"""Label post-processors: RangeNet++ kNN refinement and CRF-RNN mean-field.

Behavior-matches the reference implementations
(metrics/extractor/rangenet.py:185-263 kNN, :266-405 CRFRNN). jnp/NHWC:
neighborhood unfolds are static zero-padded shifts, the distance smoothing
and smoothness message passing are ``lax.conv``s, the majority vote is a
one-hot sum — everything jit-compiles with static shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(kernel_size: tuple[int, int], sigma: float) -> np.ndarray:
    H, W = kernel_size
    hs = np.arange(H) - H // 2
    ws = np.arange(W) - W // 2
    hh, ww = np.meshgrid(hs, ws, indexing="ij")
    k = np.exp(-(hh**2 + ww**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _unfold(x: jnp.ndarray, kernel_size: tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) -> (B, K, H, W, C) zero-padded neighborhoods in
    torch-F.unfold row-major offset order."""
    kh, kw = kernel_size
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    views = [
        jax.lax.dynamic_slice(
            xp, (0, dh, dw, 0), (x.shape[0], H, W, x.shape[3])
        )
        for dh in range(kh)
        for dw in range(kw)
    ]
    return jnp.stack(views, axis=1)


def knn_filter(
    depth: jnp.ndarray,
    label: jnp.ndarray,
    num_classes: int,
    k: int = 3,
    kernel_size: tuple[int, int] = (3, 3),
    sigma: float = 1.0,
    cutoff: float = 1.0,
) -> jnp.ndarray:
    """kNN label refinement (reference rangenet.py:197-263).

    depth: (B, H, W, 1) with invalid pixels < 0; label: (B, H, W) int.
    Returns refined (B, H, W) labels.
    """
    B, H, W, _ = depth.shape
    K = kernel_size[0] * kernel_size[1]

    neighbors = _unfold(depth, kernel_size)[..., 0]  # (B, K, H, W)
    neighbors = jnp.where(neighbors < 0, jnp.inf, neighbors)
    jump = jnp.abs(neighbors - depth[..., 0][:, None])  # (B, K, H, W)

    # penalize far pixels: per-slot conv with the inverse gaussian
    inv_g = 1.0 - _gaussian_kernel(kernel_size, sigma)
    rhs = jnp.asarray(np.tile(inv_g[:, :, None, None], (1, 1, 1, K)))
    dist = jax.lax.conv_general_dilated(
        jnp.transpose(jump, (0, 2, 3, 1)),  # (B, H, W, K)
        rhs,
        (1, 1),
        [(kernel_size[0] // 2,) * 2, (kernel_size[1] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=K,
    )  # (B, H, W, K)

    # k smallest distances + their labels
    neg_top, ids = jax.lax.top_k(-dist, k)  # (B, H, W, k)
    dist_topk = -neg_top
    label_neighbors = _unfold(label[..., None].astype(jnp.float32), kernel_size)[
        ..., 0
    ]  # (B, K, H, W)
    label_neighbors = jnp.transpose(label_neighbors, (0, 2, 3, 1))  # (B,H,W,K)
    label_topk = jnp.take_along_axis(label_neighbors, ids, axis=-1)
    if cutoff > 0:
        label_topk = jnp.where(dist_topk > cutoff, num_classes, label_topk)

    # majority vote excluding the overflow bin (reference :258-261)
    onehot = jax.nn.one_hot(label_topk.astype(jnp.int32), num_classes + 1)
    votes = onehot.sum(axis=3)  # (B, H, W, num_classes+1)
    return jnp.argmax(votes[..., :num_classes], axis=-1)


class CRFRNN:
    """Mean-field CRF-RNN (reference rangenet.py:266-405), inference only.

    Holds the fixed smoothness kernels and the (initialized-as-reference)
    per-class weights / Potts compatibility. NHWC.
    """

    def __init__(
        self,
        num_classes: int,
        kernel_size: tuple[int, int] = (3, 5),
        init_weight_smoothness: float = 0.02,
        init_weight_appearance: float = 0.1,
        theta_gamma: float | Sequence[float] = 0.9,
        theta_alpha: float | Sequence[float] = 0.9,
        theta_beta: float | Sequence[float] = 0.015,
        num_iters: int = 3,
    ):
        C = num_classes
        self.num_classes = C
        self.kernel_size = kernel_size
        self.num_iters = num_iters
        to_tuple = lambda v: np.full(C, v, np.float32) if np.isscalar(v) else np.asarray(v, np.float32)
        self.theta_gamma = to_tuple(theta_gamma)
        self.theta_alpha = to_tuple(theta_alpha)
        self.theta_beta = to_tuple(theta_beta)
        self.kernel_gamma = self._smoothness_kernel(self.theta_gamma)
        self.kernel_alpha = self._smoothness_kernel(self.theta_alpha)
        self.weight_appearance = jnp.full((C,), init_weight_appearance, jnp.float32)
        self.weight_smoothness = jnp.full((C,), init_weight_smoothness, jnp.float32)
        # Potts model [i != j], as an HWIO 1x1 kernel
        self.compat = jnp.asarray(
            (1.0 - np.eye(C, dtype=np.float32))[None, None]
        ).transpose(0, 1, 3, 2)  # (1,1,I=C,O=C) with weight[o,i]=1-eye -> sym

    def _smoothness_kernel(self, theta: np.ndarray) -> jnp.ndarray:
        """Per-class gaussian with zeroed center, as HWIO (kh,kw,C,C)
        diagonal (reference :313-331)."""
        kh, kw = self.kernel_size
        hs = np.arange(kh) - kh // 2
        ws = np.arange(kw) - kw // 2
        hh, ww = np.meshgrid(hs, ws, indexing="ij")
        pdist = hh**2 + ww**2
        C = self.num_classes
        kernel = np.zeros((kh, kw, C, C), np.float32)
        for c in range(C):
            g = np.exp(-pdist / (2 * theta[c] ** 2))
            g[kh // 2, kw // 2] = 0.0
            kernel[:, :, c, c] = g
        return jnp.asarray(kernel)

    def _conv_same(self, Q: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        return jax.lax.conv_general_dilated(
            Q, kernel, (1, 1), [(kh // 2,) * 2, (kw // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _unfold_wo_center(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B,H,W,C) -> (B, K-1, H, W, C) excluding the kernel center."""
        u = _unfold(x, self.kernel_size)
        K = self.kernel_size[0] * self.kernel_size[1]
        keep = [i for i in range(K) if i != K // 2]
        return u[:, jnp.asarray(keep)]

    def __call__(
        self, unary: jnp.ndarray, xyz: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        """unary (B,H,W,N), xyz (B,H,W,3), mask (B,H,W) -> refined logits."""
        if mask.ndim == 3:
            mask = mask[..., None]
        # appearance kernel from xyz distances (reference :353-359)
        xyz_nb = self._unfold_wo_center(xyz)  # (B,K-1,H,W,3)
        pdist = jnp.sum(jnp.square(xyz_nb - xyz[:, None]), axis=-1, keepdims=True)
        theta = jnp.asarray(self.theta_beta)  # (C,)
        kernel_beta = jnp.exp(-pdist / (2.0 * jnp.square(theta)))  # (B,K-1,H,W,C)

        Q = unary
        for _ in range(self.num_iters):
            Q = jax.nn.softmax(Q, axis=-1)
            k_smooth = self._conv_same(Q, self.kernel_gamma)
            masked_Q = Q * mask
            Q_nb = self._unfold_wo_center(masked_Q)
            exp_appearance = jnp.sum(Q_nb * kernel_beta, axis=1) * mask
            exp_smooth = self._conv_same(Q, self.kernel_alpha)
            k_appear = exp_appearance * exp_smooth
            weighted = (
                self.weight_smoothness * k_smooth
                + self.weight_appearance * k_appear
            )
            pairwise = jax.lax.conv_general_dilated(
                weighted, self.compat, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            Q = unary - pairwise
        return Q
