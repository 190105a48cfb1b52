"""Bird's-eye-view histogram metrics (JSD / MMD), pure jnp.

Behavior-matches reference ``metrics/bev.py:5-53`` (constants from lidargen):
160 m field, 100 bins, depth gate (3, 70) m, RBF kernel sigma 0.5. The
histogram is a scatter-add (TPU-friendly; torch.histogramdd semantics
including right-edge inclusion); JSD follows scipy.jensenshannon (natural
log, sqrt of the divergence).
"""

from __future__ import annotations

import jax.numpy as jnp


def point_cloud_to_histogram(
    point_cloud: jnp.ndarray,
    field_size: float = 160.0,
    bins: int = 100,
    min_depth: float = 3.0,
    max_depth: float = 70.0,
) -> jnp.ndarray:
    """(N, 3) points -> (bins, bins) xy histogram (reference bev.py:5-22)."""
    assert point_cloud.ndim == 2
    assert bins % 2 == 0
    depth = jnp.linalg.norm(point_cloud, axis=1)
    valid = (depth > min_depth) & (depth < max_depth)
    bound = field_size / 2
    xy = point_cloud[:, 0:2]
    inside = valid & jnp.all((xy >= -bound) & (xy <= bound), axis=1)
    width = field_size / bins
    # right-edge-inclusive binning like torch.histogramdd / np.histogram2d
    ix = jnp.minimum(jnp.floor((xy[:, 0] + bound) / width), bins - 1).astype(jnp.int32)
    iy = jnp.minimum(jnp.floor((xy[:, 1] + bound) / width), bins - 1).astype(jnp.int32)
    flat = ix * bins + iy
    hist = jnp.zeros((bins * bins,), jnp.float32)
    hist = hist.at[flat].add(inside.astype(jnp.float32))
    return hist.reshape(bins, bins)


def cdist_rbf(p: jnp.ndarray, q: jnp.ndarray, sigma: float = 0.5) -> jnp.ndarray:
    """RBF kernel matrix (reference bev.py:25-31)."""
    d2 = jnp.sum(jnp.square(p[:, None] - q[None]), axis=-1)
    gamma = 1.0 / (2.0 * sigma**2)
    return jnp.exp(-gamma * d2)


def compute_jsd_2d(hist1: jnp.ndarray, hist2: jnp.ndarray) -> float:
    """Jensen-Shannon distance between summed BEV distributions
    (reference bev.py:34-42; scipy convention: sqrt of JS divergence)."""
    p = hist1.reshape(len(hist1), -1).sum(axis=0)
    q = hist2.reshape(len(hist2), -1).sum(axis=0)
    p = p / p.sum()
    q = q / q.sum()
    m = (p + q) / 2.0

    def kl(a, b):
        r = jnp.where(a > 0, a * jnp.log(jnp.where(a > 0, a, 1.0) / jnp.where(b > 0, b, 1.0)), 0.0)
        return r.sum()

    js = (kl(p, m) + kl(q, m)) / 2.0
    return float(jnp.sqrt(js))


def compute_mmd_2d(hist1: jnp.ndarray, hist2: jnp.ndarray) -> float:
    """RBF-kernel MMD over per-scan normalized histograms
    (reference bev.py:45-53)."""
    p = hist1.reshape(len(hist1), -1)
    q = hist2.reshape(len(hist2), -1)
    p = p / p.sum(axis=1, keepdims=True)
    q = q / q.sum(axis=1, keepdims=True)
    mmd = (
        cdist_rbf(p, p).mean() + cdist_rbf(q, q).mean() - 2.0 * cdist_rbf(p, q).mean()
    )
    return float(mmd)
