"""Noise schedules for continuous- and discrete-time Gaussian diffusion.

Behavior-matches the reference schedule functions
(models/diffusion/continuous_time.py:14-63 and discrete_time.py:12-48) but is
written as pure jnp/numpy math:

  - continuous logSNR schedules are fp32 jnp functions of t in [0, 1] that
    constant-fold under jit when t is a tracer-free constant and vectorize
    over the `lax.scan` sampling loop;
  - discrete beta tables are computed once on host in float64 (the reference
    uses torch float64 then casts) and embedded as fp32 constants.

All continuous schedules return a logSNR array broadcastable against NHWC
images as (B, 1, 1, 1); scalar t is fine too.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _log(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return jnp.log(jnp.clip(x, min=eps))


def logsnr_linear(t: jnp.ndarray) -> jnp.ndarray:
    """-log(expm1(1e-4 + 10 t^2)); reference continuous_time.py:18-19."""
    return -_log(jnp.expm1(1e-4 + 10.0 * jnp.square(t)))


def logsnr_cosine(
    t: jnp.ndarray, logsnr_min: float = -15.0, logsnr_max: float = 15.0
) -> jnp.ndarray:
    """-2 log tan(t_min + t (t_max - t_min)); reference continuous_time.py:22-29."""
    t_min = math.atan(math.exp(-0.5 * logsnr_max))
    t_max = math.atan(math.exp(-0.5 * logsnr_min))
    return -2.0 * _log(jnp.tan(t_min + t * (t_max - t_min)))


def logsnr_cosine_shifted(
    t: jnp.ndarray,
    image_d: float,
    noise_d: float,
    logsnr_min: float = -15.0,
    logsnr_max: float = 15.0,
) -> jnp.ndarray:
    """Cosine schedule shifted by 2 log(noise_d / image_d) for resolution
    transfer; reference continuous_time.py:32-41."""
    shift = 2.0 * math.log(noise_d / image_d)
    return logsnr_cosine(t, logsnr_min, logsnr_max) + shift


def logsnr_cosine_interpolated(
    t: jnp.ndarray,
    image_d: float,
    noise_d_low: float,
    noise_d_high: float,
    logsnr_min: float = -15.0,
    logsnr_max: float = 15.0,
) -> jnp.ndarray:
    """t-interpolation between low/high shifted cosine schedules; reference
    continuous_time.py:44-58.

    NOTE: deliberate deviation. The reference computes
    ``t * logsnr_low + (1 - t) * logsnr_high`` with t of shape (N,) against
    (N,1,1,1) curves, broadcasting t along the trailing axis — for vector
    timesteps the effective weight is t[0] for every sample (and the result
    shape (N,1,1,N) cannot broadcast against images). We implement the
    intended elementwise interpolation from "simple diffusion"
    (arXiv 2301.11093 eq. 11). The reference's default config ("cosine")
    never exercises this path.
    """
    low = logsnr_cosine_shifted(t, image_d, noise_d_low, logsnr_min, logsnr_max)
    high = logsnr_cosine_shifted(t, image_d, noise_d_high, logsnr_min, logsnr_max)
    return t * low + (1.0 - t) * high


def logsnr_to_alpha_sigma(log_snr: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """alpha = sqrt(sigmoid(logSNR)), sigma = sqrt(sigmoid(-logSNR));
    reference continuous_time.py:61-63. fp32-sensitive at |logSNR| ~ 15."""
    alpha = jnp.sqrt(jax.nn.sigmoid(log_snr))
    sigma = jnp.sqrt(jax.nn.sigmoid(-log_snr))
    return alpha, sigma


def make_logsnr_fn(
    noise_schedule: str,
    image_d: float | None = None,
    noise_d_low: float | None = None,
    noise_d_high: float | None = None,
):
    """Resolve a schedule name to a t -> logSNR function (reference
    continuous_time.py:106-131)."""
    if noise_schedule == "linear":
        return logsnr_linear
    if noise_schedule == "cosine":
        return logsnr_cosine
    if noise_schedule == "cosine_shifted":
        assert image_d is not None and noise_d_low is not None
        return lambda t: logsnr_cosine_shifted(t, image_d, noise_d_low)
    if noise_schedule == "cosine_interpolated":
        assert None not in (image_d, noise_d_low, noise_d_high)
        return lambda t: logsnr_cosine_interpolated(
            t, image_d, noise_d_low, noise_d_high
        )
    raise ValueError(f"invalid noise schedule: {noise_schedule}")


# ----------------------------------------------------------------- discrete
def linear_beta_schedule(steps: int) -> np.ndarray:
    """Original DDPM linear schedule scaled to the step count; reference
    discrete_time.py:12-19. float64 internally."""
    scale = 1000.0 / steps
    return np.linspace(scale * 0.0001, scale * 0.02, steps, dtype=np.float64)


def cosine_beta_schedule(steps: int, s: float = 0.008) -> np.ndarray:
    """Nichol-Dhariwal cosine schedule; reference discrete_time.py:22-31."""
    t = np.linspace(0.0, steps, steps + 1, dtype=np.float64) / steps
    alphas_bar = np.cos((t + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_bar = alphas_bar / alphas_bar[0]
    betas = 1.0 - alphas_bar[1:] / alphas_bar[:-1]
    return np.clip(betas, 0.0, 0.999)


def sigmoid_beta_schedule(
    steps: int, start: float = -3.0, end: float = 3.0, tau: float = 1.0
) -> np.ndarray:
    """Sigmoid schedule (arXiv 2212.11972 Fig. 8); reference
    discrete_time.py:34-48."""

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    t = np.linspace(0.0, steps, steps + 1, dtype=np.float64) / steps
    v_start = sigmoid(start / tau)
    v_end = sigmoid(end / tau)
    alphas_bar = (-sigmoid((t * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    alphas_bar = alphas_bar / alphas_bar[0]
    betas = 1.0 - alphas_bar[1:] / alphas_bar[:-1]
    return np.clip(betas, 0.0, 0.999)


def make_beta_table(noise_schedule: str, steps: int) -> np.ndarray:
    if noise_schedule == "linear":
        return linear_beta_schedule(steps)
    if noise_schedule == "cosine":
        return cosine_beta_schedule(steps)
    if noise_schedule == "sigmoid":
        return sigmoid_beta_schedule(steps)
    raise ValueError(f"invalid beta schedule: {noise_schedule}")


def discrete_tables(noise_schedule: str, steps: int) -> dict[str, np.ndarray]:
    """Precomputed fp32 tables {beta, alpha_bar, alpha_bar_prev, snr}
    (reference discrete_time.py:57-78); float64 cumprod before the cast."""
    beta = make_beta_table(noise_schedule, steps)
    alpha_bar = np.cumprod(1.0 - beta)
    alpha_bar_prev = np.concatenate([[1.0], alpha_bar[:-1]])
    snr = alpha_bar / (1.0 - alpha_bar)
    return {
        "beta": beta.astype(np.float32),
        "alpha_bar": alpha_bar.astype(np.float32),
        "alpha_bar_prev": alpha_bar_prev.astype(np.float32),
        "snr": snr.astype(np.float32),
    }
