"""Continuous-time Gaussian diffusion (VDM, arXiv 2107.00630) — JAX/TPU.

Behavior-matches the reference ContinuousTimeGaussianDiffusion
(models/diffusion/continuous_time.py:66-317): logSNR schedules, eps/v/x0
prediction, DDPM & DDIM ancestral steps, RePaint completion. TPU-native
re-design:

  - ``sample`` compiles the entire reverse chain into ONE ``lax.scan`` —
    256 U-Net calls with no host synchronization (the reference runs a
    Python loop with one CUDA launch batch per step, continuous_time.py:252);
  - ``repaint`` likewise scans over the (step x resample) grid with the
    jump loops unrolled (statically small), reference continuous_time.py:260-317;
  - schedule math is fp32 (matching @autocast(enabled=False) pins) while the
    network may run bf16 internally.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import schedules
from .base import GaussianDiffusion, as_typed_key, normal, split_key


def _b(x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-sample scalars against NHWC images: (B,)->(B,1,1,1)."""
    return jnp.reshape(x, (-1, 1, 1, 1))


class ContinuousTimeGaussianDiffusion(GaussianDiffusion):
    def __init__(
        self,
        model,
        prediction_type: str = "eps",
        loss_type: str = "l2",
        noise_schedule: str = "cosine",
        min_snr_loss_weight: bool = True,
        min_snr_gamma: float = 5.0,
        sampling_resolution: Optional[tuple[int, int]] = None,
        clip_sample: bool = True,
        clip_sample_range: float = 1.0,
        image_d: Optional[float] = None,
        noise_d_low: Optional[float] = None,
        noise_d_high: Optional[float] = None,
        apply_fn=None,
    ):
        super().__init__(
            model=model,
            prediction_type=prediction_type,
            loss_type=loss_type,
            num_training_steps=None,
            noise_schedule=noise_schedule,
            min_snr_loss_weight=min_snr_loss_weight,
            min_snr_gamma=min_snr_gamma,
            sampling_resolution=sampling_resolution,
            clip_sample=clip_sample,
            clip_sample_range=clip_sample_range,
            apply_fn=apply_fn,
        )
        self.log_snr = schedules.make_logsnr_fn(
            noise_schedule, image_d, noise_d_low, noise_d_high
        )

    # ------------------------------------------------------------- training
    def sample_timesteps(self, key, batch_size: int) -> jnp.ndarray:
        # t ~ U[0, 1), reference continuous_time.py:133-135
        return jax.random.uniform(key, (batch_size,), jnp.float32)

    def get_network_condition(self, steps: jnp.ndarray) -> jnp.ndarray:
        return self.log_snr(jnp.atleast_1d(steps).astype(jnp.float32))

    def get_target(self, x_0, step_t, noise):
        if self.objective == "eps":
            return noise
        if self.objective == "x_0":
            return x_0
        if self.objective == "v":
            log_snr = _b(self.log_snr(jnp.atleast_1d(step_t)))
            alpha, sigma = schedules.logsnr_to_alpha_sigma(log_snr)
            return alpha * noise - sigma * x_0
        raise ValueError(f"invalid objective {self.objective}")

    def get_loss_weight(self, steps) -> jnp.ndarray:
        # min-SNR-gamma weighting, reference continuous_time.py:153-167
        snr = jnp.exp(self.log_snr(jnp.atleast_1d(steps)))
        clipped = jnp.minimum(snr, self.min_snr_gamma) if self.min_snr_loss_weight else snr
        if self.objective == "eps":
            return clipped / snr
        if self.objective == "x_0":
            return clipped
        if self.objective == "v":
            return clipped / (snr + 1.0)
        raise ValueError(f"invalid objective {self.objective}")

    # ------------------------------------------------------------ processes
    def q_step_from_x_0(self, x_0, step_t, noise):
        """x_t = alpha x_0 + sigma eps (reference continuous_time.py:169-176)."""
        log_snr = _b(self.log_snr(jnp.atleast_1d(step_t)))
        alpha, sigma = schedules.logsnr_to_alpha_sigma(log_snr)
        return x_0 * alpha + noise * sigma

    def q_step(self, x_s, step_t, step_s, noise):
        """q(z_t | z_s), 0<s<t<1 (reference continuous_time.py:178-190)."""
        alpha_t, sigma_t = schedules.logsnr_to_alpha_sigma(
            _b(self.log_snr(jnp.atleast_1d(step_t)))
        )
        alpha_s, sigma_s = schedules.logsnr_to_alpha_sigma(
            _b(self.log_snr(jnp.atleast_1d(step_s)))
        )
        alpha_ts = alpha_t / alpha_s
        var = jnp.square(sigma_t) - jnp.square(alpha_ts) * jnp.square(sigma_s)
        return x_s * alpha_ts + jnp.sqrt(var) * noise

    def _model_x0(
        self,
        variables,
        x_t: jnp.ndarray,
        log_snr_t: jnp.ndarray,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Run the network at (x_t, logSNR_t) and convert its eps/v/x0
        prediction to a clipped x_0 estimate (the shared first half of every
        reverse step, reference continuous_time.py:205-219)."""
        alpha_t, sigma_t = schedules.logsnr_to_alpha_sigma(_b(log_snr_t))
        prediction = self.apply_fn(
            variables, x_t, log_snr_t, **(model_kwargs or {})
        ).astype(jnp.float32)
        if self.objective == "eps":
            x_0 = (x_t - sigma_t * prediction) / alpha_t
        elif self.objective == "v":
            x_0 = alpha_t * x_t - sigma_t * prediction
        elif self.objective == "x_0":
            x_0 = prediction
        else:
            raise ValueError(f"invalid objective {self.objective}")
        return self._clip(x_0)

    def p_step(
        self,
        variables,
        x_t: jnp.ndarray,
        step_t: jnp.ndarray,
        step_s: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
        mode: str = "ddpm",
        ddim_eta: float = 0.0,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """One reverse step p(z_s | z_t) (reference continuous_time.py:192-232).

        ``noise`` must be provided for stochastic modes (pass zeros for the
        deterministic mean); keeping it an argument keeps the function pure.
        """
        B = x_t.shape[0]
        x_t = x_t.astype(jnp.float32)
        log_snr_t = self.log_snr(jnp.broadcast_to(jnp.atleast_1d(step_t), (B,)).astype(jnp.float32))
        log_snr_s = self.log_snr(jnp.broadcast_to(jnp.atleast_1d(step_s), (B,)).astype(jnp.float32))
        alpha_t, sigma_t = schedules.logsnr_to_alpha_sigma(_b(log_snr_t))
        alpha_s, sigma_s = schedules.logsnr_to_alpha_sigma(_b(log_snr_s))
        x_0 = self._model_x0(variables, x_t, log_snr_t, model_kwargs)
        if noise is None:
            noise = jnp.zeros_like(x_t)
        if mode == "ddpm":
            c = -jnp.expm1(_b(log_snr_t) - _b(log_snr_s))
            mean = alpha_s * (x_t * (1.0 - c) / alpha_t + c * x_0)
            std = sigma_s * jnp.sqrt(c)
            return mean + std * noise
        if mode == "ddim":
            c_1 = (
                ddim_eta
                * sigma_s
                / sigma_t
                * jnp.sqrt(1.0 - jnp.square(alpha_t) / jnp.square(alpha_s))
            )
            c_2 = jnp.sqrt(1.0 - jnp.square(alpha_s) - jnp.square(c_1))
            eps = (x_t - alpha_t * x_0) / sigma_t
            return alpha_s * x_0 + c_1 * noise + c_2 * eps
        raise ValueError(f"invalid mode {mode}")

    # ------------------------------------------------------------- sampling
    def sample(
        self,
        variables,
        key: jnp.ndarray,
        batch_size: int,
        num_steps: int,
        mode: str = "ddpm",
        ddim_eta: float = 0.0,
        return_all: bool = False,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Full reverse chain as one ``lax.scan`` (reference loop:
        continuous_time.py:234-258). ``key`` may be a single key or a (B,)
        batch of per-sample keys. Returns (B, H, W, C) fp32 in [-1, 1], or
        (num_steps+1, B, H, W, C) when ``return_all``."""
        key = as_typed_key(key)
        key, sub = split_key(key)
        x = normal(sub, (batch_size, *self.sampling_shape))
        ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)

        def body(carry, i):
            x, key = carry
            key, sub = split_key(key)
            noise = normal(sub, x.shape)
            x = self.p_step(
                variables, x, ts[i], ts[i + 1], noise=noise, mode=mode,
                ddim_eta=ddim_eta, model_kwargs=model_kwargs,
            )
            return (x, key), (x if return_all else None)

        (x_final, _), xs = jax.lax.scan(
            body, (x, key), jnp.arange(num_steps)
        )
        if return_all:
            return jnp.concatenate([x[None], xs], axis=0)
        return x_final

    def sample_segment(
        self,
        variables,
        x: jnp.ndarray,
        key: jnp.ndarray,
        ts_seg: jnp.ndarray,
        mode: str = "ddpm",
        ddim_eta: float = 0.0,
        return_all: bool = False,
        model_kwargs: Optional[dict] = None,
    ) -> tuple:
        """Scan ``p_step`` over a contiguous slice of boundary times
        ``ts_seg`` ((K+1,)); returns the advanced ``(x, key)`` carry (plus
        the per-step stack when ``return_all``).

        Chaining segments over ``linspace(1, 0, num_steps + 1)`` reproduces
        :meth:`sample` EXACTLY (the per-step key-split sequence is identical)
        while letting the host report progress between chunks — the
        scan-compatible replacement for the reference's per-step tqdm
        (continuous_time.py:251-252)."""
        def body(carry, i):
            x, key = carry
            key, sub = split_key(key)
            noise = normal(sub, x.shape)
            x = self.p_step(
                variables, x, ts_seg[i], ts_seg[i + 1], noise=noise, mode=mode,
                ddim_eta=ddim_eta, model_kwargs=model_kwargs,
            )
            return (x, key), (x if return_all else None)

        (x, key), xs = jax.lax.scan(
            body, (x, key), jnp.arange(ts_seg.shape[0] - 1)
        )
        if return_all:
            return x, key, xs
        return x, key

    # -------------------------------------------------- DPM-Solver++ (2M)
    # Second-order multistep ODE solver in the data-prediction
    # parameterization (Lu et al., arXiv 2211.01095). EXTENSION beyond the
    # reference (which has only ddpm/ddim ancestral steps,
    # continuous_time.py:224-229): at 16-32 steps the second-order update
    # tracks the probability-flow ODE far closer than DDIM, so the few-step
    # serving lane keeps more of the 256-step quality. Deterministic — the
    # key only seeds x_T (and is split per step so seeds line up with the
    # other samplers).
    def dpmpp_2m_segment(
        self,
        variables,
        x: jnp.ndarray,
        prev_x0: jnp.ndarray,
        prev_lam: jnp.ndarray,
        key: jnp.ndarray,
        ts_seg: jnp.ndarray,
        second_order: jnp.ndarray,
        model_kwargs: Optional[dict] = None,
        return_all: bool = False,
    ) -> tuple:
        """Scan the 2M update over ``ts_seg`` ((K+1,) boundary times).

        Carry is ``(x, prev_x0, prev_lam, key)`` — the previous step's x_0
        prediction and half-logSNR, which the multistep update extrapolates
        through. ``second_order`` ((K,) bool) gates the 2M correction per
        step: False forces the first-order (DPM-Solver++ 1S == DDIM eta=0 in
        x0 form) update, used for the global first step (no history) and
        the global last step (the standard lower-order-final stabilizer).
        Chaining segments reproduces :meth:`sample_dpmpp` EXACTLY.
        """
        B = x.shape[0]

        def body(carry, i):
            x, prev_x0, prev_lam, key = carry
            key, _ = split_key(key)  # uniform key math with sample_segment
            x = x.astype(jnp.float32)
            log_snr_t = self.log_snr(
                jnp.broadcast_to(jnp.atleast_1d(ts_seg[i]), (B,)).astype(jnp.float32)
            )
            log_snr_s = self.log_snr(
                jnp.broadcast_to(jnp.atleast_1d(ts_seg[i + 1]), (B,)).astype(jnp.float32)
            )
            x0 = self._model_x0(variables, x, log_snr_t, model_kwargs)
            lam_t = 0.5 * _b(log_snr_t)  # lambda := log(alpha/sigma)
            lam_s = 0.5 * _b(log_snr_s)
            h = lam_s - lam_t  # > 0 (logSNR grows as t decreases)
            h_prev = lam_t - prev_lam
            so = second_order[i]
            # D = x0 + (h / 2 h_prev) (x0 - prev_x0); guard h_prev=0 on the
            # (first-order) steps where the correction is switched off
            coeff = jnp.where(so, h / (2.0 * jnp.where(so, h_prev, 1.0)), 0.0)
            d = x0 + coeff * (x0 - prev_x0)
            _, sigma_t = schedules.logsnr_to_alpha_sigma(_b(log_snr_t))
            alpha_s, sigma_s = schedules.logsnr_to_alpha_sigma(_b(log_snr_s))
            x_next = (sigma_s / sigma_t) * x - alpha_s * jnp.expm1(-h) * d
            return (x_next, x0, lam_t, key), (x_next if return_all else None)

        carry, xs = jax.lax.scan(
            body, (x, prev_x0, prev_lam, key), jnp.arange(ts_seg.shape[0] - 1)
        )
        if return_all:
            return (*carry, xs)
        return carry

    def sample_dpmpp(
        self,
        variables,
        key: jnp.ndarray,
        batch_size: int,
        num_steps: int,
        return_all: bool = False,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Full DPM-Solver++(2M) chain as one ``lax.scan``; same interface
        and initial-noise key math as :meth:`sample` (a given key draws the
        same x_T under every sampler)."""
        key = as_typed_key(key)
        key, sub = split_key(key)
        x = normal(sub, (batch_size, *self.sampling_shape))
        ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
        idx = jnp.arange(num_steps)
        second_order = (idx > 0) & (idx < num_steps - 1)
        prev_x0 = jnp.zeros_like(x)
        prev_lam = jnp.zeros((batch_size, 1, 1, 1), jnp.float32)
        out = self.dpmpp_2m_segment(
            variables, x, prev_x0, prev_lam, key, ts, second_order,
            model_kwargs=model_kwargs, return_all=return_all,
        )
        if return_all:
            return jnp.concatenate([x[None], out[4]], axis=0)
        return out[0]

    def _repaint_reverse_jumps(
        self, variables, known, mask, x, step_t, step_s, key,
        jump_length: int, model_kwargs: Optional[dict],
    ):
        """t -> s through jump_length sub-steps, blending known pixels
        (reference continuous_time.py:283-303). ``known``/``mask`` fp32."""
        interp = jnp.linspace(0.0, 1.0, jump_length + 1, dtype=jnp.float32)
        r_steps = step_t + interp * (step_s - step_t)  # (jump_length+1,)
        for k in range(jump_length):
            key, k_known, k_p = split_key(key, 3)
            known_noise = normal(k_known, known.shape)
            known_s = self.q_step_from_x_0(known, r_steps[k + 1], known_noise)
            p_noise = normal(k_p, x.shape)
            unknown_s = self.p_step(
                variables, x, r_steps[k], r_steps[k + 1], noise=p_noise,
                model_kwargs=model_kwargs,
            )
            x = mask * known_s + (1.0 - mask) * unknown_s
        return x, key

    # The RePaint outer drivers (``repaint`` / ``repaint_segment`` /
    # ``repaint_final`` / ``_repaint_forward_jumps``) live on the base class
    # (diffusion/base.py) — they are generic over the two hooks this class
    # provides: :meth:`_repaint_reverse_jumps` and :meth:`q_step`.
