"""Discrete-time DDPM (arXiv 2006.11239) — JAX/TPU.

Behavior-matches the reference DiscreteTimeGaussianDiffusion
(models/diffusion/discrete_time.py:51-201): precomputed beta tables
(linear/cosine/sigmoid, float64 cumprod then fp32), eps/v/x0 prediction,
DDPM & DDIM p-steps with noise zeroed at step 0, scan-compiled sampling.

The tables are host-side numpy constants embedded at trace time — the
reference registers them as torch buffers (discrete_time.py:57-78); here they
constant-fold into the compiled computation and index with `jnp.take`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import schedules
from .base import GaussianDiffusion, as_typed_key, normal, split_key


def _b(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.reshape(x, (-1, 1, 1, 1))


class DiscreteTimeGaussianDiffusion(GaussianDiffusion):
    def __init__(
        self,
        model,
        prediction_type: str = "eps",
        loss_type: str = "l2",
        num_training_steps: int = 1000,
        noise_schedule: str = "linear",
        min_snr_loss_weight: bool = True,
        min_snr_gamma: float = 5.0,
        sampling_resolution: Optional[tuple[int, int]] = None,
        clip_sample: bool = True,
        clip_sample_range: float = 1.0,
        apply_fn=None,
    ):
        super().__init__(
            model=model,
            prediction_type=prediction_type,
            loss_type=loss_type,
            num_training_steps=num_training_steps,
            noise_schedule=noise_schedule,
            min_snr_loss_weight=min_snr_loss_weight,
            min_snr_gamma=min_snr_gamma,
            sampling_resolution=sampling_resolution,
            clip_sample=clip_sample,
            clip_sample_range=clip_sample_range,
            apply_fn=apply_fn,
        )
        tables = schedules.discrete_tables(noise_schedule, num_training_steps)
        self.beta = jnp.asarray(tables["beta"])
        self.alpha_bar = jnp.asarray(tables["alpha_bar"])
        self.alpha_bar_prev = jnp.asarray(tables["alpha_bar_prev"])
        self.snr = jnp.asarray(tables["snr"])

    # ------------------------------------------------------------- training
    def sample_timesteps(self, key, batch_size: int) -> jnp.ndarray:
        # reference discrete_time.py:80-88
        return jax.random.randint(
            key, (batch_size,), 0, self.num_training_steps, jnp.int32
        )

    def get_network_condition(self, steps: jnp.ndarray) -> jnp.ndarray:
        return jnp.atleast_1d(steps)

    def get_target(self, x_0, steps, noise):
        if self.objective == "eps":
            return noise
        if self.objective == "x_0":
            return x_0
        if self.objective == "v":
            alpha_bar = _b(self.alpha_bar[jnp.atleast_1d(steps)])
            return jnp.sqrt(alpha_bar) * noise - jnp.sqrt(1.0 - alpha_bar) * x_0
        raise ValueError(f"invalid objective {self.objective}")

    def get_loss_weight(self, steps) -> jnp.ndarray:
        snr = self.snr[jnp.atleast_1d(steps)]
        clipped = jnp.minimum(snr, self.min_snr_gamma) if self.min_snr_loss_weight else snr
        if self.objective == "eps":
            return clipped / snr
        if self.objective == "x_0":
            return clipped
        if self.objective == "v":
            return clipped / (snr + 1.0)
        raise ValueError(f"invalid objective {self.objective}")

    # ------------------------------------------------------------ processes
    def q_step_from_x_0(self, x_0, steps, noise):
        alpha_bar = _b(self.alpha_bar[jnp.atleast_1d(steps)])
        return jnp.sqrt(alpha_bar) * x_0 + jnp.sqrt(1.0 - alpha_bar) * noise

    def p_step(
        self,
        variables,
        x_t: jnp.ndarray,
        steps: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
        mode: str = "ddpm",
        eta: float = 0.0,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """One reverse step (reference discrete_time.py:126-180). Noise is
        zeroed where ``steps == 0`` (the reference's in-place mask,
        discrete_time.py:162,176-177)."""
        B = x_t.shape[0]
        x_t = x_t.astype(jnp.float32)
        steps = jnp.broadcast_to(jnp.atleast_1d(steps), (B,))
        beta = _b(self.beta[steps])
        alpha = 1.0 - beta
        alpha_bar = _b(self.alpha_bar[steps])
        alpha_bar_prev = _b(self.alpha_bar_prev[steps])
        prediction = self.apply_fn(
            variables, x_t, steps, **(model_kwargs or {})
        ).astype(jnp.float32)
        if self.objective == "eps":
            x_0 = (
                jax.lax.rsqrt(alpha_bar) * x_t
                - jnp.sqrt(1.0 / alpha_bar - 1.0) * prediction
            )
        elif self.objective == "x_0":
            x_0 = prediction
        elif self.objective == "v":
            x_0 = (
                jnp.sqrt(alpha_bar) * x_t - jnp.sqrt(1.0 - alpha_bar) * prediction
            )
        else:
            raise ValueError(f"invalid objective {self.objective}")
        x_0 = self._clip(x_0)
        if noise is None:
            noise = jnp.zeros_like(x_t)
        noise = noise * _b((steps > 0).astype(jnp.float32))
        if mode == "ddpm":
            x_0_coef = jnp.sqrt(alpha_bar_prev) * beta / (1.0 - alpha_bar)
            x_t_coef = (1.0 - alpha_bar_prev) * jnp.sqrt(alpha) / (1.0 - alpha_bar)
            mean = x_0_coef * x_0 + x_t_coef * x_t
            var = beta * (1.0 - alpha_bar_prev) / (1.0 - alpha_bar)
            var = jnp.maximum(var, 1e-20)
            std = jnp.exp(0.5 * jnp.log(var))
            return mean + std * noise
        if mode == "ddim":
            var = (
                (1.0 - alpha_bar_prev)
                / (1.0 - alpha_bar)
                * (1.0 - alpha_bar / alpha_bar_prev)
            )
            std_dev = eta * jnp.sqrt(var)
            eps = (x_t - jnp.sqrt(alpha_bar) * x_0) / jnp.sqrt(1.0 - alpha_bar)
            x_s = (
                jnp.sqrt(alpha_bar_prev) * x_0
                + jnp.sqrt(1.0 - alpha_bar_prev - jnp.square(std_dev)) * eps
            )
            if eta > 0:
                x_s = x_s + std_dev * noise
            return x_s
        raise ValueError(f"invalid mode {mode}")

    # ------------------------------------------------------------- sampling
    def sample(
        self,
        variables,
        key: jnp.ndarray,
        batch_size: int,
        num_steps: Optional[int] = None,
        mode: str = "ddpm",
        eta: float = 0.0,
        return_all: bool = False,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Reverse chain T-1..0 as one ``lax.scan`` (reference loop:
        discrete_time.py:182-201)."""
        num_steps = self.num_training_steps if num_steps is None else num_steps
        key = as_typed_key(key)
        key, sub = split_key(key)
        x = normal(sub, (batch_size, *self.sampling_shape))

        def body(carry, timestep):
            x, key = carry
            key, sub = split_key(key)
            noise = normal(sub, x.shape)
            steps = jnp.full((batch_size,), timestep, jnp.int32)
            x = self.p_step(
                variables, x, steps, noise=noise, mode=mode, eta=eta,
                model_kwargs=model_kwargs,
            )
            return (x, key), (x if return_all else None)

        timesteps = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
        (x_final, _), xs = jax.lax.scan(body, (x, key), timesteps)
        if return_all:
            return jnp.concatenate([x[None], xs], axis=0)
        return x_final

    def sample_segment(
        self,
        variables,
        x: jnp.ndarray,
        key: jnp.ndarray,
        timesteps_seg: jnp.ndarray,
        mode: str = "ddpm",
        eta: float = 0.0,
        return_all: bool = False,
        model_kwargs: Optional[dict] = None,
    ) -> tuple:
        """Scan ``p_step`` over a slice of the descending timestep index
        array; returns the advanced ``(x, key)`` carry (plus the per-step
        stack when ``return_all``). Chaining segments over
        ``arange(T-1, -1, -1)`` reproduces :meth:`sample` EXACTLY
        (identical key-split sequence) — used for chunked/progress sampling
        (see ContinuousTimeGaussianDiffusion.sample_segment)."""
        batch_size = x.shape[0]

        def body(carry, timestep):
            x, key = carry
            key, sub = split_key(key)
            noise = normal(sub, x.shape)
            steps = jnp.full((batch_size,), timestep, jnp.int32)
            x = self.p_step(
                variables, x, steps, noise=noise, mode=mode, eta=eta,
                model_kwargs=model_kwargs,
            )
            return (x, key), (x if return_all else None)

        (x, key), xs = jax.lax.scan(body, (x, key), timesteps_seg)
        if return_all:
            return x, key, xs
        return x, key
