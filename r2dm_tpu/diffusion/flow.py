"""Rectified flow / flow matching on straight noise→data paths.

EXTENSION beyond the reference repo (which is DDPM-only): the reference's
authors' own follow-up ("Fast LiDAR Data Generation with Rectified Flows",
arXiv 2412.02241) moves to this family for few-step generation, so a
complete LiDAR-diffusion framework should offer it. Formulation (rectified
flow, arXiv 2209.03003 / flow matching, arXiv 2210.02747):

  path      x_t = (1 - t) * x_0 + t * eps,        t in [0, 1], eps ~ N(0, I)
  training  minimize || v_theta(x_t, t) - (eps - x_0) ||^2
  sampling  integrate dx/dt = v_theta(x, t) from x(1) = eps down to t = 0
            (deterministic ODE; "euler" = 1 net call/step, "midpoint" =
            2 calls/step with 2nd-order accuracy)

Drop-in sibling of the Gaussian processes: same hook surface
(diffusion/base.py), same trainer/DDPM-wrapper plumbing, same
per-sample-key semantics (a given key draws the same x(1) as the other
samplers draw x_T), and a ``sample_segment`` whose chunks reproduce
:meth:`sample` bit-exactly (chunked/progress/mesh serving paths reuse the
continuous-time code in inference.py unchanged).

The network conditions on ``t * condition_scale`` (default 1000): the time
embedding (models/layers.py) was designed for logSNR/step-index magnitudes,
so raw t in [0, 1] would underuse its frequency range.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .base import GaussianDiffusion, as_typed_key, normal, split_key


def _b(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.reshape(x, (-1, 1, 1, 1))


class RectifiedFlow(GaussianDiffusion):
    """Velocity-matching flow on straight paths (see module docstring)."""

    def __init__(
        self,
        model,
        loss_type: str = "l2",
        sampling_resolution: Optional[tuple[int, int]] = None,
        condition_scale: float = 1000.0,
        apply_fn=None,
    ):
        super().__init__(
            model=model,
            prediction_type="v",  # nearest Gaussian analogue, for repr only
            loss_type=loss_type,
            num_training_steps=None,
            noise_schedule="linear",
            min_snr_loss_weight=False,
            sampling_resolution=sampling_resolution,
            clip_sample=False,  # the ODE is integrated unclipped
            apply_fn=apply_fn,
        )
        self.condition_scale = float(condition_scale)

    # hooks (training path, base.loss/p_loss) ------------------------------
    def sample_timesteps(self, key, batch_size: int) -> jnp.ndarray:
        import jax

        return jax.random.uniform(key, (batch_size,), jnp.float32)

    def get_network_condition(self, steps: jnp.ndarray) -> jnp.ndarray:
        return jnp.atleast_1d(steps).astype(jnp.float32) * self.condition_scale

    def get_target(self, x_0, steps, noise):
        return noise - x_0  # the straight path's constant velocity

    def get_loss_weight(self, steps) -> jnp.ndarray:
        return jnp.ones_like(jnp.atleast_1d(steps))

    def q_step_from_x_0(self, x_0, steps, noise):
        t = _b(jnp.atleast_1d(steps))
        return (1.0 - t) * x_0 + t * noise

    def q_step(self, x_s, step_t, step_s, noise):
        """Forward re-noising s -> t (s < t) preserving the straight-path
        marginal — the RePaint jump-back hook (base.py drivers).

        The flow path is the Gaussian interpolation with (alpha, sigma) =
        (1 - t, t): writing x_s = (1-s) x_0 + s eps, scaling by
        a = (1-t)/(1-s) keeps the signal at (1-t) x_0 while shrinking the
        old noise to a*s; topping up with fresh noise of variance
        t^2 - (a s)^2 (> 0 since a < 1 and t > s) restores the exact
        marginal N((1-t) x_0, t^2 I) — same moment-matching as the Gaussian
        q(z_t | z_s) (continuous.py q_step, reference
        continuous_time.py:178-190) specialized to this path.
        """
        t = _b(jnp.atleast_1d(step_t)).astype(jnp.float32)
        s = _b(jnp.atleast_1d(step_s)).astype(jnp.float32)
        a = (1.0 - t) / (1.0 - s)
        var = jnp.square(t) - jnp.square(a * s)
        return x_s * a + jnp.sqrt(jnp.maximum(var, 0.0)) * noise

    def _repaint_reverse_jumps(
        self, variables, known, mask, x, step_t, step_s, key,
        jump_length: int, model_kwargs,
    ):
        """t -> s through jump_length Euler sub-steps, blending known pixels
        onto their path marginal at each sub-time — the flow counterpart of
        the Gaussian reverse jumps (continuous.py, reference
        continuous_time.py:283-303). The ODE step is deterministic, so only
        the known-projection noise is drawn; the key-split structure (3-way
        per sub-step) matches the Gaussian version, so a given key drives
        the same known-noise sequence in both families."""
        interp = jnp.linspace(0.0, 1.0, jump_length + 1, dtype=jnp.float32)
        r_steps = step_t + interp * (step_s - step_t)  # (jump_length+1,)
        for k in range(jump_length):
            key, k_known, _ = split_key(key, 3)  # _: ODE draws no noise
            known_noise = normal(k_known, known.shape)
            known_s = self.q_step_from_x_0(known, r_steps[k + 1], known_noise)
            unknown_s = self.ode_step(
                variables, x, r_steps[k], r_steps[k + 1], mode="euler",
                model_kwargs=model_kwargs,
            )
            x = mask * known_s + (1.0 - mask) * unknown_s
        return x, key

    # sampling --------------------------------------------------------------
    def _velocity(self, variables, x, t, model_kwargs):
        cond = self.get_network_condition(
            jnp.broadcast_to(jnp.atleast_1d(t), (x.shape[0],))
        )
        return self.apply_fn(variables, x, cond, **(model_kwargs or {})).astype(
            jnp.float32
        )

    def ode_step(
        self, variables, x, t, s, mode: str = "euler", model_kwargs=None
    ) -> jnp.ndarray:
        """One ODE step from time ``t`` to ``s`` (s < t)."""
        x = x.astype(jnp.float32)
        dt = s - t  # negative: integrating noise -> data
        if mode == "euler":
            return x + dt * self._velocity(variables, x, t, model_kwargs)
        if mode == "midpoint":
            v1 = self._velocity(variables, x, t, model_kwargs)
            x_mid = x + 0.5 * dt * v1
            v2 = self._velocity(variables, x_mid, t + 0.5 * dt, model_kwargs)
            return x + dt * v2
        raise ValueError(f"invalid flow sampling mode {mode}")

    def sample(
        self,
        variables,
        key: jnp.ndarray,
        batch_size: int,
        num_steps: int,
        mode: str = "euler",
        ddim_eta: float = 0.0,  # accepted for sampler-API uniformity; unused
        return_all: bool = False,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Full reverse ODE as one ``lax.scan``; the initial-noise key math
        matches the Gaussian samplers (same key -> same x(1))."""
        import jax

        del ddim_eta
        key = as_typed_key(key)
        key, sub = split_key(key)
        x = normal(sub, (batch_size, *self.sampling_shape))
        ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)

        def body(carry, i):
            x, key = carry
            key, _ = split_key(key)  # uniform key math with the other samplers
            x = self.ode_step(
                variables, x, ts[i], ts[i + 1], mode=mode,
                model_kwargs=model_kwargs,
            )
            return (x, key), (x if return_all else None)

        (x_final, _), xs = jax.lax.scan(body, (x, key), jnp.arange(num_steps))
        if return_all:
            return jnp.concatenate([x[None], xs], axis=0)
        return x_final

    def sample_segment(
        self,
        variables,
        x: jnp.ndarray,
        key: jnp.ndarray,
        ts_seg: jnp.ndarray,
        mode: str = "euler",
        ddim_eta: float = 0.0,  # unused, signature-compatible (see sample)
        return_all: bool = False,
        model_kwargs: Optional[dict] = None,
    ) -> tuple:
        """ODE over a contiguous slice of boundary times ((K+1,)); chaining
        segments over ``linspace(1, 0, num_steps + 1)`` reproduces
        :meth:`sample` EXACTLY (same key-split sequence) — the seam the
        chunked/progress/mesh serving paths (inference.py) scan over."""
        import jax

        del ddim_eta

        def body(carry, i):
            x, key = carry
            key, _ = split_key(key)
            x = self.ode_step(
                variables, x, ts_seg[i], ts_seg[i + 1], mode=mode,
                model_kwargs=model_kwargs,
            )
            return (x, key), (x if return_all else None)

        (x, key), xs = jax.lax.scan(
            body, (x, key), jnp.arange(ts_seg.shape[0] - 1)
        )
        if return_all:
            return x, key, xs
        return x, key
