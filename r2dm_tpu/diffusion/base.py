"""Shared Gaussian-diffusion machinery (functional JAX core).

Re-design of the reference base class (models/diffusion/base.py:9-163) as a
plain Python config object over pure functions:

  - the denoiser is held as a flax Module; every method takes the variable
    tree explicitly, so ``p_loss`` differentiates cleanly and ``sample``
    compiles to a single XLA computation (`lax.scan`) with zero host
    round-trips — unlike the reference's per-step Python loop
    (continuous_time.py:252-255);
  - randomness is explicit `jax.random` keys. The reference's per-sample
    ``torch.Generator`` lists (base.py:71-94) map to a *batch of keys*
    (shape (B,) typed keys): sample i depends only on key i, preserving the
    per-sample-determinism API without the torch bitstream;
  - all schedule/q/p-step math runs in fp32 regardless of the network compute
    dtype, matching the reference's ``@autocast(enabled=False)`` pins
    (base.py:111).

Layout: NHWC (B, H, W, C) throughout the diffusion core.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------- rng utils
def as_typed_key(key: jnp.ndarray) -> jnp.ndarray:
    """Accept typed keys (scalar or batch) or raw uint32 key data."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key
    return jax.random.wrap_key_data(jnp.asarray(key, dtype=jnp.uint32))


def key_batch_from_seeds(seeds: Sequence[int]) -> jnp.ndarray:
    """Per-sample seed list -> (B,) batch of independent keys.

    The analogue of the reference's list-of-generators API
    (sample_and_save.py:75, utils/inference.py:113-114).
    """
    return jax.vmap(jax.random.key)(jnp.asarray(seeds, dtype=jnp.uint32))


def is_key_batch(key: jnp.ndarray) -> bool:
    return key.ndim == 1  # typed keys: scalar = single, (B,) = per-sample


def split_key(key: jnp.ndarray, num: int = 2) -> tuple[jnp.ndarray, ...]:
    """Split a single key or, elementwise, a batch of per-sample keys."""
    if is_key_batch(key):
        parts = jax.vmap(lambda k: jax.random.split(k, num))(key)  # (B, num)
        return tuple(parts[:, i] for i in range(num))
    parts = jax.random.split(key, num)
    return tuple(parts[i] for i in range(num))


def normal(key: jnp.ndarray, shape: tuple[int, ...]) -> jnp.ndarray:
    """Standard normal of ``shape``; with a key batch, row i is drawn from
    key i alone (per-sample determinism, reference base.py:80-87)."""
    if is_key_batch(key):
        assert key.shape[0] == shape[0], (key.shape, shape)
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], jnp.float32))(key)
    return jax.random.normal(key, shape, jnp.float32)


# ----------------------------------------------------------------- loss fns
def elementwise_loss(kind: str, prediction: jnp.ndarray, target: jnp.ndarray):
    """l2 / l1 / huber(beta=1), reduction='none' (reference base.py:39-48)."""
    diff = prediction - target
    if kind == "l2":
        return jnp.square(diff)
    if kind == "l1":
        return jnp.abs(diff)
    if kind == "huber":  # torch SmoothL1Loss, beta=1.0
        a = jnp.abs(diff)
        return jnp.where(a < 1.0, 0.5 * jnp.square(diff), a - 0.5)
    raise ValueError(f"invalid criterion: {kind}")


def masked_weighted_loss(
    loss: jnp.ndarray, loss_mask: Optional[jnp.ndarray], weight: jnp.ndarray
) -> jnp.ndarray:
    """Per-sample masked mean, then weight, then batch mean
    (reference base.py:129-139).

    NOTE: deliberate deviation. The reference multiplies the (B, 1) per-
    sample loss by the (B, 1, 1, 1) weight, which torch broadcasts to
    (B, 1, B, 1) — the ``.mean()`` then computes ``mean(loss) * mean(weight)``,
    decoupling the min-SNR weight from its own sample. We apply the weight
    per sample, as the min-SNR paper (arXiv 2303.09556) intends.
    """
    if loss_mask is None:
        loss_mask = jnp.ones_like(loss)
    axes = tuple(range(1, loss.ndim))
    num = jnp.sum(loss * loss_mask, axis=axes)
    den = jnp.sum(loss_mask, axis=axes) + 1e-8
    per_sample = num / den  # (B,)
    return jnp.mean(per_sample * weight.reshape(per_sample.shape))


class GaussianDiffusion:
    """Config/behavior base for the continuous/discrete processes.

    ``model`` is a flax Module exposing ``in_channels`` and ``resolution``
    (the seam contract from reference base.py:52-62); ``apply`` semantics are
    ``model.apply(variables, x_nhwc, condition) -> prediction_nhwc``.
    """

    def __init__(
        self,
        model: Any,
        prediction_type: str = "eps",
        loss_type: str = "l2",
        num_training_steps: Optional[int] = 1000,
        noise_schedule: str = "linear",
        min_snr_loss_weight: bool = True,
        min_snr_gamma: float = 5.0,
        sampling_resolution: Optional[tuple[int, int]] = None,
        clip_sample: bool = True,
        clip_sample_range: float = 1.0,
        apply_fn: Optional[Callable] = None,
    ):
        assert prediction_type in ("eps", "v", "x_0")
        self.model = model
        self.apply_fn = apply_fn if apply_fn is not None else model.apply
        self.objective = prediction_type
        self.loss_type = loss_type
        self.num_training_steps = num_training_steps
        self.noise_schedule = noise_schedule
        self.min_snr_loss_weight = min_snr_loss_weight
        self.min_snr_gamma = min_snr_gamma
        self.clip_sample = clip_sample
        self.clip_sample_range = clip_sample_range
        resolution = (
            sampling_resolution
            if sampling_resolution is not None
            else tuple(model.resolution)
        )
        self.in_channels = int(model.in_channels)
        self.resolution = tuple(resolution)
        # NHWC sampling shape (reference keeps (C, H, W), base.py:55-62)
        self.sampling_shape = (*self.resolution, self.in_channels)

    # hooks implemented by subclasses -------------------------------------
    def sample_timesteps(self, key, batch_size: int) -> jnp.ndarray:
        raise NotImplementedError

    def get_network_condition(self, steps: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def get_target(self, x_0, steps, noise) -> jnp.ndarray:
        raise NotImplementedError

    def get_loss_weight(self, steps) -> jnp.ndarray:
        raise NotImplementedError

    def q_step_from_x_0(self, x_0, steps, noise):
        raise NotImplementedError

    def q_step(self, x_s, step_t, step_s, noise):
        """q(z_t | z_s), s < t (more noise at t) — RePaint re-noising hook."""
        raise NotImplementedError

    def _repaint_reverse_jumps(
        self, variables, known, mask, x, step_t, step_s, key,
        jump_length: int, model_kwargs,
    ):
        """One RePaint reverse pass t -> s with known-region blending —
        process-specific hook (continuous.py / flow.py)."""
        raise NotImplementedError

    # RePaint drivers (arXiv 2201.09865; reference continuous_time.py:260-317)
    # — generic over the :meth:`q_step` / :meth:`_repaint_reverse_jumps`
    # hooks, so both the Gaussian processes and the rectified flow share the
    # chunked/mesh serving plumbing (inference.py) unchanged. ---------------
    def _repaint_forward_jumps(self, x, step_t, step_s, key, jump_length: int):
        """s -> t re-noising (reference continuous_time.py:309-315)."""
        interp = jnp.linspace(0.0, 1.0, jump_length + 1, dtype=jnp.float32)
        r_steps = step_t + interp * (step_s - step_t)
        for k in range(jump_length, 0, -1):
            key, sub = split_key(key)
            noise = normal(sub, x.shape)
            x = self.q_step(x, r_steps[k - 1], r_steps[k], noise)
        return x, key

    def repaint_segment(
        self,
        variables,
        known: jnp.ndarray,
        mask: jnp.ndarray,
        x_t: jnp.ndarray,
        key: jnp.ndarray,
        ts_pairs: jnp.ndarray,
        num_resample_steps: int = 1,
        jump_length: int = 1,
        model_kwargs: Optional[dict] = None,
    ) -> tuple:
        """Advance the RePaint outer loop over ``ts_pairs`` ((K, 2) rows of
        (t, s) boundary times); returns the advanced ``(x_t, key)`` carry.

        Chaining segments over ``stack([ts[:-2], ts[1:-1]], 1)`` followed by
        one :meth:`_repaint_reverse_jumps` final step reproduces
        :meth:`repaint` EXACTLY (identical key-split sequence) — the
        chunked-dispatch counterpart of ``sample_segment``, needed because a
        T x r x j grid compiles to one multi-minute dispatch at
        completion-scale batches (reference loop: continuous_time.py:260-317).
        """
        known = known.astype(jnp.float32)
        mask = mask.astype(jnp.float32)

        def resample_body(j, carry):
            x_t, key, step_t, step_s = carry
            x_s, key = self._repaint_reverse_jumps(
                variables, known, mask, x_t, step_t, step_s, key,
                jump_length, model_kwargs,
            )
            # re-noise unless this is the final resample of this step
            is_last_resample = j == num_resample_steps - 1

            def renoise(args):
                x, key = args
                return self._repaint_forward_jumps(
                    x, step_t, step_s, key, jump_length
                )

            x_t, key = jax.lax.cond(
                is_last_resample, lambda args: args, renoise, (x_s, key)
            )
            return (x_t, key, step_t, step_s)

        def step_body(carry, ts_pair):
            x_t, key = carry
            x_t, key, _, _ = jax.lax.fori_loop(
                0,
                num_resample_steps,
                resample_body,
                (x_t, key, ts_pair[0], ts_pair[1]),
            )
            return (x_t, key), None

        (x_t, key), _ = jax.lax.scan(step_body, (x_t, key), ts_pairs)
        return x_t, key

    def repaint_final(
        self,
        variables,
        known: jnp.ndarray,
        mask: jnp.ndarray,
        x_t: jnp.ndarray,
        key: jnp.ndarray,
        step_t: jnp.ndarray,
        step_s: jnp.ndarray,
        jump_length: int = 1,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """The last RePaint step: one reverse pass, no re-noising (the
        reference's early break, continuous_time.py:305-307)."""
        x_s, _ = self._repaint_reverse_jumps(
            variables, known.astype(jnp.float32), mask.astype(jnp.float32),
            x_t, step_t, step_s, key, jump_length, model_kwargs,
        )
        return x_s

    def repaint(
        self,
        variables,
        known: jnp.ndarray,
        mask: jnp.ndarray,
        key: jnp.ndarray,
        num_steps: int,
        num_resample_steps: int = 1,
        jump_length: int = 1,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """RePaint completion (arXiv 2201.09865), reference
        continuous_time.py:260-317.

        ``known``/``mask`` are NHWC; known pixels (mask=1) are projected onto
        each intermediate noise level, unknown pixels follow the reverse
        process; between resamples the state is re-noised forward. Scans over
        the (num_steps-1) x num_resample_steps grid with the (static, small)
        jump loops unrolled; the final step runs one resample only, matching
        the reference's early-break (continuous_time.py:305-307).
        """
        assert num_resample_steps > 0 and jump_length > 0
        key = as_typed_key(key)
        batch_size = known.shape[0]
        known = known.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        key, sub = split_key(key)
        x_t = normal(sub, (batch_size, *self.sampling_shape))
        ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)

        if num_steps > 1:
            ts_pairs = jnp.stack([ts[:-2], ts[1:-1]], axis=1)
            x_t, key = self.repaint_segment(
                variables, known, mask, x_t, key, ts_pairs,
                num_resample_steps=num_resample_steps,
                jump_length=jump_length, model_kwargs=model_kwargs,
            )
        return self.repaint_final(
            variables, known, mask, x_t, key, ts[num_steps - 1], ts[num_steps],
            jump_length=jump_length, model_kwargs=model_kwargs,
        )

    # shared --------------------------------------------------------------
    def _clip(self, x_0: jnp.ndarray) -> jnp.ndarray:
        if self.clip_sample:
            return jnp.clip(x_0, -self.clip_sample_range, self.clip_sample_range)
        return x_0

    def p_loss(
        self,
        variables,
        x_0: jnp.ndarray,
        steps: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
        key: Optional[jnp.ndarray] = None,
        loss_mask: Optional[jnp.ndarray] = None,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Masked, min-SNR-weighted denoising loss (reference base.py:122-139).

        Pure in ``variables`` — differentiable with jax.grad.
        """
        x_0 = x_0.astype(jnp.float32)
        if noise is None:
            assert key is not None, "p_loss needs `noise` or `key`"
            noise = normal(key, x_0.shape)
        x_t = self.q_step_from_x_0(x_0, steps, noise)
        condition = self.get_network_condition(steps)
        prediction = self.apply_fn(
            variables, x_t, condition, **(model_kwargs or {})
        ).astype(jnp.float32)
        target = self.get_target(x_0, steps, noise)
        loss = elementwise_loss(self.loss_type, prediction, target)
        return masked_weighted_loss(loss, loss_mask, self.get_loss_weight(steps))

    def loss(
        self,
        variables,
        x_0: jnp.ndarray,
        key: jnp.ndarray,
        loss_mask: Optional[jnp.ndarray] = None,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Timestep-sampling + p_loss (reference forward, base.py:141-149)."""
        key = as_typed_key(key)
        t_key, n_key = split_key(key)
        steps = self.sample_timesteps(t_key, x_0.shape[0])
        return self.p_loss(
            variables, x_0, steps, key=n_key, loss_mask=loss_mask,
            model_kwargs=model_kwargs,
        )
