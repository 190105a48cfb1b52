"""Reflow (2-rectification) of a trained rectified-flow checkpoint.

Rectified flow's few-step power comes from STRAIGHT transport paths; after
the first training round the learned coupling is still curved. Reflow
(arXiv 2209.03003 §3; used by the reference authors' follow-up R2Flow,
arXiv 2412.02241, for 1-2 step LiDAR generation) re-trains the SAME
velocity objective on the model's own (noise, sample) pairs — a
deterministic coupling whose paths the next model can make near-straight,
enabling 1-2 step Euler sampling.

Pipeline (one command):
  1. draw eps ~ N(0, I), integrate the teacher ODE -> x_hat (per-seed
     deterministic; chunked through DDPM.sample semantics via
     sample_segment so long chains stay watchdog-safe);
  2. fine-tune on pairs: t ~ U(0,1), x_t = (1-t) x_hat + t eps, target
     eps - x_hat (diffusion.p_loss with the PAIRED noise — the only change
     vs first-round training is the coupling);
  3. save a checkpoint (same cfg) loadable by setup_model / the CLIs.

Usage:
  python tools/reflow.py --ckpt flow.msgpack --out reflowed.msgpack \
      --num_pairs 4096 --teacher_steps 64 --train_steps 2000
"""

import argparse
import sys
from functools import partial

sys.path.insert(0, ".")

def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="trained flow checkpoint")
    p.add_argument("--out", required=True, help="output checkpoint path")
    p.add_argument("--num_pairs", type=int, default=4096)
    p.add_argument("--teacher_steps", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--train_steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_jax_cache")

    from r2dm_tpu import config as config_lib
    from r2dm_tpu.checkpoint import load_checkpoint, save_checkpoint
    from r2dm_tpu.diffusion.base import normal, split_key
    from r2dm_tpu.diffusion.flow import RectifiedFlow
    from r2dm_tpu.inference import setup_model

    ddpm, _, cfg = setup_model(args.ckpt)
    flow = ddpm.diffusion
    if not isinstance(flow, RectifiedFlow):
        raise SystemExit("reflow requires a flow checkpoint "
                         "(--diffusion.timestep_type flow)")
    variables = ddpm.variables

    # ---- 1. teacher pairs (eps, x_hat), per-seed deterministic ------------
    ts = jnp.linspace(1.0, 0.0, args.teacher_steps + 1, dtype=jnp.float32)

    @jax.jit
    def gen_pair(key):
        key, sub = split_key(key)
        eps = normal(sub, (args.batch_size, *flow.sampling_shape))
        x, _ = flow.sample_segment(variables, eps, key, ts)
        return eps.astype(jnp.bfloat16), x.astype(jnp.bfloat16)

    # Pairs stay DEVICE-resident end to end: pulling them to host and
    # re-uploading a minibatch every step would push ~16 MB/step through
    # the (slow) axon tunnel at config-H — at 1000 steps that transfer,
    # not the MXU, would dominate the reflow. They are stored bf16: the
    # fine-tune consumes them through a bf16 net anyway, and fp32 storage
    # (1024 config-H pairs = 1 GB + a concat-time copy) tipped the b32
    # backward over this chip's 15.75 GB HBM (measured OOM, round 4).
    eps_parts, x_parts = [], []
    base = jax.random.key(args.seed)
    for i in range(0, args.num_pairs, args.batch_size):
        eps, x = gen_pair(jax.random.fold_in(base, i))
        eps_parts.append(eps)
        x_parts.append(x)
        print(f"pairs [{min(i + args.batch_size, args.num_pairs)}"
              f"/{args.num_pairs}]", flush=True)
    eps_all = jnp.concatenate(eps_parts)[: args.num_pairs]
    x_all = jnp.concatenate(x_parts)[: args.num_pairs]
    del eps_parts, x_parts

    # ---- 2. fine-tune the velocity on the deterministic coupling ---------
    tx = optax.adamw(args.lr, b1=0.9, b2=0.99, weight_decay=0.0)
    params = variables["params"]
    opt_state = tx.init(params)
    buffers = variables.get("buffers", {})

    # params/opt_state are donated so the update happens in place — without
    # donation the step double-buffers ~0.5 GB of fp32 state next to the
    # b32 backward, which is exactly the margin the chip doesn't have.
    @partial(jax.jit, donate_argnums=(0, 1))
    def reflow_step(params, opt_state, x_data, eps_data, key):
        # minibatch selection happens ON DEVICE (gather), so the per-step
        # host->device traffic is one key
        key, idx_key = split_key(key)
        t_key, _ = split_key(key)
        idx = jax.random.randint(
            idx_key, (args.batch_size,), 0, x_data.shape[0]
        )
        x_pair = jnp.take(x_data, idx, axis=0).astype(jnp.float32)
        eps_pair = jnp.take(eps_data, idx, axis=0).astype(jnp.float32)
        t = jax.random.uniform(t_key, (args.batch_size,), jnp.float32)

        def loss_fn(p):
            v = {"params": p}
            if buffers:
                v["buffers"] = buffers
            # p_loss with the PAIRED noise == the reflow objective
            return flow.p_loss(v, x_pair, t, noise=eps_pair)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for step in range(args.train_steps):
        params, opt_state, loss = reflow_step(
            params, opt_state, x_all, eps_all,
            jax.random.fold_in(jax.random.key(args.seed + 1), step),
        )
        if step % 50 == 0 or step == args.train_steps - 1:
            # .2e, not .4f: a converged teacher's reflow loss sits below
            # 5e-5 (the paired-noise objective starts near its optimum),
            # which a fixed-point format rounds to an alarming-looking 0.0000
            print(f"reflow step {step}: loss {float(loss):.2e}", flush=True)

    # ---- 3. save (reference ckpt layout; EMA lane = the reflowed weights)
    weights = {"params": params, **({"buffers": buffers} if buffers else {})}
    save_checkpoint(
        args.out, config_lib.asdict(cfg), weights, ema_weights=weights,
        step=args.train_steps,
    )
    print(f"wrote {args.out} — sample with --mode euler and 1-4 steps")


if __name__ == "__main__":
    main()
