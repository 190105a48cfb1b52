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

sys.path.insert(0, ".")

import numpy as np


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
        return eps, x

    eps_all, x_all = [], []
    base = jax.random.key(args.seed)
    for i in range(0, args.num_pairs, args.batch_size):
        eps, x = gen_pair(jax.random.fold_in(base, i))
        eps_all.append(np.asarray(eps))
        x_all.append(np.asarray(x))
        print(f"pairs [{min(i + args.batch_size, args.num_pairs)}"
              f"/{args.num_pairs}]", flush=True)
    eps_all = np.concatenate(eps_all)[: args.num_pairs]
    x_all = np.concatenate(x_all)[: args.num_pairs]

    # ---- 2. fine-tune the velocity on the deterministic coupling ---------
    tx = optax.adamw(args.lr, b1=0.9, b2=0.99, weight_decay=0.0)
    params = variables["params"]
    opt_state = tx.init(params)
    buffers = variables.get("buffers", {})

    @jax.jit
    def reflow_step(params, opt_state, x_pair, eps_pair, key):
        t_key, _ = split_key(key)
        t = jax.random.uniform(t_key, (x_pair.shape[0],), jnp.float32)

        def loss_fn(p):
            v = {"params": p}
            if buffers:
                v["buffers"] = buffers
            # p_loss with the PAIRED noise == the reflow objective
            return flow.p_loss(v, x_pair, t, noise=eps_pair)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed)
    for step in range(args.train_steps):
        idx = rng.integers(0, args.num_pairs, size=args.batch_size)
        params, opt_state, loss = reflow_step(
            params, opt_state,
            jnp.asarray(x_all[idx]), jnp.asarray(eps_all[idx]),
            jax.random.fold_in(jax.random.key(args.seed + 1), step),
        )
        if step % 50 == 0 or step == args.train_steps - 1:
            print(f"reflow step {step}: loss {float(loss):.4f}", flush=True)

    # ---- 3. save (reference ckpt layout; EMA lane = the reflowed weights)
    weights = {"params": params, **({"buffers": buffers} if buffers else {})}
    save_checkpoint(
        args.out, config_lib.asdict(cfg), weights, ema_weights=weights,
        step=args.train_steps,
    )
    print(f"wrote {args.out} — sample with --mode euler and 1-4 steps")


if __name__ == "__main__":
    main()
