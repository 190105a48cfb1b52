"""Attribute the bench warmup cost phase by phase (one device run).

The driver bench's warm-cache warmup moved from the historical 70-90 s band
to 150-370 s (quality/QUALITY.md, 2026-08-19). This probe times each phase
of bench.py's warmup separately so the band has an explanation on record:

  imports | model.init (compile+run) | param gen (host) | device_put |
  seg trace+lower (jit.lower) | compile-or-cache-load (.compile()) |
  first dispatch | second dispatch (steady state)

Usage: python tools/probe_warmup.py  (protocol shapes: config H, b256)
"""

import json
import os
import sys
import time

t0 = time.time()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/r2dm_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

phases = {}


def mark(name, since):
    now = time.time()
    phases[name] = round(now - since, 2)
    return now


t = mark("imports_jax", t0)

from r2dm_tpu import Config
from r2dm_tpu.diffusion.base import as_typed_key, normal, split_key
from r2dm_tpu.inference import build_diffusion, build_model, model_coords

t = mark("imports_r2dm", t)

BATCH, STEPS, CHUNK = 256, 256, 32
cfg = Config()
model = build_model(cfg, dtype=jnp.bfloat16)
variables = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, 64, 1024, 2)), jnp.zeros((1,))
)
jax.block_until_ready(variables)
t = mark("model_init", t)

rng = np.random.default_rng(0)
params = jax.tree.map(
    lambda l: np.asarray(rng.standard_normal(l.shape, dtype=np.float32) * 0.05),
    variables["params"],
)
t = mark("param_gen_host", t)
params = jax.tree.map(jnp.asarray, params)
jax.block_until_ready(params)
variables = {
    "params": params,
    "buffers": {"coords": jnp.asarray(model_coords(cfg))},
}
t = mark("device_put_params", t)

diffusion = build_diffusion(cfg, model)
from functools import partial

fn = partial(diffusion.sample_segment, mode="ddpm", ddim_eta=0.0)
jfn = jax.jit(fn)

key = as_typed_key(jax.random.key(0))
key, sub = split_key(key)
x = normal(sub, (BATCH, *diffusion.sampling_shape))
jax.block_until_ready(x)
ts = jnp.linspace(1.0, 0.0, STEPS + 1, dtype=jnp.float32)
t = mark("init_noise", t)

lowered = jfn.lower(variables, x, key, ts[: CHUNK + 1])
t = mark("trace_lower", t)
compiled = lowered.compile()  # persistent-cache load OR compile
t = mark("compile_or_cache_load", t)

out, key2 = compiled(variables, x, key, ts[: CHUNK + 1])
float(jnp.sum(out))
t = mark("first_dispatch", t)
out2, _ = compiled(variables, out, key2, ts[CHUNK : 2 * CHUNK + 1])
float(jnp.sum(out2))
t = mark("second_dispatch", t)

phases["total"] = round(time.time() - t0, 2)
print(json.dumps({"probe": "bench_warmup_phases", "batch": BATCH,
                  "chunk": CHUNK, "device": str(jax.devices()[0]),
                  "phases": phases}))
