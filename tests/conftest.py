"""Test configuration: force an 8-device CPU mesh (the TPU-world stand-in for
a fake distributed backend, per SURVEY.md §4) and keep everything on host.

Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to "axon,cpu"; force tests onto
# the 8-device host CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on this 1-CPU
# box (cold ~14 min, warm ~4 min). A SIGABRT scare was investigated and
# attributed NOT to the cache but to a negative-padding dilated-conv
# gradient crashing XLA:CPU under GSPMD (fixed in ops/fused_resample.py);
# the cache ran many green suites before and after. The CPU AOT loader
# logs machine-feature-mismatch warnings on load — cosmetic on this box.
jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
