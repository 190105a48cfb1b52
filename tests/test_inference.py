"""setup_model / DDPM wrapper / checkpoint round-trip tests."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu import Config, setup_model
from r2dm_tpu.checkpoint import load_checkpoint, save_checkpoint
from r2dm_tpu.config import DataConfig, ModelConfig, asdict
from r2dm_tpu.inference import DDPM, build_diffusion, build_model, model_coords

GOLDEN = Path(__file__).parent / "golden"


def tiny_cfg() -> Config:
    return Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(
            base_channels=16,
            gn_num_groups=4,
            attn_num_heads=4,
            num_residual_blocks=(1, 1, 1, 1),
        ),
    )


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_cfg()
    model = build_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 2)), jnp.zeros((1,))
    )
    variables = {
        **variables,
        "buffers": {"coords": jnp.asarray(model_coords(cfg))},
    }
    return cfg, model, variables


def test_reference_style_checkpoint_loads(tiny_setup):
    """A dict in the reference torch-checkpoint layout {cfg, weights(flat
    state_dict)} must load through setup_model (utils/inference.py:16-114)."""
    g = np.load(GOLDEN / "tiny_unet_fourier_features.npz")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    ckpt = {"cfg": asdict(tiny_cfg()), "weights": sd, "global_step": 123}
    ddpm, lidar_utils, cfg = setup_model(ckpt, ema=False)
    assert ddpm.sampling_shape == (16, 64, 2)
    assert lidar_utils.depth_format == cfg.data.depth_format
    # parity with the captured forward through the wrapper's variables
    x = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1)))
    t = jnp.asarray(g["t"])
    y = ddpm.diffusion.apply_fn(ddpm.variables, x, t)
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(g["y"], (0, 2, 3, 1)), rtol=1e-4, atol=2e-5
    )


def test_ddpm_sample_nchw_surface(tiny_setup):
    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    x = ddpm.sample(batch_size=2, num_steps=2)
    assert x.shape == (2, 2, 16, 64)  # NCHW like the reference README.md:27
    x2 = ddpm.sample(batch_size=2, num_steps=2, seeds=[5, 6], data_format="NHWC")
    assert x2.shape == (2, 16, 64, 2)
    # jit cache reuse: same signature must not recompile (same object out)
    assert ("sample", 2, 2, "ddpm", 0.0, False, None) in ddpm._jit_cache


def test_progress_sampling_bit_identical(tiny_setup):
    """The chunked progress path must reproduce the single-scan sampler
    exactly (same key-split sequence; VERDICT r1 item 8)."""
    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    a = ddpm.sample(batch_size=2, num_steps=7, seeds=[3, 4])
    b = ddpm.sample(
        batch_size=2, num_steps=7, seeds=[3, 4], progress=True, progress_chunk=3
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_progress_sampling_bit_identical_discrete(tiny_setup):
    """Same chunked-vs-single equality for the discrete-time process."""
    import dataclasses

    cfg, model, variables = tiny_setup
    dcfg = dataclasses.replace(
        cfg, diffusion=dataclasses.replace(
            cfg.diffusion, timestep_type="discrete", num_training_steps=16
        )
    )
    ddpm = DDPM(build_diffusion(dcfg, model), variables, dcfg)
    a = ddpm.sample(batch_size=2, num_steps=7, seeds=[3, 4])
    b = ddpm.sample(
        batch_size=2, num_steps=7, seeds=[3, 4], progress=True, progress_chunk=3
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_progress_return_all_bit_identical(tiny_setup):
    """Chunked return_all must stack exactly like the single scan, and a
    non-positive chunk must be rejected rather than spinning forever."""
    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    a = ddpm.sample(batch_size=2, num_steps=5, seeds=[3, 4], return_all=True)
    ddpm2 = DDPM(build_diffusion(cfg, model), variables, cfg)
    ddpm2.AUTO_CHUNK_WORK = 1  # force the chunked route incl. return_all
    b = ddpm2.sample(
        batch_size=2, num_steps=5, seeds=[3, 4], return_all=True,
        progress_chunk=2,
    )
    assert b.shape == a.shape == (6, 2, 2, 16, 64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="progress_chunk"):
        ddpm2.sample(batch_size=1, num_steps=2, progress=True, progress_chunk=0)


def test_auto_chunking_kicks_in_for_large_chains(tiny_setup):
    """Above AUTO_CHUNK_WORK pixel-steps, sample() must silently run the
    (bit-identical) segment path — long single dispatches can trip device
    watchdogs (see DDPM.sample docstring)."""
    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    a = ddpm.sample(batch_size=2, num_steps=6, seeds=[1, 2])
    ddpm2 = DDPM(build_diffusion(cfg, model), variables, cfg)
    ddpm2.AUTO_CHUNK_WORK = 1  # force the auto-chunk route
    b = ddpm2.sample(batch_size=2, num_steps=6, seeds=[1, 2])
    assert any(sig[0] == "segment" for sig in ddpm2._jit_cache)
    assert not any(sig[0] == "segment" for sig in ddpm._jit_cache)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_auto_chunking_row_exact(tiny_setup):
    """Above MAX_BATCH_PIXELS per-device pixels, sample() must run the
    batch as sequential chunks (the measured HBM bound: a config-H call
    fits 384 images/chip, OOMs at 512). With per-sample seeds the chunked
    result is row-exact (row i is drawn from key i alone)."""
    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    seeds = [11, 12, 13, 14, 15]
    a = ddpm.sample(batch_size=5, num_steps=3, seeds=seeds)
    ddpm2 = DDPM(build_diffusion(cfg, model), variables, cfg)
    ddpm2.MAX_BATCH_PIXELS = 2 * 16 * 64  # force the batch-chunk route
    ddpm2.BATCH_CHUNK_PIXELS = 2 * 16 * 64  # chunks of 2 images
    b = ddpm2.sample(batch_size=5, num_steps=3, seeds=seeds)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # explicit batch_chunk with return_all: batch is axis 1 there
    c = ddpm.sample(batch_size=5, num_steps=3, seeds=seeds, return_all=True)
    d = ddpm.sample(
        batch_size=5, num_steps=3, seeds=seeds, return_all=True, batch_chunk=3
    )
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))
    # single key: per-chunk keys are derived; the call stays deterministic
    e = ddpm2.sample(batch_size=5, num_steps=3, key=jax.random.key(0))
    assert e.shape == (5, 2, 16, 64) and np.isfinite(np.asarray(e)).all()
    f = ddpm2.sample(batch_size=5, num_steps=3, key=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(f))


def test_batch_chunking_mesh_parity(tiny_setup):
    """Batch chunking composes with mesh serving: chunk sizes stay
    multiples of the data axis and rows match the unchunked mesh run."""
    from r2dm_tpu.parallel import make_mesh

    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    mesh = make_mesh((2,))
    seeds = list(range(20, 28))
    kw = dict(batch_size=8, num_steps=3, seeds=seeds, data_format="NHWC")
    a = ddpm.sample(mesh=mesh, **kw)
    ddpm2 = DDPM(build_diffusion(cfg, model), variables, cfg)
    ddpm2.MAX_BATCH_PIXELS = 16 * 64  # per-device bound -> chunking
    ddpm2.BATCH_CHUNK_PIXELS = 2 * 16 * 64  # 2/device -> 4-image chunks
    b = ddpm2.sample(mesh=mesh, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_repaint_chunked_bit_identical(tiny_setup):
    """Chunked repaint (segment dispatches) must reproduce the monolithic
    T x r x j grid exactly — same key-split sequence (VERDICT r2 item 5)."""
    cfg, model, variables = tiny_setup
    known = jnp.zeros((1, 2, 16, 64)).at[:, :, :8].set(0.5)
    mask = jnp.zeros((1, 2, 16, 64)).at[:, :, :8].set(1.0)
    kwargs = dict(num_steps=5, num_resample_steps=2, jump_length=2, seeds=[9])
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    a = ddpm.repaint(known, mask, **kwargs)
    assert not any(sig[0] == "repaint_seg" for sig in ddpm._jit_cache)
    ddpm2 = DDPM(build_diffusion(cfg, model), variables, cfg)
    ddpm2.AUTO_CHUNK_WORK = 1  # force the chunked route
    b = ddpm2.repaint(known, mask, **kwargs)
    assert any(sig[0] == "repaint_seg" for sig in ddpm2._jit_cache)
    assert any(sig[0] == "repaint_final" for sig in ddpm2._jit_cache)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # progress path shares the exact same segment math
    c = ddpm2.repaint(known, mask, progress=True, progress_chunk=4, **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_repaint_discrete_clear_error(tiny_setup):
    """Discrete-time checkpoints have no RePaint hooks (reference parity:
    repaint lives in continuous_time.py only) — the wrapper must fail with
    a clear ValueError, not a NotImplementedError mid-jit-trace."""
    import dataclasses

    cfg, model, variables = tiny_setup
    dcfg = dataclasses.replace(
        cfg, diffusion=dataclasses.replace(
            cfg.diffusion, timestep_type="discrete", num_training_steps=16
        )
    )
    ddpm_d = DDPM(build_diffusion(dcfg, model), variables, dcfg)
    known = jnp.zeros((1, 2, 16, 64))
    with pytest.raises(ValueError, match="continuous-time or flow"):
        ddpm_d.repaint(known, jnp.ones_like(known), num_steps=4)


def test_repaint_mask_validation(tiny_setup):
    """Malformed masks must fail up front with actionable errors, not
    broadcast-fail inside jit or get mis-sliced by the batch chunker
    (advisor finding, round 4)."""
    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    known = jnp.zeros((2, 2, 16, 64))
    with pytest.raises(ValueError, match="same rank"):
        ddpm.repaint(known, jnp.ones((2, 16, 64)), num_steps=2)
    with pytest.raises(ValueError, match="batch dim"):
        ddpm.repaint(known, jnp.ones((3, 2, 16, 64)), num_steps=2)


def test_repaint_batch_chunking_row_exact(tiny_setup):
    """Repaint batch-axis chunking (same HBM bound as sample()) must be
    row-exact with per-sample seeds, including a broadcast (batch-1) mask."""
    cfg, model, variables = tiny_setup
    known = jnp.zeros((5, 2, 16, 64)).at[:, :, :8].set(0.5)
    mask = jnp.zeros((1, 2, 16, 64)).at[:, :, :8].set(1.0)
    kwargs = dict(num_steps=4, num_resample_steps=2, seeds=[9, 10, 11, 12, 13])
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    a = ddpm.repaint(known, mask, **kwargs)
    ddpm2 = DDPM(build_diffusion(cfg, model), variables, cfg)
    ddpm2.MAX_BATCH_PIXELS = 2 * 16 * 64  # force batch chunking
    ddpm2.BATCH_CHUNK_PIXELS = 2 * 16 * 64  # chunks of 2 rows
    b = ddpm2.repaint(known, mask, **kwargs)
    assert b.shape == a.shape == (5, 2, 16, 64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # per-sample mask slices along with the rows
    mask5 = jnp.tile(mask, (5, 1, 1, 1))
    c = ddpm2.repaint(known, mask5, **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_repaint_mesh_parity(tiny_setup):
    """repaint(mesh=...) on (data,) and (data, width) meshes must agree with
    the unsharded result, for both the monolithic and chunked routes."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from r2dm_tpu.parallel import make_mesh

    cfg, model, variables = tiny_setup
    known = jnp.zeros((2, 2, 16, 64)).at[:, :, :8].set(0.5)
    mask = jnp.zeros((2, 2, 16, 64)).at[:, :, :8].set(1.0)
    kwargs = dict(num_steps=4, num_resample_steps=2, jump_length=1,
                  seeds=[5, 6])
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    a = ddpm.repaint(known, mask, **kwargs)
    for mesh in (make_mesh((2,)), make_mesh((2, 4))):
        b = ddpm.repaint(known, mask, mesh=mesh, **kwargs)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, err_msg=str(mesh.shape)
        )
        # chunked route under the same mesh
        ddpm2 = DDPM(build_diffusion(cfg, model), variables, cfg)
        ddpm2.AUTO_CHUNK_WORK = 1
        c = ddpm2.repaint(known, mask, mesh=mesh, **kwargs)
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), atol=1e-4, err_msg=str(mesh.shape)
        )


def test_jit_cache_is_bounded(tiny_setup):
    """Distinct sampler signatures must not grow the compiled-fn cache past
    JIT_CACHE_SIZE (serving processes sweep shapes; VERDICT r2 weak #6)."""
    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    ddpm.JIT_CACHE_SIZE = 3
    for steps in range(2, 8):
        ddpm.sample(batch_size=1, num_steps=steps)
    assert len(ddpm._jit_cache) == 3
    # most-recent signatures survive (LRU)
    assert ("sample", 1, 7, "ddpm", 0.0, False, None) in ddpm._jit_cache
    ddpm.clear_jit_cache()
    assert not ddpm._jit_cache


def test_native_checkpoint_roundtrip(tmp_path, tiny_setup):
    cfg, model, variables = tiny_setup
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(
        path, asdict(cfg), variables, ema_weights=variables, step=77
    )
    loaded = load_checkpoint(path)
    assert loaded["global_step"] == 77
    ddpm, lidar_utils, cfg2 = setup_model(path)
    assert cfg2.data.resolution == cfg.data.resolution
    x = ddpm.sample(batch_size=1, num_steps=2)
    assert np.isfinite(np.asarray(x)).all()
    # tree equality of weights
    flat_a = jax.tree.leaves(variables)
    flat_b = jax.tree.leaves(ddpm.variables)
    assert all(np.allclose(a, b) for a, b in zip(flat_a, flat_b))


def test_default_rng_stream_advances(tiny_setup):
    """sample() without key/seeds must give fresh batches per call (the
    reference draws from the global torch rng)."""
    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    a = ddpm.sample(batch_size=1, num_steps=2)
    b = ddpm.sample(batch_size=1, num_steps=2)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3


@pytest.mark.slow  # separate full-net compile for the alt architecture
def test_refinenet_checkpoint_routing():
    """setup_model must use the RefineNet converter for refinenet configs."""
    g = np.load(GOLDEN / "tiny_refinenet.npz")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    cfg = Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(
            architecture="refinenet", base_channels=8,
            channel_multiplier=(1, 2, 2, 2),
        ),
    )
    from r2dm_tpu.config import asdict as cfg_asdict

    ckpt = {"cfg": cfg_asdict(cfg), "weights": sd, "global_step": 1}
    ddpm, lidar_utils, cfg2 = setup_model(ckpt, ema=False)
    y = ddpm.diffusion.apply_fn(
        ddpm.variables, jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1))), None
    )
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(g["y"], (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
    )


def test_model_coords_spherical(tiny_setup):
    cfg, _, _ = tiny_setup
    coords = model_coords(cfg)
    assert coords.shape == (16, 64, 2)
    # elevation spans (+3, -25] deg
    assert np.deg2rad(-25.1) < coords[..., 0].min() < np.deg2rad(3.1)


def test_dpmpp_mode_routes_and_chunks(tiny_setup):
    """mode='dpmpp_2m' must work through the DDPM wrapper: NCHW surface,
    chunked-vs-monolithic bit-identity (the multistep carry crosses segment
    boundaries), and a clear error on discrete-time diffusion."""
    import dataclasses

    cfg, model, variables = tiny_setup
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    a = ddpm.sample(batch_size=2, num_steps=7, seeds=[3, 4], mode="dpmpp_2m")
    assert a.shape == (2, 2, 16, 64)
    assert np.isfinite(np.asarray(a)).all()
    b = ddpm.sample(
        batch_size=2, num_steps=7, seeds=[3, 4], mode="dpmpp_2m",
        progress=True, progress_chunk=3,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # deterministic: same seeds -> same samples on a fresh wrapper
    c = ddpm.sample(batch_size=2, num_steps=7, seeds=[3, 4], mode="dpmpp_2m")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    dcfg = dataclasses.replace(
        cfg, diffusion=dataclasses.replace(
            cfg.diffusion, timestep_type="discrete", num_training_steps=16
        )
    )
    ddpm_d = DDPM(build_diffusion(dcfg, model), variables, dcfg)
    with pytest.raises(ValueError, match="dpmpp_2m"):
        ddpm_d.sample(batch_size=1, num_steps=4, mode="dpmpp_2m")
