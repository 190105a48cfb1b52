"""Hub-surface tests: hubconf imports, mesh-parallel sampling, setup_rng."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_hubconf_imports():
    import sys

    sys.path.insert(0, "/root/repo")
    import hubconf

    assert callable(hubconf.pretrained_r2dm)
    assert callable(hubconf.rangenet53)
    assert callable(hubconf.knn(num_classes=20))
    crf = hubconf.crf_rnn(num_classes=4)
    out = crf(
        jnp.zeros((1, 8, 16, 4)), jnp.zeros((1, 8, 16, 3)), jnp.ones((1, 8, 16))
    )
    assert out.shape == (1, 8, 16, 4)


def test_pretrained_r2dm_missing_ckpt_message():
    from r2dm_tpu import pretrained_r2dm

    with pytest.raises(FileNotFoundError, match="r2dm-h-kitti360-300k"):
        pretrained_r2dm()


def test_resolve_pretrained_ckpt_file_url(tmp_path, monkeypatch):
    """By-name weight resolution (reference hubconf.py:17-18,34-35): fetch
    <base>/<config>.pth into the cache atomically, then hit the cache."""
    from r2dm_tpu.inference import resolve_pretrained_ckpt

    release = tmp_path / "release"
    release.mkdir()
    (release / "r2dm-test.pth").write_bytes(b"fake-weights")
    monkeypatch.setenv("R2DM_WEIGHTS_URL_BASE", release.as_uri())
    monkeypatch.setenv("R2DM_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.delenv("R2DM_CKPT_DIR", raising=False)

    path = resolve_pretrained_ckpt("r2dm-test", progress=False)
    assert open(path, "rb").read() == b"fake-weights"
    assert str(tmp_path / "cache") in path

    # cache hit: resolving again must not re-download (source removed)
    (release / "r2dm-test.pth").unlink()
    assert resolve_pretrained_ckpt("r2dm-test", progress=False) == path

    # $R2DM_CKPT_DIR wins over the cache
    local = tmp_path / "local"
    local.mkdir()
    (local / "r2dm-test.pth").write_bytes(b"local-weights")
    monkeypatch.setenv("R2DM_CKPT_DIR", str(local))
    assert open(resolve_pretrained_ckpt("r2dm-test"), "rb").read() == b"local-weights"


def test_resolve_pretrained_ckpt_no_egress_error(tmp_path, monkeypatch):
    """A failed fetch degrades to an actionable error naming both remedies."""
    from r2dm_tpu.inference import resolve_pretrained_ckpt

    monkeypatch.setenv(
        "R2DM_WEIGHTS_URL_BASE", (tmp_path / "missing").as_uri()
    )
    monkeypatch.setenv("R2DM_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.delenv("R2DM_CKPT_DIR", raising=False)
    with pytest.raises(FileNotFoundError, match="R2DM_CKPT_DIR"):
        resolve_pretrained_ckpt("r2dm-test", progress=False)
    assert not (tmp_path / "cache" / "checkpoints" / "r2dm-test.pth.tmp").exists()


def test_setup_rng_alias():
    from r2dm_tpu.inference import setup_rng

    keys = setup_rng([3, 4, 5])
    assert keys.shape == (3,)


def test_mesh_parallel_sampling():
    """DDPM.sample(mesh=...) must shard the output batch over the data axis
    and agree with the unsharded sampler."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from r2dm_tpu.config import Config, DataConfig, ModelConfig
    from r2dm_tpu.inference import DDPM, build_diffusion, build_model, model_coords
    from r2dm_tpu.parallel import make_mesh

    cfg = Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(
            base_channels=8,
            channel_multiplier=(1, 2, 2, 2),
            num_residual_blocks=(1, 1, 1, 1),
            gn_num_groups=4,
            attn_num_heads=2,
        ),
    )
    model = build_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 2)), jnp.zeros((1,))
    )
    variables = {**variables, "buffers": {"coords": jnp.asarray(model_coords(cfg))}}
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    mesh = make_mesh((8,))
    x_sharded = ddpm.sample(
        batch_size=8, num_steps=2, seeds=list(range(8)), mesh=mesh,
        data_format="NHWC",
    )
    assert x_sharded.shape == (8, 16, 64, 2)
    x_single = ddpm.sample(
        batch_size=8, num_steps=2, seeds=list(range(8)), data_format="NHWC"
    )
    np.testing.assert_allclose(
        np.asarray(x_sharded), np.asarray(x_single), atol=1e-5
    )
    # the chunked progress path must compose with mesh sharding and stay
    # bit-identical to the single-scan sampler
    x_prog = ddpm.sample(
        batch_size=8, num_steps=4, seeds=list(range(8)), mesh=mesh,
        data_format="NHWC", progress=True, progress_chunk=2,
    )
    x_plain = ddpm.sample(
        batch_size=8, num_steps=4, seeds=list(range(8)), data_format="NHWC"
    )
    np.testing.assert_allclose(
        np.asarray(x_prog), np.asarray(x_plain), atol=1e-5
    )

    # (data, width) mesh: the azimuth axis shards too (GSPMD halo permutes
    # through the ring convs / FIR margins) — the multi-chip latency lane
    mesh_dw = make_mesh((2, 4))
    x_w = ddpm.sample(
        batch_size=8, num_steps=2, seeds=list(range(8)), mesh=mesh_dw,
        data_format="NHWC",
    )
    np.testing.assert_allclose(np.asarray(x_w), np.asarray(x_single), atol=1e-5)
    x_w_prog = ddpm.sample(
        batch_size=8, num_steps=4, seeds=list(range(8)), mesh=mesh_dw,
        data_format="NHWC", progress=True, progress_chunk=2,
    )
    np.testing.assert_allclose(
        np.asarray(x_w_prog), np.asarray(x_plain), atol=1e-5
    )


def test_mesh_parallel_sampling_dpmpp_chunked():
    """The dpmpp_2m chunked path under a mesh: the extended segment carry
    (x, prev_x0, prev_lam, key) must shard correctly and match both the
    unsharded and the monolithic results."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from r2dm_tpu.config import Config, DataConfig, ModelConfig
    from r2dm_tpu.inference import DDPM, build_diffusion, build_model, model_coords
    from r2dm_tpu.parallel import make_mesh

    cfg = Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(
            base_channels=8,
            channel_multiplier=(1, 2, 2, 2),
            num_residual_blocks=(1, 1, 1, 1),
            gn_num_groups=4,
            attn_num_heads=2,
        ),
    )
    model = build_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 2)), jnp.zeros((1,))
    )
    variables = {**variables, "buffers": {"coords": jnp.asarray(model_coords(cfg))}}
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)
    mesh = make_mesh((8,))
    kw = dict(
        batch_size=8, num_steps=5, seeds=list(range(8)), mode="dpmpp_2m",
        data_format="NHWC",
    )
    x_mesh_chunked = ddpm.sample(mesh=mesh, progress=True, progress_chunk=2, **kw)
    x_single = ddpm.sample(**kw)
    np.testing.assert_allclose(
        np.asarray(x_mesh_chunked), np.asarray(x_single), atol=1e-5
    )
    # dpmpp's extended carry under a (data, width) mesh: x/prev_x0 shard on
    # both axes, prev_lam (B,1,1,1) on data only
    x_dw = ddpm.sample(
        mesh=make_mesh((2, 4)), progress=True, progress_chunk=2, **kw
    )
    np.testing.assert_allclose(np.asarray(x_dw), np.asarray(x_single), atol=1e-5)
