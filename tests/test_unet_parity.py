"""End-to-end activation parity of EfficientUNet vs the reference network.

Golden fixtures hold a randomly-initialized reference net's state_dict plus
input/output pairs (tools/gen_goldens.py). Importing those weights through
utils/torch_import.py and running our NHWC flax model must reproduce the
reference output within fp32 tolerance — this exercises every op end to end
(ring convs, FIR resample, AdaGN, attention, encodings, skip topology).
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.models.efficient_unet import EfficientUNet
from r2dm_tpu.utils.torch_import import variables_from_reference

GOLDEN = Path(__file__).parent / "golden"

TINY = dict(
    in_channels=2,
    resolution=(16, 64),
    base_channels=16,
    channel_multiplier=(1, 2, 4, 8),
    num_residual_blocks=(1, 1, 1, 1),
    gn_num_groups=4,
    attn_num_heads=4,
    ring=True,
)


def load_case(name):
    g = np.load(GOLDEN / f"{name}.npz")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    return g, sd


@pytest.mark.parametrize(
    "cenc", ["fourier_features", "spherical_harmonics", "polar_coordinates"]
)
def test_unet_forward_parity(cenc):
    g, sd = load_case(f"tiny_unet_{cenc}")
    variables = variables_from_reference(sd)
    net = EfficientUNet(coords_encoding=cenc, **TINY)
    x = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1)))
    t = jnp.asarray(g["t"])
    y = net.apply(variables, x, t)
    expected = np.transpose(g["y"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=2e-5)


@pytest.mark.slow  # compile-heavy (grad of full remat net, 1-CPU box)
def test_remat_preserves_outputs_and_grads():
    """remat=True must be numerically identical (it only changes backward
    memory scheduling) and differentiable."""
    import jax

    g, sd = load_case("tiny_unet_fourier_features")
    variables = variables_from_reference(sd)
    x = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1)))
    t = jnp.asarray(g["t"])
    base = EfficientUNet(coords_encoding="fourier_features", **TINY)
    remat = EfficientUNet(coords_encoding="fourier_features", remat=True, **TINY)
    y0 = base.apply(variables, x, t)
    y1 = remat.apply(variables, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    def loss(params):
        return jnp.sum(
            remat.apply({**variables, "params": params}, x, t) ** 2
        )

    grads = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(g).all() for g in jax.tree.leaves(grads))


def test_channels_major_l1_parity():
    """channels_major_l1=True must be numerically identical (pure layout
    change) using the same weight tree."""
    g, sd = load_case("tiny_unet_fourier_features")
    variables = variables_from_reference(sd)
    x = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1)))
    t = jnp.asarray(g["t"])
    net = EfficientUNet(
        coords_encoding="fourier_features", channels_major_l1=True, **TINY
    )
    y = net.apply(variables, x, t)
    expected = np.transpose(g["y"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=5e-5)


@pytest.mark.slow  # compile-heavy (two remat traces)
def test_remat_composes_with_dropout():
    """remat + dropout>0 must not trace the deterministic flag
    (static_argnums) in either train or eval mode."""
    import jax

    net = EfficientUNet(
        coords_encoding=None, remat=True, dropout=0.2, **TINY
    )
    x = jnp.zeros((1, 16, 64, 2))
    t = jnp.zeros((1,))
    variables = net.init(jax.random.key(0), x, t)
    y_eval = net.apply(variables, x, t)  # deterministic default
    assert np.isfinite(np.asarray(y_eval)).all()
    y_train = net.apply(
        variables, x, t, False, rngs={"dropout": jax.random.key(1)}
    )
    assert np.isfinite(np.asarray(y_train)).all()


def test_unet_param_tree_matches_init():
    """Imported param tree must be structurally identical to a fresh init."""
    import jax

    g, sd = load_case("tiny_unet_fourier_features")
    imported = variables_from_reference(sd)
    net = EfficientUNet(coords_encoding="fourier_features", **TINY)
    fresh = net.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 2)), jnp.zeros((1,))
    )

    fresh_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(fresh)
    }
    imp_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(imported)
    }
    assert fresh_paths == imp_paths
