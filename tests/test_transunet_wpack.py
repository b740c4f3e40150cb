"""W-packed conv-family path (models/transunet.py TU_WPACK, ops/wpack.py).

VERDICT r4 #4: the conv families' train steps ran 4.0-4.5x their forward
because every 128^3/64^3-level op runs at 16-32/128 live lanes. The packed
path is an exact reformulation (same param tree, same math up to f32
reduction order); these tests pin output parity, param-tree identity, and
GRADIENT parity for all three families, plus the packed max-pool op alone.
Reference architecture: TransUnet/models/ (see module docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu import registry
import micformer_tpu.models.transunet as tu
from micformer_tpu.ops import wpack


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_maxpool2_wpack_matches_unpacked(rng):
    import flax.linen as nn

    x = jnp.asarray(rng.normal(size=(2, 8, 6, 16, 3)).astype(np.float32))
    want = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
    for S in (2, 4, 8):
        got = wpack.unpack(wpack.maxpool2_wpack(wpack.pack(x, S), S), S // 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   err_msg=f"S={S}")


FAMILIES = ["unet_conv", "halfunet", "transunet"]


@pytest.mark.parametrize("name", FAMILIES)
def test_wpack_forward_and_grad_parity(name, rng):
    """Packed forward == unpacked forward on the same params (identical
    trees), and the loss gradient matches leaf-by-leaf."""
    model = registry.build(name, num_classes=3)
    x = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 32)).astype(np.float32))
    prev = tu.TU_WPACK
    try:
        tu.TU_WPACK = False
        variables = jax.jit(model.init)(jax.random.key(0), x)
        want = jax.jit(model.apply)(variables, x)
        tu.TU_WPACK = True
        v2 = jax.jit(model.init)(jax.random.key(0), x)
        assert (jax.tree_util.tree_structure(v2)
                == jax.tree_util.tree_structure(variables))
        got = jax.jit(model.apply)(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)

        def loss(params, packed):
            tu.TU_WPACK = packed
            return jnp.mean(model.apply({"params": params}, x) ** 2)

        g_packed = jax.grad(lambda p: loss(p, True))(variables["params"])
        g_plain = jax.grad(lambda p: loss(p, False))(variables["params"])
        flat_p = jax.tree_util.tree_leaves_with_path(g_packed)
        flat_u = jax.tree.leaves(g_plain)
        assert len(flat_p) == len(flat_u)
        for (path, a), b in zip(flat_p, flat_u):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
                err_msg=jax.tree_util.keystr(path))
    finally:
        tu.TU_WPACK = prev


def test_wpack_ineligible_shapes_fall_back(rng):
    """Shapes the packer can't tile (odd W) must route to the plain path —
    same fallback the U-shape itself needs for pooling, so exercise it on a
    single-level channel list where the plain path accepts odd extents."""
    model = registry.build("unet_conv", num_classes=3,
                           num_channels_list=(16,))
    x = jnp.asarray(rng.normal(size=(1, 2, 7, 9, 7)).astype(np.float32))
    prev = tu.TU_WPACK
    try:
        tu.TU_WPACK = True
        variables = jax.jit(model.init)(jax.random.key(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 3, 7, 9, 7)
    finally:
        tu.TU_WPACK = prev
