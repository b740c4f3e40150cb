"""Model zoo shape/numerics tests on tiny volumes (CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu import registry


def _forward(name, shape=(1, 2, 32, 32, 32), **kw):
    model = registry.build(name, **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    return model, variables, out


@pytest.mark.slow  # re-tier r4: >30s on the fast tier
def test_unet3d_shapes():
    _, _, out = _forward("unet3d")
    assert out.shape == (1, 8, 32, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_mednext_shapes():
    _, _, out = _forward("mednext", shape=(1, 2, 16, 16, 16))
    assert out.shape == (1, 8, 16, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_mednext_deep_supervision_pyramid():
    _, _, out = _forward("mednext", shape=(1, 2, 16, 16, 16), deep_supervision=True)
    assert isinstance(out, list) and len(out) == 5
    assert out[0].shape == (1, 8, 16, 16, 16)
    # nnU-Net ordering: highest resolution first (MedNextV1.py:306-335)
    assert out[1].shape[2:] == (8, 8, 8)
    assert out[-1].shape[2:] == (1, 1, 1)


def test_registry_lists_models():
    avail = registry.available()
    assert "unet3d" in avail and "mednext" in avail


def test_unet3d_jit_grad():
    from micformer_tpu.losses.dice import mdice_loss

    model = registry.build("unet3d")
    x = jnp.ones((1, 2, 16, 16, 16))
    y = jnp.zeros((1, 8, 16, 16, 16)).at[:, 0].set(1.0)
    variables = model.init(jax.random.key(0), x)

    @jax.jit
    def loss_fn(params):
        out = model.apply({"params": params}, x)
        return mdice_loss(out, y)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.slow
def test_micformer_fused_head_matches_two_op_path(rng):
    """The composed transposed-conv head must equal ConvTranspose+Conv3^3
    exactly (same params — the trees are identical by construction)."""
    import jax
    import jax.numpy as jnp
    from micformer_tpu.models.micformer import MicFormer

    kw = dict(num_classes=3, embed_dim=8, depths=(1, 1), num_heads=(2, 4),
              drop_path_rate=0.0)
    fused = MicFormer(fused_head=True, **kw)
    plain = MicFormer(fused_head=False, **kw)
    x = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 16)).astype(np.float32))
    variables = jax.jit(fused.init)(jax.random.key(0), x)
    a = fused.apply(variables, x)
    b = plain.apply(variables, x)
    assert a.shape == b.shape == (1, 3, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_head_convt_via_dot_matches_conv_transpose(rng):
    """The round-5 head reformulation: conv_transpose(k=6, s=4, pad (4,4))
    == k=2 VALID conv over the shifted residue blocking + depth-to-space +
    border slice (micformer._convt_s4_k6_via_dot) — exact, including
    borders, on odd extents."""
    from micformer_tpu.models.micformer import _convt_s4_k6_via_dot

    kc = jnp.asarray(rng.normal(size=(6, 6, 6, 6, 5)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 8, 7, 5, 6)).astype(np.float32))
    ref = jax.lax.conv_transpose(x, kc, strides=(4, 4, 4),
                                 padding=((4, 4),) * 3,
                                 dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = _convt_s4_k6_via_dot(x, kc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_micformer_scan_blocks_matches_unrolled(rng):
    """SCAN_BLOCKS (one lax.scan over stacked per-depth block params) must
    produce the unrolled path's param tree and deterministic outputs, and
    finite nonzero grads through the stacked-param scan. (~4 min on the CPU
    backend — grad-of-scan compile dominates; slow tier.)"""
    from micformer_tpu.models import micformer as mf

    kw = dict(num_classes=3, embed_dim=8, depths=(2, 3), num_heads=(2, 4),
              drop_path_rate=0.2)
    x = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 16)).astype(np.float32))
    prev = mf.SCAN_BLOCKS
    try:
        mf.SCAN_BLOCKS = False
        plain = mf.MicFormer(**kw)
        variables = jax.jit(plain.init)(jax.random.key(0), x)
        want = plain.apply(variables, x)
        mf.SCAN_BLOCKS = True
        scanned = mf.MicFormer(**kw)
        v2 = jax.jit(scanned.init)(jax.random.key(0), x)
        assert (jax.tree_util.tree_structure(v2)
                == jax.tree_util.tree_structure(variables))
        got = scanned.apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

        def loss(params):
            return jnp.sum(scanned.apply(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": jax.random.key(1)}) ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    finally:
        mf.SCAN_BLOCKS = prev


def test_conv3x3viadot_preproject_matches_shifted_dot(rng):
    """The PREPROJECT reformulation (one [C,27F] projection + 27 shifted
    slice-adds) must equal the 27-shifted-dot path exactly — same params."""
    from micformer_tpu.models import layers

    m = layers.Conv3x3ViaDot(16)
    x = jnp.asarray(rng.normal(size=(2, 6, 5, 7, 24)).astype(np.float32))
    v = m.init(jax.random.key(0), x)
    prev = layers.PREPROJECT
    try:
        layers.PREPROJECT = False
        a = m.apply(v, x)
        layers.PREPROJECT = True
        b = m.apply(v, x)
    finally:
        layers.PREPROJECT = prev
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
