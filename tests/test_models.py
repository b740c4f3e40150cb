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
