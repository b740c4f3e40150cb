"""W-axis channel-packing parity tests (ops/wpack.py).

Every packed form must equal its nn.Conv / nn.ConvTranspose / InstanceNorm
reference with the SAME kernel (callers pass flax module params verbatim),
including the multi-stream packed-concat layout used by the SwinUNETR
UnetrUpBlock skip concat.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.ops import wpack


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 8, 5)).astype(np.float32))
    for S in (2, 4, 8):
        p = wpack.pack(x, S)
        assert p.shape == (2, 3, 4, 8 // S, S * 5)
        np.testing.assert_array_equal(np.asarray(wpack.unpack(p, S)),
                                      np.asarray(x))


def _ref_conv3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("S", [2, 4])
def test_conv3_wpack_single_stream(rng, S):
    Ci, Co = 3, 5
    x = jnp.asarray(rng.normal(size=(2, 4, 5, 8, Ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)).astype(np.float32))
    want = _ref_conv3(x, w)
    P = wpack.pack(x, S)
    got = wpack.unpack(wpack.conv3_wpack(P, w, S, (Ci,)), S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("S", [2, 4])
def test_conv3_wpack_multi_stream(rng, S):
    """Packed concat is stream-major per W block ([x packed ‖ skip packed]),
    the reference concat is per-voxel channel order — ci_splits reorders the
    kernel rows so the outputs still match."""
    C1, C2, Co = 3, 4, 6
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, C1)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(1, 4, 4, 8, C2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C1 + C2, Co)).astype(np.float32))
    want = _ref_conv3(jnp.concatenate([x, s], axis=-1), w)
    P = jnp.concatenate([wpack.pack(x, S), wpack.pack(s, S)], axis=-1)
    got = wpack.unpack(wpack.conv3_wpack(P, w, S, (C1, C2)), S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pointwise_wpack_multi_stream(rng):
    S, C1, C2, Co = 4, 3, 2, 5
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 8, C1)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(1, 3, 4, 8, C2)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C1 + C2, Co)).astype(np.float32))
    want = jnp.einsum("bdhwc,cf->bdhwf",
                      jnp.concatenate([x, s], axis=-1), w1)
    P = jnp.concatenate([wpack.pack(x, S), wpack.pack(s, S)], axis=-1)
    got = wpack.unpack(wpack.pointwise_wpack(P, w1, S, (C1, C2)), S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_instance_norm_wpack(rng):
    from micformer_tpu.models.layers import InstanceNorm

    S, C = 4, 3
    x = jnp.asarray(rng.normal(size=(2, 4, 5, 8, C)).astype(np.float32) * 3
                    + 1.5)
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    mod = InstanceNorm(affine=True)
    want = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = wpack.unpack(
        wpack.instance_norm_wpack(wpack.pack(x, S), S, scale, bias), S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)
    # no-affine form
    want0 = InstanceNorm(affine=False).apply({}, x)
    got0 = wpack.unpack(wpack.instance_norm_wpack(wpack.pack(x, S), S), S)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("S,k", [(4, 3), (4, 5), (2, 3), (8, 3)])
def test_dw_conv_wpack(rng, S, k):
    C = 3
    x = jnp.asarray(rng.normal(size=(2, 4, 5, 8, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, k, 1, C)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(k // 2, k // 2)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=C)
    got = wpack.unpack(wpack.dw_conv_wpack(wpack.pack(x, S), w, S), S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("S", [2, 4])
def test_dw_conv_wpack_banded(rng, S):
    """Banded dw form (conv3_wpack with the diagonal-densified kernel) ==
    lax depthwise conv — the round-4 co-design replacing the slot-shift tap
    form inside MedNeXtBlockW."""
    C = 3
    x = jnp.asarray(rng.normal(size=(2, 4, 5, 8, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, C)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=C)
    got = wpack.unpack(wpack.dw_conv_wpack_banded(wpack.pack(x, S), w, S), S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_dw_conv_wpack_banded_grads(rng):
    S, C = 4, 3
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, C)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def f_ref(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=C)
        return jnp.sum(y * g)

    def f_pack(x, w):
        y = wpack.unpack(
            wpack.dw_conv_wpack_banded(wpack.pack(x, S), w, S), S)
        return jnp.sum(y * g)

    for i, (a, b) in enumerate(zip(jax.grad(f_pack, (0, 1))(x, w),
                                   jax.grad(f_ref, (0, 1))(x, w))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=f"arg {i}")


def test_pointwise_slots(rng):
    """Slot-reshaped pointwise einsum == pointwise_wpack's block diagonal
    (single stream) == the plain per-voxel matmul."""
    S, C, Co = 4, 3, 5
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 8, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C, Co)).astype(np.float32))
    want = jnp.einsum("bdhwc,cf->bdhwf", x, w1)
    got = wpack.unpack(wpack.pointwise_slots(wpack.pack(x, S), w1, S), S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_conv3_wpack_grads(rng):
    """Autodiff through the packed k3 conv == lax.conv grads (dx and dw)."""
    S, Ci, Co = 4, 3, 5
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, Ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 4, 4, 8, Co)).astype(np.float32))

    def f_ref(x, w):
        return jnp.sum(_ref_conv3(x, w) * g)

    def f_pack(x, w):
        y = wpack.unpack(wpack.conv3_wpack(wpack.pack(x, S), w, S, (Ci,)), S)
        return jnp.sum(y * g)

    dx_r, dw_r = jax.grad(f_ref, (0, 1))(x, w)
    dx_p, dw_p = jax.grad(f_pack, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_r),
                               atol=1e-4, rtol=1e-4)


def test_dw_conv_wpack_grads(rng):
    S, C, k = 4, 3, 3
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, k, 1, C)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def f_ref(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(k // 2, k // 2)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=C)
        return jnp.sum(y * g)

    def f_pack(x, w):
        y = wpack.unpack(wpack.dw_conv_wpack(wpack.pack(x, S), w, S), S)
        return jnp.sum(y * g)

    for i, (a, b) in enumerate(zip(jax.grad(f_pack, (0, 1))(x, w),
                                   jax.grad(f_ref, (0, 1))(x, w))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=f"arg {i}")


def test_parity_interleave_packed(rng):
    """Fused classes->packed == parity_interleave followed by pack."""
    from micformer_tpu.models.layers import parity_interleave

    x6 = jnp.asarray(rng.normal(size=(2, 3, 4, 4, 8, 5)).astype(np.float32))
    for S in (2, 4, 8):
        want = wpack.pack(parity_interleave(x6), S)
        got = wpack.parity_interleave_packed(x6, S)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_swinunetr_wpack_full_model_parity(rng):
    """MICFORMER_WPACK SwinUNETR == the default path with the SAME params
    (identical tree): the packed UNETR conv path is an exact reformulation
    up to f32 reduction order in the InstanceNorm statistics."""
    from micformer_tpu import registry
    from micformer_tpu.models import swinunetr as su

    kw = dict(feature_size=4, num_heads=(1, 2, 4, 8), window_size=(2, 2, 2))
    x = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 32)).astype(np.float32))
    model = registry.build("swinunetr", **kw)
    prev = su.WPACK
    try:
        su.WPACK = False
        variables = model.init(jax.random.key(0), x)
        want = model.apply(variables, x)
        su.WPACK = True
        v2 = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(v2))
        got = model.apply(variables, x)
    finally:
        su.WPACK = prev
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_mednext_wpack_full_model_parity(rng):
    """MICFORMER_MEDNEXT_WPACK == the default stencil path with the SAME
    params (identical tree): packed stem/enc0/dec3/head segments are exact
    up to f32 reduction order in the InstanceNorm statistics."""
    from micformer_tpu import registry
    from micformer_tpu.models import mednext as mn

    x = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 16)).astype(np.float32))
    model = registry.build("mednext", deep_supervision=True)
    prev = mn.MN_WPACK
    try:
        mn.MN_WPACK = False
        variables = model.init(jax.random.key(0), x)
        want = model.apply(variables, x)
        mn.MN_WPACK = True
        v2 = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(v2))
        got = model.apply(variables, x)
    finally:
        mn.MN_WPACK = prev
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("S", [2, 4])
def test_convtranspose2_wpack(rng, S):
    C, F = 3, 5
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 4, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, 2, C, F)).astype(np.float32))
    mod = nn.ConvTranspose(F, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
                           use_bias=False)
    want = mod.apply({"params": {"kernel": w}}, x)
    got = wpack.unpack(wpack.convtranspose2_wpack(x, w, S), S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_conv3_wpack_rejects_s1(rng):
    """S=1 would double-apply edge terms (ADVICE r4) — rejected outright."""
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
    with pytest.raises(AssertionError):
        wpack.conv3_wpack(x, w, 1, (3,))
