"""Fused window-attention kernel: parity vs einsum reference (interpret mode
on CPU) for forward and gradients, including the non-divisible tail."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu.ops.pallas.window_attention import fused_window_attention
from micformer_tpu.ops import attention as attention_mod
from micformer_tpu.ops.attention import multi_head_attention


def _reference(q, k, v, scale=None):
    # kernel contract is [N,h,T,d]; multi_head_attention takes [N,T,h,d]
    attention_mod_prev = attention_mod.USE_FUSED
    attention_mod.USE_FUSED = False
    try:
        out = multi_head_attention(jnp.asarray(q).transpose(0, 2, 1, 3),
                                   jnp.asarray(k).transpose(0, 2, 1, 3),
                                   jnp.asarray(v).transpose(0, 2, 1, 3),
                                   scale=scale)
        return out.transpose(0, 2, 1, 3)
    finally:
        attention_mod.USE_FUSED = attention_mod_prev


@pytest.mark.parametrize("N,h,T,d", [(20, 3, 8, 16), (7, 2, 8, 16), (5, 1, 4, 8)])
def test_fused_matches_einsum(rng, N, h, T, d):
    q = rng.normal(size=(N, h, T, d)).astype(np.float32)
    k = rng.normal(size=(N, h, T, d)).astype(np.float32)
    v = rng.normal(size=(N, h, T, d)).astype(np.float32)
    out = fused_window_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                 None, True)  # interpret mode
    ref = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_fused_grad_matches_einsum(rng):
    N, h, T, d = 6, 2, 8, 16
    q = rng.normal(size=(N, h, T, d)).astype(np.float32)
    k = rng.normal(size=(N, h, T, d)).astype(np.float32)
    v = rng.normal(size=(N, h, T, d)).astype(np.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_window_attention(q, k, v, None, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_dispatch_predicate():
    from micformer_tpu.ops.pallas.window_attention import should_use_fused

    # CPU backend in tests -> never dispatches
    assert should_use_fused(8, 16, None, None) is (jax.default_backend() == "tpu")
    assert should_use_fused(8, 16, np.zeros((1, 8, 8)), None) is False
    assert should_use_fused(8, 16, None, np.zeros((1, 8, 8))) is False
    assert should_use_fused(48, 16, None, None) is False


@pytest.mark.slow
@pytest.mark.parametrize("N,T,h,d", [(20, 8, 3, 16), (300, 8, 2, 8), (7, 4, 1, 16)])
def test_v2_matches_einsum(rng, N, T, h, d):
    from micformer_tpu.ops.pallas.window_attention_v2 import window_attention_v2

    q = rng.normal(size=(N, T, h, d)).astype(np.float32)
    k = rng.normal(size=(N, T, h, d)).astype(np.float32)
    v = rng.normal(size=(N, T, h, d)).astype(np.float32)
    out = window_attention_v2(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              None, True)  # interpret mode
    # reference: the plain [N,T,h,d] einsum path
    attention_mod_prev = attention_mod.HEAD_LOOP_MAX
    attention_mod.HEAD_LOOP_MAX = 0
    try:
        ref = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    finally:
        attention_mod.HEAD_LOOP_MAX = attention_mod_prev
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_v2_grad_matches_einsum(rng):
    from micformer_tpu.ops.pallas.window_attention_v2 import window_attention_v2

    N, T, h, d = 6, 8, 2, 16
    q = jnp.asarray(rng.normal(size=(N, T, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(N, T, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, T, h, d)).astype(np.float32))

    def loss_v2(q, k, v):
        return jnp.sum(window_attention_v2(q, k, v, None, True) ** 2)

    def loss_ref(q, k, v):
        prev = attention_mod.HEAD_LOOP_MAX
        attention_mod.HEAD_LOOP_MAX = 0
        try:
            return jnp.sum(multi_head_attention(q, k, v) ** 2)
        finally:
            attention_mod.HEAD_LOOP_MAX = prev

    gv = jax.grad(loss_v2, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gv, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.slow  # re-tier r4: >30s on the fast tier
def test_dw_conv3_pallas_matches_stencil():
    """Pallas depthwise plane-streaming kernel (ops/pallas/dw_stencil.py) ==
    the XLA shift-and-add form, forward and both gradients, k=3 and k=5."""
    from micformer_tpu.ops.pallas.dw_stencil import dw_conv3_pallas
    from micformer_tpu.models.layers import dw_conv_stencil

    rng = np.random.default_rng(0)
    for shape, k in [((2, 6, 8, 10, 5), 3), ((1, 4, 6, 6, 7), 5)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, k, 1, shape[-1])).astype(np.float32))
        a = dw_conv3_pallas(x, w, True)
        b = dw_conv_stencil(x, w)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        g = jnp.asarray(rng.normal(size=a.shape).astype(np.float32))
        g1 = jax.grad(lambda x, w: jnp.vdot(dw_conv3_pallas(x, w, True), g),
                      (0, 1))(x, w)
        g2 = jax.grad(lambda x, w: jnp.vdot(dw_conv_stencil(x, w), g),
                      (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-3)
