"""Fused Pallas kernel for many-tiny-windows attention (SURVEY §7 hard-part 2).

The MicFormer regime is thousands of windows × 8 tokens × 16 head-dims
(32³ grid / window 2³ / embed 48 ⇒ 4096 windows · 3 heads = 12288 tiny
attentions per block). Per-window matmuls underfill the 128×128 MXU by ~250×.

Kernel strategy: PACK G = 128//T windows into one VMEM tile [128, d], compute
one dense 128×128 score matrix on the MXU, add a block-diagonal mask built
from iota (window i attends only to its own T tokens), row-softmax, and one
[128,128]@[128,d] PV matmul. The cross-window products are wasted FLOPs
(factor G), but the MXU runs them at full tile utilization, which beats
dispatching G tiny [T,d] matmuls.

Differentiability: jax.custom_vjp — forward is the Pallas kernel, backward is
the standard attention gradient in einsum form (XLA handles the transposed
batched matmuls well; a fused backward kernel is a later optimization).

Falls back to pure-XLA einsum off-TPU and for biased/masked variants
(ops/attention.py handles those).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 128


def _kernel(q_ref, k_ref, v_ref, o_ref, *, T: int, scale: float):
    q = q_ref[:].astype(jnp.float32) * scale
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [R, R]
    R = scores.shape[0]
    row_w = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // T
    col_w = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // T
    scores = jnp.where(row_w == col_w, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[:] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pallas_forward(q, k, v, scale, interpret=False):
    """q, k, v: [M, T, d] (windows*heads flattened). Returns [M, T, d]."""
    M, T, d = q.shape
    G = max(_BLOCK_ROWS // T, 1)
    R = G * T
    n_blocks = -(-M // G)
    pad = n_blocks * G - M
    if pad:
        cfg = ((0, pad), (0, 0), (0, 0))
        q = jnp.pad(q, cfg)
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)
    qf = q.reshape(n_blocks * G * T, d)
    kf = k.reshape(n_blocks * G * T, d)
    vf = v.reshape(n_blocks * G * T, d)

    out = pl.pallas_call(
        functools.partial(_kernel, T=T, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(n_blocks * G, T, d)
    return out[:M] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_window_attention(q, k, v, scale=None, interpret=False):
    """softmax(q·kᵀ·scale)·v per window, fused. q/k/v: [N, h, T, d]."""
    N, h, T, d = q.shape
    s = scale if scale is not None else d ** -0.5
    out = _pallas_forward(
        q.reshape(N * h, T, d), k.reshape(N * h, T, d), v.reshape(N * h, T, d),
        s, interpret)
    return out.reshape(N, h, T, d)


def _fwd(q, k, v, scale, interpret):
    return fused_window_attention(q, k, v, scale, interpret), (q, k, v)


def _bwd(scale, interpret, res, g):
    q, k, v = res
    d = q.shape[-1]
    s = scale if scale is not None else d ** -0.5
    qf = q.astype(jnp.float32) * s
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    logits = jnp.einsum("nhqd,nhkd->nhqk", qf, kf)
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("nhqk,nhqd->nhkd", p, gf)
    dp = jnp.einsum("nhqd,nhkd->nhqk", gf, vf)
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("nhqk,nhkd->nhqd", dlogits, kf) * s
    dk = jnp.einsum("nhqk,nhqd->nhkd", dlogits, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_window_attention.defvjp(_fwd, _bwd)


def should_use_fused(T: int, d: int, bias, mask) -> bool:
    """Dispatch predicate: unbiased/unmasked tiny windows on a TPU backend."""
    if bias is not None or mask is not None:
        return False
    if T > 32 or d > 128 or _BLOCK_ROWS % T != 0:
        return False
    return jax.default_backend() == "tpu"
