"""Pallas window-attention v2 — whole-window-row kernel for the tiny-T regime.

v1 (window_attention.py) packed G windows into a dense 128x128 MXU score
matrix and paid a factor-G of wasted cross-window FLOPs; it lost its end-to-
end A/B by 8%. v2 observes that at T=8, d=16 the attention FLOPs are
negligible — the XLA dot path loses to MEMORY: materialized [N,T,h,d]
relayout copies plus two [N,h,T,T] softmax round-trips (~18% of the MicFormer
forward, profiled). So v2 never touches the MXU: one grid step loads a block
of G windows' q/k/v [G, T, C] into VMEM and evaluates scores, softmax and the
PV mix entirely on the VPU with static loops over (t, head) — each window's
tokens live along the LANE axis, so per-head contractions are lane-slice
reductions. HBM traffic: read q,k,v once, write out once. No relayouts, no
logit round-trips.

Contract matches ops/attention.py's [N, T, h, d] layout (heads inside lanes:
C = h*d). Gradients ride the same einsum custom_vjp as v1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, T: int, h: int, d: int, scale: float):
    # refs are [T, G, C]: slicing one token gives a contiguous [G, C] tile.
    # Loads stream from VMEM inside the loops — materializing all 3T token
    # tiles up front made the Mosaic compile helper fall over.
    # Per-head lane masks come from iota (kernels cannot capture constant
    # arrays): head id of lane c is c // d. Per-head math runs FULL-WIDTH —
    # Mosaic rejects sub-128 lane slicing/stores; masked full-width multiplies
    # and reduces lower cleanly.
    C = h * d
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) // d
    masks = [(lane_head == hi).astype(jnp.float32) for hi in range(h)]

    for t in range(T):
        qt = q_ref[t].astype(jnp.float32) * scale
        # per-head logits for every key token: logits[hi][s] : [G, 1]
        logits = [[None] * T for _ in range(h)]
        for s in range(T):
            prod = qt * k_ref[s].astype(jnp.float32)      # [G, C]
            for hi in range(h):
                logits[hi][s] = jnp.sum(prod * masks[hi], axis=-1,
                                        keepdims=True)    # [G, 1]
        out_t = jnp.zeros_like(qt)
        for hi in range(h):
            m = logits[hi][0]
            for s in range(1, T):
                m = jnp.maximum(m, logits[hi][s])
            ps = [jnp.exp(logits[hi][s] - m) for s in range(T)]
            denom = ps[0]
            for s in range(1, T):
                denom = denom + ps[s]
            inv = 1.0 / denom                             # [G, 1]
            for s in range(T):
                out_t = out_t + (ps[s] * inv) * (
                    v_ref[s].astype(jnp.float32) * masks[hi])
        o_ref[t] = out_t.astype(o_ref.dtype)


def window_attention_v2(q, k, v, scale=None, interpret=False):
    """softmax(q·kᵀ·scale)·v per window. q/k/v: [N, T, h, d] (attention.py
    layout). Differentiable (einsum backward)."""
    N, T, h, d = q.shape
    s = scale if scale is not None else d ** -0.5
    out = _v2_call(q.reshape(N, T, h * d), k.reshape(N, T, h * d),
                   v.reshape(N, T, h * d), h, s, interpret)
    return out.reshape(N, T, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _v2_call(q, k, v, h, scale, interpret):
    return _v2_forward(q, k, v, h, scale, interpret)


def _v2_forward(q, k, v, h, scale, interpret):
    N, T, C = q.shape
    d = C // h
    G = 512
    n_blocks = -(-N // G)
    pad = n_blocks * G - N
    if pad:
        cfg = ((0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, cfg), jnp.pad(k, cfg), jnp.pad(v, cfg)
    # token-major layout: refs become [T, G, C] so one token slice is a
    # contiguous [G, C] tile (lane-aligned; no sub-lane slicing in-kernel)
    qt = q.transpose(1, 0, 2)
    kt = k.transpose(1, 0, 2)
    vt = v.transpose(1, 0, 2)
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, h=h, d=d, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((T, G, C), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((T, G, C), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qt, kt, vt).transpose(1, 0, 2)
    return out[:N] if pad else out


def _v2_fwd(q, k, v, h, scale, interpret):
    return _v2_forward(q, k, v, h, scale, interpret), (q, k, v)


def _v2_bwd(h, scale, interpret, res, g):
    q, k, v = res
    N, T, C = q.shape
    d = C // h
    qf = q.astype(jnp.float32).reshape(N, T, h, d) * scale
    kf = k.astype(jnp.float32).reshape(N, T, h, d)
    vf = v.astype(jnp.float32).reshape(N, T, h, d)
    gf = g.astype(jnp.float32).reshape(N, T, h, d)
    logits = jnp.einsum("nqhd,nkhd->nhqk", qf, kf)
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("nhqk,nqhd->nkhd", p, gf)
    dp = jnp.einsum("nqhd,nkhd->nhqk", gf, vf)
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("nhqk,nkhd->nqhd", dlogits, kf) * scale
    dk = jnp.einsum("nhqk,nqhd->nkhd", dlogits, qf)
    return (dq.reshape(N, T, C).astype(q.dtype),
            dk.reshape(N, T, C).astype(k.dtype),
            dv.reshape(N, T, C).astype(v.dtype))


_v2_call.defvjp(_v2_fwd, _v2_bwd)


def should_use_v2(T: int, h: int, d: int, bias, mask, n_windows: int = 1 << 30) -> bool:
    """Unbiased/unmasked tiny windows on TPU. h is capped: the kernel unrolls
    h*T*T masked reductions, and deep-stage head counts (12/24) blow up
    Mosaic compile time while mattering little (stage 0 dominates the
    profile). n_windows is floored because SMALL operand arrays get placed
    wholly in VMEM by XLA, and the pallas call's block staging then overflows
    the 16MB scoped-vmem budget (observed at stage 1: bf16[8,2048,96]
    operands -> 20.5M scoped alloc)."""
    if bias is not None or mask is not None:
        return False
    if T > 8 or h > 6 or h * d > 512:
        return False
    if n_windows * T * (h * d) * 2 < 8 * 1024 * 1024:
        return False
    return jax.default_backend() == "tpu"
