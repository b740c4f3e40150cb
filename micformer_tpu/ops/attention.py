"""Batched multi-head attention core for the (many-windows × few-tokens) regime.

One function serves every attention variant in the model zoo (SURVEY.md §7.5):
plain windowed self-attention (MicFormer TransformerBlock3D), shifted+masked
(VT-Unet/SwinUnet3D/nnFormer/SwinUNETR), relative-position-biased, cross-stream
Q/KV (MicFormer CrossWindowAttention3D, MICFormer_self.py:148-203), decoder
skip-KV (nnFormer), and encoder-saved-KV (VT-Unet).

Design: callers project to per-head layout [N, h, T, d] and pass optional
additive bias terms; the core is a single einsum chain that XLA batches over
N·h. For the MM-WHS configs N is 10^3-10^4 windows of T=8-512 tokens — the
einsum form lets XLA tile the batched matmuls onto the MXU. A fused Pallas
kernel (ops/pallas/window_attention.py) implements the same contract for the
tiny-T regime where per-window matmuls would underfill the 128×128 systolic
array; `multi_head_attention` dispatches to it when profitable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Optional dispatch to the fused Pallas kernel (ops/pallas/window_attention.py)
# for unbiased/unmasked tiny-window attention on TPU. OFF by default: the A/B
# sliding-window bench measured the XLA batched-einsum path ~8% FASTER end to
# end (2.16 vs 2.00 vol/s, micformer bf16 sw4) — the kernel's G-window MXU
# packing wastes a factor-G of FLOPs on cross-window products, and XLA already
# batches the tiny matmuls well. Kept as an opt-in (MICFORMER_FUSED_ATTENTION=1)
# experiment; a batched-dot Mosaic variant is the round-2 follow-up.
import os as _os

USE_FUSED = _os.environ.get("MICFORMER_FUSED_ATTENTION", "0") == "1"
# head-loop variant for few-heads tiny-window attention: per-head lane-sliced
# 3D einsums instead of one 4D batched einsum — avoids materializing the
# [N,T,h,d] relayout copies XLA inserts for the (n,h)-batched dot.
HEAD_LOOP_MAX = int(_os.environ.get("MICFORMER_ATTN_HEADLOOP_MAX", "4"))
# Pallas v2 whole-window-row kernel (ops/pallas/window_attention_v2.py):
# VPU-only fused QK/softmax/PV for T<=8 windows — q/k/v read once, out
# written once, no relayouts or logit round-trips. A/B-gated.
USE_V2 = _os.environ.get("MICFORMER_ATTENTION_V2", "0") == "1"
# Lane-major tiny-window attention (round-3 A/B WINNER: 5.30 vs 4.07 vol/s,
# p50 latency −20%, bf16 sw4 protocol) — transpose q/k/v so the HUGE window
# axis N rides the 128-lane dimension and the tiny T=8 / d=16 axes become
# sublane/unrolled math. The profiled stage-0 attention cost was hundreds of
# minor-dim-8/16 ops ([16384,8,3,16] copies, [16384,8,8] logit fusions)
# running at 8-16/128 lane efficiency; in [T,d,N] layout every multiply-add
# is full-lane VPU work and softmax reduces over a major axis. Default ON for
# the unbiased/unmasked tiny-window regime; set =0 to fall back.
LANE_MAJOR = _os.environ.get("MICFORMER_ATTN_LANE_MAJOR", "1") == "1"


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """softmax(q·kᵀ·scale + bias + mask)·v over batched windows.

    Args:
      q: [N, Tq, h, d]; k, v: [N, Tk, h, d]. N = B·nWindows (or any batch).
        The head axis lives INSIDE the token layout (split_heads is a pure
        reshape): the profiled [N,h,T,d] layout forced XLA to materialize
        pre/post transposes of every q/k/v/out tensor (~8% of the MicFormer
        forward); in [N,T,h,d] the batched matmuls relayout internally only
        where the MXU actually needs it.
      bias: optional [h, Tq, Tk] (relative-position bias) — broadcast over N.
      mask: optional [nW, Tq, Tk] shifted-window mask with nW dividing N;
        applied per window position within each batch element (Swin semantics).
      scale: q scaling; default d**-0.5 (reference uses head_dim**-0.5).

    Returns [N, Tq, h, d]. Accumulates logits in float32 and stores the
    unnormalized softmax in v.dtype (bf16-safe).
    """
    N, Tq, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if USE_FUSED and Tq == k.shape[1]:
        from micformer_tpu.ops.pallas.window_attention import (
            fused_window_attention,
            should_use_fused,
        )

        if should_use_fused(Tq, d, bias, mask):
            out = fused_window_attention(q.transpose(0, 2, 1, 3),
                                         k.transpose(0, 2, 1, 3),
                                         v.transpose(0, 2, 1, 3), scale)
            return out.transpose(0, 2, 1, 3)
    # logits dtype: f32 models keep exact f32 math (parity tests); bf16 models
    # store logits in bf16 — the MXU accumulates the d-contraction in f32
    # either way, and the [N,h,Tq,Tk] HBM round-trip halves. Softmax max-sub
    # keeps bf16 exp well-conditioned.
    if USE_V2 and Tq == k.shape[1]:
        from micformer_tpu.ops.pallas.window_attention_v2 import (
            should_use_v2,
            window_attention_v2,
        )

        if should_use_v2(Tq, h, d, bias, mask, n_windows=N):
            return window_attention_v2(q, k, v, scale)
    acc_t = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    qf = q.astype(acc_t) * jnp.asarray(scale, acc_t)
    kf = k.astype(acc_t)
    if LANE_MAJOR and bias is None and mask is None and Tq <= 16 \
            and k.shape[1] <= 16 and N >= 1024:
        return _lane_major_attention(qf, kf, v, acc_t).astype(q.dtype)
    if h <= HEAD_LOOP_MAX and bias is None and mask is None and Tq <= 16:
        return _head_loop_attention(qf, kf, v, acc_t).astype(q.dtype)
    attn = jnp.einsum("nqhd,nkhd->nhqk", qf, kf,
                      preferred_element_type=acc_t)
    if bias is not None:
        attn = attn + bias.astype(acc_t)[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(N // nW, nW, h, Tq, -1)
        if mask.ndim == 2:
            # compact region-id form [nW, T] (see windows.shifted_window_region_ids):
            # pairwise -100 mask built in-graph, fuses into the softmax
            ids = jnp.asarray(mask)
            pair = jnp.where(ids[:, :, None] == ids[:, None, :],
                             jnp.asarray(0.0, acc_t), jnp.asarray(-100.0, acc_t))
            attn = attn + pair[None, :, None]
        else:
            attn = attn + jnp.asarray(mask).astype(acc_t)[None, :, None]
        attn = attn.reshape(N, h, Tq, -1)
    # softmax with the normalization folded AFTER the PV matmul:
    #   softmax(a) @ V == (exp(a - max) @ V) / sum(exp(a - max))
    # The unnormalized exp is stored in v.dtype (bf16 halves the [N,h,Tq,Tk]
    # HBM round-trip — profiled at ~10% of the MicFormer forward), the
    # denominator reduces in f32, and the divide rides on the smaller
    # [N,h,Tq,d] output. Exactly the f32 math when v is f32 (parity tests).
    m = jax.lax.stop_gradient(jnp.max(attn, axis=-1, keepdims=True))
    p = jnp.exp(attn - m).astype(v.dtype)
    denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    out = jnp.einsum("nhqk,nkhd->nqhd", p, v)
    # denom is [N,h,Tq,1] -> align to [N,Tq,h,1]
    out = out / denom.transpose(0, 2, 1, 3).astype(v.dtype)
    return out.astype(q.dtype)


def _head_loop_attention(qf, kf, v, acc_t):
    """Per-head attention on [N,T,h,d] via lane slices (3D einsums). Same math
    as the batched path — used for h <= HEAD_LOOP_MAX unbiased/unmasked tiny
    windows, where the 4D batched dot's operand relayouts dominate."""
    N, Tq, h, d = qf.shape
    outs = []
    for i in range(h):
        qh, kh, vh = qf[:, :, i], kf[:, :, i], v[:, :, i]      # [N, T, d]
        a = jnp.einsum("nqd,nkd->nqk", qh, kh,
                       preferred_element_type=acc_t)
        m = jax.lax.stop_gradient(jnp.max(a, axis=-1, keepdims=True))
        p = jnp.exp(a - m).astype(v.dtype)
        denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.einsum("nqk,nkd->nqd", p, vh) / denom.astype(v.dtype)
        outs.append(o)
    return jnp.stack(outs, axis=2)  # [N, T, h, d]


def lane_major_attention_core(q_t, k_t, v_t, acc_t):
    """Attention core on lane-major [T, h, d, N] operands (q pre-scaled).

    Per head computes
      logits[q, k, :] = sum_d q[q, d, :] * k[k, d, :]      (d = sublane reduce)
      out[q, d, :]    = sum_k p[q, k, :] * v[k, d, :]      (k = major reduce)
    as full-lane VPU fusions — the huge window axis N rides the 128-lane dim.
    Same max-sub/post-PV-normalized softmax math as the batched path (exact
    f32 parity when inputs are f32). Returns [Tq, h, d, N] in v_t.dtype."""
    h = q_t.shape[1]
    outs = []
    for i in range(h):
        qh, kh, vh = q_t[:, i], k_t[:, i], v_t[:, i]        # [T, d, N]
        a = jnp.sum(qh[:, None] * kh[None], axis=2)          # [Tq, Tk, N]
        m = jax.lax.stop_gradient(jnp.max(a, axis=1, keepdims=True))
        p = jnp.exp(a - m).astype(v_t.dtype)                 # [Tq, Tk, N]
        denom = jnp.sum(p.astype(jnp.float32), axis=1)       # [Tq, N]
        o = jnp.sum(p[:, :, None] * vh[None], axis=1)        # [Tq, d, N]
        outs.append(o / denom[:, None].astype(v_t.dtype))
    return jnp.stack(outs, axis=1)                           # [Tq, h, d, N]


def _lane_major_attention(qf, kf, v, acc_t):
    """Attention with the window axis N on the minor (lane) dimension.

    qf/kf: [N, T, h, d] (q pre-scaled); v: [N, Tk, h, d]. Transposes each
    operand to [T, h, d, N] (a single relayout of a few MB — far cheaper than
    the per-op minor-dim-8 penalty it removes), then runs
    lane_major_attention_core."""
    q_t = jnp.moveaxis(qf, 0, -1)            # [Tq, h, d, N]
    k_t = jnp.moveaxis(kf, 0, -1)            # [Tk, h, d, N]
    v_t = jnp.moveaxis(v, 0, -1)             # [Tk, h, d, N]
    out = lane_major_attention_core(q_t, k_t, v_t, acc_t)    # [Tq, h, d, N]
    return jnp.moveaxis(out, -1, 0)                          # [N, Tq, h, d]


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[N, T, C] -> [N, T, h, C//h] — a pure reshape (no transpose; see
    multi_head_attention's layout note)."""
    N, T, C = x.shape
    return x.reshape(N, T, num_heads, C // num_heads)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[N, T, h, d] -> [N, T, h*d] — a pure reshape."""
    N, T, h, d = x.shape
    return x.reshape(N, T, h * d)
