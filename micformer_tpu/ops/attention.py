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
      q: [N, h, Tq, d]; k, v: [N, h, Tk, d]. N = B·nWindows (or any batch).
      bias: optional [h, Tq, Tk] (relative-position bias) — broadcast over N.
      mask: optional [nW, Tq, Tk] shifted-window mask with nW dividing N;
        applied per window position within each batch element (Swin semantics).
      scale: q scaling; default d**-0.5 (reference uses head_dim**-0.5).

    Returns [N, h, Tq, d]. Accumulates logits/softmax in float32 and casts the
    output back to q.dtype (bf16-safe).
    """
    N, h, Tq, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if USE_FUSED and Tq == k.shape[2]:
        from micformer_tpu.ops.pallas.window_attention import (
            fused_window_attention,
            should_use_fused,
        )

        if should_use_fused(Tq, d, bias, mask):
            return fused_window_attention(q, k, v, scale)
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    attn = jnp.einsum("nhqd,nhkd->nhqk", qf, kf)
    if bias is not None:
        attn = attn + bias.astype(jnp.float32)[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(N // nW, nW, h, Tq, -1)
        if mask.ndim == 2:
            # compact region-id form [nW, T] (see windows.shifted_window_region_ids):
            # pairwise -100 mask built in-graph, fuses into the softmax
            ids = jnp.asarray(mask)
            pair = jnp.where(ids[:, :, None] == ids[:, None, :], 0.0, -100.0)
            attn = attn + pair[None, :, None]
        else:
            attn = attn + jnp.asarray(mask).astype(jnp.float32)[None, :, None]
        attn = attn.reshape(N, h, Tq, -1)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(v.dtype), v)
    return out.astype(q.dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[N, T, C] -> [N, h, T, C//h]."""
    N, T, C = x.shape
    return x.reshape(N, T, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[N, h, T, d] -> [N, T, h*d]."""
    N, h, T, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(N, T, h * d)
