"""Shared flax.linen building blocks for the 3D segmentation model zoo.

Internal tensor convention: channels-last [B, D, H, W, C] — the layout XLA
tiles best on TPU (last dim lands on the 128-lane axis). Public model wrappers
accept/return the reference's NCDHW convention (SURVEY.md §1 L2 interface).

Behavioral parity notes cite the reference implementations these blocks
functionally replace (studied, not translated):
  - Mlp / window blocks:            MicFormer/models/MICFormer_self.py:16-34,430-524
  - fused-qkv rel-pos window attn:  VT-Unet/vtunet/vt_unet.py:126-231
  - cross-stream q/kv attention:    MICFormer_self.py:148-203
  - PatchEmbed3D (conv k=s=patch):  MICFormer_self.py:837-878
  - conv PatchMerging / Expand:     MICFormer_self.py:527-579
  - linear PatchMerging (8C->2C):   vt_unet.py:412-448
  - linear PatchExpand (shuffle):   vt_unet.py:451-536
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.ops.windows import (
    window_partition,
    window_reverse,
    shifted_window_region_ids,
    relative_position_index,
    adjust_window_shift,
    cyclic_shift,
)
from micformer_tpu.ops.attention import (
    multi_head_attention,
    split_heads,
    merge_heads,
    lane_major_attention_core,
)

# A/B (round 3): Conv3x3ViaDot pre-projection — one [C, 27F] matmul + 27
# shifted slice-adds instead of 27 shifted full-input dots (input read once
# instead of 27x). Exact math, same param tree.
import os as _os

PREPROJECT = _os.environ.get("MICFORMER_CONV3_PREPROJECT", "0") == "1"
# Round-3 A/B WINNER (+6.3%: 5.30 -> 5.64 vol/s, p50 0.2133 -> 0.2071,
# reproducible across two same-session pairs; train step neutral 162.0 ->
# 160.5 ms/call): run the q/kv PROJECTIONS and output proj in the [T, C, N]
# lane-major layout too — one entry transpose of each input stream instead
# of three per-operand moveaxis of q/k/v, with every elementwise/bias op at
# full 128-lane width. Profiled motivation: post-lane-major forward was
# 57.6% transpose/copy. Default ON; =0 falls back to the batched path.
ATTN_LANE_PROJ = _os.environ.get("MICFORMER_ATTN_LANE_PROJ", "1") == "1"
# Whole-block lane-major residual stream for unshifted tiny-window Swin
# blocks: lattice-transpose [B,D,H,W,C] -> [T,C,N] once per block; LN, qkv,
# attention, proj, MLP and both residual adds all run lane-major.
BLOCK_LANE_MAJOR = _os.environ.get("MICFORMER_BLOCK_LANE_MAJOR", "0") == "1"
# A/B (round 3): channels-last LayerNorm APPLY in packed bf16. Stats stay
# f32 (flax fast-variance), but the normalize+scale+bias runs as bf16
# (x - m)*r*g + b — the VPU packs 2 bf16 per lane, halving the per-element
# work of the 16 stage-0 LN fusions. bf16-only (f32 models keep the flax
# module verbatim — torch-transplant parity runs f32 and is bit-unaffected).
# A/B verdict: NEUTRAL (5.736 vs base 5.7325 vol/s, p50 0.1980 vs 0.1966) —
# XLA already fuses the LN apply into its neighbors, so halving VPU
# per-element work doesn't move wall time. Kept opt-in; do not retry.
LN_BF16_APPLY = _os.environ.get("MICFORMER_LN_BF16_APPLY", "0") == "1"
# Minimum window count N for the lane-major attention path (N rides the
# 128-lane axis; below ~one tile the entry transposes can't pay off). The
# round-3 train profile showed the deep stages (N=128/16 at b2 128³) falling
# back to the batched path and emitting 408 tiny [N,8,h,16] per-operand
# moveaxis copies per call. A/B WINNER at 128 (default): train step 161.6 ->
# 158.2 ms/call; with CONV3_STACK_BWD combined, bench 5.73 -> 6.10 vol/s
# (p50 0.1966 -> 0.1868) — stage-2 (N=256) inference attention joins the
# lane path. One full lane tile (128) is the break-even point.
LANE_MIN_N = int(_os.environ.get("MICFORMER_LANE_MIN_N", "128"))


# A/B (round 3): LayerNorm channel stats as MXU ones-dots. Reducing the
# minor (lane) C=48 axis is a cross-lane VPU reduce at ~46 GB/s effective on
# the round-3 profile (16 standalone convert_reduce fusions per forward);
# contracting with a ones [C,1] vector instead rides the MXU at bandwidth.
# Σx is exact (bf16→f32 is exact, f32 accumulation); Σx² carries one bf16
# rounding of the square — bf16-gated, below the output quantization.
# A/B verdict: NEUTRAL (6.1072 vs 6.1035 vol/s, p50 0.1857 vs 0.1860) —
# like LN_BF16_APPLY, the LN work overlaps adjacent compute and is not on
# the critical path. Kept opt-in; the LN family is closed, do not retry.
LN_STATS_VIA_DOT = _os.environ.get("MICFORMER_LN_STATS_VIA_DOT", "0") == "1"


def apply_layer_norm(ln: nn.LayerNorm, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a flax LayerNorm over the minor C axis of a channels-last
    tensor. Flag-off or non-bf16 input: the module verbatim. With
    MICFORMER_LN_BF16_APPLY=1 on bf16 inputs: f32 stats, bf16 apply. With
    MICFORMER_LN_STATS_VIA_DOT=1 on bf16 inputs: MXU ones-dot stats, flax
    f32 normalize/scale/bias apply."""
    if LN_STATS_VIA_DOT and x.dtype == jnp.bfloat16:
        C = x.shape[-1]
        _ = ln(jnp.zeros((1, 1, C), x.dtype))  # materialize params
        p = ln.variables["params"]
        ones = jnp.ones((C, 1), jnp.bfloat16)
        s = jnp.einsum("...c,cs->...s", x, ones,
                       preferred_element_type=jnp.float32)
        x2 = jnp.square(x.astype(jnp.float32)).astype(jnp.bfloat16)
        s2 = jnp.einsum("...c,cs->...s", x2, ones,
                        preferred_element_type=jnp.float32)
        mean = s / C
        var = jnp.maximum(s2 / C - mean * mean, 0.0)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + ln.epsilon)
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        return y.astype(x.dtype)
    if not (LN_BF16_APPLY and x.dtype == jnp.bfloat16):
        return ln(x)
    _ = ln(jnp.zeros((1, 1, x.shape[-1]), x.dtype))  # materialize params
    p = ln.variables["params"]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0)
    r = (jax.lax.rsqrt(var + ln.epsilon)).astype(jnp.bfloat16)
    m = mean.astype(jnp.bfloat16)
    g = p["scale"].astype(jnp.bfloat16)
    b = p["bias"].astype(jnp.bfloat16)
    return (x - m) * r * g + b


def _dense_lane(xt: jnp.ndarray, mod: nn.Dense, dt) -> jnp.ndarray:
    """Apply a materialized nn.Dense to a lane-major [T, Cin, N] tensor as
    einsum('tcn,cf->tfn') + bias — same math as Dense on [N, T, Cin] (the
    dot contraction and dtype promotion mirror flax's), different layout."""
    params = mod.variables["params"]
    w = params["kernel"].astype(dt)
    y = jnp.einsum("tcn,cf->tfn", xt.astype(dt), w)
    if "bias" in params:
        y = y + params["bias"].astype(dt)[None, :, None]
    return y


def _lane_layer_norm(xt: jnp.ndarray, mod: nn.LayerNorm, eps: float, dt) -> jnp.ndarray:
    """flax LayerNorm over the C axis of a lane-major [T, C, N] tensor:
    f32 fast-variance stats (E[x^2]-E[x]^2, clipped at 0), f32 normalize +
    scale/bias, cast to dt — bit-matching flax's _compute_stats/_normalize."""
    params = mod.variables["params"]
    x32 = xt.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32)[None, :, None]
    y = y + params["bias"].astype(jnp.float32)[None, :, None]
    return y.astype(dt)


def pad_to_multiple(x: jnp.ndarray, multiple) -> jnp.ndarray:
    """Zero-pad spatial dims of [B, D, H, W, C] up to multiples (static)."""
    B, D, H, W, C = x.shape
    pd = (-D) % multiple[0]
    ph = (-H) % multiple[1]
    pw = (-W) % multiple[2]
    if pd or ph or pw:
        x = jnp.pad(x, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))
    return x


class Mlp(nn.Module):
    """GELU MLP, hidden = dim * ratio (MICFormer_self.py:16-34)."""

    hidden: int
    out: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (timm DropPath semantics).

    `rate` (call-time) overrides the static attribute with a traced scalar —
    used by the scan-over-blocks path, where all iterations share one
    compiled body and the per-block rate rides as a scanned input. A traced
    rate of 0.0 is exact identity (bernoulli(1.0) is all-True, x/1.0 == x).
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        if deterministic or (rate is None and self.rate == 0.0):
            return x
        keep = 1.0 - (self.rate if rate is None else rate)
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def rel_pos_bias_cached(module: nn.Module, table, window_size, T: int, h: int):
    """[h, T, T] relative-position bias, served from the `rpe_cache`
    collection when the caller passes one.

    The table gather runs [T², h] rows per biased block per call, and because
    the table is a runtime parameter XLA cannot hoist it (~2.3 ms/call across
    SwinUNETR's biased blocks on the round-4 post-WPACK profile). At
    INFERENCE the bias is constant per checkpoint: `materialize_rpe_cache`
    runs one apply with mutable=["rpe_cache"] so every biased attention
    module stores its gathered bias; subsequent applies that include the
    cache in `variables` read it instead of re-gathering.

    Training must NOT pass the cache: a cached bias is a constant, so the
    bias table would silently stop receiving gradients. In-repo callers only
    materialize on inference paths (cli/predict, benchmarks); Trainer never
    does. Reference behavior: vt_unet.py:149-168 (same gather, per call).
    """
    if module.has_variable("rpe_cache", "bias"):
        return module.get_variable("rpe_cache", "bias")
    idx = relative_position_index(window_size)[:T, :T]
    bias = table[idx.reshape(-1)].reshape(T, T, h).transpose(2, 0, 1)
    if (not module.is_initializing()) and module.is_mutable_collection("rpe_cache"):
        module.variable("rpe_cache", "bias", lambda: bias)
    return bias


def materialize_rpe_cache(model, variables, *args, **kwargs):
    """Pre-gather every relative-position bias for a fixed inference shape.

    Runs one jitted forward with mutable=["rpe_cache"] (one extra compile,
    amortized by the persistent compilation cache) and returns `variables`
    with the cache collection merged — or unchanged for models with no
    rel-pos tables. The cache is shape-specific: windows clamp to the input
    extent (`adjust_window_shift`), so materialize at the same spatial shape
    the cached variables will be applied at. INFERENCE ONLY (see
    rel_pos_bias_cached).
    """
    import jax as _jax

    _, mut = _jax.jit(
        lambda v, a: model.apply(v, *a, mutable=["rpe_cache"], **kwargs)
    )(variables, args)
    cache = mut.get("rpe_cache", {})
    if not cache:
        return variables
    return {**variables, "rpe_cache": cache}


class WindowAttention3D(nn.Module):
    """Windowed MHA over [N, T, C] token windows.

    Variants (one module, config-selected):
      - cross=False: fused qkv self-attention (vt_unet.py:126-231 /
        MICFormer_self.py:206-261 behavior).
      - cross=True: Q from `x`, K/V from `context` via separate projections
        (MICFormer_self.py:148-203; also serves nnFormer skip-KV decoders).
      - rel_pos_bias=True: learned 3D relative-position bias table
        (vt_unet.py:149-168). MicFormer's own blocks use no bias.
    """

    dim: int
    window_size: tuple
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    rel_pos_bias: bool = False
    cross: bool = False
    head_dim: int | None = None   # inner = head_dim*heads when set (SwinUnet3D)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, window_perm=None,
                 lane_layout=False):
        if lane_layout:
            # caller keeps the residual stream lane-major: x (and context)
            # are [T, C, N]; return [T, C, N].
            return self._lane_path(x, context, lane_in=True)
        N, T, C = x.shape
        h = self.num_heads
        inner = (self.head_dim * h) if self.head_dim else self.dim
        if (ATTN_LANE_PROJ and not self.rel_pos_bias and mask is None
                and window_perm is None and T <= 16 and N >= LANE_MIN_N):
            return self._lane_path(x, context, lane_in=False)
        if self.cross or context is not None:
            ctx = x if context is None else context
            q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x)
            kv = nn.Dense(2 * inner, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(ctx)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = nn.Dense(3 * inner, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        if window_perm is not None:
            # faithful SwinUnet3D shifted-window scramble (SwinUnet_3D.py:185-
            # 203): the reference's einops chain permutes the window axis of
            # the masked logits — but not the values — so window w attends
            # with window perm[w]'s q·k pattern. Replicated by permuting q, k
            # (and the caller-permuted mask) while v stays in place.
            nW = len(window_perm)
            idx = (np.arange(N // nW)[:, None] * nW + np.asarray(window_perm)).ravel()
            q, k = q[idx], k[idx]
        q, k, v = split_heads(q, h), split_heads(k, h), split_heads(v, h)

        bias = None
        if self.rel_pos_bias:
            wd, wh, ww = self.window_size
            table = self.param(
                "rel_pos_bias_table",
                nn.initializers.truncated_normal(0.02),
                ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), h),
            )
            bias = rel_pos_bias_cached(self, table, self.window_size, T, h)

        mask_arr = None if mask is None else jnp.asarray(mask)
        out = multi_head_attention(q, k, v, bias=bias, mask=mask_arr, scale=self.qk_scale)
        out = merge_heads(out)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

    def _lane_path(self, x, context, lane_in: bool):
        """Projections + attention core + output proj in lane-major layout.

        Same parameter tree as the batched path (the Dense modules are
        materialized by 1-token dummy calls, then applied as lane-major
        einsums); same accumulation dtypes and softmax math. One transpose
        per input stream in / one out (vs three per-operand moveaxis inside
        multi_head_attention's lane-major core), and every bias/elementwise
        op runs at full 128-lane width over the window axis N."""
        dt = self.dtype
        if lane_in:
            T, C, N = x.shape
            xt = x
        else:
            N, T, C = x.shape
            xt = jnp.transpose(x, (1, 2, 0))                 # [T, C, N]
        h = self.num_heads
        inner = (self.head_dim * h) if self.head_dim else self.dim
        d = inner // h
        scale = self.qk_scale if self.qk_scale is not None else d ** -0.5
        if self.cross or context is not None:
            ctx = xt if context is None else (
                context if lane_in else jnp.transpose(context, (1, 2, 0)))
            q_mod = nn.Dense(inner, use_bias=self.qkv_bias, dtype=dt, name="q")
            kv_mod = nn.Dense(2 * inner, use_bias=self.qkv_bias, dtype=dt, name="kv")
            _ = q_mod(jnp.zeros((1, 1, C), dt))
            _ = kv_mod(jnp.zeros((1, 1, ctx.shape[1]), dt))
            qt = _dense_lane(xt, q_mod, dt)                  # [Tq, F, N]
            kvt = _dense_lane(ctx, kv_mod, dt)               # [Tk, 2F, N]
            kt, vt = jnp.split(kvt, 2, axis=1)
        else:
            qkv_mod = nn.Dense(3 * inner, use_bias=self.qkv_bias, dtype=dt, name="qkv")
            _ = qkv_mod(jnp.zeros((1, 1, C), dt))
            qkvt = _dense_lane(xt, qkv_mod, dt)              # [T, 3F, N]
            qt, kt, vt = jnp.split(qkvt, 3, axis=1)
        Tq, Tk = qt.shape[0], kt.shape[0]
        acc_t = jnp.float32 if qt.dtype == jnp.float32 else qt.dtype
        q4 = (qt.astype(acc_t) * jnp.asarray(scale, acc_t)).reshape(Tq, h, d, -1)
        k4 = kt.astype(acc_t).reshape(Tk, h, d, -1)
        v4 = vt.reshape(Tk, h, d, -1)
        out = lane_major_attention_core(q4, k4, v4, acc_t)   # [Tq, h, d, N]
        out = out.reshape(Tq, inner, -1).astype(dt)
        proj_mod = nn.Dense(self.dim, dtype=dt, name="proj")
        _ = proj_mod(jnp.zeros((1, 1, inner), dt))
        yt = _dense_lane(out, proj_mod, dt)                  # [Tq, dim, N]
        return yt if lane_in else jnp.transpose(yt, (2, 0, 1))


class SwinBlock3D(nn.Module):
    """Generic (shifted-)window transformer block on [B, D, H, W, C].

    Covers: MicFormer TransformerBlock3D (no shift, no bias), VT-Unet /
    SwinUnet3D / nnFormer encoder blocks (shift + rel-pos bias). Pre-norm,
    residual + DropPath, MLP ratio 4.
    """

    dim: int
    num_heads: int
    window_size: tuple = (4, 4, 4)
    shift_size: tuple = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    rel_pos_bias: bool = False
    drop_path: float = 0.0
    dropout: float = 0.0
    head_dim: int | None = None
    swinunet_scramble: bool = False  # faithful SwinUnet3D shifted-window quirk
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, drop_rate=None):
        B, D, H, W, C = x.shape
        if (BLOCK_LANE_MAJOR and not self.rel_pos_bias
                and not self.swinunet_scramble and self.head_dim is None
                and self.dropout == 0.0):
            ws_l, ss_l = adjust_window_shift((D, H, W), self.window_size,
                                             self.shift_size)
            T_l = ws_l[0] * ws_l[1] * ws_l[2]
            if (not any(ss_l) and D % ws_l[0] == 0 and H % ws_l[1] == 0
                    and W % ws_l[2] == 0 and T_l <= 16
                    and B * (D // ws_l[0]) * (H // ws_l[1]) * (W // ws_l[2]) >= LANE_MIN_N):
                return self._lane_block(x, ws_l, deterministic, drop_rate)
        if self.swinunet_scramble:
            # the reference SwinUnet3D has no window clamp (it asserts input
            # size instead): shift + mask run even on a single-window grid
            ws, ss = tuple(self.window_size), tuple(self.shift_size)
        else:
            ws, ss = adjust_window_shift((D, H, W), self.window_size, self.shift_size)

        shortcut = x
        x = apply_layer_norm(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype), x)
        x = pad_to_multiple(x, ws)
        _, Dp, Hp, Wp, _ = x.shape

        x = cyclic_shift(x, ss)
        mask = shifted_window_region_ids((Dp, Hp, Wp), ws, ss)
        wins = window_partition(x, ws)
        perm = None
        if self.swinunet_scramble and any(ss):
            # the reference's post-mask einops relabeling flattens the shifted
            # window grid as (n_z, n_x, n_y) instead of (n_x, n_y, n_z)
            # (SwinUnet_3D.py:185-203) — a defect kept behind this flag;
            # well-defined only on a cubic window grid, like the reference.
            g = (Dp // ws[0], Hp // ws[1], Wp // ws[2])
            if g[0] == g[1] == g[2] and g[0] > 1:
                perm = np.arange(g[0] * g[1] * g[2]).reshape(g).transpose(2, 0, 1).ravel()
                if mask is not None:
                    mask = np.asarray(mask)[perm]
        attn = WindowAttention3D(
            self.dim, ws, self.num_heads, self.qkv_bias, self.qk_scale,
            rel_pos_bias=self.rel_pos_bias, head_dim=self.head_dim,
            dtype=self.dtype, name="attn",
        )(wins, mask=mask, window_perm=perm)
        x = window_reverse(attn, ws, B, Dp, Hp, Wp)
        x = cyclic_shift(x, ss, reverse=True)
        x = x[:, :D, :H, :W]

        x = shortcut + DropPath(self.drop_path)(x, deterministic, rate=drop_rate)
        y = apply_layer_norm(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype), x)
        y = Mlp(int(C * self.mlp_ratio), C, self.dropout, dtype=self.dtype)(y, deterministic)
        return x + DropPath(self.drop_path)(y, deterministic, rate=drop_rate)

    def _lane_block(self, x, ws, deterministic: bool, drop_rate=None):
        """Whole block in lane-major [T, C, N] layout (unshifted windows).

        One lattice transpose in, one out; LN / qkv / attention / proj / MLP
        and both residual adds run with the window axis N on the 128-lane
        dim. Window partition for ws=(2,2,2) is exactly the parity-bit
        split of the spatial dims, so the entry transpose IS the window
        partition — the separate partition/reverse copies of the base path
        disappear. Parameter tree identical to the base path (LayerNorm /
        attn / Mlp created in the same order with the same names)."""
        B, D, H, W, C = x.shape
        wd, wh, ww = ws
        nD, nH, nW_ = D // wd, H // wh, W // ww
        T, N = wd * wh * ww, B * nD * nH * nW_
        dt = self.dtype
        xt = x.reshape(B, nD, wd, nH, wh, nW_, ww, C)
        xt = xt.transpose(2, 4, 6, 7, 0, 1, 3, 5).reshape(T, C, N)

        ln0 = nn.LayerNorm(epsilon=1e-5, dtype=dt)
        _ = ln0(jnp.zeros((1, 1, C), dt))
        xn = _lane_layer_norm(xt, ln0, 1e-5, dt)
        at = WindowAttention3D(
            self.dim, ws, self.num_heads, self.qkv_bias, self.qk_scale,
            rel_pos_bias=False, head_dim=self.head_dim, dtype=dt, name="attn",
        )(xn, lane_layout=True)                              # [T, C, N]
        xt = xt + self._lane_drop_path(at, B, deterministic, drop_rate)

        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=dt)
        _ = ln1(jnp.zeros((1, 1, C), dt))
        yt = _lane_layer_norm(xt, ln1, 1e-5, dt)
        mlp = Mlp(int(C * self.mlp_ratio), C, self.dropout, dtype=dt)
        _ = mlp(jnp.zeros((1, 1, C), dt), True)
        params = mlp.variables["params"]
        w0, b0 = params["Dense_0"]["kernel"].astype(dt), params["Dense_0"]["bias"].astype(dt)
        w1, b1 = params["Dense_1"]["kernel"].astype(dt), params["Dense_1"]["bias"].astype(dt)
        ht = jnp.einsum("tcn,cf->tfn", yt.astype(dt), w0) + b0[None, :, None]
        ht = nn.gelu(ht, approximate=False)
        ot = jnp.einsum("tfn,fc->tcn", ht, w1) + b1[None, :, None]
        xt = xt + self._lane_drop_path(ot, B, deterministic, drop_rate)

        out = xt.reshape(wd, wh, ww, C, B, nD, nH, nW_)
        out = out.transpose(4, 5, 0, 6, 1, 7, 2, 3).reshape(B, D, H, W, C)
        return out

    def _lane_drop_path(self, xt, B: int, deterministic: bool, rate=None):
        """DropPath on a lane-major [T, C, N] residual branch: the per-sample
        mask broadcasts over N (batch-major raster), matching the base
        DropPath's (B,1,1,1,1) semantics."""
        if deterministic or (rate is None and self.drop_path == 0.0):
            return xt
        keep = 1.0 - (self.drop_path if rate is None else rate)
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (B,))
        N = xt.shape[2]
        mask_n = jnp.repeat(mask, N // B)[None, None, :]
        return jnp.where(mask_n, xt / keep, 0.0).astype(xt.dtype)


class PatchEmbed3D(nn.Module):
    """Conv patch embedding, kernel = stride = patch (MICFormer_self.py:837-878)."""

    embed_dim: int
    patch_size: tuple = (4, 4, 4)
    use_norm: bool = True
    via_dot: bool | None = None   # None = follow the EMBED_VIA_DOT global
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = nn.Conv(self.embed_dim, self.patch_size, strides=self.patch_size,
                       padding="VALID", dtype=self.dtype)
        B, D, H, W, C = x.shape
        pd, ph, pw = self.patch_size
        use_dot = EMBED_VIA_DOT if self.via_dot is None else self.via_dot
        if use_dot and D % pd == 0 and H % ph == 0 and W % pw == 0:
            # k = s = patch conv == space-to-depth + ONE MXU matmul. Same
            # param tree (the Conv is materialized by a dummy call); the
            # lax.conv form emitted ~4.6 ms/call of tiny [p,p,p,C,E]
            # weight-grad ops in the backward on the round-3 train profile.
            _ = conv(jnp.zeros((1, pd, ph, pw, C), x.dtype))
            p = conv.variables["params"]
            w = p["kernel"].reshape(pd * ph * pw * C, self.embed_dim)
            xs = x.reshape(B, D // pd, pd, H // ph, ph, W // pw, pw, C)
            xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                B, D // pd, H // ph, W // pw, pd * ph * pw * C)
            x = jnp.einsum("bdhwk,ke->bdhwe", xs.astype(self.dtype),
                           w.astype(self.dtype)) + p["bias"].astype(self.dtype)
        else:
            x = conv(x)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return x


class PatchMergingConv(nn.Module):
    """Conv downsample C->2C, k2 s2 + LN (MICFormer_self.py:527-561)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(2 * self.dim, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
                    dtype=self.dtype)(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class PatchExpandConv(nn.Module):
    """ConvTranspose upsample C->C/2, k2 s2 + LN (MICFormer_self.py:564-579)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.dim // 2, (2, 2, 2), strides=(2, 2, 2),
                             padding="VALID", dtype=self.dtype)(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class PatchMergingLinear(nn.Module):
    """Swin-style merge: 2x2x2 neighborhood concat -> LN -> Linear(8C->2C)
    (vt_unet.py:412-448)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = pad_to_multiple(x, (2, 2, 2))
        _, Dp, Hp, Wp, _ = x.shape
        x = x.reshape(B, Dp // 2, 2, Hp // 2, 2, Wp // 2, 2, C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, Dp // 2, Hp // 2, Wp // 2, 8 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype)(x)


class PatchExpandLinear(nn.Module):
    """Swin-style expand: Linear(C->2C) -> pixel-shuffle 2x -> LN on C/2
    (vt_unet.py:451-536 PatchExpand semantics, dim_scale=2)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype)(x)
        x = x.reshape(B, D, H, W, 2, 2, 2, C // 4)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, 2 * D, 2 * H, 2 * W, C // 4)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class FinalPatchExpand(nn.Module):
    """Final x4 expand (vt_unet.py FinalPatchExpand_X4): Linear(C->64C/8?) —
    implemented as Linear(C -> scale^3 * C) -> shuffle -> LN keeping C."""

    dim: int
    scale: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        s = self.scale
        x = nn.Dense(s ** 3 * C, use_bias=False, dtype=self.dtype)(x)
        x = x.reshape(B, D, H, W, s, s, s, C)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, s * D, s * H, s * W, C)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# Conv-family primitives (U-Net / MedNeXt / TransBTS / TransUNet)
# ---------------------------------------------------------------------------

# A/B (round 4): two-stage InstanceNorm statistics. XLA lowers the direct
# jnp.mean/var over (D,H,W) as a single reduce that includes the minor (lane)
# spatial dim — ~5 ms per full-resolution call on MedNeXt/SwinUNETR (the
# cross-lane reduction runs at ~27 GB/s). Reducing the non-lane dims first
# (one full-bandwidth pass to [B, W, C]) and finishing on the tiny remainder
# is exact up to f32 summation order; variance via E[x²]−μ² in f32.
IN_TWO_STAGE = _os.environ.get("MICFORMER_IN_TWO_STAGE", "1") == "1"


class InstanceNorm(nn.Module):
    """InstanceNorm3d equivalent: per-(batch, channel) normalization over
    spatial dims. torch InstanceNorm3d default: affine=False, eps=1e-5."""

    epsilon: float = 1e-5
    affine: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        if IN_TWO_STAGE and x.ndim == 5:
            n = x.shape[1] * x.shape[2] * x.shape[3]
            xf = x.astype(jnp.float32)
            s1 = jnp.sum(xf, (1, 2)).sum(1)                 # [B, C]
            s2 = jnp.sum(jnp.square(xf), (1, 2)).sum(1)     # [B, C]
            mean = (s1 / n)[:, None, None, None, :]
            var = jnp.maximum(s2 / n - jnp.square(s1 / n), 0.0)[
                :, None, None, None, :]
        else:
            mean = jnp.mean(x, axes, keepdims=True)
            var = jnp.var(x, axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            C = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (C,))
            bias = self.param("bias", nn.initializers.zeros, (C,))
            y = y * scale + bias
        return y.astype(x.dtype)


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope (torch PReLU default).

    NB: the slope field must not be named `init` — that would shadow
    flax's Module.init (caught by tests/test_layer_parity.py)."""

    neg_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(self.neg_slope), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class ConvNormAct(nn.Module):
    """Conv3d + norm + activation, the generic conv-decoder unit."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "instance"  # instance | group | layer | batch-free none
    act: str = "prelu"      # prelu | relu | gelu | leaky | none
    transpose: bool = False
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (self.kernel,) * 3
        s = (self.stride,) * 3
        if self.transpose:
            x = nn.ConvTranspose(self.features, k, strides=s, padding="SAME",
                                 dtype=self.dtype)(x)
        else:
            x = nn.Conv(self.features, k, strides=s, padding="SAME",
                        feature_group_count=self.groups, dtype=self.dtype)(x)
        if self.norm == "instance":
            x = InstanceNorm(dtype=self.dtype)(x)
        elif self.norm == "group":
            x = nn.GroupNorm(epsilon=1e-5, num_groups=min(8, self.features), dtype=self.dtype)(x)
        elif self.norm == "layer":
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if self.act == "prelu":
            x = PReLU()(x)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act == "gelu":
            x = nn.gelu(x, approximate=False)
        elif self.act == "leaky":
            x = nn.leaky_relu(x, 0.01)
        return x


# A/B WINNER (round 3, default ON; train step 161.6 -> 152.3 ms/call alone,
# 148.8 combined with LANE_MIN_N=128): consolidated backward for the
# 27-shifted-dot conv. The autodiff backward of the tap loop emits, per conv,
# 27 tiny [C,F] weight-grad partials plus 27 read-modify-writes of the full
# [B,D,H,W,C] dx accumulator (~17 ms/call across the 8 cross blocks on the
# b2/128³ train profile). With G[p, i*F+f] = g_pad[p + (2-δi), f] — one
# [B,D,H,W,27F] stack of the NARROW (F=16) output gradient — both grads
# become single MXU matmuls:  dx = G @ W_flat^T  and  dw = x^T @ G.
CONV3_STACK_BWD = _os.environ.get("MICFORMER_CONV3_STACK_BWD", "1") == "1"
# A/B (round 3): patch embedding as space-to-depth + one MXU matmul instead
# of the k=s=patch lax.conv (whose backward emits tiny [p,p,p,C,E]
# weight-grad ops). Exact same math and param tree. Verdict: SPLIT — train
# step 149.4 -> 142.2 ms/call (−4.8%) but serving bench 6.10 -> 5.90 vol/s
# (−3.4%, p50 +2.7%). Module default stays conv (the serving protocol);
# Trainer.__init__ turns it on for training unless the env var overrides.
EMBED_VIA_DOT = _os.environ.get("MICFORMER_EMBED_VIA_DOT", "0") == "1"


def _conv3_taps(xp, D, H, W):
    """The 27 shifted [B,D,H,W,C] views of a pad-1 tensor, tap-major."""
    return [xp[:, dz:dz + D, dy:dy + H, dx:dx + W, :]
            for dz in range(3) for dy in range(3) for dx in range(3)]


@jax.custom_vjp
def conv3_dots(x, w):
    """3³ SAME conv as 27 shifted matmuls: x [B,D,H,W,C] · w [27,C,F]."""
    B, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for i, patch in enumerate(_conv3_taps(xp, D, H, W)):
        term = jnp.einsum("bdhwc,cf->bdhwf", patch, w[i])
        out = term if out is None else out + term
    return out


def _conv3_dots_fwd(x, w):
    return conv3_dots(x, w), (x, w)


def _conv3_dots_bwd(res, g):
    x, w = res
    B, D, H, W, C = x.shape
    F = w.shape[-1]
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # reverse-shifted taps: dx[p] = Σ_i g_pad[p + (2-δi)] @ w[i]^T, so stack
    # tap i at slice start (2-δ) and contract once.
    slabs = [gp[:, 2 - dz:2 - dz + D, 2 - dy:2 - dy + H, 2 - dx:2 - dx + W, :]
             for dz in range(3) for dy in range(3) for dx in range(3)]
    G = jnp.concatenate(slabs, axis=-1)                      # [B,D,H,W,27F]
    w_flat = jnp.transpose(w, (0, 2, 1)).reshape(27 * F, C)  # [27F, C]
    dx = jnp.einsum("bdhwk,kc->bdhwc", G, w_flat)
    # dw[i,c,f] = Σ_p x[p,c] · G[p, i*F+f]; f32 accumulation, one rounding.
    dw_flat = jnp.einsum("bdhwk,bdhwc->kc", G, x,
                         preferred_element_type=jnp.float32)  # [27F, C]
    dw = dw_flat.reshape(27, F, C).transpose(0, 2, 1).astype(w.dtype)
    return dx.astype(x.dtype), dw


conv3_dots.defvjp(_conv3_dots_fwd, _conv3_dots_bwd)


class Conv3x3ViaDot(nn.Module):
    """3³ 'SAME' conv expressed as 27 shifted matmuls.

    Workaround for a Mosaic/XLA-on-axon compile pathology: `lax.conv` with
    small-but-not-tiny output channels (e.g. 96->16 k3 at 32³) takes 500+ s to
    compile, while the same contraction as dots compiles in seconds (measured
    2026-08-16). FLOP-equivalent; used on cold paths where C_out is small.

    kernel_layout="conv" stores the parameter in nn.Conv's (3,3,3,C,F)
    layout instead (drop-in replacement for an existing nn.Conv param tree;
    used by SwinUNETR's ResConvBlocks, round-4 perf pass).
    """

    features: int
    use_bias: bool = True
    kernel_layout: str = "taps"  # taps (27,C,F) | conv (3,3,3,C,F)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        if self.kernel_layout == "conv":
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, 3, C, self.features)).reshape(
                               27, C, self.features)
        else:
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (27, C, self.features))
        if PREPROJECT:
            # exact reformulation: project ONCE with the [C, 27·F] flattened
            # kernel, then sum the 27 tap slices at their spatial shifts. The
            # input is read once instead of 27 times (the shifted-dot form
            # rereads the full [B,D,H,W,C] operand per tap — ~680 MB per
            # stage-0 offset conv); the taps ride on the F-wide projection.
            y = jnp.einsum("bdhwc,cf->bdhwf", x.astype(self.dtype),
                           w.transpose(1, 0, 2).reshape(C, 27 * self.features)
                           .astype(self.dtype))
            yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
            out = None
            i = 0
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        # output[p] = sum_taps w_tap @ x[p + tap - 1]: tap i of
                        # the projection, shifted so slot (1,1,1) is centered
                        term = yp[:, dz:dz + D, dy:dy + H, dx:dx + W,
                                  i * self.features:(i + 1) * self.features]
                        out = term if out is None else out + term
                        i += 1
        elif CONV3_STACK_BWD:
            out = conv3_dots(x.astype(self.dtype), w.astype(self.dtype))
        else:
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
            out = None
            i = 0
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        patch = xp[:, dz:dz + D, dy:dy + H, dx:dx + W, :]
                        term = jnp.einsum("bdhwc,cf->bdhwf",
                                          patch.astype(self.dtype),
                                          w[i].astype(self.dtype))
                        out = term if out is None else out + term
                        i += 1
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,)).astype(self.dtype)
        return out


class ConvTranspose2x2ViaDot(nn.Module):
    """ConvTranspose k=s=2 'VALID' as one matmul + depth-to-space.

    Parameter tree identical to flax nn.ConvTranspose (kernel (2,2,2,C,F),
    bias (F,)). With kernel == stride the windows don't overlap, so
    out[b, 2d+i, 2h+j, 2w+l, f] = Σ_c x[b,d,h,w,c]·w[i,j,l,c,f]: one MXU
    [C, 8F] contraction then an interleave reshape — no lax.conv layout
    round-trip (round-4 SwinUNETR perf pass)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        F = self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 2, 2, C, F))
        # flax ConvTranspose applies the kernel spatially flipped
        # (lax.conv_transpose semantics) — flip here so the param is
        # bit-compatible with an nn.ConvTranspose checkpoint.
        w = w[::-1, ::-1, ::-1]
        y = jnp.einsum("bdhwc,ck->bdhwk", x.astype(self.dtype),
                       w.reshape(8, C, F).transpose(1, 0, 2)
                       .reshape(C, 8 * F).astype(self.dtype))
        y = y.reshape(B, D, H, W, 2, 2, 2, F)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, 2 * D, 2 * H, 2 * W, F)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (F,)).astype(self.dtype)
        return y


# A/B (round 4): depthwise k³ convs as shift-and-add stencils. XLA lowers
# grouped lax.conv on this backend with spatial-minor operand layouts, so a
# depthwise conv between two channel-minor matmuls costs two full-tensor
# layout copies — 45% of the MedNeXt-S forward was transpose/copy
# (benchmarks/RESULTS.md round 4). The stencil form is k³ shifted
# multiply-adds in the SAME channel-minor layout as its neighbours: no
# copies, negligible FLOPs (depthwise convs are bandwidth-, not FLOP-work).
DW_STENCIL = _os.environ.get("MICFORMER_DW_STENCIL", "1") == "1"
# A/B (round 4): stride-1 depthwise stencils as a Pallas plane-streaming
# kernel — holds the 3 contributing planes in VMEM, HBM traffic 3+1 passes
# per plane vs the XLA form's up-to-27 tap rereads (ops/pallas/dw_stencil.py).
# Verdict: LOST −8% (mednext 128³ p50 0.1411 vs 0.1305 same protocol) — the
# per-plane grid (128 steps × ~1 MB DMAs) and the dx·C=32 lane-offset slices
# cost more than the rereads XLA evidently overlaps. Opt-in; do not retry
# without packing multiple planes per grid step.
DW_PALLAS = _os.environ.get("MICFORMER_DW_PALLAS", "0") == "1"
# A/B (round 4 continuation): deferred-interleave MedNeXt up block. The up
# block's norm/expand/GELU/compress and residual add are all parity-agnostic
# (pointwise or per-channel), so the block can run in the blocked parity
# layout [B, D, H, W, 8, C] end to end and pay ONE spatial interleave at the
# COMPRESSED width instead of two (dw output at C + residual at F).
# Verdict: LOST −3.5% throughput, p50 neutral (0.1374/0.1312 base vs
# 0.1378/0.1338; 9.61/9.65 vs 9.28/9.30 w/s, ABAB rounds) — stacking the
# classes on the W-adjacent axis IS the interleave-class data movement, so
# the transposes were relocated, not removed. Kept opt-in (exact math,
# parity-tested); do not retry without changing the minor-dim tiling too.
UP_BLOCKED = _os.environ.get("MICFORMER_UP_BLOCKED", "0") == "1"


def _dw_pallas_eligible(x, k: int = 3) -> bool:
    # the Pallas plane-streaming kernel is written for k=3 (3 resident
    # planes, halo 1); larger kernels would need k planes and a k//2 halo
    # the VMEM estimate below doesn't model — route them to the stencil.
    if not DW_PALLAS or k != 3:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    # lane-packed plane [Hp, Wp·C] must fit VMEM comfortably (~2 MB each,
    # 3 planes + out + double buffering)
    B, D, H, W, C = x.shape
    h = k // 2
    plane_bytes = (H + 2 * h) * (W + 2 * h) * C * x.dtype.itemsize
    return platform not in ("cpu",) and D >= 4 and plane_bytes <= 2_500_000


def dw_conv_stencil(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
                    pad=None) -> jnp.ndarray:
    """Depthwise conv as shift-and-add: x [B,D,H,W,C] · w [k,k,k,1,C] (flax
    grouped-Conv kernel layout). `pad` is per-axis (lo, hi); default k//2.

    stride 2 routes through a parity reshape (spatial axis -> (n, 2) view,
    free: C stays minor) so every tap is a STATIC slice — a strided slice
    here lowers to a 24 ms/row-set gather on this backend (round-4 profile).
    """
    B, D, H, W, C = x.shape
    k = w.shape[0]
    if pad is None:
        p = k // 2
        pad = ((p, p),) * 3
    if stride == 2:
        return _dw_conv_stencil_s2(x, w, pad)
    xp = jnp.pad(x, ((0, 0), pad[0], pad[1], pad[2], (0, 0)))
    sizes = [dim + lo + hi - k + 1 for dim, (lo, hi) in zip((D, H, W), pad)]
    out = None
    for dz in range(k):
        for dy in range(k):
            for dx in range(k):
                sl = xp[:, dz:dz + sizes[0], dy:dy + sizes[1],
                        dx:dx + sizes[2], :]
                term = sl * w[dz, dy, dx, 0][None, None, None, None, :]
                out = term if out is None else out + term
    return out


def _dw_conv_stencil_s2(x, w, pad):
    """Stride-2 depthwise stencil via parity views.

    out[p] = Σ_t w[t]·xp[2p+t]. Pad each spatial axis to even length 2n,
    reshape to (n, 2) — a free view (channels stay minor) — and each tap t
    becomes the static slice parity[t%2][p + t//2]."""
    B, D, H, W, C = x.shape
    k = w.shape[0]
    sizes = [(dim + lo + hi - k) // 2 + 1
             for dim, (lo, hi) in zip((D, H, W), pad)]
    # pad so every tap's slice stays in range: need 2·(size-1)+k ≤ padded len,
    # rounded up to even for the parity view.
    plens = [max(2 * (s - 1) + k, dim + lo + hi)
             for s, dim, (lo, hi) in zip(sizes, (D, H, W), pad)]
    plens = [l + (l % 2) for l in plens]
    cfg = [(lo, pl - dim - lo)
           for pl, dim, (lo, hi) in zip(plens, (D, H, W), pad)]
    xp = jnp.pad(x, ((0, 0), cfg[0], cfg[1], cfg[2], (0, 0)))
    xv = xp.reshape(B, plens[0] // 2, 2, plens[1] // 2, 2, plens[2] // 2, 2, C)
    out = None
    for dz in range(k):
        for dy in range(k):
            for dx in range(k):
                sl = xv[:,
                        dz // 2:dz // 2 + sizes[0], dz % 2,
                        dy // 2:dy // 2 + sizes[1], dy % 2,
                        dx // 2:dx // 2 + sizes[2], dx % 2, :]
                term = sl * w[dz, dy, dx, 0][None, None, None, None, :]
                out = term if out is None else out + term
    return out


def parity_interleave(x6: jnp.ndarray) -> jnp.ndarray:
    """[B, D, H, W, 8, C] parity-class tensor -> [B, 2D, 2H, 2W, C].

    Class axis ordered (pz, py, px) z-major: out[b, 2d+pz, 2h+py, 2w+px, c]
    = x6[b, d, h, w, (pz, py, px), c]. The single spatial interleave
    transpose of the blocked up/space-to-depth paths."""
    B, D, H, W, P, C = x6.shape
    out = x6.reshape(B, D, H, W, 2, 2, 2, C)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return out.reshape(B, 2 * D, 2 * H, 2 * W, C)


def parity_block(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of parity_interleave: [B, 2D, 2H, 2W, C] -> [B, D, H, W, 8, C]
    (space-to-depth by 2 with the class axis kept explicit)."""
    B, D2, H2, W2, C = x.shape
    x = x.reshape(B, D2 // 2, 2, H2 // 2, 2, W2 // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, D2 // 2, H2 // 2, W2 // 2, 8, C)


def dw_transpose2_blocked(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """dw_transpose2_stencil stopped BEFORE the spatial interleave: returns
    the eight parity classes stacked as [B, D, H, W, 8, C] (class axis
    ordered (pz, py, px) z-major, matching parity_interleave)."""
    B, D, H, W, C = x.shape
    k = w.shape[0]
    lo = k // 2 + 1
    # per axis parity π, the surviving (tap, input-offset) pairs
    taps = {pi: [(t, (pi + t - lo) // 2) for t in range(k)
                 if (pi + t - lo) % 2 == 0] for pi in (0, 1)}
    off = max(-min(d for pr in taps.values() for _, d in pr), 0)
    hi = max(max(d for pr in taps.values() for _, d in pr), 0)
    xp = jnp.pad(x, ((0, 0),) + ((off, hi),) * 3 + ((0, 0),))

    classes = []
    for pz in (0, 1):
        for py in (0, 1):
            for px in (0, 1):
                acc = None
                for tz, dz in taps[pz]:
                    for ty, dy in taps[py]:
                        for tx, dx in taps[px]:
                            sl = xp[:, off + dz:off + dz + D,
                                    off + dy:off + dy + H,
                                    off + dx:off + dx + W, :]
                            term = sl * w[tz, ty, tx, 0][None, None, None,
                                                         None, :]
                            acc = term if acc is None else acc + term
                classes.append(acc)
    return jnp.stack(classes, axis=4)                   # [B,D,H,W,8,C]


def dw_transpose2_stencil(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise stride-2 transpose conv (k odd), output exactly 2L per axis
    == dw_conv_stencil(zero_dilate(x), w, pad=((p+1, p),)*3) — the MedNeXt
    up-block's fused form (blocks.py:113-147) — but computed per output
    parity class on the SMALL input: no dilated-tensor traffic, no gathers.

    out[o] = Σ_t w[t]·xd[o+t-(p+1)], xd = zero-dilated x; for o = 2q+π only
    taps with (π+t-p-1) even survive, reading x[q + (π+t-p-1)//2]."""
    return parity_interleave(dw_transpose2_blocked(x, w))


class PointwiseConv(nn.Module):
    """1³ conv as one einsum over the channel axis; parameter tree identical
    to nn.Conv(features, (1,1,1)) (kernel [1,1,1,C,F], bias [F]). Keeps the
    surrounding channel-minor layout — lax.conv would negotiate a conv
    layout and pay full-tensor copies both ways (round-4 MedNeXt profile)."""

    features: int
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, 1, C, self.features))
        if self.stride == 2:
            # parity view, not a strided slice (which lowers to a gather).
            # SAME stride-2 semantics pick indices 0,2,... giving ceil(dim/2)
            # outputs; pad odd axes by one so the even-reshape view matches
            # (the pad element sits at an odd index and is never selected).
            if (D % 2) or (H % 2) or (W % 2):
                x = jnp.pad(x, ((0, 0), (0, D % 2), (0, H % 2), (0, W % 2),
                                (0, 0)))
                B, D, H, W = x.shape[:4]
            x = x.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2,
                          C)[:, :, 0, :, 0, :, 0, :]
        y = jnp.einsum("bdhwc,cf->bdhwf", x.astype(self.dtype),
                       w[0, 0, 0].astype(self.dtype))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,)).astype(self.dtype)
        return y


class PointwiseTranspose2(nn.Module):
    """1³ conv over a lead-padded zero-dilated input (the MedNeXt up-block
    residual, blocks.py:137-146 default form), computed as one matmul on the
    SMALL input + a parity interleave: out[2q+1] = W·x[q]+b on the all-odd
    parity class, bias everywhere else. Param tree == nn.Conv((1,1,1)).

    blocked_out=True returns the [B, D, H, W, 8, F] parity-class stack
    (parity_interleave ordering) instead of interleaving — the deferred-
    interleave up-block path adds it to the main branch and interleaves once."""

    features: int
    blocked_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        F = self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, 1, C, F))
        b = self.param("bias", nn.initializers.zeros, (F,)).astype(self.dtype)
        y = jnp.einsum("bdhwc,cf->bdhwf", x.astype(self.dtype),
                       w[0, 0, 0].astype(self.dtype)) + b
        bias_field = jnp.broadcast_to(b, (B, D, H, W, F))
        classes = [bias_field] * 7 + [y]          # (0,0,0)..(1,1,0), (1,1,1)
        out = jnp.stack(classes, axis=4)          # [B,D,H,W,8,F]
        if self.blocked_out:
            return out
        return parity_interleave(out)


class DepthwiseConv3D(nn.Module):
    """Depthwise k³ conv with an nn.Conv(feature_group_count=C)-identical
    parameter tree (kernel [k,k,k,1,C], bias [C]) but stencil lowering."""

    features: int
    kernel: int = 3
    stride: int = 1          # 1 | 2; ignored when transpose2
    pad: tuple | None = None
    transpose2: bool = False  # stride-2 transpose conv (2x upsample)
    blocked_out: bool = False  # transpose2: return [B,D,H,W,8,C] classes
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        assert C == self.features, "depthwise: features must equal input C"
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, k, 1, C))
        if self.transpose2 and self.blocked_out:
            out = dw_transpose2_blocked(x.astype(self.dtype),
                                        w.astype(self.dtype))
        elif self.transpose2:
            out = dw_transpose2_stencil(x.astype(self.dtype),
                                        w.astype(self.dtype))
        elif (self.stride == 1 and self.pad is None
              and _dw_pallas_eligible(x, k)):
            from micformer_tpu.ops.pallas.dw_stencil import dw_conv3_pallas

            out = dw_conv3_pallas(x.astype(self.dtype), w.astype(self.dtype))
        else:
            out = dw_conv_stencil(x.astype(self.dtype), w.astype(self.dtype),
                                  self.stride, self.pad)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (C,)).astype(self.dtype)
        return out


def zero_dilate(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Insert factor-1 zeros between spatial elements of [B, D, H, W, C].

    Output spatial size = factor*S - (factor-1). Composing with a (grouped)
    conv reproduces a stride-`factor` transpose conv — used where flax's
    ConvTranspose lacks feature_group_count (depthwise transpose convs)."""
    cfg = [(0, 0, 0)] + [(0, 0, factor - 1)] * 3 + [(0, 0, 0)]
    return jax.lax.pad(x, jnp.zeros((), x.dtype), cfg)


def to_channels_last(x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, D, H, W] -> [B, D, H, W, C] (reference API boundary)."""
    return jnp.moveaxis(x, 1, -1)


def to_channels_first(x: jnp.ndarray) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B, C, D, H, W]."""
    return jnp.moveaxis(x, -1, 1)
