"""VT-UNet — volumetric Swin U-shape with encoder-KV decoder cross-attention.

Behavioral parity with reference VT-Unet/vtunet/vt_unet.py (+ the
vision_transformer.py VTUNet wrapper), studied not translated:
  - WindowAttention3D (:126-231): fused qkv, 3D relative-position bias table
    (:149-168 — our ops.windows.relative_position_index builds the same
    mixed-radix index); decoder mode additionally attends q against the
    encoder's saved prev_k/prev_v with the SAME rel-pos bias and mask and the
    SAME output projection; returns (x, x2, v, k, q).
  - SwinTransformerBlock3D (:272-409): pre-norm, pad-to-window, cyclic shift
    (odd blocks, shift = ws//2), residual+DropPath, MLP; decoder fusion
    x = (1-α)·x_sa + α·x_ca + MLP(norm2(FPE)) with α = 0.5 (:381-409). Note
    the reference's FPE(x) returns the sinusoidal ENCODING ONLY (not x + PE),
    so the third term is a learned transform of a constant — kept faithfully
    (ops/pe.py, computed at trace time).
  - encoder BasicLayer (:641-735): per stage the LAST even block's (v,k,q)
    and LAST odd block's (v,k,q) are saved; decoder BasicLayer_up (:538-621)
    alternates prev_1 / prev_2 across its blocks.
  - topology (:782-1000): patch-embed 4³ + LN, encoder dims E·2^i with
    depths (2,2,2,1), heads (3,6,12,24), window 7³, drop-path 0→0.1;
    decoder: bottleneck PatchExpand, stages with skip-concat +
    Linear(2C→C, no bias), final LN + FinalPatchExpand_X4 + 1³ conv (no bias).
  - MM-WHS config (configs/vt_unet_base.yaml): embed 96, window 7 -> stage
    grids pad 32³→35³ etc. at trace time.

Deliberate deviation (documented): the reference's PatchMerging/PatchExpand
are 2D-Swin ports that halve only H/W and re-shape D through hard-coded
view(B, 32/D*8, ...) hacks (:412-536). Here merging/expansion are true 3D
(8-neighborhood concat -> Linear(8C→2C); Linear(C→2C) -> 2³ pixel shuffle),
matching the VT-UNet paper's intent and giving isotropic stage grids.

`faithful_2d_merge=True` (round-4) reproduces the reference semantics
exactly instead — H/W-only merge/expand with the reference's channel-block
ordering, anisotropic stage grids (D stays at 32 while H,W walk 32→4) —
which is what the hard-coded views compute for the 128³/patch-4 config;
this mode carries full-model torch transplant parity
(tests/test_torch_parity.py, docs/PARITY.md).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.models.layers import (
    Mlp,
    DropPath,
    PatchEmbed3D,
    PatchMergingLinear,
    PatchExpandLinear,
    FinalPatchExpand,
    rel_pos_bias_cached,
    pad_to_multiple,
    to_channels_last,
    to_channels_first,
)
from micformer_tpu.ops.windows import (
    window_partition,
    window_reverse,
    shifted_window_region_ids,
    relative_position_index,
    adjust_window_shift,
    cyclic_shift,
)
from micformer_tpu.ops.attention import multi_head_attention, split_heads, merge_heads
from micformer_tpu.ops.pe import sinusoidal_pe_3d
from micformer_tpu import registry


class PatchMerging2D(nn.Module):
    """Faithful reference merge (vt_unet.py:412-448): halves H,W ONLY —
    4-concat [(h0,w0),(h1,w0),(h0,w1),(h1,w1)] -> LayerNorm(4C) ->
    Linear(4C->2C, no bias). The reference's torch F.pad branch never fires
    on the MM-WHS grids (all even)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class PatchExpand2D(nn.Module):
    """Faithful reference expand (vt_unet.py:451-506 PatchExpand /
    PatchExpand_Up — identical math for the MM-WHS config, where the
    hard-coded view(B, 32 | D*8, H, W, ·) equals the actual token count):
    Linear(C->2C, no bias) -> H/W-only pixel shuffle with (p1, p2, c)
    channel blocks -> LayerNorm(C/2)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="expand")(x)
        c = (2 * C) // 4
        x = x.reshape(B, D, H, W, 2, 2, c)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, D, 2 * H, 2 * W, c)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class VTWindowAttention(nn.Module):
    """Fused-qkv windowed MHA with rel-pos bias; optional decoder cross path
    against saved (prev_k, prev_v). Returns (x, x2, v, k, q)."""

    dim: int
    window_size: tuple
    num_heads: int
    qkv_bias: bool = True
    # the CONSTRUCTION window: the reference sizes its rel-pos table for the
    # ctor window (7,7,7) and, when the runtime window is clamped to the grid,
    # still slices the FULL-window index [:T,:T] (vt_unet.py:165-167,191-194)
    # — the bias rows are then mixed-radix-inconsistent with the clamped
    # window, a defect kept faithfully (weights were trained with it).
    table_window: tuple | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, prev_v=None, prev_k=None, is_decoder=False):
        N, T, C = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = (split_heads(t, h) for t in jnp.split(qkv, 3, axis=-1))

        wd, wh, ww = self.table_window or self.window_size
        table = self.param(
            "rel_pos_bias_table", nn.initializers.truncated_normal(0.02),
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), h))
        bias = rel_pos_bias_cached(
            self, table, self.table_window or self.window_size, T, h)

        proj = nn.Dense(self.dim, dtype=self.dtype, name="proj")
        m = None if mask is None else jnp.asarray(mask)
        out = proj(merge_heads(multi_head_attention(q, k, v, bias=bias, mask=m)))
        out2 = None
        if is_decoder:
            # reference quirk kept faithfully: the decoder re-applies
            # `q = q * self.scale` on the ALREADY-scaled q before the cross
            # logits (vt_unet.py:213-214), so cross-attention runs at scale
            # head_dim^-1 instead of head_dim^-0.5 — the weights were trained
            # with it (caught by the block transplant parity test).
            d = q.shape[-1]
            out2 = proj(merge_heads(multi_head_attention(
                q, prev_k, prev_v, bias=bias, mask=m, scale=float(d) ** -1.0)))
        return out, out2, v, k, q


class VTBlock(nn.Module):
    """SwinTransformerBlock3D with optional decoder α-fusion."""

    dim: int
    num_heads: int
    window_size: tuple = (7, 7, 7)
    shift: bool = False
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    alpha: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, prev_v=None, prev_k=None, is_decoder=False,
                 deterministic=True):
        B, D, H, W, C = x.shape
        base_shift = tuple(w // 2 for w in self.window_size) if self.shift else (0, 0, 0)
        ws, ss = adjust_window_shift((D, H, W), self.window_size, base_shift)

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        xn = pad_to_multiple(xn, ws)
        _, Dp, Hp, Wp, _ = xn.shape
        xn = cyclic_shift(xn, ss)
        mask = shifted_window_region_ids((Dp, Hp, Wp), ws, ss)
        wins = window_partition(xn, ws)

        attn, attn2, v, k, q = VTWindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias,
            table_window=tuple(self.window_size), dtype=self.dtype,
            name="attn")(wins, mask=mask, prev_v=prev_v, prev_k=prev_k,
                         is_decoder=is_decoder)

        def unwindow(a):
            y = window_reverse(a, ws, B, Dp, Hp, Wp)
            y = cyclic_shift(y, ss, reverse=True)
            return y[:, :D, :H, :W]

        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        mlp = Mlp(int(C * self.mlp_ratio), C, dtype=self.dtype, name="mlp")
        dp = DropPath(self.drop_path)

        x_sa = shortcut + dp(unwindow(attn), deterministic)
        x_sa = x_sa + dp(mlp(norm2(x_sa), deterministic), deterministic)

        if is_decoder and attn2 is not None:
            x_ca = shortcut + dp(unwindow(attn2), deterministic)
            x_ca = x_ca + dp(mlp(norm2(x_ca), deterministic), deterministic)
            pe = jnp.asarray(sinusoidal_pe_3d(D, H, W, C))[None]
            fuse = (1 - self.alpha) * x_sa + self.alpha * x_ca
            x_out = fuse + mlp(norm2(pe.astype(x_sa.dtype)), deterministic)
        else:
            x_out = x_sa
        return x_out, v, k, q


class VTUNet(nn.Module):
    num_classes: int = 8
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 1)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: tuple = (7, 7, 7)
    patch_size: tuple = (4, 4, 4)
    drop_path_rate: float = 0.1
    faithful_2d_merge: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        Merge = PatchMerging2D if self.faithful_2d_merge else PatchMergingLinear
        Expand = PatchExpand2D if self.faithful_2d_merge else PatchExpandLinear
        x = to_channels_last(x)
        x = PatchEmbed3D(self.embed_dim, self.patch_size, use_norm=True,
                         dtype=self.dtype, name="patch_embed")(x)
        n = len(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        skips, kv1, kv2 = [], [], []
        for i in range(n):
            dim = self.embed_dim * 2 ** i
            skips.append(x)
            s_kv1 = s_kv2 = (None, None)
            for b in range(self.depths[i]):
                blk = VTBlock(dim, self.num_heads[i], self.window_size,
                              shift=(b % 2 == 1),
                              drop_path=dpr[sum(self.depths[:i]) + b],
                              dtype=self.dtype, name=f"enc{i}_b{b}")
                x, v, k, q = blk(x, deterministic=deterministic)
                if b % 2 == 0:
                    s_kv1 = (v, k)
                else:
                    s_kv2 = (v, k)
            kv1.append(s_kv1)
            kv2.append(s_kv2)
            if i < n - 1:
                x = Merge(dim, dtype=self.dtype, name=f"merge{i}")(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

        # decoder: bottleneck expand, then stages with skip concat + cross-KV
        x = Expand(self.embed_dim * 2 ** (n - 1), dtype=self.dtype,
                   name="up0")(x)
        for inx in range(1, n):
            i = n - 1 - inx  # matching encoder stage
            dim = self.embed_dim * 2 ** i
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                         name=f"concat_back{inx}")(x)
            for b in range(self.depths[i]):
                pv, pk = kv1[i] if b % 2 == 0 else kv2[i]
                blk = VTBlock(dim, self.num_heads[i], self.window_size,
                              shift=(b % 2 == 1),
                              drop_path=dpr[sum(self.depths[:i]) + b],
                              dtype=self.dtype, name=f"dec{inx}_b{b}")
                x, _, _, _ = blk(x, prev_v=pv, prev_k=pk, is_decoder=True,
                                 deterministic=deterministic)
            if inx < n - 1:
                x = Expand(dim, dtype=self.dtype, name=f"up{inx}")(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_up")(x)
        x = FinalPatchExpand(self.embed_dim, scale=self.patch_size[0],
                             dtype=self.dtype, name="final_expand")(x)
        x = nn.Conv(self.num_classes, (1, 1, 1), use_bias=False,
                    dtype=self.dtype, name="head")(x)
        return to_channels_first(x).astype(jnp.float32)


@registry.register("vtunet", num_classes=8, embed_dim=96)
def build_vtunet(**kw):
    return VTUNet(**kw)
