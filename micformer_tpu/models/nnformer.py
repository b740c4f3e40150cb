"""nnFormer — interleaved conv/transformer U-shape with skip-KV decoder blocks.

Behavioral parity with reference nnFormer/nnformer/nnFormer_tumor.py (studied,
not translated):
  - PatchEmbed (:663-700): two `project` conv stems (conv k3 s2 + GELU +
    channel-LN + conv k3 s1 [+ GELU + LN except last]), then optional LN.
  - Encoder (:703-801): 4 stages of (reg, shifted) Swin blocks with rel-pos
    bias and per-stage window size (MM-WHS: [4,4,8,4]); PatchMerging =
    GELU -> LN -> Conv k3 s2 (C->2C) (:401-422); per-stage LN'd outputs are
    the skips.
  - Decoder (:804-871): 3 stages; Patch_Expanding = LN -> ConvTranspose k2 s2
    (:424-447); ADDITIVE skip (x = up + skip, :589-592); first block is
    SwinTransformerBlock_kv — K/V projected from the skip, Q = the (normed)
    upsampled features with NO q projection (:199-231,92-155); remaining
    blocks are regular SHIFTED Swin blocks; decoder windows/heads are the
    encoder's reversed ([8,4,4] / [24,12,6]).
  - Heads (:873-886,930-960): final_patch_expanding = ConvTranspose k=s=patch
    (dim->classes); deep supervision applies one per decoder stage (reversed),
    MM-WHS runs deep_supervision=False (train_mmwhs_noPad.py:92-98).
  - MM-WHS config: crop 128³, embed 96, in 2, heads [3,6,12,24], patch 4³.

Deviation (documented): WindowAttention_kv's relative-position index uses a
scrambled mixed radix (`*= 3*ws[1]-1` / `*= 2*ws[1]-1`, :184-186) that
collapses some displacement pairs; we use the standard 3D Swin index
(ops/windows.relative_position_index) — same table shape, bijective lookup.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.models.layers import (
    Mlp,
    DropPath,
    SwinBlock3D,
    rel_pos_bias_cached,
    pad_to_multiple,
    to_channels_last,
    to_channels_first,
)
from micformer_tpu.ops.windows import (
    window_partition,
    window_reverse,
    relative_position_index,
    adjust_window_shift,
)
from micformer_tpu.ops.attention import multi_head_attention, split_heads, merge_heads
from micformer_tpu import registry


class ConvStem(nn.Module):
    """`project` (:629-660): conv k3 (stride s) + GELU + LN + conv k3 s1
    [+ GELU + LN unless last]."""

    features: int
    stride: int
    last: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3, 3), strides=(self.stride,) * 3,
                    padding=1, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Conv(self.features, (3, 3, 3), padding=1, dtype=self.dtype)(x)
        if not self.last:
            x = nn.gelu(x, approximate=False)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return x


class SkipKVBlock(nn.Module):
    """SwinTransformerBlock_kv (:62-155): shortcut = up+skip; attention with
    K/V <- Dense(2C) of LN(skip), Q <- LN(x_up) raw (no projection), rel-pos
    bias; unshifted; then MLP."""

    dim: int
    num_heads: int
    window_size: tuple
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, x_up, deterministic: bool = True):
        B, D, H, W, C = x.shape
        ws = adjust_window_shift((D, H, W), self.window_size)

        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        sk = pad_to_multiple(norm1(skip), ws)
        up = pad_to_multiple(norm1(x_up), ws)
        _, Dp, Hp, Wp, _ = sk.shape

        sk_w = window_partition(sk, ws)
        up_w = window_partition(up, ws)
        h = self.num_heads
        kv = nn.Dense(2 * self.dim, dtype=self.dtype, name="kv")(sk_w)
        k, v = (split_heads(t, h) for t in jnp.split(kv, 2, axis=-1))
        q = split_heads(up_w, h)

        T = ws[0] * ws[1] * ws[2]
        wd, wh, ww = ws
        table = self.param("rel_pos_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), h))
        bias = rel_pos_bias_cached(self, table, ws, T, h)

        out = multi_head_attention(q, k, v, bias=bias)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(merge_heads(out))
        out = window_reverse(out, ws, B, Dp, Hp, Wp)[:, :D, :H, :W]

        x = x + DropPath(self.drop_path)(out, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(4 * C, C, dtype=self.dtype, name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path)(y, deterministic)


class NnFormer(nn.Module):
    num_classes: int = 8
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_sizes: Sequence[int] = (4, 4, 8, 4)
    patch_size: tuple = (4, 4, 4)
    drop_path_rate: float = 0.2
    deep_supervision: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = to_channels_last(x)
        E = self.embed_dim
        # two-stage conv patch embed (stride patch/2 each) + LN
        x = ConvStem(E // 2, self.patch_size[0] // 2, dtype=self.dtype, name="stem1")(x)
        x = ConvStem(E, self.patch_size[0] // 2, last=True, dtype=self.dtype, name="stem2")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        n = len(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        skips = []
        for i in range(n):
            dim = E * 2 ** i
            ws = (self.window_sizes[i],) * 3
            for b in range(self.depths[i]):
                x = SwinBlock3D(dim, self.num_heads[i], ws,
                                tuple(w // 2 for w in ws) if b % 2 else (0, 0, 0),
                                rel_pos_bias=True,
                                drop_path=dpr[sum(self.depths[:i]) + b],
                                dtype=self.dtype, name=f"enc{i}_b{b}")(x, deterministic)
            skips.append(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"skip_norm{i}")(x))
            if i < n - 1:
                # PatchMerging (:401-422): GELU -> LN -> conv k3 s2
                x = nn.gelu(x, approximate=False)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"merge_norm{i}")(x)
                x = nn.Conv(2 * dim, (3, 3, 3), strides=(2, 2, 2), padding=1,
                            dtype=self.dtype, name=f"merge{i}")(x)

        x = skips[-1]
        dec_ws = list(self.window_sizes[::-1][1:])   # [8, 4, 4] for MM-WHS
        dec_heads = list(self.num_heads[::-1][:-1])  # [24, 12, 6]
        dec_depths = list(self.depths[::-1][1:])     # [2, 2, 2]
        outs = []
        for s in range(n - 1):
            i = n - 2 - s  # target encoder stage (2, 1, 0)
            dim = E * 2 ** i
            # Patch_Expanding: LN -> ConvTranspose k2 s2 (2C -> C)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"up_norm{s}")(x)
            x = nn.ConvTranspose(dim, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
                                 dtype=self.dtype, name=f"up{s}")(x)
            x_up = x
            x = x + skips[i]
            ws = (dec_ws[s],) * 3
            x = SkipKVBlock(dim, dec_heads[s], ws,
                            drop_path=dpr[0], dtype=self.dtype,
                            name=f"dec{s}_kv")(x, skips[i], x_up, deterministic)
            for b in range(1, dec_depths[s]):
                x = SwinBlock3D(dim, dec_heads[s], ws, tuple(w // 2 for w in ws),
                                rel_pos_bias=True, drop_path=dpr[b],
                                dtype=self.dtype, name=f"dec{s}_b{b}")(x, deterministic)
            outs.append(x)

        def head(feat, name):
            # final_patch_expanding: dilate+conv == ConvTranspose k=s=patch
            p = self.patch_size
            return nn.ConvTranspose(self.num_classes, p, strides=p, padding="VALID",
                                    dtype=self.dtype, name=name)(feat)

        if self.deep_supervision:
            # highest resolution first — the order MultipleOutputLoss2's
            # 2^-i weights assume (tested in tests/test_losses_extended.py)
            return [to_channels_first(head(outs[-1 - j], f"head{j}")).astype(jnp.float32)
                    for j in range(len(outs))]
        logits = head(outs[-1], "head0")
        return to_channels_first(logits).astype(jnp.float32)


@registry.register("nnformer", num_classes=8, embed_dim=96)
def build_nnformer(**kw):
    return NnFormer(**kw)


@registry.register("nnformer_singlemodal", num_classes=8, embed_dim=96)
def build_nnformer_sm(**kw):
    """SingleModal_nnformer parity: same model, 1-channel CT-only input
    (SingleModal_nnformer/train_mmwhs_noPad.py:94) — channel count comes from
    the data, the model is input-channel agnostic (conv stem infers C)."""
    return NnFormer(**kw)
