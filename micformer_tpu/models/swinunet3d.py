"""SwinUnet3D — conv-gated Swin U-shape.

Behavioral parity with reference SwinUnet/SwinUnet_3DV1/SwinUnet_3D.py
(studied, not translated):
  - stages (:325-398): PatchMerging3D conv k=s=dsf + channel-Norm (:254-265),
    then a GATED ConvBlock x2 path net(x)*x with grouped k3 convs (:305-322),
    then (regular, shifted) Swin block pairs channels-last, then x + conv(x)
    fusion.
  - WindowAttention3D (:114-214): fused qkv (no bias), inner dim =
    heads*head_dim (head_dim=32 default), scale head_dim^-0.5; the
    relative-position embedding is COMMENTED OUT in the reference, so
    rel_pos_bias=False here too (flag kept); shifted masks equal the standard
    Swin region mask (the reference's per-axis x/y/z masks are its
    decomposition).
  - decoder (:362-398): PatchExpand3D transpose conv + Norm, gated ConvBlock,
    swin pairs; Converge = add + Norm (:400-417).
  - final: ConvTranspose k4 s4 + Norm + PReLU -> 1³ conv head (:286-302,478).
  - MM-WHS config (SwinUnet/train_mmwhs_noPad.py:92-94): in 2, hidden 96,
    layers (2,2,4,2), window 4, dsf (4,2,2,2), num_classes 8.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.models.layers import (
    SwinBlock3D,
    PReLU,
    to_channels_last,
    to_channels_first,
)
from micformer_tpu import registry


class ChannelNorm(nn.Module):
    """Reference `Norm` (:235-251): LayerNorm over the channel dim."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class GatedConvBlock(nn.Module):
    """ConvBlock (:305-322): two grouped k3 conv+Norm+PReLU, output net(x)*x."""

    features: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3, 3), padding=1,
                    feature_group_count=self.groups, dtype=self.dtype)(x)
        h = ChannelNorm(dtype=self.dtype)(h)
        h = PReLU()(h)
        h = nn.Conv(self.features, (3, 3, 3), padding=1,
                    feature_group_count=self.groups, dtype=self.dtype)(h)
        h = ChannelNorm(dtype=self.dtype)(h)
        h = PReLU()(h)
        return h * x


class SwinStage(nn.Module):
    """Down- or up-scaling stage: resample -> gated conv path + swin pairs -> add.

    pure=True is the SwinUnet3D_pure_Transformer.py sibling (:257-312): the
    conv resamples become LINEAR patch merge (dsf³-neighborhood concat ->
    Linear) / expand (Linear -> pixel shuffle), and the gated conv path is
    dropped entirely — stages are attention-only."""

    features: int
    layers: int
    factor: int
    num_heads: int
    head_dim: int
    window_size: int
    up: bool = False
    pure: bool = False
    faithful_scramble: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = (self.factor,) * 3
        s = self.factor
        if self.pure and self.up:
            # Linear(C -> usf^3*out) + pixel shuffle, '(fac1 fac2 fac3 c)'
            # split order (pure_Transformer.py:276-283)
            B, D, H, W, _ = x.shape
            h0 = nn.Dense(s ** 3 * self.features, dtype=self.dtype,
                          name="expand")(x)
            h0 = h0.reshape(B, D, H, W, s, s, s, self.features)
            h0 = h0.transpose(0, 1, 4, 2, 5, 3, 6, 7)
            x = h0.reshape(B, D * s, H * s, W * s, self.features)
        elif self.pure:
            # dsf^3-neighborhood concat ('(dsf_h dsf_w dsf_d c)', c fastest)
            # -> Linear (pure_Transformer.py:257-264)
            B, D, H, W, C = x.shape
            h0 = x.reshape(B, D // s, s, H // s, s, W // s, s, C)
            h0 = h0.transpose(0, 1, 3, 5, 2, 4, 6, 7)
            h0 = h0.reshape(B, D // s, H // s, W // s, s ** 3 * C)
            x = nn.Dense(self.features, dtype=self.dtype, name="merge")(h0)
        elif self.up:
            x = nn.ConvTranspose(self.features, f, strides=f, padding="VALID",
                                 dtype=self.dtype, name="expand")(x)
        else:
            x = nn.Conv(self.features, f, strides=f, padding="VALID",
                        dtype=self.dtype, name="merge")(x)
        x = ChannelNorm(dtype=self.dtype)(x)

        conv_path = None
        if not self.pure:
            conv_path = GatedConvBlock(self.features, self.features,
                                       dtype=self.dtype, name="conv_block")(x)
        ws = (self.window_size,) * 3
        h = x
        for i in range(self.layers // 2):
            h = SwinBlock3D(self.features, self.num_heads, ws, (0, 0, 0),
                            qkv_bias=False, head_dim=self.head_dim,
                            dtype=self.dtype, name=f"swin{i}_reg")(h, deterministic)
            h = SwinBlock3D(self.features, self.num_heads, ws,
                            tuple(w // 2 for w in ws), qkv_bias=False,
                            head_dim=self.head_dim,
                            swinunet_scramble=self.faithful_scramble,
                            dtype=self.dtype,
                            name=f"swin{i}_shift")(h, deterministic)
        return h if conv_path is None else h + conv_path


class SwinUnet3D(nn.Module):
    num_classes: int = 8
    hidden_dim: int = 96
    layers: Sequence[int] = (2, 2, 4, 2)
    heads: Sequence[int] = (3, 6, 9, 12)
    head_dim: int = 32
    window_size: int = 4
    downscaling_factors: Sequence[int] = (4, 2, 2, 2)
    stl_channels: int = 32
    # Reference defect kept switchable (SwinUnet_3D.py:185-203): the shifted
    # blocks' post-mask einops relabeling permutes the window grid as
    # (n_z, n_x, n_y), pairing each window's masked q·k logits with another
    # window's values. Default False (correct Swin behavior); True reproduces
    # the reference bit-for-bit (used by the transplant parity test).
    faithful_scramble: bool = False
    # pure=True: the SwinUnet3D_pure_Transformer.py sibling — linear patch
    # merge/expand, no gated conv paths, linear final expand.
    pure: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = to_channels_last(x)
        hd = self.hidden_dim
        dsf = self.downscaling_factors
        common = dict(head_dim=self.head_dim, window_size=self.window_size,
                      faithful_scramble=self.faithful_scramble,
                      pure=self.pure, dtype=self.dtype)

        d1 = SwinStage(hd, self.layers[0], dsf[0], self.heads[0],
                       name="down12", **common)(x, deterministic)
        d2 = SwinStage(hd * 2, self.layers[1], dsf[1], self.heads[1],
                       name="down3", **common)(d1, deterministic)
        d3 = SwinStage(hd * 4, self.layers[2], dsf[2], self.heads[2],
                       name="down4", **common)(d2, deterministic)
        feat = SwinStage(hd * 8, self.layers[3], dsf[3], self.heads[3],
                         name="features", **common)(d3, deterministic)

        u4 = SwinStage(hd * 4, self.layers[2], dsf[3], self.heads[2], up=True,
                       name="up4", **common)(feat, deterministic)
        u4 = ChannelNorm(dtype=self.dtype, name="converge4")(u4 + d3)
        u3 = SwinStage(hd * 2, self.layers[1], dsf[2], self.heads[1], up=True,
                       name="up3", **common)(u4, deterministic)
        u3 = ChannelNorm(dtype=self.dtype, name="converge3")(u3 + d2)
        u12 = SwinStage(hd, self.layers[0], dsf[1], self.heads[0], up=True,
                        name="up12", **common)(u3, deterministic)
        u12 = ChannelNorm(dtype=self.dtype, name="converge12")(u12 + d1)

        f = (dsf[0],) * 3
        if self.pure:
            s = dsf[0]
            B, D, H, W, _ = u12.shape
            out = nn.Dense(s ** 3 * self.stl_channels, dtype=self.dtype,
                           name="final_expand")(u12)
            out = out.reshape(B, D, H, W, s, s, s, self.stl_channels)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
            out = out.reshape(B, D * s, H * s, W * s, self.stl_channels)
        else:
            out = nn.ConvTranspose(self.stl_channels, f, strides=f, padding="VALID",
                                   dtype=self.dtype, name="final_expand")(u12)
        out = ChannelNorm(dtype=self.dtype)(out)
        out = PReLU()(out)
        out = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="head")(out)
        return to_channels_first(out).astype(jnp.float32)


@registry.register("swinunet3d", num_classes=8)
def build_swinunet3d(**kw):
    return SwinUnet3D(**kw)


@registry.register("swinunet3d_pure", num_classes=8)
def build_swinunet3d_pure(**kw):
    """SwinUnet3D_pure_Transformer.py sibling (528 LoC variant): attention-
    only stages with linear patch merge/expand."""
    kw.setdefault("pure", True)
    return SwinUnet3D(**kw)
