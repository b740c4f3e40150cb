"""SwinUNETR — Swin transformer encoder + residual conv UNETR decoder.

Functional equivalent of the reference's MONAI usage
(SwinUnter/train_mmwhs_noPad.py:92-93):
  SwinUNETR(img_size=(128,128,128), in_channels=2, out_channels=8,
            depths=(2,4,2,2), num_heads=[2,4,8,12], feature_size=12)
MONAI SwinUNETR structure (capability surface, re-implemented):
  - SwinViT: patch embed k=s=2 -> feature_size channels; 4 stages of
    (regular, shifted) window-7 blocks with rel-pos bias, linear PatchMerging
    between stages; hidden states after embed + each stage are tapped.
  - encoder1..4 + bottleneck: UnetrBasicBlock = residual double
    (conv3 + InstanceNorm + LeakyReLU) on input / hidden states.
  - decoder5..1: transpose-conv 2x up + skip concat + UnetrBasicBlock.
  - out: 1³ conv head.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

import os as _os

from micformer_tpu.models.layers import (
    SwinBlock3D,
    PatchEmbed3D,
    PatchMergingLinear,
    InstanceNorm,
    Conv3x3ViaDot,
    ConvTranspose2x2ViaDot,
    PointwiseConv,
    to_channels_last,
    to_channels_first,
)
from micformer_tpu import registry

# A/B (round 4): the UNETR conv path (ResConvBlocks at full/half resolution
# with 12-24 channels) as shifted-dot convs + depth-to-space transpose convs,
# param-tree bit-compatible with the nn.Conv/nn.ConvTranspose forms.
# Verdict: SPLIT — p50 0.1180 -> 0.1088 (fewer dispatches) but pipelined
# device throughput 14.80 -> 12.51 w/s (the 27 tap rereads cost more than
# the conv layout copies they remove at C=12). Default OFF: the zoo serving
# metric is device throughput. Opt-in for latency-sensitive single calls.
RESCONV_VIA_DOT = _os.environ.get("MICFORMER_RESCONV_VIA_DOT", "0") == "1"
# W-axis channel packing for the UNETR conv path (round-4 continuation,
# default ON). The full/half-resolution ResConvBlocks run at C=12-24, so every
# tensor tiles T(8,128) with 12-24/128 lanes live — ~30 of SwinUNETR's
# ~62 ms/call device time sat in this lane-starved elementwise/IN/layout class
# while the window attention cost 1.3 ms. Packing S consecutive W positions
# into channels ([B,D,H,W,C] -> [B,D,H,W/S,S·C], a pure reshape) makes the
# minor dim ~96-128; k3 convs become banded [S·Ci, S·Co] matmuls + skinny edge
# terms (ops/wpack.py). Exact reformulation, nn.Conv-identical param trees.
# TPU A/B (ABAB subprocess pairs, 128³ b1 bf16): p50 0.0878 -> 0.0608 s,
# 15.6 -> 27.8 w/s (+78%) — WON; see benchmarks/RESULTS.md round-4 trail.
WPACK = _os.environ.get("MICFORMER_WPACK", "1") == "1"


def _slots(W: int, C: int) -> int:
    """Largest power-of-2 slot count S with S·C <= 128, S | W, S <= 8."""
    S = 1
    while S < 8 and 2 * S * C <= 128 and W % (2 * S) == 0:
        S *= 2
    return S


class ResConvBlockW(nn.Module):
    """ResConvBlock on a W-packed tensor (param tree == ResConvBlock).

    Input is the stream-major packed concat [B, D, H, W/S, Σ S·Ci]; output is
    single-stream packed [B, D, H, W/S, S·features]."""

    features: int
    S: int
    ci_splits: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, P):
        from micformer_tpu.ops import wpack

        F, S = self.features, self.S
        Ci = sum(self.ci_splits)
        dt = self.dtype

        def conv3(name, h, splits):
            mod = nn.Conv(F, (3, 3, 3), padding=1, dtype=dt, name=name)
            _ = mod(jnp.zeros((1, 1, 1, 1, sum(splits)), h.dtype))
            pr = mod.variables["params"]
            out = wpack.conv3_wpack(h.astype(dt), pr["kernel"].astype(dt),
                                    S, splits)
            return out + jnp.tile(pr["bias"].astype(dt), S)

        def inorm(h):
            mod = InstanceNorm(affine=True, dtype=dt)
            _ = mod(jnp.zeros((1, 1, 1, 1, F), h.dtype))
            pr = mod.variables["params"]
            return wpack.instance_norm_wpack(h, S, pr["scale"], pr["bias"])

        h = conv3("Conv_0", P, self.ci_splits)
        h = inorm(h)
        h = nn.leaky_relu(h, 0.01)
        h = conv3("Conv_1", h, (F,))
        h = inorm(h)
        if Ci == F and len(self.ci_splits) == 1:
            res = P
        else:
            mod = nn.Conv(F, (1, 1, 1), dtype=dt, name="res")
            _ = mod(jnp.zeros((1, 1, 1, 1, Ci), P.dtype))
            pr = mod.variables["params"]
            res = wpack.pointwise_wpack(P.astype(dt),
                                        pr["kernel"][0, 0, 0].astype(dt),
                                        S, self.ci_splits)
            res = res + jnp.tile(pr["bias"].astype(dt), S)
        return nn.leaky_relu(h + res, 0.01)


class UpBlockW(nn.Module):
    """UnetrUpBlock on W-packed tensors (param tree == UpBlock): transpose
    conv from the UNPACKED low-res input straight into the packed layout,
    stream-major packed concat with the packed skip, packed ResConvBlock."""

    features: int
    S: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_packed):
        from micformer_tpu.ops import wpack

        F, S, dt = self.features, self.S, self.dtype
        mod = nn.ConvTranspose(F, (2, 2, 2), strides=(2, 2, 2),
                               padding="VALID", dtype=dt,
                               name="ConvTranspose_0")
        _ = mod(jnp.zeros((1, 1, 1, 1, x.shape[-1]), x.dtype))
        pr = mod.variables["params"]
        up = wpack.convtranspose2_wpack(x.astype(dt),
                                        pr["kernel"].astype(dt), S)
        up = up + jnp.tile(pr["bias"].astype(dt), S)
        P = jnp.concatenate([up, skip_packed], axis=-1)
        return ResConvBlockW(F, S, (F, skip_packed.shape[-1] // S), dtype=dt,
                             name="ResConvBlock_0")(P)


class ResConvBlock(nn.Module):
    """UnetrBasicBlock equivalent: 2x(conv k3 + InstanceNorm + LeakyReLU),
    1³-conv residual when channels change."""

    features: int
    dtype: jnp.dtype = jnp.float32

    def _conv3(self, name=None):
        if RESCONV_VIA_DOT:
            return Conv3x3ViaDot(self.features, kernel_layout="conv",
                                 dtype=self.dtype, name=name)
        return nn.Conv(self.features, (3, 3, 3), padding=1, dtype=self.dtype,
                       name=name)

    @nn.compact
    def __call__(self, x):
        # names pin the param tree to the original nn.Conv layout
        h = self._conv3(name="Conv_0")(x)
        h = InstanceNorm(affine=True, dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.01)
        h = self._conv3(name="Conv_1")(h)
        h = InstanceNorm(affine=True, dtype=self.dtype)(h)
        if x.shape[-1] == self.features:
            res = x
        elif RESCONV_VIA_DOT:
            res = PointwiseConv(self.features, dtype=self.dtype, name="res")(x)
        else:
            res = nn.Conv(self.features, (1, 1, 1), dtype=self.dtype,
                          name="res")(x)
        return nn.leaky_relu(h + res, 0.01)


class UpBlock(nn.Module):
    """UnetrUpBlock: transpose conv 2x + concat skip + ResConvBlock."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        if RESCONV_VIA_DOT:
            x = ConvTranspose2x2ViaDot(self.features, dtype=self.dtype,
                                       name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                                 padding="VALID", dtype=self.dtype,
                                 name="ConvTranspose_0")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return ResConvBlock(self.features, dtype=self.dtype)(x)


class SwinUNETR(nn.Module):
    num_classes: int = 8
    feature_size: int = 12
    depths: Sequence[int] = (2, 4, 2, 2)
    num_heads: Sequence[int] = (2, 4, 8, 12)
    window_size: tuple = (7, 7, 7)
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x_in = to_channels_last(x)
        F = self.feature_size

        # SwinViT with patch size 2 (space-to-depth matmul: keeps the conv
        # layout islands out of the full-res path)
        h = PatchEmbed3D(F, (2, 2, 2), use_norm=False,
                         via_dot=RESCONV_VIA_DOT or None, dtype=self.dtype,
                         name="patch_embed")(x_in)
        hiddens = [h]
        for i in range(4):
            dim = F * 2 ** i
            for b in range(self.depths[i]):
                h = SwinBlock3D(dim, self.num_heads[i], self.window_size,
                                tuple(w // 2 for w in self.window_size) if b % 2 else (0, 0, 0),
                                rel_pos_bias=True, dtype=self.dtype,
                                name=f"swin{i}_b{b}")(h, deterministic)
            h = PatchMergingLinear(dim, dtype=self.dtype, name=f"merge{i}")(h)
            hiddens.append(h)

        # the lane-starved full/half-resolution conv path optionally runs
        # W-packed (pure-reshape pack; see ops/wpack.py). S1/S2 are the slot
        # counts at full / half resolution; S=1 (tiny inputs) disables.
        S1 = _slots(x_in.shape[3], F) if WPACK else 1
        S2 = _slots(hiddens[0].shape[3], F) if WPACK else 1
        if S1 > 1 and S2 > 1:
            from micformer_tpu.ops import wpack

            enc0 = ResConvBlockW(F, S1, (x_in.shape[-1],), dtype=self.dtype,
                                 name="encoder1")(wpack.pack(x_in, S1))
            enc1 = ResConvBlockW(F, S2, (F,), dtype=self.dtype,
                                 name="encoder2")(wpack.pack(hiddens[0], S2))
        else:
            enc0 = ResConvBlock(F, dtype=self.dtype, name="encoder1")(x_in)
            enc1 = ResConvBlock(F, dtype=self.dtype, name="encoder2")(hiddens[0])
        enc2 = ResConvBlock(2 * F, dtype=self.dtype, name="encoder3")(hiddens[1])
        enc3 = ResConvBlock(4 * F, dtype=self.dtype, name="encoder4")(hiddens[2])
        dec4 = ResConvBlock(16 * F, dtype=self.dtype, name="encoder10")(hiddens[4])

        d = UpBlock(8 * F, dtype=self.dtype, name="decoder5")(dec4, hiddens[3])
        d = UpBlock(4 * F, dtype=self.dtype, name="decoder4")(d, enc3)
        d = UpBlock(2 * F, dtype=self.dtype, name="decoder3")(d, enc2)
        if S1 > 1 and S2 > 1:
            d = UpBlockW(F, S2, dtype=self.dtype, name="decoder2")(d, enc1)
            d = UpBlockW(F, S1, dtype=self.dtype,
                         name="decoder1")(wpack.unpack(d, S2), enc0)
            out_mod = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                              name="out")
            _ = out_mod(jnp.zeros((1, 1, 1, 1, F), d.dtype))
            pr = out_mod.variables["params"]
            out = wpack.pointwise_wpack(d.astype(self.dtype),
                                        pr["kernel"][0, 0, 0].astype(self.dtype),
                                        S1, (F,))
            out = out + jnp.tile(pr["bias"].astype(self.dtype), S1)
            out = wpack.unpack(out, S1)
        else:
            d = UpBlock(F, dtype=self.dtype, name="decoder2")(d, enc1)
            d = UpBlock(F, dtype=self.dtype, name="decoder1")(d, enc0)
            head = (PointwiseConv if RESCONV_VIA_DOT else
                    lambda f, dtype, name: nn.Conv(f, (1, 1, 1), dtype=dtype,
                                                   name=name))
            out = head(self.num_classes, dtype=self.dtype, name="out")(d)
        return to_channels_first(out).astype(jnp.float32)


@registry.register("swinunetr", num_classes=8, feature_size=12)
def build_swinunetr(**kw):
    return SwinUNETR(**kw)
