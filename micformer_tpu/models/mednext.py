"""MedNeXt — ConvNeXt-style 3D segmentation network.

Behavioral parity with the reference
MedNeXt/nnunet_mednext/network_architecture/mednextv1/ (blocks.py:6-160,
MedNextV1.py:7-389, create_mednext_v1.py:3-82):
  - MedNeXtBlock: depthwise k³ conv -> GroupNorm(groups=C) -> 1³ expand (×R)
    -> GELU -> 1³ compress, optional residual.
  - Down/Up blocks: stride-2 depthwise (transpose) conv inside the block, with
    a parallel 1³ stride-2 residual path (do_res_up_down).
  - U-shape: stem 1³ conv, 4 encoder stages (C·2^i), bottleneck, 4 decoder
    stages with additive skips, deep-supervision 1³ heads per decoder level.
  - Sizes S/B/M/L via exp_r / block_counts tables; MM-WHS uses 'S' kernel 3
    (MedNeXt/train_mmwhs_noPad.py:92-95).

TPU notes: depthwise convs use feature_group_count; channels-last NDHWC.
GroupNorm with one group per channel == InstanceNorm with affine (torch
GroupNorm has affine=True by default).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.models.layers import (
    DW_STENCIL,
    UP_BLOCKED,
    DepthwiseConv3D,
    InstanceNorm,
    PointwiseConv,
    PointwiseTranspose2,
    parity_interleave,
    to_channels_last,
    to_channels_first,
    zero_dilate,
)


from micformer_tpu import registry

import os as _os

# A/B (round 4 continuation): W-axis channel packing for the full-resolution
# stages. MedNeXt-S runs every 128³ tensor at C=32 — 32/128 lanes live, so
# the dw stencil / IN / GELU / residual class pays a ~4x bandwidth penalty
# (the round-4 floor assessment puts 4 full-res same-blocks at 28 ms of the
# ~100 ms call). Packing S=4 W positions into channels ([B,D,H,W,32] ->
# [B,D,H,W/4,128], ops/wpack.py) makes every elementwise/stencil op
# full-lane; the W taps of the dw conv become slot shifts built once.
# Exact reformulation; param tree unchanged (same modules, dummy-called).
# TPU A/B (ABAB subprocess pairs, 128³ b1 bf16): 9.65 -> 8.06 w/s (−17%),
# p50 0.1302 -> 0.1472 — LOST (unlike SwinUNETR's C=12, the C=32 dw stencil
# with its 2·r slot-shift tensors reads MORE packed bytes than the 4x lane
# penalty it removes). Stays opt-in; see benchmarks/RESULTS.md round-4 trail.
MN_WPACK = _os.environ.get("MICFORMER_MEDNEXT_WPACK", "0") == "1"
# Round-4 continuation, W-pack CO-DESIGN (the v1 loss analysis said "do not
# retry without changing the minor-dim tiling"): (a) the packed depthwise
# conv as 9 shifted BANDED matmuls (conv3_wpack with the diagonal-densified
# kernel — the form that won +78% on SwinUNETR) instead of v1's 27 taps over
# slot-shift concat tensors; (b) the up block class-packed (see
# MedNeXtBlock._up_packed). =0 falls back to the v1 tap form.
MN_DW_BANDED = _os.environ.get("MICFORMER_MN_DW_BANDED", "1") == "1"


def _pw(features, stride=1, dtype=jnp.float32, name=None):
    """1³ conv: einsum form when the stencil profile is on (nn.Conv param
    tree either way)."""
    if DW_STENCIL:
        return PointwiseConv(features, stride=stride, dtype=dtype, name=name)
    s = (stride,) * 3
    return nn.Conv(features, (1, 1, 1), strides=s, dtype=dtype, name=name)


class MedNeXtBlock(nn.Module):
    out_channels: int
    exp_r: int = 4
    kernel: int = 3
    do_res: bool = True
    mode: str = "same"  # same | down | up
    faithful_up: bool = False
    pack_S: int = 0      # >1: mode='up' returns a W-packed output (MN_WPACK)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        k = (self.kernel,) * 3
        p = self.kernel // 2
        if (self.mode == "up" and DW_STENCIL and not self.faithful_up
                and self.pack_S > 1):
            return self._up_packed(x, C, self.pack_S)
        if (self.mode == "up" and DW_STENCIL and not self.faithful_up
                and UP_BLOCKED):
            return self._up_blocked(x, C)
        if self.mode == "down":
            if DW_STENCIL:
                h = DepthwiseConv3D(C, self.kernel, stride=2,
                                    dtype=self.dtype, name="dw")(x)
            else:
                h = nn.Conv(C, k, strides=(2, 2, 2), padding=self.kernel // 2,
                            feature_group_count=C, dtype=self.dtype, name="dw")(x)
        elif self.mode == "up":
            # torch: depthwise ConvTranspose3d(k, s2, pad=k//2) then
            # F.pad (1,0,1,0,1,0) -> exactly 2x extent (MedNeXtUpBlock,
            # blocks.py:113-147). Two equivalent-up-to-border forms:
            #   faithful_up=True — exact reference semantics: dilated conv at
            #   symmetric padding p (the un-padded ConvTranspose output,
            #   2L-1 per axis), norm/expand/compress THERE, then the literal
            #   leading zero plane is padded on at the end of the block.
            #   faithful_up=False (default) — one fused asymmetric-padding
            #   conv straight to 2L; the leading plane carries a real windowed
            #   value instead of a dead border and the norm statistics include
            #   it (documented deviation, tests/test_layer_parity.py).
            if DW_STENCIL and not self.faithful_up:
                # parity-class transpose stencil == zero_dilate + pad (p+1,p)
                # conv, without materializing the dilated tensor
                h = DepthwiseConv3D(C, self.kernel, transpose2=True,
                                    dtype=self.dtype, name="dw")(x)
            else:
                h = zero_dilate(x)
                pad = [(p, p)] * 3 if self.faithful_up else [(p + 1, p)] * 3
                if DW_STENCIL:
                    h = DepthwiseConv3D(C, self.kernel, pad=tuple(pad),
                                        dtype=self.dtype, name="dw")(h)
                else:
                    h = nn.Conv(C, k, padding=pad, feature_group_count=C,
                                dtype=self.dtype, name="dw")(h)
        else:
            if DW_STENCIL:
                h = DepthwiseConv3D(C, self.kernel, dtype=self.dtype,
                                    name="dw")(x)
            else:
                h = nn.Conv(C, k, padding=self.kernel // 2,
                            feature_group_count=C, dtype=self.dtype, name="dw")(x)
        h = InstanceNorm(affine=True, dtype=self.dtype, name="norm")(h)
        h = _pw(self.exp_r * C, dtype=self.dtype, name="expand")(h)
        h = nn.gelu(h, approximate=False)
        h = _pw(self.out_channels, dtype=self.dtype, name="compress")(h)
        lead = ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0))
        if self.mode == "up" and self.faithful_up:
            h = jnp.pad(h, lead)  # the reference's literal-zero border plane
        if self.do_res:
            if self.mode == "down":
                res = _pw(self.out_channels, stride=2, dtype=self.dtype,
                          name="res")(x)
            elif self.mode == "up":
                # 1³ stride-2 transpose conv + leading pad. faithful: conv the
                # dilated input first, pad after (border plane exactly 0, as
                # blocks.py:146 res pad); default: pad first (border = bias).
                if DW_STENCIL and not self.faithful_up:
                    res = PointwiseTranspose2(self.out_channels,
                                              dtype=self.dtype, name="res")(x)
                else:
                    res = zero_dilate(x)
                    if not self.faithful_up:
                        res = jnp.pad(res, lead)
                    res = nn.Conv(self.out_channels, (1, 1, 1),
                                  dtype=self.dtype, name="res")(res)
                    if self.faithful_up:
                        res = jnp.pad(res, lead)
            else:
                res = x
            h = h + res
        return h

    def _up_blocked(self, x, C):
        """Deferred-interleave up block (MICFORMER_UP_BLOCKED, round-4 A/B).

        Same math as the default stencil up path: norm / expand / GELU /
        compress are per-channel (parity-agnostic), so the block runs in the
        blocked parity layout [B, D, H, W, 8, C] — a free 5D view
        [B, D, H, W·8, C] for the existing modules — and pays ONE spatial
        interleave at the COMPRESSED width instead of two (dw output at C +
        residual at F). Parameter tree identical (same modules, same names,
        same call order). Differs from the interleaved form only by f32
        reduction order inside the InstanceNorm statistics."""
        B, D, H, W, _ = x.shape
        F = self.out_channels
        h = DepthwiseConv3D(C, self.kernel, transpose2=True, blocked_out=True,
                            dtype=self.dtype, name="dw")(x)   # [B,D,H,W,8,C]
        h = h.reshape(B, D, H, W * 8, C)                      # free view
        h = InstanceNorm(affine=True, dtype=self.dtype, name="norm")(h)
        h = _pw(self.exp_r * C, dtype=self.dtype, name="expand")(h)
        h = nn.gelu(h, approximate=False)
        h = _pw(F, dtype=self.dtype, name="compress")(h)
        h = h.reshape(B, D, H, W, 8, F)
        if self.do_res:
            h = h + PointwiseTranspose2(F, blocked_out=True, dtype=self.dtype,
                                        name="res")(x)
        return parity_interleave(h)

    def _up_packed(self, x, C, S):
        """Class-packed up block (MN_WPACK + pack_S — the round-4 co-design).

        Everything after the dw transpose conv is parity-agnostic, so the
        block runs in the CLASS-PACKED layout [B, D, H, W, 8·C]: the 8 parity
        classes merged into the MINOR dim (a free reshape of the blocked
        stack) — 8·C = 256-512 live lanes where the interleaved form runs the
        full-resolution norm/expand/GELU/compress at C/128 = 32-64 lanes (the
        profiled 20.9 ms/call IN-reduce class + 26 ms interleave class,
        benchmarks/RESULTS.md round-4). NOT the lost deferred-interleave
        [B,D,H,W·8,C] view, whose minor dim stayed lane-starved. The residual
        adds in the same layout (no interleave at all); the ONE transpose
        happens at the compressed width, fused with the W-pack
        (parity_interleave_packed) so the dec3 stage consumes it directly.
        Parameter tree identical to the interleaved block; math exact up to
        f32 reduction order in the InstanceNorm statistics."""
        from micformer_tpu.ops import wpack

        B, D, H, W, _ = x.shape
        F = self.out_channels
        dt = self.dtype
        h6 = DepthwiseConv3D(C, self.kernel, transpose2=True, blocked_out=True,
                             dtype=dt, name="dw")(x)       # [B,D,H,W,8,C]
        h = h6.reshape(B, D, H, W, 8 * C)                  # free class merge

        norm = InstanceNorm(affine=True, dtype=dt, name="norm")
        _ = norm(jnp.zeros((1, 1, 1, 1, C), h.dtype))
        npr = norm.variables["params"]
        h = wpack.instance_norm_wpack(h, 8, npr["scale"], npr["bias"])

        exp_mod = _pw(self.exp_r * C, dtype=dt, name="expand")
        _ = exp_mod(jnp.zeros((1, 1, 1, 1, C), h.dtype))
        we = exp_mod.variables["params"]
        h = wpack.pointwise_slots(h.astype(dt), we["kernel"][0, 0, 0].astype(dt), 8)
        h = h + jnp.tile(we["bias"].astype(dt), 8)
        h = nn.gelu(h, approximate=False)
        cmp_mod = _pw(F, dtype=dt, name="compress")
        _ = cmp_mod(jnp.zeros((1, 1, 1, 1, self.exp_r * C), h.dtype))
        wc = cmp_mod.variables["params"]
        h = wpack.pointwise_slots(h.astype(dt), wc["kernel"][0, 0, 0].astype(dt), 8)
        h = h + jnp.tile(wc["bias"].astype(dt), 8)

        if self.do_res:
            r6 = PointwiseTranspose2(F, blocked_out=True, dtype=dt,
                                     name="res")(x)        # [B,D,H,W,8,F]
            h = h + r6.reshape(B, D, H, W, 8 * F)
        return wpack.parity_interleave_packed(
            h.reshape(B, D, H, W, 8, F), S)       # [B,2D,2H,2W/S,S·F]


class MedNeXtBlockW(nn.Module):
    """MedNeXtBlock mode='same' on a W-packed tensor [B, D, H, W/S, S·C]
    (param tree == MedNeXtBlock: dw / norm / expand / compress; the same-mode
    residual is the identity). All ops run at full lane width; see MN_WPACK."""

    out_channels: int
    exp_r: int = 4
    kernel: int = 3
    S: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, P):
        from micformer_tpu.ops import wpack

        S, dt = self.S, self.dtype
        C = P.shape[-1] // S
        assert C == self.out_channels, "same-blocks keep channels"

        dw = DepthwiseConv3D(C, self.kernel, dtype=dt, name="dw")
        _ = dw(jnp.zeros((1, 1, 1, 1, C), P.dtype))
        pr = dw.variables["params"]
        dw_fn = (wpack.dw_conv_wpack_banded
                 if (MN_DW_BANDED and self.kernel == 3)
                 else wpack.dw_conv_wpack)
        h = dw_fn(P.astype(dt), pr["kernel"].astype(dt), S)
        h = h + jnp.tile(pr["bias"].astype(dt), S)

        norm = InstanceNorm(affine=True, dtype=dt, name="norm")
        _ = norm(jnp.zeros((1, 1, 1, 1, C), h.dtype))
        npr = norm.variables["params"]
        h = wpack.instance_norm_wpack(h, S, npr["scale"], npr["bias"])

        def pw(name, h, F):
            mod = _pw(F, dtype=dt, name=name)
            _ = mod(jnp.zeros((1, 1, 1, 1, h.shape[-1] // S), h.dtype))
            mpr = mod.variables["params"]
            y = wpack.pointwise_wpack(h.astype(dt),
                                      mpr["kernel"][0, 0, 0].astype(dt),
                                      S, (h.shape[-1] // S,))
            return y + jnp.tile(mpr["bias"].astype(dt), S)

        h = pw("expand", h, self.exp_r * C)
        h = nn.gelu(h, approximate=False)
        h = pw("compress", h, C)
        return h + P


def _mn_slots(W: int, C: int, k: int) -> int:
    """Slot count for the packed MedNeXt path: S·C <= 128, S | W, S > k//2."""
    S = 1
    while S < 8 and 2 * S * C <= 128 and W % (2 * S) == 0:
        S *= 2
    return S if S > k // 2 else 1


_SIZES = {
    "S": dict(exp_r=[2] * 9, block_counts=[2] * 9),
    "B": dict(exp_r=[2, 3, 4, 4, 4, 4, 4, 3, 2], block_counts=[2] * 9),
    "M": dict(exp_r=[2, 3, 4, 4, 4, 4, 4, 3, 2], block_counts=[3, 4, 4, 4, 4, 4, 4, 4, 3]),
    "L": dict(exp_r=[3, 4, 8, 8, 8, 8, 8, 4, 3], block_counts=[3, 4, 8, 8, 8, 8, 8, 4, 3]),
}


class MedNeXt(nn.Module):
    num_classes: int = 8
    n_channels: int = 32
    exp_r: Sequence[int] = tuple([2] * 9)
    kernel: int = 3
    block_counts: Sequence[int] = tuple([2] * 9)
    deep_supervision: bool = False
    faithful_up: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = to_channels_last(x)
        n = self.n_channels
        er, bc = list(self.exp_r), list(self.block_counts)
        # W-packed full-resolution segments (MN_WPACK): stem + enc0 blocks,
        # and dec3 blocks + head below. Exact reformulation, same param tree.
        S = (_mn_slots(x.shape[3], n, self.kernel)
             if (MN_WPACK and DW_STENCIL) else 1)
        if S > 1:
            from micformer_tpu.ops import wpack

            stem = _pw(n, dtype=self.dtype, name="stem")
            _ = stem(jnp.zeros((1, 1, 1, 1, x.shape[-1]), x.dtype))
            pr = stem.variables["params"]
            P = wpack.pointwise_wpack(wpack.pack(x, S).astype(self.dtype),
                                      pr["kernel"][0, 0, 0].astype(self.dtype),
                                      S, (x.shape[-1],))
            P = P + jnp.tile(pr["bias"].astype(self.dtype), S)
            for b in range(bc[0]):
                P = MedNeXtBlockW(n, er[0], self.kernel, S, dtype=self.dtype,
                                  name=f"enc0_{b}")(P)
            x = wpack.unpack(P, S)
            skips = [P]
        else:
            x = _pw(n, dtype=self.dtype, name="stem")(x)
            for b in range(bc[0]):
                x = MedNeXtBlock(n, er[0], self.kernel, True, dtype=self.dtype,
                                 name=f"enc0_{b}")(x)
            skips = [x]
        x = MedNeXtBlock(2 * n, er[1], self.kernel, True, mode="down",
                         dtype=self.dtype, name="down0")(x)
        # encoder stages 1..3 + downs, bottleneck stage 4
        for s in range(1, 4):
            c = n * (2 ** s)
            for b in range(bc[s]):
                x = MedNeXtBlock(c, er[s], self.kernel, True, dtype=self.dtype,
                                 name=f"enc{s}_{b}")(x)
            skips.append(x)
            x = MedNeXtBlock(2 * c, er[s + 1], self.kernel, True, mode="down",
                             dtype=self.dtype, name=f"down{s}")(x)
        c = n * 16
        for b in range(bc[4]):
            x = MedNeXtBlock(c, er[4], self.kernel, True, dtype=self.dtype,
                             name=f"bottleneck_{b}")(x)

        # ds head ordering follows the reference (MedNextV1.py:306-335):
        # x_ds_4 at the bottleneck, x_ds_i after each decoder stage's blocks,
        # returned as [full-res, 1/2, 1/4, 1/8, 1/16].
        ds_out = []
        if self.deep_supervision:
            ds_out.append(_pw(self.num_classes, dtype=self.dtype,
                              name="ds4")(x))
        for s in range(4):  # decoder stages, deep to shallow
            c_out = n * (2 ** (3 - s))
            # class-packed up3 emits the W-packed layout directly (one fused
            # transpose at compressed width); eligibility mirrors _up_packed's
            # guard so a faithful_up model falls back to interleaved + pack.
            up_packed = (s == 3 and S > 1 and DW_STENCIL
                         and not self.faithful_up)
            x = MedNeXtBlock(c_out, er[5 + s], self.kernel, True, mode="up",
                             faithful_up=self.faithful_up,
                             pack_S=S if up_packed else 0,
                             dtype=self.dtype, name=f"up{s}")(x)
            if s == 3 and S > 1:
                # full-res decoder segment runs packed (skip is stored packed)
                x = (x if up_packed else wpack.pack(x, S)) + skips[0]
                for b in range(bc[8]):
                    x = MedNeXtBlockW(c_out, er[8], self.kernel, S,
                                      dtype=self.dtype, name=f"dec3_{b}")(x)
                continue
            x = x + skips[3 - s]
            for b in range(bc[5 + s]):
                x = MedNeXtBlock(c_out, er[5 + s], self.kernel, True,
                                 dtype=self.dtype, name=f"dec{s}_{b}")(x)
            if self.deep_supervision and s < 3:
                ds_out.append(_pw(self.num_classes, dtype=self.dtype,
                                  name=f"ds{3 - s}")(x))
        if S > 1:
            out = _pw(self.num_classes, dtype=self.dtype, name="out")
            _ = out(jnp.zeros((1, 1, 1, 1, n), x.dtype))
            pr = out.variables["params"]
            logits = wpack.pointwise_wpack(x.astype(self.dtype),
                                           pr["kernel"][0, 0, 0].astype(self.dtype),
                                           S, (n,))
            logits = wpack.unpack(
                logits + jnp.tile(pr["bias"].astype(self.dtype), S), S)
        else:
            logits = _pw(self.num_classes, dtype=self.dtype, name="out")(x)
        logits = to_channels_first(logits).astype(jnp.float32)
        if self.deep_supervision:
            pyramid = [logits] + [to_channels_first(d).astype(jnp.float32)
                                  for d in reversed(ds_out)]
            return pyramid
        return logits


@registry.register("mednext", num_classes=8, size="S", kernel=3, deep_supervision=False)
def build_mednext(num_classes=8, size="S", kernel=3, deep_supervision=False,
                  faithful_up=False, dtype=jnp.float32):
    cfg = _SIZES[size]
    return MedNeXt(num_classes=num_classes, kernel=kernel,
                   exp_r=tuple(cfg["exp_r"]), block_counts=tuple(cfg["block_counts"]),
                   deep_supervision=deep_supervision, faithful_up=faithful_up,
                   dtype=dtype)
