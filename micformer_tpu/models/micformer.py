"""MicFormer — dual-stream cross-modal Swin U-shape with deformable windowed
cross-attention (the paper model, arXiv:2404.16371).

Behavioral parity with reference MicFormer/models/MICFormer_self.py (studied,
not translated — structure rebuilt channels-last for TPU):
  - Head (:1042-1055): split 2-ch input -> (moving=CT, fixed=MR); MicFormer
    (window (2,2,2), embed 48 at train: train_mmwhs_noPad.py:92); out conv
    k3 (embed/2 -> num_classes).
  - MicFormer (:881-1039): SHARED patch-embed conv k4 s4 for both streams
    (:995-996 — one module, two calls), 4 encoder BasicLayers (dims 48·2^i,
    depths [2,2,6,2], heads [3,6,12,24], conv PatchMerging shared across
    streams for stages 0-2), shared LN bottleneck, 4 decoder BasicLayers
    (PatchExpand for i>0), skip-concat per stream + shared Linear(2C->C)
    (:1027-1030), final concat + LN + ConvTranspose k4 s4 (2E -> E/2).
  - BasicLayer (:582-707): per depth i:
        x, xa = Self1(x), Self2(xa); x, xa = Cross1(x, xa), Cross2(xa, x)
  - CrossTransformerBlock3D (:277-426): LN on Q-stream only; offsets =
    Conv(2C->16,k3)+ChannelLN+GELU+Conv(16->3,k1,no-bias) on concat(LN(x), xa)
    (:313-318,354-358); pos = offsets + reference grid (:363-364,
    offset_range_factor=2 >= 0 branch -> NO tanh); STN-warp of xa by pos as a
    voxel flow (:379, double-grid quirk kept faithfully — SURVEY §2.13, flag
    `faithful_grid`); windowed cross-attention Q=x, K/V=warped xa (:387-394),
    separate q/kv projections, no rel-pos bias (:148-203); residual+DropPath,
    pre-norm MLP.
  - drop_path: linspace 0..0.2 over sum(depths) blocks (:941); dropout 0.

TPU notes: 128³ input -> stages 32³..4³ all divide window 2, so padding is a
trace-time no-op; window partition fuses into the attention einsums; the warp
is one 8-corner gather (ops/warp.py).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.models.layers import (
    Mlp,
    Conv3x3ViaDot,
    DropPath,
    WindowAttention3D,
    SwinBlock3D,
    PatchEmbed3D,
    PatchMergingConv,
    PatchExpandConv,
    pad_to_multiple,
    to_channels_first,
    apply_layer_norm,
)
from micformer_tpu.ops.windows import window_partition, window_reverse, adjust_window_shift
from micformer_tpu.ops.warp import (
    stn_warp, stn_absolute_coords, trilinear_sample, reference_points,
)
from micformer_tpu import registry

# A/B (round 3): sample the warped KV stream directly in WINDOW-TOKEN order —
# the tiny [B,3,D,H,W] coordinate tensor is permuted instead of the big
# warped feature map (whose voxel-order materialization + window_partition
# transpose profiled alongside the gather itself).
WARP_WINDOW_ORDER = os.environ.get("MICFORMER_WARP_WINDOW_ORDER", "0") == "1"
# A/B (round 3, lane-major family): run the cross block's norm2+MLP tail in
# [C, M] lane-major layout (tokens on the 128-lane dim) — the cross blocks
# are half of all blocks and their LNs otherwise reduce over a C=48 minor
# dim at 48/128 lane efficiency. Same params; math parity tested.
CROSS_LANE_TAIL = os.environ.get("MICFORMER_CROSS_LANE_TAIL", "0") == "1"
# Round-3 A/B WINNER (+1.2%, reproduced across two same-session pairs:
# 5.73 vs base 5.66 vol/s, p50 0.1973/0.1985 vs 0.2001/0.1995): offset-net
# TAIL in [F, M] lane-major layout. After the 27-tap conv (MXU-shaped in
# channels-last, unchanged) the channels-last tail runs LN over F=16 minor
# dims (16/128 lanes), exact-erf GELU at the same efficiency, a
# [N,16]x[16,3] dot whose output minor dim is THREE (3/128 lanes), and a
# moveaxis to [B,3,D,H,W]. Lane-major: one 4 MB entry transpose, every tail
# op at full lane width, and the [3, M] output reshapes straight into the
# coordinate layout the warp wants. Default ON; =0 falls back.
OFFSET_LANE_TAIL = os.environ.get("MICFORMER_OFFSET_LANE_TAIL", "1") == "1"
# Round-5: the fused-head transposed conv (k=6, s=4, 96->8 at full 128³
# resolution) measured 18.6 ms/call + ~2 ms adjacent copies on the round-5
# overlap-corrected profile (device_summary --run micformer 4 128) — 23% of
# the 89 ms forward, running at ~0.5% MFU (layout-bound conv_transpose
# lowering). Because k = s + 2, the op is exactly a SAME k=3 conv on the
# 32³ INPUT grid producing all 4³ output-residue classes at once
# (96 -> 512 channels — an MXU-shaped contraction), followed by one
# depth-to-space interleave. Exact reformulation; kill switch =0.
HEAD_VIA_DOT = os.environ.get("MICFORMER_HEAD_VIA_DOT", "1") == "1"
# Round-5 (VERDICT r4 #7): roll each stage's depth-wise block loop into ONE
# lax.scan over stacked per-block params. The unrolled flagship train step
# compiles 24 dual-stream levels × 4 block bodies as separate HLO (1247 s
# cold train compile, 76 MB full-size GSPMD HLO); the scan compiles each
# stage's (self, self, cross, cross) body once and dynamic-slices the
# stacked params per iteration. Param tree IDENTICAL to the unrolled path
# (the per-depth blocks are materialized with their usual names via
# 1-voxel dummy calls, then stacked at trace time); per-block drop-path
# rates ride as scanned inputs (DropPath rate override). Math identical in
# deterministic mode (parity-tested); stochastic mode draws its dropout
# keys from a different (split-based) stream than the unrolled path.
SCAN_BLOCKS = os.environ.get("MICFORMER_SCAN_BLOCKS", "0") == "1"


class CrossBlock3D(nn.Module):
    """CrossTransformerBlock3D: deformable-warp + windowed cross-attention."""

    dim: int
    num_heads: int
    window_size: tuple = (2, 2, 2)
    hidden_channels: int = 16
    offset_kernel: int = 3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    faithful_grid: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xa, deterministic: bool = True, drop_rate=None):
        B, D, H, W, C = x.shape
        ws = adjust_window_shift((D, H, W), self.window_size)

        shortcut = x
        xn = apply_layer_norm(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1"), x)
        xn = pad_to_multiple(xn, ws)
        xap = pad_to_multiple(xa, ws)
        _, Dp, Hp, Wp, _ = xn.shape

        # offset field from concat(LN(x), xa) — Conv k3 + channel-LN + GELU + Conv k1.
        # k3 conv lowered to matmuls (Conv3x3ViaDot) — lax.conv with 16 output
        # channels hits a minutes-long Mosaic compile pathology on this stack.
        off = jnp.concatenate([xn, xap], axis=-1)
        off = Conv3x3ViaDot(self.hidden_channels, dtype=self.dtype,
                            name="offset_conv1")(off)
        ref = reference_points(Dp, Hp, Wp, faithful=self.faithful_grid)
        norm_o = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="offset_norm")
        conv2 = nn.Conv(3, (1, 1, 1), use_bias=False, dtype=self.dtype,
                        name="offset_conv2")
        if OFFSET_LANE_TAIL and B * Dp * Hp * Wp >= 1024:
            from micformer_tpu.models.layers import _lane_layer_norm

            F = off.shape[-1]
            _ = norm_o(jnp.zeros((1, 1, 1, 1, F), self.dtype))
            _ = conv2(jnp.zeros((1, 1, 1, 1, F), self.dtype))
            t = off.reshape(-1, F).T[None]                   # [1, F, M]
            t = _lane_layer_norm(t, norm_o, 1e-5, self.dtype)
            t = nn.gelu(t, approximate=False)
            w2 = conv2.variables["params"]["kernel"].reshape(F, 3).astype(self.dtype)
            o = jnp.einsum("tfm,fo->tom", t, w2)[0]          # [3, M]
            off_cm = o.reshape(3, B, Dp, Hp, Wp)
            pos = jnp.moveaxis(off_cm, 1, 0).astype(jnp.float32) + ref
        else:
            off = norm_o(off)
            off = nn.gelu(off, approximate=False)
            off = conv2(off)                                 # [B, Dp, Hp, Wp, 3]
            pos = jnp.moveaxis(off, -1, 1).astype(jnp.float32) + ref  # [B,3,D,H,W]
        # coords stay f32; values ride in the model dtype (bf16 halves the
        # 8-corner gather traffic — the profiled stage-0 hot spot)
        x_wins = window_partition(xn, ws)
        if WARP_WINDOW_ORDER:
            # permute the COORDS into window-major token order, then gather:
            # the gather output IS the KV window tensor — no voxel-order
            # warped map, no second window_partition transpose.
            wd, wh, ww = ws
            coords = stn_absolute_coords(pos, (Dp, Hp, Wp))  # [B,3,Dp,Hp,Wp]
            cw = coords.reshape(B, 3, Dp // wd, wd, Hp // wh, wh, Wp // ww, ww)
            cw = cw.transpose(0, 1, 2, 4, 6, 3, 5, 7)
            n_win = (Dp // wd) * (Hp // wh) * (Wp // ww)
            cw = cw.reshape(B, 3, n_win, wd * wh * ww, 1)
            xa_wins = trilinear_sample(xap, cw)          # [B, nW, T, 1, C]
            xa_wins = xa_wins.reshape(B * n_win, wd * wh * ww, C)
        else:
            xa_warp = stn_warp(xap, pos)
            xa_wins = window_partition(xa_warp, ws)
        attn = WindowAttention3D(self.dim, ws, self.num_heads, self.qkv_bias,
                                 cross=True, dtype=self.dtype, name="cross_attn")(
            x_wins, context=xa_wins)
        h = window_reverse(attn, ws, B, Dp, Hp, Wp)[:, :D, :H, :W]

        x = shortcut + DropPath(self.drop_path)(h, deterministic, rate=drop_rate)
        if CROSS_LANE_TAIL and B * D * H * W >= 1024:
            from micformer_tpu.models.layers import _dense_lane, _lane_layer_norm

            M = B * D * H * W
            xt = x.reshape(M, C).T[None]                     # [1, C, M]
            norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
            _ = norm2(jnp.zeros((1, 1, C), self.dtype))
            yt = _lane_layer_norm(xt, norm2, 1e-5, self.dtype)
            mlp = Mlp(int(C * self.mlp_ratio), C, dtype=self.dtype, name="mlp")
            _ = mlp(jnp.zeros((1, 1, C), self.dtype), True)
            mp = mlp.variables["params"]
            w0 = mp["Dense_0"]["kernel"].astype(self.dtype)
            b0 = mp["Dense_0"]["bias"].astype(self.dtype)
            w1 = mp["Dense_1"]["kernel"].astype(self.dtype)
            b1 = mp["Dense_1"]["bias"].astype(self.dtype)
            ht = jnp.einsum("tcn,cf->tfn", yt.astype(self.dtype), w0) + b0[None, :, None]
            ht = nn.gelu(ht, approximate=False)
            ot = jnp.einsum("tfn,fc->tcn", ht, w1) + b1[None, :, None]
            y = ot[0].T.reshape(B, D, H, W, C)
        else:
            y = apply_layer_norm(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2"), x)
            y = Mlp(int(C * self.mlp_ratio), C, dtype=self.dtype, name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path)(y, deterministic, rate=drop_rate)


class DualStreamStage(nn.Module):
    """BasicLayer (:582-707): depth × (self per stream, cross both ways),
    then a SHARED resample module applied to both streams."""

    dim: int
    depth: int
    num_heads: int
    window_size: tuple = (2, 2, 2)
    drop_paths: Sequence[float] = (0.0,)
    resample: str | None = None   # None | 'merge' | 'expand'
    qkv_bias: bool = True
    faithful_grid: bool = True
    use_remat: bool = False       # gradient checkpointing (reference
                                  # use_checkpoint, MICFormer_self.py:415-423)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xa, deterministic: bool = True):
        if SCAN_BLOCKS and self.depth >= 2:
            x, xa = self._scan_blocks(x, xa, deterministic)
        else:
            SelfBlk = nn.remat(SwinBlock3D, static_argnums=(2,)) if self.use_remat else SwinBlock3D
            CrossBlk = nn.remat(CrossBlock3D, static_argnums=(3,)) if self.use_remat else CrossBlock3D
            for i in range(self.depth):
                dp = self.drop_paths[i] if i < len(self.drop_paths) else self.drop_paths[-1]
                common = dict(dim=self.dim, num_heads=self.num_heads,
                              window_size=self.window_size, qkv_bias=self.qkv_bias,
                              drop_path=dp, dtype=self.dtype)
                x = SelfBlk(rel_pos_bias=False, name=f"self1_{i}", **common)(x, deterministic)
                xa = SelfBlk(rel_pos_bias=False, name=f"self2_{i}", **common)(xa, deterministic)
                cross1 = CrossBlk(faithful_grid=self.faithful_grid, name=f"cross1_{i}", **common)
                cross2 = CrossBlk(faithful_grid=self.faithful_grid, name=f"cross2_{i}", **common)
                x, xa = cross1(x, xa, deterministic), cross2(xa, x, deterministic)

        if self.resample == "merge":
            down = PatchMergingConv(self.dim, dtype=self.dtype, name="downsample")
            return x, xa, down(x), down(xa)
        if self.resample == "expand":
            up = PatchExpandConv(self.dim, dtype=self.dtype, name="upsample")
            return x, xa, up(x), up(xa)
        return x, xa, x, xa

    def _scan_blocks(self, x, xa, deterministic: bool):
        """One lax.scan over the stage's depth (see SCAN_BLOCKS).

        The per-depth blocks are created under their unrolled names
        (self1_i/self2_i/cross1_i/cross2_i) and materialized by 1-voxel dummy
        calls — every parameter in a block depends only on C, so the trees
        (and checkpoints / torch transplants) are identical to the unrolled
        path. Their stacked params are scanned over a body that applies
        UNBOUND template modules functionally; per-block drop-path rates are
        scanned inputs, dropout keys are split per (depth, role)."""
        depth = self.depth
        common = dict(dim=self.dim, num_heads=self.num_heads,
                      window_size=self.window_size, qkv_bias=self.qkv_bias,
                      drop_path=0.0, dtype=self.dtype)
        dummy = jnp.zeros((1, 1, 1, 1, self.dim), self.dtype)
        selfs1, selfs2, crosses1, crosses2, rates = [], [], [], [], []
        for i in range(depth):
            rates.append(self.drop_paths[i] if i < len(self.drop_paths)
                         else self.drop_paths[-1])
            s1 = SwinBlock3D(rel_pos_bias=False, name=f"self1_{i}", **common)
            s2 = SwinBlock3D(rel_pos_bias=False, name=f"self2_{i}", **common)
            c1 = CrossBlock3D(faithful_grid=self.faithful_grid,
                              name=f"cross1_{i}", **common)
            c2 = CrossBlock3D(faithful_grid=self.faithful_grid,
                              name=f"cross2_{i}", **common)
            _ = s1(dummy, True)
            _ = s2(dummy, True)
            _ = c1(dummy, dummy, True)
            _ = c2(dummy, dummy, True)
            selfs1.append(s1), selfs2.append(s2)
            crosses1.append(c1), crosses2.append(c2)

        def stack(mods):
            return jax.tree.map(lambda *ls: jnp.stack(ls),
                                *[m.variables["params"] for m in mods])

        P = (stack(selfs1), stack(selfs2), stack(crosses1), stack(crosses2))
        rates = jnp.asarray(rates, jnp.float32)
        tmpl_s = SwinBlock3D(rel_pos_bias=False, parent=None, **common)
        tmpl_c = CrossBlock3D(faithful_grid=self.faithful_grid, parent=None,
                              **common)
        need_rng = (not deterministic) and self.has_rng("dropout")
        keys = (jax.random.split(self.make_rng("dropout"), depth * 4)
                .reshape(depth, 4) if need_rng
                else jnp.zeros((depth, 4), jnp.uint32))

        def step(x, xa, ps1, ps2, pc1, pc2, rate, ks):
            def rngs(j):
                return {"dropout": ks[j]} if need_rng else None

            x = tmpl_s.apply({"params": ps1}, x, deterministic,
                             drop_rate=rate, rngs=rngs(0))
            xa = tmpl_s.apply({"params": ps2}, xa, deterministic,
                              drop_rate=rate, rngs=rngs(1))
            xn = tmpl_c.apply({"params": pc1}, x, xa, deterministic,
                              drop_rate=rate, rngs=rngs(2))
            xan = tmpl_c.apply({"params": pc2}, xa, x, deterministic,
                               drop_rate=rate, rngs=rngs(3))
            return xn, xan

        if self.use_remat:
            step = jax.checkpoint(step, static_argnums=())

        def body(carry, xs):
            ps1, ps2, pc1, pc2, rate, ks = xs
            return step(*carry, ps1, ps2, pc1, pc2, rate, ks), None

        (x, xa), _ = jax.lax.scan(body, (x, xa), (*P, rates, keys))
        return x, xa


def _composed_head_kernel(k1, k2):
    """Compose ConvTranspose(k=s=p) kernel k1 [p,p,p,I,O] with a SAME 3^3
    conv kernel k2 [3,3,3,O,C] into ONE transposed-conv kernel
    [p+2,p+2,p+2,I,C] (both ops are linear with nothing between them).
    flax ConvTranspose applies its kernel FLIPPED — y[q] = sum_m x[m]
    K[s*m + k-1 - q] — so the composition is a correlation of k1 with k2:
      conv3(convT(x; k1); k2)[t] = convT(x; Kc)[t+1],
      Kc[a] = sum_j k1[a - j] @ k2[j]   (zero outside k1's support).
    The fused form skips the full-resolution O-channel intermediate — the
    profiled ~12% tail of the forward (layout copies + a second 128^3 pass).
    """
    p = k1.shape[0]
    # Kc[a] = sum_j k1[a-j] @ k2[j]: stack the 27 shifted [p+2]³ windows of
    # the padded k1 and contract in ONE einsum. (History: a 27-term python
    # loop emitted dozens of serialized small ops; a lax.conv formulation of
    # the correlation compiled to a 2.6 ms/call micro-conv — tiny convs are
    # pathological on this stack. The stack-einsum is a single MXU dot.)
    k1p = jnp.pad(k1.astype(jnp.float32),
                  ((2, 2), (2, 2), (2, 2), (0, 0), (0, 0)))
    q = p + 2
    slabs = [k1p[2 - jz:2 - jz + q, 2 - jy:2 - jy + q, 2 - jx:2 - jx + q]
             for jz in range(3) for jy in range(3) for jx in range(3)]
    stack = jnp.stack(slabs)                            # [27, q, q, q, I, O]
    I, O = k1.shape[3], k1.shape[4]
    C = k2.shape[4]
    # contract as an explicit 2-D dot: [q³I, 27O] @ [27O, C]. The einsum form
    # ("jzyxio,joc->zyxic") fused the stack build and contraction into one
    # 5.3 ms/call serial loop fusion; the reshape-transpose + MXU dot is the
    # same math at matmul speed.
    st2 = stack.transpose(1, 2, 3, 4, 0, 5).reshape(q * q * q * I, 27 * O)
    w2 = k2.astype(jnp.float32).reshape(27 * O, C)
    return (st2 @ w2).reshape(q, q, q, I, C)


def _composed_head_bias_field(b1, k2, out_spatial):
    """Border-exact contribution of the ConvTranspose bias b1 through the
    SAME-padded 3^3 conv: interior voxels see sum_j k2[j]@b1, voxels on a face
    lose the j-taps whose reach falls outside. Factorizes per axis."""
    t = jnp.einsum("zyxoc,o->zyxc", k2.astype(jnp.float32),
                   b1.astype(jnp.float32))  # [3,3,3,C]
    vs = []
    for s in out_spatial:
        v = np.ones((3, s), np.float32)
        v[0, 0] = 0.0       # j=0 reaches p-1 < 0 at p=0
        v[2, s - 1] = 0.0   # j=2 reaches p+1 >= s at p=s-1
        vs.append(jnp.asarray(v))
    return jnp.einsum("zyxc,zp,yq,xr->pqrc", t, *vs)


def _composed_head_bias_field_blocked(b1, k2, out_spatial):
    """_composed_head_bias_field in the SHIFTED residue-blocked layout of
    `_convt_s4_k6_blocked` (axis position p = 4b + r - 3 at [..., b, r, :],
    b ∈ [0, s/4]): the same per-axis factor vectors, zero-padded 3 left /
    1 right so the dead border slots line up, reshaped [3, s+4] ->
    [3, s/4+1, 4]."""
    t = jnp.einsum("zyxoc,o->zyxc", k2.astype(jnp.float32),
                   b1.astype(jnp.float32))  # [3,3,3,C]
    vs = []
    for s in out_spatial:
        v = np.ones((3, s), np.float32)
        v[0, 0] = 0.0
        v[2, s - 1] = 0.0
        v = np.pad(v, ((0, 0), (3, 1)))
        vs.append(jnp.asarray(v.reshape(3, s // 4 + 1, 4)))
    return jnp.einsum("zyxc,zPa,yQb,xRd->PQRabdc", t, *vs)


def _convt_s4_k6_blocked(x, kc):
    """Residue-blocked form of `lax.conv_transpose(x, kc, strides=(4,4,4),
    padding=((4,4),)*3)` with kc [6,6,6,I,C]: one k=2 VALID conv producing
    [B, Q+1, Q+1, Q+1, 4, 4, 4, C] residue blocks (Q = input extent), output
    voxel p = 4b + r - 3 at [..., b, r, c]; per axis, slots p < 0 (r < 3 of
    b=0) and p >= 4Q (r=3 of b=Q) are dead and must be sliced off AFTER the
    caller's interleave — which the caller folds into whatever relayout it
    was going to do anyway.

    Derivation (per axis): conv_transpose is a correlation over the
    4-dilated input, out[p] = Σ_j kc[j]·xd[p + j - 4]; xd[u] nonzero only at
    u = 4m, so with the SHIFTED blocking p = 4b + r - 3 the taps are
    j = 3 - r + 4d at input m = b - 1 + d with d ∈ {0, 1} only (j valid:
    d=0 for every r, d=1 for r ∈ {2, 3}) — a 2³-neighborhood contraction:

        out_blocked[b, (r, c)] = W0[r]·x[b-1] + W1[r]·x[b],   Wd = kc[3-r+4d]

    == one k=2 VALID conv over the 1-padded input with the re-blocked
    [2, 2, 2, I, 64·C] kernel. The unshifted t = 4q + r blocking needs
    d ∈ {-1, 0, +1} (a k=3 SAME conv, 27 dense taps): that v2 form measured
    LOSING (6.10 -> 5.11 vol/s, round-5 ledger) because its kernel is ~8×
    structurally zero — 348 GFLOP/window where the true contraction is 10.9.
    The k=2 kernel is only 2.4× zero-padded (28 GFLOP incl. the +1 border
    blocks), 12× less than v2 and ~35% less than the conv_transpose
    lowering's effective 43.5."""
    kd, I, C = 6, kc.shape[3], kc.shape[4]
    assert kc.shape[:3] == (kd, kd, kd)
    # per-axis (d -> residues r, kernel rows j = 3 - r + 4d)
    terms = {0: ([0, 1, 2, 3], [3, 2, 1, 0]), 1: ([2, 3], [5, 4])}
    W = jnp.zeros((2, 2, 2, I, 4, 4, 4, C), kc.dtype)
    for dz, (rz, jz) in terms.items():
        for dy, (ry, jy) in terms.items():
            for dx, (rx, jx) in terms.items():
                blk = kc[jnp.ix_(jnp.array(jz), jnp.array(jy), jnp.array(jx))]
                blk = jnp.moveaxis(blk, 3, 0)        # [I, |rz|, |ry|, |rx|, C]
                W = W.at[dz, dy, dx, :,
                         rz[0]:rz[0] + len(rz), ry[0]:ry[0] + len(ry),
                         rx[0]:rx[0] + len(rx)].set(blk)
    B, Dq, Hq, Wq, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, W.reshape(2, 2, 2, I, 64 * C), window_strides=(1, 1, 1),
        padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y.reshape(B, Dq + 1, Hq + 1, Wq + 1, 4, 4, 4, C)


def _convt_s4_k6_via_dot(x, kc):
    """Interleaved (NDHWC) wrapper over _convt_s4_k6_blocked — numerically
    identical to the conv_transpose (op-level parity test)."""
    y = _convt_s4_k6_blocked(x, kc)
    B, b1, b2, b3 = y.shape[:4]
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    y = y.reshape(B, 4 * b1, 4 * b2, 4 * b3, kc.shape[-1])
    return y[:, 3:4 * b1 - 1, 3:4 * b2 - 1, 3:4 * b3 - 1]


class MicFormer(nn.Module):
    """Head + MicFormer U-shape (:881-1055). Input [B, 2, D, H, W] (CT, MR)."""

    num_classes: int = 8
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: tuple = (2, 2, 2)
    patch_size: tuple = (4, 4, 4)
    drop_path_rate: float = 0.2
    faithful_grid: bool = True
    use_remat: bool = False
    # fuse reverse_patch_embed + out_conv into one transposed conv (exact
    # weight-level composition; same param tree, tested vs the 2-op path)
    fused_head: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # CT, MR split (Head :1050). Slice on the channels-FIRST major axis,
        # then relabel to NDHWC for free (a singleton channel reshape moves no
        # data). The moveaxis-then-minor-slice form relayouts the full volume
        # to interleave the modalities and then de-interleaves them again —
        # two pathological [B,D,H,W,1] strided copies on the round-3 profile.
        B_, _, D_, H_, W_ = x.shape
        moving = x[:, 0:1].reshape(B_, D_, H_, W_, 1)
        fixed = x[:, 1:2].reshape(B_, D_, H_, W_, 1)

        # shared patch embed, patch_norm=False (:934-936)
        embed = PatchEmbed3D(self.embed_dim, self.patch_size, use_norm=False,
                             dtype=self.dtype, name="patch_embed")
        moving, fixed = embed(moving), embed(fixed)

        n_layers = len(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        feats_m, feats_f = [], []
        for i in range(n_layers):
            stage = DualStreamStage(
                dim=self.embed_dim * 2 ** i,
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                drop_paths=tuple(dpr[sum(self.depths[:i]): sum(self.depths[: i + 1])]),
                resample="merge" if i < n_layers - 1 else None,
                faithful_grid=self.faithful_grid,
                use_remat=self.use_remat,
                dtype=self.dtype,
                name=f"enc{i}",
            )
            m_out, f_out, moving, fixed = stage(moving, fixed, deterministic)
            feats_m.append(m_out)
            feats_f.append(f_out)

        bottleneck_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        moving, fixed = bottleneck_norm(moving), bottleneck_norm(fixed)

        for inx, i in enumerate(reversed(range(n_layers))):
            dim = self.embed_dim * 2 ** i
            if inx > 0:
                skip_m, skip_f = feats_m[n_layers - 1 - inx], feats_f[n_layers - 1 - inx]
                moving = jnp.concatenate([moving, skip_m], axis=-1)
                fixed = jnp.concatenate([fixed, skip_f], axis=-1)
                back = nn.Dense(dim, dtype=self.dtype, name=f"concat_back{inx}")
                moving, fixed = back(moving), back(fixed)
            stage = DualStreamStage(
                dim=dim,
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                drop_paths=tuple(dpr[sum(self.depths[:i]): sum(self.depths[: i + 1])]),
                resample="expand" if i > 0 else None,
                faithful_grid=self.faithful_grid,
                use_remat=self.use_remat,
                dtype=self.dtype,
                name=f"dec{inx}",
            )
            _, _, moving, fixed = stage(moving, fixed, deterministic)

        out = jnp.concatenate([moving, fixed], axis=-1)          # 2E
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(out)
        rpe = nn.ConvTranspose(self.embed_dim // 2, self.patch_size,
                               strides=self.patch_size, padding="VALID",
                               dtype=self.dtype, name="reverse_patch_embed")
        oc = nn.Conv(self.num_classes, (3, 3, 3), padding=1, dtype=self.dtype,
                     name="out_conv")
        if self.fused_head:
            # materialize both modules' params via 1-voxel dummy calls (keeps
            # the param tree identical to the 2-op path / torch transplant),
            # then run the single composed transposed conv.
            _ = rpe(jnp.zeros((1, 1, 1, 1, out.shape[-1]), self.dtype))
            _ = oc(jnp.zeros((1, 1, 1, 1, self.embed_dim // 2), self.dtype))
            k1 = rpe.variables["params"]["kernel"]
            b1 = rpe.variables["params"]["bias"]
            k2 = oc.variables["params"]["kernel"]
            b2 = oc.variables["params"]["bias"]
            kc = _composed_head_kernel(k1, k2).astype(self.dtype)
            if HEAD_VIA_DOT and self.patch_size == (4, 4, 4):
                # blocked conv output; bias field built blocked; then the
                # interleave in the LAYOUT-CHEAP order: the NDHWC transpose
                # [B,bz,by,bx,rz,ry,rx,C] -> [B,bz,rz,by,ry,bx,rx,C] moves
                # only (rz, ry) — (bx, rx, C) stay adjacent, so the minor
                # (x=bx·rx, C) plane is untouched (the channels-FIRST-target
                # transpose of this same tensor relayouts every tile and
                # measured 5.5+3.4+6.5 ms in copies+slice, round-5 ledger).
                # The border slice rides the channels-last volume; the final
                # to-channels-first is the same ~2 ms minor-dims copy class
                # the base path pays.
                y = _convt_s4_k6_blocked(out, kc)           # [B,(q+1)³,r³,C]
                B, b1_, b2_, b3_ = y.shape[:4]
                Dq, Hq, Wq = b1_ - 1, b2_ - 1, b3_ - 1
                fb = _composed_head_bias_field_blocked(
                    b1, k2, (4 * Dq, 4 * Hq, 4 * Wq))
                y = y + (fb + b2.astype(jnp.float32)).astype(self.dtype)[None]
                y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
                    B, 4 * b1_, 4 * b2_, 4 * b3_, self.num_classes)
                out = y[:, 3:4 * b1_ - 1, 3:4 * b2_ - 1, 3:4 * b3_ - 1]
                return to_channels_first(out).astype(jnp.float32)
            # conv_transpose pads the s-dilated input: full output
            # (k-1,k-1); the composition is offset by one voxel -> trim
            # with (k-2,k-2)
            pad = tuple((k - 2, k - 2) for k in kc.shape[:3])
            out = jax.lax.conv_transpose(
                out, kc, strides=self.patch_size, padding=pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            field = _composed_head_bias_field(b1, k2, out.shape[1:4])
            out = out + (field + b2.astype(jnp.float32)).astype(self.dtype)[None]
        else:
            out = oc(rpe(out))
        return to_channels_first(out).astype(jnp.float32)


@registry.register("micformer", num_classes=8, embed_dim=48)
def build_micformer(**kw):
    return MicFormer(**kw)
