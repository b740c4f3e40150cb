"""3D trilinear sampling / spatial-transformer warp — the MicFormer hot gather.

Behavioral parity targets (reference, studied not copied):
  - `SpatialTransformer` (MicFormer/models/STN.py:5-32): flow in voxel units is
    added to an identity grid, normalized per-axis by 2*(x/(S-1) - 0.5),
    axis-reordered, and passed to torch `grid_sample` with its DEFAULTS —
    align_corners=False, padding_mode='zeros', mode='bilinear'.
  - `_get_ref_points` (MICFormer_self.py:326-337): half-pixel-centered linspace
    per axis normalized to ~[-1,1] with the reference's axis mix-up (z/=D but
    y/=W and x/=H — SURVEY.md §2.13); kept faithfully behind `faithful=True`.
  - `Re_SpatialTransformer` (STN.py:35-42): approximate inverse warp.

TPU design: rather than emulate normalized grid_sample coordinates, everything
reduces to `trilinear_sample(src, coords)` in absolute voxel space. Forward:
ONE lax.gather of [2,2,2,C] neighborhoods with clamp-shifted lerp weights
(8x fewer gather rows than the corner form — the profiled round-1 hot spot).
Backward: custom VJP over the 8-corner take_along_axis form (the block
gather's autodiff scatter lowers as a serial while loop). Out-of-range
corners contribute 0 (zeros padding parity).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# block-gather path (one lax.gather of 2x2x2xC slices + shifted-weight
# algebra) vs the 8-corner path (8 independent row gathers). The block form
# is the default: the 8-corner gathers were the profiled #1 cost of the
# MicFormer forward (~29% — row-count-bound, not byte-bound).
USE_BLOCK_GATHER = os.environ.get("MICFORMER_WARP_BLOCK_GATHER", "1") == "1"
# A/B (round 3): per-axis sequential lerp instead of the materialized
# [B,N,2,2,2] outer-product weight tensor.
AXIS_REDUCE = os.environ.get("MICFORMER_WARP_AXIS_REDUCE", "0") == "1"
# A/B (round 3): fold batch into the gather rows (one un-batched gather over
# a [B*D,H,W,C] view) instead of a vmap'd batched gather.
FLAT_BATCH = os.environ.get("MICFORMER_WARP_FLAT_BATCH", "0") == "1"
# A/B (round 3): contract the gathered blocks against the 8 corner weights as
# one unrolled multiply-add chain instead of materializing the [B,N,2,2,2]
# outer-product weight tensor. The materialized tensor's minor dims of 2 force
# a pathological relayout copy before the gather/contraction (profiled ~2.5 ms
# PER cross block at stage 0 — as costly as the gather itself); the unrolled
# form reads the blocks once in a single fusion and the weights stay [B,N].
UNROLLED_LERP = os.environ.get("MICFORMER_WARP_UNROLLED_LERP", "0") == "1"
# A/B (round 3): row-gather formulation — pre-concatenate the 8 shifted corner
# copies into a [B,D,H,W,8C] source so each sample point is ONE contiguous
# 8C-wide row fetch (take_along_axis, the lowering this stack favors — see the
# custom VJP note), then contract with [B,N,8] weights. Eliminates both the
# multi-dim-slice gather AND the pathological [B,N,2,2,2] weight layout.
ROW_GATHER = os.environ.get("MICFORMER_WARP_ROW_GATHER", "0") == "1"
# Backward formulation for the custom VJP (round-3 A/B WINNER: train step
# 237.7 -> 162.0 ms/call device time, b2 128^3 bf16). "corners" (the round-1
# choice) differentiates 8 independent row gathers -> 8 scatter-adds + 8
# index sorts per warp; "rowgather" (default) differentiates the
# concat-8-shift row fetch -> ONE scatter-add of 8C-wide rows + 8 dense
# shifted slice-adds (the concat/pad transposes). The corner scatters'
# fusions were 36% of the whole train step; the row scatter is 9%.
BWD_ROW_GATHER = os.environ.get("MICFORMER_WARP_BWD_ROW_GATHER", "1") == "1"
# A/B WINNER (round 3, default ON; train step 142.2 -> 138.3 ms/call, b2
# 128³ bf16): direct backward from SAVED forward blocks. The row-gather
# backward obtains its transpose via jax.vjp over the row forward, which
# re-runs that forward in the backward pass — rebuilding the [B,DHW,8C]
# concat source per warp (with the row scatters, ~10% of the train step).
# Saving the forward's gathered [B,N,2,2,2,C] blocks as the residual lets
# the backward skip the rebuild: d_coords = autodiff of the weight math with
# blocks constant (gather indices are piecewise-constant in coords), d_src =
# one row scatter-add + 8 shifted fold slice-adds. Costs ~4x the residual
# memory of src per warp (blocks vs src).
BWD_SAVED_BLOCKS = os.environ.get("MICFORMER_WARP_BWD_SAVED_BLOCKS", "1") == "1"


def _axis_pair_weights(c0, frac, size):
    """Per-axis lerp weights ALIGNED TO THE CLAMPED-FETCH block.

    For floor index c0 with fraction frac on an axis of extent `size`, the
    fetch starts at c0c = clip(c0, 0, size-2) and covers [c0c, c0c+1]. The
    desired contribution of true corners (c0, c0+1) with weights
    (1-frac, frac) — zeroed outside [0, size) — maps onto the fetched slots by
    the shift delta = c0 - c0c: w_fetched[k] = w_true[k - delta]."""
    delta = c0 - jnp.clip(c0, 0, size - 2)
    w0 = (1.0 - frac) * ((c0 >= 0) & (c0 < size))
    w1 = frac * ((c0 + 1 >= 0) & (c0 + 1 < size))
    # w_fetched[k] = w_true[k - delta]:  k=0 -> {0: w0, -1: w1},
    #                                    k=1 -> {0: w1, +1: w0}; else 0.
    f0 = jnp.where(delta == 0, w0, 0.0) + jnp.where(delta == -1, w1, 0.0)
    f1 = jnp.where(delta == 0, w1, 0.0) + jnp.where(delta == 1, w0, 0.0)
    return f0, f1


def _trilinear_sample_block(src: jnp.ndarray, coords: jnp.ndarray,
                            return_blocks: bool = False):
    """trilinear_sample via ONE gather of [2,2,2,C] blocks per output point.

    Equivalent math to the 8-corner form: fetch the 2x2x2 neighborhood at
    clamped starts, shift the per-axis lerp weights by the clamp delta
    (zero-padding parity preserved — out-of-range corners get zero weight).
    With return_blocks=True also returns the gathered [B,N,2,2,2,C] blocks
    (residual for the saved-blocks backward).
    """
    B, D, H, W, C = src.shape
    cz, cy, cx = coords[:, 0], coords[:, 1], coords[:, 2]
    out_spatial = cz.shape[1:]
    N = int(np.prod(out_spatial)) if out_spatial else 1

    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fz, fy, fx = cz - z0, cy - y0, cx - x0
    z0 = z0.astype(jnp.int32).reshape(B, N)
    y0 = y0.astype(jnp.int32).reshape(B, N)
    x0 = x0.astype(jnp.int32).reshape(B, N)

    wz0, wz1 = _axis_pair_weights(z0, fz.reshape(B, N), D)
    wy0, wy1 = _axis_pair_weights(y0, fy.reshape(B, N), H)
    wx0, wx1 = _axis_pair_weights(x0, fx.reshape(B, N), W)

    if ROW_GATHER:
        return _trilinear_sample_rows(src, coords)

    starts = jnp.stack([jnp.clip(z0, 0, D - 2),
                        jnp.clip(y0, 0, H - 2),
                        jnp.clip(x0, 0, W - 2)], axis=-1)  # [B, N, 3]

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )

    if FLAT_BATCH:
        # fold B into the z start indices over a [B*D, H, W, C] view: ONE
        # un-batched gather (no vmap batching dims — the batched form made
        # XLA relayout the 12.6 MB source per cross block, profiled round 3).
        # Slices never cross batch boundaries: z starts are clipped to D-2.
        flat = src.reshape(B * D, H, W, C)
        zoff = (jnp.arange(B, dtype=jnp.int32) * D)[:, None, None]  # [B,1,1]
        fstarts = jnp.concatenate(
            [starts[..., :1] + zoff, starts[..., 1:]], axis=-1).reshape(B * N, 3)
        blocks = jax.lax.gather(
            flat, fstarts, dnums, slice_sizes=(2, 2, 2, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(B, N, 2, 2, 2, C)
    else:
        def gather_one(vol, idx):
            return jax.lax.gather(
                vol, idx, dnums, slice_sizes=(2, 2, 2, C),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # [N, 2, 2, 2, C]

        blocks = jax.vmap(gather_one)(src, starts)  # [B, N, 2, 2, 2, C]

    if UNROLLED_LERP:
        ws = {0: (wz0, wy0, wx0), 1: (wz1, wy1, wx1)}
        out = None
        for kz in (0, 1):
            for ky in (0, 1):
                for kx in (0, 1):
                    w8 = (ws[kz][0] * ws[ky][1] * ws[kx][2]).astype(src.dtype)
                    term = blocks[:, :, kz, ky, kx, :] * w8[..., None]
                    out = term if out is None else out + term  # [B, N, C]
    elif AXIS_REDUCE:
        # per-axis sequential lerp: 3 shrinking contractions instead of one
        # materialized [B,N,2,2,2] outer-product weight tensor (whose layout
        # copy profiled as costly as the gather itself at stage 0)
        wz0c, wz1c = wz0.astype(src.dtype), wz1.astype(src.dtype)
        wy0c, wy1c = wy0.astype(src.dtype), wy1.astype(src.dtype)
        wx0c, wx1c = wx0.astype(src.dtype), wx1.astype(src.dtype)
        t = (blocks[:, :, 0] * wz0c[..., None, None, None]
             + blocks[:, :, 1] * wz1c[..., None, None, None])  # [B,N,2,2,C]
        t = t[:, :, 0] * wy0c[..., None, None] + t[:, :, 1] * wy1c[..., None, None]
        out = t[:, :, 0] * wx0c[..., None] + t[:, :, 1] * wx1c[..., None]
    else:
        wz = jnp.stack([wz0, wz1], -1).astype(src.dtype)  # [B, N, 2]
        wy = jnp.stack([wy0, wy1], -1).astype(src.dtype)
        wx = jnp.stack([wx0, wx1], -1).astype(src.dtype)
        w = (wz[:, :, :, None, None] * wy[:, :, None, :, None]
             * wx[:, :, None, None, :])                    # [B, N, 2, 2, 2]
        out = jnp.sum(blocks * w[..., None], axis=(2, 3, 4))  # [B, N, C]
    out = out.reshape((B,) + out_spatial + (C,))
    if return_blocks:
        return out, blocks
    return out


def _trilinear_sample_rows(src: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Row-gather formulation: concat the 8 shifted corner copies into a
    [B,D,H,W,8C] source, fetch ONE contiguous 8C row per sample point
    (take_along_axis), contract with [B,N,8] clamp-shifted weights.

    Same math as the block/corner forms (bit-exact vs block gather, see
    tests/test_ops.py). Its autodiff transpose is ONE scatter-add of 8C-wide
    rows + 8 dense shifted slice-adds (the concat/pad transposes) — vs the
    8-corner form's 8 scatter-adds + 8 index sorts per warp."""
    B, D, H, W, C = src.shape
    cz, cy, cx = coords[:, 0], coords[:, 1], coords[:, 2]
    out_spatial = cz.shape[1:]
    N = int(np.prod(out_spatial)) if out_spatial else 1

    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fz, fy, fx = cz - z0, cy - y0, cx - x0
    z0 = z0.astype(jnp.int32).reshape(B, N)
    y0 = y0.astype(jnp.int32).reshape(B, N)
    x0 = x0.astype(jnp.int32).reshape(B, N)

    wz0, wz1 = _axis_pair_weights(z0, fz.reshape(B, N), D)
    wy0, wy1 = _axis_pair_weights(y0, fy.reshape(B, N), H)
    wx0, wx1 = _axis_pair_weights(x0, fx.reshape(B, N), W)

    zc = jnp.clip(z0, 0, D - 2)
    yc = jnp.clip(y0, 0, H - 2)
    xc = jnp.clip(x0, 0, W - 2)

    # [B,D,H,W,8C] source: corner k=(kz,ky,kx) lives at channels
    # [k*C, (k+1)*C). Far-edge positions of each shifted copy are zero
    # padding, never read (starts are clamped to size-2).
    shifted = []
    for kz in (0, 1):
        for ky in (0, 1):
            for kx in (0, 1):
                s = src[:, kz:, ky:, kx:, :]
                s = jnp.pad(s, ((0, 0), (0, kz), (0, ky), (0, kx), (0, 0)))
                shifted.append(s)
    csrc = jnp.concatenate(shifted, axis=-1).reshape(B, D * H * W, 8 * C)
    flat_idx = ((zc * H + yc) * W + xc)[..., None]            # [B, N, 1]
    rows = jnp.take_along_axis(csrc, flat_idx, axis=1)        # [B, N, 8C]
    blocks8 = rows.reshape(B, N, 8, C)
    wz = jnp.stack([wz0, wz1], -1)                            # [B, N, 2]
    wy = jnp.stack([wy0, wy1], -1)
    wx = jnp.stack([wx0, wx1], -1)
    w8 = (wz[:, :, :, None, None] * wy[:, :, None, :, None]
          * wx[:, :, None, None, :]).reshape(B, N, 8).astype(src.dtype)
    out = jnp.sum(blocks8 * w8[..., None], axis=2)            # [B, N, C]
    return out.reshape((B,) + out_spatial + (C,))


def trilinear_sample(src: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample `src` at fractional voxel coordinates with zeros padding.

    Args:
      src: [B, D, H, W, C] (channels-last).
      coords: [B, 3, Do, Ho, Wo] absolute voxel coordinates (axis order z,y,x
        matching src's D,H,W).

    Returns [B, Do, Ho, Wo, C].

    Forward runs the block-gather kernel (fast: one lax.gather), but its
    AUTODIFF gradient is catastrophic — XLA lowers the multi-dim-slice
    scatter-add as a serial per-point while loop (profiled at ~90% of a train
    step). The custom VJP below keeps the block forward and differentiates
    the 8-corner formulation instead (row-wise scatter-adds, the round-1
    train-speed path).
    """
    B, D, H, W, C = src.shape
    if USE_BLOCK_GATHER and min(D, H, W) >= 2:
        return _trilinear_block_with_corner_grad(src, coords)
    return _trilinear_sample_corners(src, coords)


@jax.custom_vjp
def _trilinear_block_with_corner_grad(src, coords):
    return _trilinear_sample_block(src, coords)


def _tri_fwd(src, coords):
    if BWD_SAVED_BLOCKS and not ROW_GATHER:
        out, blocks = _trilinear_sample_block(src, coords, return_blocks=True)
        # src rides along for shape/dtype only (its values are unused in the
        # backward — the whole point is that blocks already hold the fetch).
        return out, (coords, blocks, src)
    return _trilinear_sample_block(src, coords), (src, coords)


def _weights8(coords, dims):
    """The [B, N, 2, 2, 2] clamp-shifted lerp weight tensor and the flat
    clamped start index [B, N] — the exact weight math of the block/row
    forward forms (differentiable in coords; floor/clip are constant)."""
    B, D, H, W = dims
    cz, cy, cx = coords[:, 0], coords[:, 1], coords[:, 2]
    N = int(np.prod(cz.shape[1:])) if cz.ndim > 1 else 1
    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fz, fy, fx = cz - z0, cy - y0, cx - x0
    z0 = jax.lax.stop_gradient(z0).astype(jnp.int32).reshape(B, N)
    y0 = jax.lax.stop_gradient(y0).astype(jnp.int32).reshape(B, N)
    x0 = jax.lax.stop_gradient(x0).astype(jnp.int32).reshape(B, N)
    wz0, wz1 = _axis_pair_weights(z0, fz.reshape(B, N), D)
    wy0, wy1 = _axis_pair_weights(y0, fy.reshape(B, N), H)
    wx0, wx1 = _axis_pair_weights(x0, fx.reshape(B, N), W)
    wz = jnp.stack([wz0, wz1], -1)
    wy = jnp.stack([wy0, wy1], -1)
    wx = jnp.stack([wx0, wx1], -1)
    w = (wz[:, :, :, None, None] * wy[:, :, None, :, None]
         * wx[:, :, None, None, :])                       # [B, N, 2, 2, 2]
    zc = jnp.clip(z0, 0, D - 2)
    yc = jnp.clip(y0, 0, H - 2)
    xc = jnp.clip(x0, 0, W - 2)
    flat_idx = (zc * H + yc) * W + xc                     # [B, N]
    return w, flat_idx


def _tri_bwd_saved_blocks(res, g):
    """Direct backward from the saved forward blocks: no forward recompute.

    d_coords: autodiff of the weight math with blocks held constant — the
    gather indices are piecewise-constant in coords, so this equals the full
    autodiff gradient. d_src: ONE row scatter-add of the 8C-wide per-point
    gradient rows + 8 dense shifted slice-adds folding the corner groups —
    the row-gather backward's transpose WITHOUT its 8-slab concat-source
    rebuild (the [N,8C] build was ~10% of the round-3 train step)."""
    coords, blocks, src = res
    B, D, H, W, C = src.shape
    src_dtype = src.dtype
    N = blocks.shape[1]
    g2 = g.reshape(B, N, C)

    def combine(c):
        w, _ = _weights8(c, (B, D, H, W))
        return jnp.sum(blocks * w.astype(blocks.dtype)[..., None],
                       axis=(2, 3, 4))                    # [B, N, C]

    _, vjp_c = jax.vjp(combine, coords)
    (d_coords,) = vjp_c(g2)

    w, flat_idx = _weights8(coords, (B, D, H, W))
    w8 = w.reshape(B, N, 8).astype(g2.dtype)
    d_rows = (w8[..., None] * g2[:, :, None, :]).reshape(B, N, 8 * C)
    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, N))
    d_csrc = jnp.zeros((B, D * H * W, 8 * C), g2.dtype)
    d_csrc = d_csrc.at[bidx, flat_idx].add(d_rows)
    d_csrc = d_csrc.reshape(B, D, H, W, 8, C)
    d_src = None
    k = 0
    for kz in (0, 1):
        for ky in (0, 1):
            for kx in (0, 1):
                grp = d_csrc[:, :, :, :, k, :]
                grp = jnp.pad(grp, ((0, 0), (kz, 0), (ky, 0), (kx, 0),
                                    (0, 0)))[:, :D, :H, :W, :]
                d_src = grp if d_src is None else d_src + grp
                k += 1
    return d_src.astype(src_dtype), d_coords


def _tri_bwd(res, g):
    if BWD_SAVED_BLOCKS and not ROW_GATHER:
        return _tri_bwd_saved_blocks(res, g)
    src, coords = res
    bwd_form = (_trilinear_sample_rows if BWD_ROW_GATHER
                else _trilinear_sample_corners)
    _, vjp = jax.vjp(bwd_form, src, coords)
    return vjp(g)


_trilinear_block_with_corner_grad.defvjp(_tri_fwd, _tri_bwd)


def _trilinear_sample_corners(src: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """8-corner take_along_axis formulation (identical math to the block
    gather; differentiates to row-wise scatter-adds)."""
    B, D, H, W, C = src.shape
    cz, cy, cx = coords[:, 0], coords[:, 1], coords[:, 2]

    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fz, fy, fx = cz - z0, cy - y0, cx - x0
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def corner(dz, dy, dx):
        z = z0 + dz
        y = y0 + dy
        x = x0 + dx
        valid = (
            (z >= 0) & (z < D) & (y >= 0) & (y < H) & (x >= 0) & (x < W)
        )
        zc = jnp.clip(z, 0, D - 1)
        yc = jnp.clip(y, 0, H - 1)
        xc = jnp.clip(x, 0, W - 1)
        # flat gather: [B, Do*Ho*Wo] indices into [B, D*H*W, C]
        flat = (zc * H + yc) * W + xc
        src_flat = src.reshape(B, D * H * W, C)
        vals = jnp.take_along_axis(
            src_flat, flat.reshape(B, -1, 1).astype(jnp.int32), axis=1
        ).reshape(z.shape + (C,))
        wz = jnp.where(dz == 1, fz, 1.0 - fz)
        wy = jnp.where(dy == 1, fy, 1.0 - fy)
        wx = jnp.where(dx == 1, fx, 1.0 - fx)
        # weights follow src dtype: in bf16 the gather+lerp moves half the HBM
        # bytes (the stage-0 warp is the profiled top cost — 8 corner gathers
        # of [B,32^3,48] per cross block); f32 inputs keep f32 math exactly.
        w = ((wz * wy * wx) * valid).astype(src.dtype)
        return vals * w[..., None]

    out = corner(0, 0, 0)
    for dz, dy, dx in [(0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]:
        out = out + corner(dz, dy, dx)
    return out


def _grid_sample_coords(norm_coords: jnp.ndarray, sizes) -> jnp.ndarray:
    """torch grid_sample(align_corners=False) coordinate transform.

    norm in [-1,1] -> voxel = ((norm + 1) * S - 1) / 2, per axis.
    norm_coords: [B, 3, ...] ordered (z, y, x) with sizes (D, H, W).
    """
    out = []
    for i, s in enumerate(sizes):
        out.append(((norm_coords[:, i] + 1.0) * s - 1.0) / 2.0)
    return jnp.stack(out, axis=1)


def stn_absolute_coords(flow: jnp.ndarray, sizes) -> jnp.ndarray:
    """Reference-STN flow -> absolute voxel sampling coordinates [B,3,D,H,W].

    Equivalent chain (STN.py:9-32): locs = grid + flow; norm =
    2*(locs/(S-1) - 0.5); grid_sample(align_corners=False) — composed into
    voxel = ((grid+flow)/(S-1))*S - 0.5. Size-1 axes sample the only plane
    (the reference divides by zero there)."""
    D, H, W = sizes
    grids = jnp.meshgrid(
        jnp.arange(D, dtype=flow.dtype),
        jnp.arange(H, dtype=flow.dtype),
        jnp.arange(W, dtype=flow.dtype),
        indexing="ij",
    )
    grid = jnp.stack(grids)[None]  # [1, 3, D, H, W]
    locs = grid + flow
    return jnp.stack(
        [
            locs[:, i] / (sizes[i] - 1) * sizes[i] - 0.5
            if sizes[i] > 1
            else jnp.zeros_like(locs[:, i])
            for i in range(3)
        ],
        axis=1,
    )


def stn_warp(src: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """VoxelMorph-style warp with reference STN semantics (STN.py:9-32).

    Args:
      src: [B, D, H, W, C] channels-last.
      flow: [B, 3, D, H, W] voxel-unit displacement, channel i displaces axis i.
    """
    B, D, H, W, C = src.shape
    coords = stn_absolute_coords(flow, (D, H, W))
    return trilinear_sample(src, coords)


def reference_points(D: int, H: int, W: int, faithful: bool = True) -> jnp.ndarray:
    """MicFormer deformable reference grid, [1, 3, D, H, W] (channel order z,y,x).

    faithful=True reproduces `_get_ref_points` exactly INCLUDING the axis
    normalization mix-up (z/=D, y/=W, x/=H — MICFormer_self.py:333-335);
    faithful=False normalizes each axis by its own extent (the paper's intent).
    """
    z = jnp.linspace(0.5, D - 0.5, D)
    y = jnp.linspace(0.5, H - 0.5, H)
    x = jnp.linspace(0.5, W - 0.5, W)
    gz, gy, gx = jnp.meshgrid(z, y, x, indexing="ij")
    if faithful:
        gz = gz / H * 2 - 1  # ref[...,0] /= H_key
        gy = gy / W * 2 - 1  # ref[...,1] /= W_key
        gx = gx / D * 2 - 1  # ref[...,2] /= D_key
    else:
        gz = gz / D * 2 - 1
        gy = gy / H * 2 - 1
        gx = gx / W * 2 - 1
    return jnp.stack([gz, gy, gx])[None].astype(jnp.float32)


def inverse_stn_warp(src: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Re_SpatialTransformer parity (STN.py:35-42): warp flow by itself, negate,
    then warp src by the result — a first-order inverse-deformation estimate."""
    # stn(flow, flow): flow is [B, 3, D, H, W]; warp it channels-last.
    flow_cl = jnp.moveaxis(flow, 1, -1)
    warped_flow = stn_warp(flow_cl, flow)
    neg_inv = -jnp.moveaxis(warped_flow, -1, 1)
    return stn_warp(src, neg_inv)
