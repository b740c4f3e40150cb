"""W-axis channel packing for lane-starved dense-conv paths.

Problem (round-4 SwinUNETR profile, benchmarks/RESULTS.md): the reference's
UNETR-style full-resolution conv path (MONAI SwinUNETR, feature_size=12 —
SwinUnter/train_mmwhs_noPad.py:92-93) runs every 128³ tensor at C=12, so the
TPU tiles it T(8,128) with 12/128 lanes live — all elementwise, InstanceNorm
and layout work pays a ~10× bandwidth penalty, and lax.conv inserts
full-tensor layout copies on both sides. ~30 of SwinUNETR's ~62 ms/call
device time sat in this class while its window attention cost 1.3 ms.

Fix: pack S consecutive W positions into channels. Because W and C are
memory-adjacent in channels-last layout, `[B,D,H,W,C] -> [B,D,H,W/S,S·C]`
is a pure reshape (same bytes) — but the packed minor dim S·C ≈ 96-128 tiles
at full lane width. The ops:

  - elementwise / activations: unchanged, on the packed tensor.
  - InstanceNorm: per-original-channel stats = reduce spatial dims on the
    packed tensor to [B, S·C], fold the slot axis on the tiny remainder.
  - 1³ conv: block-diagonal [S·Ci, S·Co] matmul (slot-preserving).
  - k³ conv (SAME, stride 1): per (dz,dy) spatial shift the W-axis taps
    become a BANDED [S·Ci, S·Co] matrix (slot band |πi-πo| ≤ k//2) — the
    matmul absorbs the intra-block W shifts for free — plus 2(k//2) skinny
    cross-block edge terms read from the neighbouring W block.

Multi-stream support: a packed concat of two feature maps is slot-major per
stream ([x packed ‖ skip packed]), NOT per-voxel channel order, so the
weight-matrix builders take `ci_splits` and reorder the kernel rows instead
of shuffling the data (the UnetrUpBlock skip-concat never materializes an
interleave).

All forms are exact reformulations of the nn.Conv/InstanceNorm math (up to
f32 reduction order in the norm statistics); parameter trees stay
nn.Conv-identical — callers materialize flax modules and pass their kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack(x: jnp.ndarray, S: int) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B, D, H, W//S, S*C] — a pure reshape."""
    B, D, H, W, C = x.shape
    return x.reshape(B, D, H, W // S, S * C)


def unpack(x: jnp.ndarray, S: int) -> jnp.ndarray:
    """[B, D, H, U, S*C] -> [B, D, H, U*S, C] — a pure reshape."""
    B, D, H, U, SC = x.shape
    return x.reshape(B, D, H, U * S, SC // S)


def slots(W: int, C: int, cap: int = 8) -> int:
    """Largest power-of-2 slot count S with S·C <= 128, S | W, S <= cap."""
    S = 1
    while S < cap and 2 * S * C <= 128 and W % (2 * S) == 0:
        S *= 2
    return S


def repack(P: jnp.ndarray, S_old: int, S_new: int) -> jnp.ndarray:
    """Change the slot count of a single-stream packed tensor — still a pure
    reshape (both layouts are views of the same [B, D, H, W, C] bytes)."""
    if S_old == S_new:
        return P
    return pack(unpack(P, S_old), S_new)


def maxpool2_wpack(P: jnp.ndarray, S: int) -> jnp.ndarray:
    """MaxPool 2³ stride-2 on a single-stream W-packed tensor.

    [B, D, H, U, S·C] -> [B, D/2, H/2, U, (S/2)·C]: the W pooling pairs are
    slot-adjacent inside a block (slots 2j, 2j+1 are consecutive W voxels),
    so the W reduction is a [.., S/2, 2, C] view + max — no relayout; D/H
    pool as plain strided views. Output stays packed at S/2 with the SAME
    block extent U, which matches `_slots` halving as channels double.
    Requires even S, D, H."""
    B, D, H, U, SC = P.shape
    C = SC // S
    assert S % 2 == 0 and D % 2 == 0 and H % 2 == 0, (S, D, H)
    t = P.reshape(B, D, H, U, S // 2, 2, C).max(axis=5)
    t = t.reshape(B, D // 2, 2, H // 2, 2, U, (S // 2) * C)
    return t.max(axis=(2, 4))


def _stream_offsets(S: int, ci_splits):
    offs, off = [], 0
    for ci in ci_splits:
        offs.append(off)
        off += S * ci
    return offs


def band_matrix(w3: jnp.ndarray, S: int, ci_splits) -> jnp.ndarray:
    """[k, ΣCi, Co] W-axis kernel slice -> [Σ S·Ci, S·Co] banded matrix.

    Row layout is stream-major then slot-major then channel (the packed
    concat layout); column block πo gets kernel tap πi-πo+k//2 at row block
    (stream j, slot πi) for |πi-πo| <= k//2."""
    k, _, Co = w3.shape
    r = k // 2
    dt = w3.dtype
    cum = 0
    stream_rows = []
    for ci in ci_splits:
        w3j = w3[:, cum:cum + ci]                      # [k, ci, Co]
        cum += ci
        cols = []
        for po in range(S):
            blocks = [
                w3j[pi - po + r] if abs(pi - po) <= r
                else jnp.zeros((ci, Co), dt)
                for pi in range(S)
            ]
            cols.append(jnp.concatenate(blocks, axis=0))   # [S·ci, Co]
        stream_rows.append(jnp.concatenate(cols, axis=1))  # [S·ci, S·Co]
    return jnp.concatenate(stream_rows, axis=0)


def blockdiag_matrix(w1: jnp.ndarray, S: int, ci_splits) -> jnp.ndarray:
    """[ΣCi, Co] 1³-conv kernel -> [Σ S·Ci, S·Co] slot-preserving block
    diagonal (band k=1)."""
    return band_matrix(w1[None], S, ci_splits)


def _edge_slices(Pp, S, ci_splits, offs, dz, dy, D, H, U, side: str):
    """Cross-block edge operand: for every stream, the slot-(S-1) (left) or
    slot-0 (right) channels of the W-neighbour block, concatenated to
    [B, D, H, U, ΣCi]."""
    u0 = 0 if side == "left" else 2
    parts = []
    for off, ci in zip(offs, ci_splits):
        c0 = off + (S - 1) * ci if side == "left" else off
        parts.append(Pp[:, dz:dz + D, dy:dy + H, u0:u0 + U, c0:c0 + ci])
    return jnp.concatenate(parts, axis=-1)


def conv3_wpack(P: jnp.ndarray, w: jnp.ndarray, S: int, ci_splits) -> jnp.ndarray:
    """k=3 'SAME' stride-1 conv on a W-packed (possibly multi-stream) tensor.

    P: [B, D, H, U, Σ S·Ci] (stream-major packed concat); w: [3, 3, 3, ΣCi,
    Co] (nn.Conv layout, per-voxel channel order = streams concatenated).
    Returns [B, D, H, U, S·Co]. 9 shifted banded matmuls + 2×9 skinny edge
    matmuls; the input is read ~9 times at full lane width (vs 27 times at
    Ci/128 lanes for the shifted-dot form)."""
    # S=1 would make the final concat's third slice span the whole tensor
    # (2*Co channels, edge terms double-applied) — packing is meaningless at
    # S=1 anyway, so reject it outright (ADVICE r4).
    assert S >= 2, "conv3_wpack requires pack factor S >= 2 (S=1 is unpacked)"
    B, D, H, U, _ = P.shape
    Co = w.shape[-1]
    dt = P.dtype
    offs = _stream_offsets(S, ci_splits)
    Pp = jnp.pad(P, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    lacc = None
    racc = None
    for dz in range(3):
        for dy in range(3):
            w3 = w[dz, dy].astype(dt)                   # [3, ΣCi, Co]
            M = band_matrix(w3, S, ci_splits)           # [ΣS·Ci, S·Co]
            base = Pp[:, dz:dz + D, dy:dy + H, 1:1 + U, :]
            t = jnp.einsum("bdhuc,cf->bdhuf", base, M)
            out = t if out is None else out + t
            left = _edge_slices(Pp, S, ci_splits, offs, dz, dy, D, H, U,
                                "left")
            tl = jnp.einsum("bdhuc,cf->bdhuf", left, w3[0])
            lacc = tl if lacc is None else lacc + tl
            right = _edge_slices(Pp, S, ci_splits, offs, dz, dy, D, H, U,
                                 "right")
            tr = jnp.einsum("bdhuc,cf->bdhuf", right, w3[2])
            racc = tr if racc is None else racc + tr
    return jnp.concatenate(
        [out[..., :Co] + lacc,
         out[..., Co:(S - 1) * Co],
         out[..., (S - 1) * Co:] + racc], axis=-1)


def pointwise_wpack(P: jnp.ndarray, w1: jnp.ndarray, S: int, ci_splits) -> jnp.ndarray:
    """1³ conv on a W-packed multi-stream tensor: one block-diagonal matmul
    (slot-preserving; the zeros cost ~S× FLOPs of an already-tiny op but keep
    the tensor lane-packed). w1: [ΣCi, Co]."""
    M = blockdiag_matrix(w1.astype(P.dtype), S, ci_splits)
    return jnp.einsum("bdhuc,cf->bdhuf", P, M)


def pointwise_slots(P: jnp.ndarray, w1: jnp.ndarray, S: int) -> jnp.ndarray:
    """1³ conv on a single-stream slot-packed tensor via the slot-reshaped
    einsum: the [.., S, C] view of the packed minor dim is free (S and C are
    memory-adjacent), so each slot contracts with the SAME [C, Co] kernel and
    no block-diagonal zero FLOPs are spent. Preferred over pointwise_wpack
    when S·C is large (e.g. the class-packed up block at S=8: the block
    diagonal would cost 8× the real FLOPs)."""
    B, D, H, U, SC = P.shape
    C = w1.shape[0]
    t = P.reshape(B, D, H, U, S, C)
    y = jnp.einsum("bdhusc,cf->bdhusf", t, w1.astype(P.dtype))
    return y.reshape(B, D, H, U, S * w1.shape[-1])


def dw_densify(w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise kernel [k, k, k, 1, C] -> dense [k, k, k, C, C] with
    wd[..., i, j] = w[..., 0, j]·δ(i, j) — a dense conv with wd equals the
    depthwise conv with w exactly."""
    C = w.shape[-1]
    eye = jnp.eye(C, dtype=w.dtype)
    return w[:, :, :, 0, None, :] * eye


def dw_conv_wpack_banded(P: jnp.ndarray, w: jnp.ndarray, S: int) -> jnp.ndarray:
    """Depthwise k=3 'SAME' stride-1 conv on a W-packed tensor via the BANDED
    matmul form: conv3_wpack with the kernel densified to its diagonal dense
    equivalent. 9 shifted full-lane matmuls (the [S·C, S·C] band matrix
    absorbs the intra-block W taps) + 18 skinny edge terms — vs
    dw_conv_wpack's 27 taps over 2·(k//2) slot-shift tensors, whose minor-
    axis concat relayouts lost the round-4 MedNeXt W-pack A/B. The band
    matrix is 3C/(S·C)² sparse but MXU-shaped; at S·C=128 the zero FLOPs are
    free next to the lane-starved traffic they replace."""
    assert w.shape[0] == 3, "banded dw form is k=3 only"
    C = w.shape[-1]
    return conv3_wpack(P, dw_densify(w), S, (C,))


def instance_norm_wpack(P: jnp.ndarray, S: int, scale=None, bias=None,
                        epsilon: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm3d on a single-stream W-packed tensor [B, D, H, U, S·C]:
    per-(b, c) statistics over (D, H, U, slot) — exactly the unpacked norm's
    statistics up to f32 reduction order. All full-tensor work stays on the
    lane-packed layout; only the [B, S·C] -> [B, C] slot fold is tiny."""
    B, D, H, U, SC = P.shape
    C = SC // S
    n = D * H * U * S
    xf = P.astype(jnp.float32)
    s1 = jnp.sum(xf, (1, 2)).sum(1)                     # [B, S·C]
    s2 = jnp.sum(jnp.square(xf), (1, 2)).sum(1)         # [B, S·C]
    s1c = s1.reshape(B, S, C).sum(1)                    # [B, C]
    s2c = s2.reshape(B, S, C).sum(1)
    mean = s1c / n
    var = jnp.maximum(s2c / n - jnp.square(mean), 0.0)
    # broadcast per-channel stats back to the packed minor axis
    mean_p = jnp.tile(mean, (1, S))[:, None, None, None, :]
    rstd_p = jnp.tile(jax.lax.rsqrt(var + epsilon), (1, S))[
        :, None, None, None, :]
    y = (xf - mean_p) * rstd_p
    if scale is not None:
        y = y * jnp.tile(scale.astype(jnp.float32), S)
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), S)
    return y.astype(P.dtype)


def parity_interleave_packed(x6: jnp.ndarray, S: int) -> jnp.ndarray:
    """[B, D, H, W, 8, C] parity classes (z-major (pz,py,pw) order, as
    models.layers.parity_interleave) -> W-packed [B, 2D, 2H, 2W/S, S·C] in
    ONE transpose — the interleave and the pack relayout fused. Slot
    s = 2j + pw holds global w' = S·u + s = 2·((S//2)·u + j) + pw."""
    B, D, H, W, _, C = x6.shape
    J = S // 2
    x = x6.reshape(B, D, H, W // J, J, 2, 2, 2, C)
    x = x.transpose(0, 1, 5, 2, 6, 3, 4, 7, 8)   # [B,D,pz,H,py,U,j,pw,C]
    return x.reshape(B, 2 * D, 2 * H, 2 * W // S, S * C)


def slot_shift(P: jnp.ndarray, dx: int, C: int, S: int) -> jnp.ndarray:
    """Shift a single-stream packed tensor by dx W positions (zero edges):
    out[..., u, s·C:(s+1)·C] = x at global w = u·S + s + dx. A |dx|·C
    lane-group slice + the matching sliver of the W-neighbour block."""
    B, D, H, U, SC = P.shape
    if dx == 0:
        return P
    z = ((0, 0), (0, 0), (0, 0))
    if dx > 0:
        nxt = jnp.pad(P[:, :, :, 1:, :dx * C], z + ((0, 1), (0, 0)))
        return jnp.concatenate([P[..., dx * C:], nxt], axis=-1)
    d = -dx
    prev = jnp.pad(P[:, :, :, :-1, SC - d * C:], z + ((1, 0), (0, 0)))
    return jnp.concatenate([prev, P[..., :SC - d * C]], axis=-1)


def dw_conv_wpack(P: jnp.ndarray, w: jnp.ndarray, S: int) -> jnp.ndarray:
    """Depthwise k³ 'SAME' stride-1 conv on a W-packed tensor.

    P: [B, D, H, U, S·C]; w: [k, k, k, 1, C] (DepthwiseConv3D layout).
    D/H taps are plain spatial shifts (packing leaves those axes alone); the
    W taps are the 2·(k//2) slot-shift tensors built once — every
    multiply-add then runs at full lane width (the unpacked stencil reads
    C/128 lanes). Requires S > k//2 (slot shifts stay within one block)."""
    B, D, H, U, SC = P.shape
    C = SC // S
    k = w.shape[0]
    r = k // 2
    assert S > r, f"S={S} must exceed k//2={r}"
    dt = P.dtype
    pads = ((0, 0), (r, r), (r, r), (0, 0), (0, 0))
    shifted = {dx: jnp.pad(slot_shift(P, dx, C, S), pads)
               for dx in range(-r, r + 1)}
    out = None
    for dz in range(k):
        for dy in range(k):
            for dx in range(-r, r + 1):
                wt = jnp.tile(w[dz, dy, dx + r, 0].astype(dt), S)
                term = shifted[dx][:, dz:dz + D, dy:dy + H] * wt
                out = term if out is None else out + term
    return out


def convtranspose2_wpack(x: jnp.ndarray, w: jnp.ndarray, S: int) -> jnp.ndarray:
    """ConvTranspose k=s=2 'VALID' from an UNPACKED [B, D, H, W, C] input to
    a W-packed [B, 2D, 2H, 2W/S, S·F] output.

    w: [2, 2, 2, C, F] in flax nn.ConvTranspose layout (caller passes the
    module kernel verbatim; the spatial flip lax.conv_transpose applies is
    handled here). Non-overlapping windows ⇒ one [C, 8F] matmul; the D/H
    interleave is one transpose whose minor axis is the packed (2·F·S/2…)
    channel group — the W interleave happens inside the free final reshape."""
    B, D, H, W, C = x.shape
    F = w.shape[-1]
    wf = w[::-1, ::-1, ::-1]                            # flax flip
    y = jnp.einsum("bdhwc,ck->bdhwk", x,
                   wf.reshape(8, C, F).transpose(1, 0, 2)
                   .reshape(C, 8 * F).astype(x.dtype))
    # k-axis order is (pd, ph, pw, f); move pd into D and ph into H, keep
    # (w, pw, f) adjacent so the W interleave is a reshape.
    y = y.reshape(B, D, H, W, 2, 2, 2 * F)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6)                # [B,D,2,H,2,W,2F]
    y = y.reshape(B, 2 * D, 2 * H, (2 * W) // S, S * F)
    return y
