"""Pallas depthwise-conv stencil kernel (round-4 MedNeXt perf pass).

The XLA lowering of the shift-and-add depthwise form
(models/layers.py dw_conv_stencil) re-reads the padded input once per tap —
k³ = 27 HBM passes per conv; the full-resolution MedNeXt stage pays
~12.8 ms/conv for what is ~1 ms of traffic (benchmarks/RESULTS.md round 4).
This kernel streams one output plane per grid step: the k contributing input
planes are DMA'd to VMEM once and all k³ taps are computed from VMEM, so HBM
traffic is k reads + 1 write per plane (and the pipeline overlaps the
neighbour-plane rereads).

Lane packing: planes are viewed as [Hp, Wp·C] (a free reshape — C is minor)
so the VMEM blocks use full 128-lane tiles even at C=32; a W-shift by dx is
a lane slice at offset dx·C. Weights arrive pre-tiled to [k³, W·C].

Layout contract: channels-last [B, D, H, W, C], kernel [k, k, k, 1, C]
(flax grouped-Conv layout), SAME padding k//2, stride 1 — the MedNeXt
"same"-mode blocks, which carry ~80% of the family's stencil traffic. The
down/up modes keep the XLA parity-view forms (models/layers.py).

Differentiable via custom VJP: dx is the same kernel with the spatially
flipped kernel; dw is a tap-correlation reduce done in XLA (27 small
multiply-reduces — the backward is not on the serving path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(wref, *refs, k: int, H: int, W: int, C: int):
    """refs = (plane_0 .. plane_{k-1}, out). Plane ref dz is
    [1, 1, Hp, Wp·C] (pre-padded input at depth d+dz, lane-packed); out is
    [1, 1, H, W·C]. wref is [k³, W·C] (kernel tiled W times per tap)."""
    out_ref = refs[-1]
    acc = None
    i = 0
    for dz in range(k):
        plane = refs[dz][0, 0]                       # [Hp, Wp·C]
        for dy in range(k):
            for dx in range(k):
                tap = plane[dy:dy + H, dx * C:dx * C + W * C]
                term = tap * wref[i][None, :]
                acc = term if acc is None else acc + term
                i += 1
    out_ref[0, 0] = acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv3_pallas(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """Depthwise k³ SAME conv, stride 1: x [B,D,H,W,C] · w [k,k,k,1,C]."""
    return _forward(x, w, interpret)


def _forward(x, w, interpret=False):
    B, D, H, W, C = x.shape
    k = w.shape[0]
    p = k // 2
    # pre-pad once in XLA (one cheap pass); the kernel then only does
    # static VMEM slicing. D padded too so plane d+dz is always in range.
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)))
    Hp, Wp = H + 2 * p, W + 2 * p
    xp = xp.reshape(B, D + 2 * p, Hp, Wp * C)        # free: C, W contiguous
    # [k³, W·C]: per-tap channel weights tiled across the packed W lanes
    wt = jnp.broadcast_to(
        w.reshape(k * k * k, 1, C).astype(x.dtype), (k * k * k, W, C)
    ).reshape(k * k * k, W * C)

    plane_specs = [
        pl.BlockSpec((1, 1, Hp, Wp * C),
                     (lambda b, d, dz=dz: (b, d + dz, 0, 0)),
                     memory_space=pltpu.VMEM)
        for dz in range(k)
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, H=H, W=W, C=C),
        grid=(B, D),
        in_specs=[pl.BlockSpec((k * k * k, W * C), lambda b, d: (0, 0),
                               memory_space=pltpu.VMEM)] + plane_specs,
        out_specs=pl.BlockSpec((1, 1, H, W * C), lambda b, d: (b, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W * C), x.dtype),
        interpret=interpret,
    )(wt, *([xp] * k))
    return out.reshape(B, D, H, W, C)


def _fwd(x, w, interpret):
    return _forward(x, w, interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    B, D, H, W, C = x.shape
    k = w.shape[0]
    # dx: correlate g with the spatially flipped kernel (same SAME geometry)
    dx = _forward(g, w[::-1, ::-1, ::-1], interpret)
    # dw[t, c] = Σ_p g[p, c] · x[p + t - p0, c]: tap-correlation reduces in
    # XLA (f32 accumulation; backward is train-path only)
    p0 = k // 2
    xp = jnp.pad(x, ((0, 0), (p0, p0), (p0, p0), (p0, p0), (0, 0)))
    taps = []
    for dz in range(k):
        for dy in range(k):
            for dx_ in range(k):
                sl = xp[:, dz:dz + D, dy:dy + H, dx_:dx_ + W, :]
                taps.append(jnp.sum((sl * g).astype(jnp.float32),
                                    axis=(0, 1, 2, 3)))
    dw = jnp.stack(taps, 0).reshape(k, k, k, 1, C).astype(w.dtype)
    return dx.astype(x.dtype), dw


dw_conv3_pallas.defvjp(_fwd, _bwd)
