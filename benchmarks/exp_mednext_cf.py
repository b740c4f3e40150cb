"""A/B: MedNeXt same-mode block, channels-last stencil (current) vs
channels-first lane-major formulation (round-4 experiment).

Hypothesis: at C=32 the channels-minor layout uses 32/128 lanes for every
elementwise/stencil op in the block (the profile's [.,.,8,17,32] fusions run
~16 ms where bandwidth says ~2); putting W on the lane dim (channels-first
[B,C,D,H,W]) runs every op full-lane: dw taps become lane shifts, the
expand/compress pointwise convs become [O,C]x[C,M] MXU matmuls with the
spatial dim minor, InstanceNorm reduces the minor dims in one pass.

Usage: python benchmarks/exp_mednext_cf.py [size [channels [reps]]]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def block_cl(x, wdw, scale, bias, wexp, bexp, wcmp, bcmp):
    """Current channels-last form (models/layers.py dw_conv_stencil +
    PointwiseConv + InstanceNorm), inlined: x [B,D,H,W,C]."""
    k, p = 3, 1
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)))
    B, D, H, W, C = x.shape
    acc = None
    for dz in range(k):
        for dy in range(k):
            for dx in range(k):
                tap = jax.lax.slice(
                    xp, (0, dz, dy, dx, 0), (B, dz + D, dy + H, dx + W, C))
                term = tap * wdw[dz, dy, dx, 0]
                acc = term if acc is None else acc + term
    h = acc
    # two-stage IN stats
    n = D * H * W
    hf = h.astype(jnp.float32)
    s1 = jnp.sum(hf, (1, 2)).sum(1)
    s2 = jnp.sum(jnp.square(hf), (1, 2)).sum(1)
    mean = (s1 / n)[:, None, None, None, :]
    var = jnp.maximum(s2 / n - jnp.square(s1 / n), 0.0)[:, None, None, None, :]
    h = ((h - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
    h = h * scale + bias
    h = jnp.einsum("bdhwc,ce->bdhwe", h, wexp) + bexp
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("bdhwe,ec->bdhwc", h, wcmp) + bcmp
    return h + x


def block_cf(x, wdw, scale, bias, wexp, bexp, wcmp, bcmp):
    """Channels-first lane-major form: x [B,C,D,H,W]; same math, same
    params (wdw [k,k,k,1,C], wexp [C,E], wcmp [E,C])."""
    k, p = 3, 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p), (p, p)))
    B, C, D, H, W = x.shape
    wt = jnp.moveaxis(wdw[:, :, :, 0, :], -1, 0)     # [C,k,k,k]
    acc = None
    for dz in range(k):
        for dy in range(k):
            for dx in range(k):
                tap = jax.lax.slice(
                    xp, (0, 0, dz, dy, dx), (B, C, dz + D, dy + H, dx + W))
                term = tap * wt[:, dz, dy, dx][None, :, None, None, None]
                acc = term if acc is None else acc + term
    h = acc
    n = D * H * W
    hf = h.astype(jnp.float32)
    s1 = jnp.sum(hf, (2, 3, 4))                       # [B,C]
    s2 = jnp.sum(jnp.square(hf), (2, 3, 4))
    mean = (s1 / n)[:, :, None, None, None]
    var = jnp.maximum(s2 / n - jnp.square(s1 / n), 0.0)[:, :, None, None, None]
    h = ((h - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
    h = h * scale[:, None, None, None] + bias[:, None, None, None]
    h = jnp.einsum("bcdhw,ce->bedhw", h, wexp) + bexp[:, None, None, None]
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("bedhw,ec->bcdhw", h, wcmp) + bcmp[:, None, None, None]
    return h + x


def block_dense(x, wdw, scale, bias, wexp, bexp, wcmp, bcmp):
    """Depthwise conv embedded block-diagonally into a DENSE 3^3 lax.conv:
    w_dense[dz,dy,dx,i,o] = wdw[dz,dy,dx,0,o] * (i==o). 27x32x32 MACs/voxel
    are free on the MXU; HBM traffic drops from 27 tap rereads to ~1 read +
    1 write. Exact same math (plus 0*x terms)."""
    C = x.shape[-1]
    wd = wdw[:, :, :, 0, :][..., None, :] * jnp.eye(C, dtype=wdw.dtype)[
        None, None, None]                                  # [k,k,k,C,C]
    h = jax.lax.conv_general_dilated(
        x, wd, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    B, D, H, W, _ = x.shape
    n = D * H * W
    hf = h.astype(jnp.float32)
    s1 = jnp.sum(hf, (1, 2)).sum(1)
    s2 = jnp.sum(jnp.square(hf), (1, 2)).sum(1)
    mean = (s1 / n)[:, None, None, None, :]
    var = jnp.maximum(s2 / n - jnp.square(s1 / n), 0.0)[:, None, None, None, :]
    h = ((h - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
    h = h * scale + bias
    h = jnp.einsum("bdhwc,ce->bdhwe", h, wexp) + bexp
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("bdhwe,ec->bdhwc", h, wcmp) + bcmp
    return h + x


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    E = 2 * C
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    params = [
        jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 1, C)), dt),   # wdw
        jnp.asarray(rng.normal(1, 0.1, (C,)), dt),              # scale
        jnp.asarray(rng.normal(0, 0.1, (C,)), dt),              # bias
        jnp.asarray(rng.normal(0, 0.1, (C, E)), dt),            # wexp
        jnp.asarray(rng.normal(0, 0.1, (E,)), dt),              # bexp
        jnp.asarray(rng.normal(0, 0.1, (E, C)), dt),            # wcmp
        jnp.asarray(rng.normal(0, 0.1, (C,)), dt),              # bcmp
    ]
    x_cl = jnp.asarray(rng.normal(0, 1, (1, size, size, size, C)), dt)
    x_cf = jnp.moveaxis(x_cl, -1, 1)

    # chain N blocks inside ONE jit: a single block call sits at the relay's
    # ~35 ms dispatch floor and measures nothing (first A/B of this file)
    chain = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    def chain_fn(block):
        def f(x, *params):
            for _ in range(chain):
                x = block(x, *params)
            return x
        return f

    f_cl = jax.jit(chain_fn(block_cl))
    f_cf = jax.jit(chain_fn(block_cf))
    f_de = jax.jit(chain_fn(block_dense))
    a = f_cl(x_cl, *params)
    b = f_cf(x_cf, *params)
    d = f_de(x_cl, *params)
    err = float(jnp.max(jnp.abs(a - jnp.moveaxis(b, 1, -1))))
    errd = float(jnp.max(jnp.abs(a - d)))
    print(f"parity max abs err: cf {err:.2e}  dense {errd:.2e}")

    for name, f, x in (("cl", f_cl, x_cl), ("cf", f_cf, x_cf),
                       ("dense", f_de, x_cl)):
        f(x, *params).block_until_ready()
        lat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f(x, *params).block_until_ready()
            lat.append(time.perf_counter() - t0)
        print(f"{name}: p50 {np.percentile(lat, 50)*1e3:.2f} ms  "
              f"min {min(lat)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
