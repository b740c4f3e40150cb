"""Component microbenchmarks — attribute flagship forward time to ops.

Usage: python benchmarks/microbench.py [component ...]
Components: warp, attn_fused, attn_einsum, crossblock, selfblock, offsets.
Run ONE at a time on the TPU (single chip — see memory note on serialization).
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: p50 {np.percentile(ts, 50)*1000:.3f} ms")
    return out


def main(components):
    from micformer_tpu.ops.warp import stn_warp
    from micformer_tpu.ops.windows import window_partition, window_reverse
    from micformer_tpu.ops.attention import split_heads, merge_heads, multi_head_attention
    from micformer_tpu.ops.pallas.window_attention import fused_window_attention
    from micformer_tpu.models.micformer import CrossBlock3D
    from micformer_tpu.models.layers import SwinBlock3D

    B, S, C, h = 1, 32, 48, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, S, S, C)).astype(np.float32))
    flow = jnp.asarray(rng.normal(size=(B, 3, S, S, S)).astype(np.float32))

    if "warp" in components:
        timed("stn_warp 32^3x48", jax.jit(stn_warp), x, flow)

    wins = window_partition(x, (2, 2, 2))
    q = split_heads(wins, h)
    if "attn_fused" in components:
        timed("fused_window_attention 4096x8x16",
              jax.jit(lambda q: fused_window_attention(q, q, q)), q)
    if "attn_einsum" in components:
        import micformer_tpu.ops.attention as am

        am.USE_FUSED = False
        timed("einsum attention 4096x8x16",
              jax.jit(lambda q: multi_head_attention(q, q, q)), q)
        am.USE_FUSED = True

    if "crossblock" in components:
        blk = CrossBlock3D(dim=C, num_heads=h, window_size=(2, 2, 2))
        v = jax.jit(blk.init)(jax.random.key(0), x, x)
        timed("CrossBlock3D 32^3x48", jax.jit(lambda a, b: blk.apply(v, a, b)), x, x)

    if "selfblock" in components:
        blk = SwinBlock3D(dim=C, num_heads=h, window_size=(2, 2, 2))
        v = jax.jit(blk.init)(jax.random.key(0), x)
        timed("SwinBlock3D 32^3x48", jax.jit(lambda a: blk.apply(v, a)), x)


if __name__ == "__main__":
    main(sys.argv[1:] or ["warp", "attn_fused", "attn_einsum", "crossblock", "selfblock"])
