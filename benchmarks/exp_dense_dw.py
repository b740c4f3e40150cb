"""Device-time A/B: depthwise stencil (current) vs block-diagonal DENSE
lax.conv on the MXU, chained blocks, measured from the xplane trace module
line (the only trusted metric on this relay — block_until_ready does not
reliably sync small programs).

Usage: python benchmarks/exp_dense_dw.py [size [C [chain]]]
"""

from __future__ import annotations

import glob
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_mednext_cf import block_cl, block_dense  # noqa: E402


def module_ms(trace_dir, n_calls):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    planes = [p for p in xspace.planes if p.name.startswith("/device:TPU")]
    mods = [l for l in planes[0].lines if l.name == "XLA Modules"]
    return sum(e.duration_ps for e in mods[0].events) / n_calls / 1e9


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    E = 2 * C
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    params = [jnp.asarray(rng.normal(0, 0.1, s), dt) for s in
              [(3, 3, 3, 1, C), (C,), (C,), (C, E), (E,), (E, C), (C,)]]
    x = jnp.asarray(rng.normal(0, 1, (1, size, size, size, C)), dt)

    def mk(block):
        def f(x, *p):
            for _ in range(chain):
                x = block(x, *p)
            return x
        return jax.jit(f)

    for name, f in (("stencil", mk(block_cl)), ("dense", mk(block_dense))):
        out = f(x, *params)
        jax.block_until_ready(out)
        trace = f"/tmp/exp_dense_{name}"
        os.system(f"rm -rf {trace}")
        n = 5
        with jax.profiler.trace(trace):
            for _ in range(n):
                out = f(x, *params)
            jax.block_until_ready(out)
        ms = module_ms(trace, n)
        print(f"{name} chain{chain}: {ms:.2f} ms/call device "
              f"({ms / chain:.2f} ms/block)", flush=True)


if __name__ == "__main__":
    main()
