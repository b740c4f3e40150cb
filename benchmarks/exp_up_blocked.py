"""A/B: MICFORMER_UP_BLOCKED (deferred-interleave MedNeXt up block).

Runs the zoo_bench single-family protocol (p50 blocking latency over 10
calls + best-of-3 pipelined batches) for mednext with the flag off/on in
alternating subprocesses (ABAB — same-session pairs are impossible because
the flag binds at import; alternation controls relay drift instead).

Usage: python benchmarks/exp_up_blocked.py [model] [flag_name]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ARM = r"""
import os, time, json
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from micformer_tpu import registry

model = registry.build(os.environ["EXP_MODEL"], num_classes=8, dtype=jnp.bfloat16)
x0 = jnp.zeros((1, 2, 128, 128, 128), jnp.float32)
variables = jax.jit(model.init)(jax.random.key(0), x0)
fwd = jax.jit(lambda v, x: model.apply(v, x))

def drain(o):
    _ = np.asarray(o[..., :1, :1, :1])

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(1, 2, 128, 128, 128)).astype(np.float32))
t0 = time.perf_counter()
drain(fwd(variables, x))
compile_s = time.perf_counter() - t0
lat = []
for _ in range(10):
    t1 = time.perf_counter()
    drain(fwd(variables, x))
    lat.append(time.perf_counter() - t1)
pipelined = float("inf")
for _ in range(3):
    t1 = time.perf_counter()
    outs = [fwd(variables, x) for _ in range(10)]
    drain(outs[-1])
    pipelined = min(pipelined, (time.perf_counter() - t1) / 10)
lat = np.asarray(lat)
print("RESULT " + json.dumps({
    "p50": round(float(np.percentile(lat, 50)), 4),
    "mean": round(float(lat.mean()), 4),
    "wps": round(1.0 / min(pipelined, float(lat.mean())), 2),
    "compile_s": round(compile_s, 1),
}))
"""


def run_arm(model: str, flag: str, val: str) -> dict:
    env = dict(os.environ, EXP_MODEL=model)
    env[flag] = val
    out = subprocess.run([sys.executable, "-c", ARM], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    print(out.stdout[-2000:], out.stderr[-2000:], sep="\n---\n")
    raise RuntimeError(f"arm {flag}={val} produced no RESULT")


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "mednext"
    flag = sys.argv[2] if len(sys.argv) > 2 else "MICFORMER_UP_BLOCKED"
    for rnd in range(2):
        for val in ("0", "1"):
            r = run_arm(model, flag, val)
            print(f"[round {rnd}] {flag}={val}: {r}", flush=True)


if __name__ == "__main__":
    main()
