"""Profile a jitted forward on the real TPU and print top HLO ops by device time.

Usage: python benchmarks/profile_forward.py [model] [batch] [size]
Writes the xplane trace under /tmp/micprof and aggregates the device-side
"XLA Ops" line into a per-op-category table — the data that drives kernel
work (TODO.md perf section).
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def parse_xspace(trace_dir: str):
    """Sum event durations by event name on device planes of the xplane trace."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    totals = collections.Counter()
    plane_names = []
    for p in paths:
        xspace = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            plane_names.append(plane.name)
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            ev_names = dict(plane.event_metadata.items())
            for line in plane.lines:
                for ev in line.events:
                    md = ev_names.get(ev.metadata_id)
                    name = md.name if md else str(ev.metadata_id)
                    totals[name] += ev.duration_ps
    return totals, plane_names


def summarize(trace_dir: str, n_calls: int = 3, top: int = 30):
    """Aggregate the TPU plane's 'XLA Ops' line by (op kind, output shape) —
    the attribution view the round-2 kernel work was driven from."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    planes = [p for p in xspace.planes if p.name.startswith("/device:TPU")]
    assert planes, "no TPU plane in trace"
    plane = planes[0]
    md = dict(plane.event_metadata.items())
    mods = [l for l in plane.lines if l.name == "XLA Modules"]
    if mods:
        tot = sum(e.duration_ps for e in mods[0].events)
        print(f"device time: {tot / n_calls / 1e9:.1f} ms/call "
              f"({len(mods[0].events)} module executions)")
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]
    sig, cnt = collections.Counter(), collections.Counter()
    for ev in line.events:
        name = md[ev.metadata_id].name
        m = re.match(r"%?[\w\-\.]+ = (\S+?)\{", name)
        s = m.group(1) if m else name[:40]
        kindm = re.match(r"%?([a-zA-Z\-_]+)", name)
        key = f"{kindm.group(1) if kindm else '?'} -> {s}"
        sig[key] += ev.duration_ps
        cnt[key] += 1
    T = max(sum(sig.values()), 1)
    for k, ps in sig.most_common(top):
        print(f"  {ps/1e9:8.2f} ms {100*ps/T:5.1f}%  x{cnt[k]:4d}  {k}")


CATEGORIES = [
    ("conv", re.compile(r"conv", re.I)),
    ("dot/matmul", re.compile(r"dot|einsum", re.I)),
    ("gather", re.compile(r"gather|take", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("transpose/copy", re.compile(r"transpose|copy|reshape|bitcast", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("fusion(other)", re.compile(r"fusion", re.I)),
]


def categorize(totals: collections.Counter):
    cat = collections.Counter()
    for name, ps in totals.items():
        for label, rx in CATEGORIES:
            if rx.search(name):
                cat[label] += ps
                break
        else:
            cat["other"] += ps
    return cat


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "micformer"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from micformer_tpu import registry

    model = registry.build(model_name, num_classes=8, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 2, size, size, size), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)
    fwd = jax.jit(lambda v, x: model.apply(v, x))

    print("compiling...", flush=True)
    fwd(variables, x)[0].block_until_ready()
    import time

    t0 = time.perf_counter()
    for _ in range(3):
        out = fwd(variables, x)
    out.block_until_ready()
    print(f"steady-state: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/call", flush=True)

    trace_dir = "/tmp/micprof"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fwd(variables, x)
        out.block_until_ready()

    totals, planes = parse_xspace(trace_dir)
    print("planes:", sorted(set(planes)))
    total_ps = sum(totals.values())
    print(f"\n== top 40 device events ({total_ps/1e9:.2f} ms total, 3 calls) ==")
    for name, ps in totals.most_common(40):
        print(f"{ps/1e9:9.3f} ms  {100*ps/max(total_ps,1):5.1f}%  {name[:140]}")
    print("\n== by category ==")
    for label, ps in categorize(totals).most_common():
        print(f"{ps/1e9:9.3f} ms  {100*ps/max(total_ps,1):5.1f}%  {label}")


if __name__ == "__main__":
    main()
