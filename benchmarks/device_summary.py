"""Device-time-only xplane summarizer (overlap-corrected).

The raw per-op xplane tables on this relay are overlap-inflated: async
param copy-starts and long DMA events span intervals that overlap real
compute on the same "XLA Ops" lane, so naive per-op duration sums read ~4x
the trusted "XLA Modules" total (benchmarks/RESULTS.md round-3 tail). This
tool makes the per-op attribution sum EXACTLY to occupied device time:

  - per op key (HLO kind -> output signature, as profile_forward.summarize),
    a sweep over the XLA Ops lane splits every instant equally among the
    events covering it ("exclusive" ms);
  - the union occupancy and the XLA Modules total are printed so coverage
    is visible (occupancy <= module time; the gap is inter-op bubbles).

Usage:
  python benchmarks/device_summary.py <trace_dir> [n_calls] [top]
  python benchmarks/device_summary.py --run <model> [batch] [size]   # trace then summarize

`--run` traces 3 jitted forward calls like profile_forward.py.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys


def _load_tpu_plane(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    planes = [p for p in xspace.planes if p.name.startswith("/device:TPU")]
    assert planes, f"no TPU plane in trace (planes: {[p.name for p in xspace.planes]})"
    return planes[0]


def _key(name: str) -> str:
    m = re.match(r"%?[\w\-\.]+ = (\S+?)\{", name)
    s = m.group(1) if m else name[:40]
    kindm = re.match(r"%?([a-zA-Z\-_]+)", name)
    return f"{kindm.group(1) if kindm else '?'} -> {s}"


def exclusive_times(events):
    """events: [(start_ps, dur_ps, key)]. Sweep the lane; at each instant the
    covering events share it equally. Returns (per-key Counter of ps, union
    occupancy ps)."""
    bounds = []  # (time, +1/-1, idx)
    for i, (t0, dur, _) in enumerate(events):
        bounds.append((t0, 1, i))
        bounds.append((t0 + dur, -1, i))
    bounds.sort(key=lambda b: (b[0], -b[1]))
    active: set[int] = set()
    out = collections.Counter()
    union = 0
    prev_t = None
    for t, delta, i in bounds:
        if prev_t is not None and active and t > prev_t:
            span = t - prev_t
            union += span
            share = span / len(active)
            for j in active:
                out[events[j][2]] += share
        (active.add if delta > 0 else active.discard)(i)
        prev_t = t
    return out, union


def summarize(trace_dir: str, n_calls: int = 3, top: int = 30):
    plane = _load_tpu_plane(trace_dir)
    md = dict(plane.event_metadata.items())
    mods = [l for l in plane.lines if l.name == "XLA Modules"]
    mod_ps = sum(e.duration_ps for e in mods[0].events) if mods else 0
    if mods:
        print(f"module device time: {mod_ps / n_calls / 1e9:.2f} ms/call "
              f"({len(mods[0].events)} executions / {n_calls} calls)")
    ops = [l for l in plane.lines if l.name == "XLA Ops"]
    assert ops, "no 'XLA Ops' line in TPU plane"
    events, raw = [], collections.Counter()
    cnt = collections.Counter()
    for ev in ops[0].events:
        k = _key(md[ev.metadata_id].name)
        events.append((ev.offset_ps, ev.duration_ps, k))
        raw[k] += ev.duration_ps
        cnt[k] += 1
    excl, union = exclusive_times(events)
    print(f"ops-lane occupancy: {union / n_calls / 1e9:.2f} ms/call "
          f"(raw duration sum {sum(raw.values()) / n_calls / 1e9:.2f} ms/call "
          f"-> inflation x{sum(raw.values()) / max(union, 1):.1f})")
    if mod_ps:
        print(f"bubbles (module - occupancy): "
              f"{(mod_ps - union) / n_calls / 1e9:.2f} ms/call")
    print(f"\n{'excl ms':>9} {'%occ':>5} {'raw ms':>9} {'count':>6}  op")
    T = max(union, 1)
    for k, ps in excl.most_common(top):
        print(f"{ps / 1e9:9.2f} {100 * ps / T:5.1f} {raw[k] / 1e9:9.2f} "
              f"{cnt[k]:6d}  {k}")
    return excl, union, mod_ps


def _run_and_trace(model_name: str, batch: int, size: int) -> str:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from micformer_tpu import registry

    model = registry.build(model_name, num_classes=8, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 2, size, size, size), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    print("compiling...", flush=True)
    fwd(variables, x)[0].block_until_ready()
    trace_dir = "/tmp/micprof_dev"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fwd(variables, x)
        out.block_until_ready()
    return trace_dir


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        model = sys.argv[2] if len(sys.argv) > 2 else "micformer"
        batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        size = int(sys.argv[4]) if len(sys.argv) > 4 else 128
        trace_dir = _run_and_trace(model, batch, size)
        summarize(trace_dir, n_calls=3)
    else:
        trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/micprof"
        n_calls = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        top = int(sys.argv[3]) if len(sys.argv) > 3 else 30
        summarize(trace_dir, n_calls, top)


if __name__ == "__main__":
    main()
