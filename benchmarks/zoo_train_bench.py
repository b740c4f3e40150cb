"""Zoo-wide TRAIN-step benchmark: one measured b1 128³ train step per family
on the real chip (VERDICT r3 item 4 — the round-2 lesson: autodiff can turn a
fine forward into a scatter catastrophe, so every family needs one measured
backward).

Metric: device module time per step from the xplane trace (3 traced steps) —
wall-clock steady-state is relay-dispatch-bound and misleading (see
.claude/skills/verify). The step is the real Trainer.train_step: bf16 model,
monai augment stack fused in, mdice loss, Adam — the reference protocol
(train_mmwhs_noPad.py:108-201).

Results append to zoo_bench_results.json as `train_device_ms`, so a timeout
mid-sweep loses nothing; rerunning skips families already recorded (delete
the key to re-measure). ZOO_BENCH.md picks the column up via
`zoo_bench.py --table`.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from zoo_bench import FAMILIES, RESULTS, _load  # noqa: E402


def _module_device_ms(trace_dir: str, n_calls: int) -> float:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    import glob

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    planes = [p for p in xspace.planes if p.name.startswith("/device:TPU")]
    assert planes, "no TPU plane"
    mods = [l for l in planes[0].lines if l.name == "XLA Modules"]
    assert mods, "no XLA Modules line"
    tot_ps = sum(e.duration_ps for e in mods[0].events)
    return tot_ps / n_calls / 1e9


def bench_train(name: str, batch: int = 1, size: int = 128) -> dict:
    from micformer_tpu import registry
    from micformer_tpu.train import Trainer, TrainConfig

    model = registry.build(name, num_classes=8, dtype=jnp.bfloat16)
    cfg = TrainConfig(num_classes=8, augment="monai",
                      run_dir="/tmp/zoo_train_bench")
    trainer = Trainer(model, cfg)
    state = trainer.init_state((batch, 2, size, size, size))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, 2, size, size, size))
                         .astype(np.float16))
    labels = jnp.asarray(rng.integers(0, 8, (batch, size, size, size))
                         .astype(np.uint8))
    key = jax.random.key(0)

    t0 = time.perf_counter()
    state, m = trainer.train_step(state, images, labels, key)
    jax.block_until_ready(m["loss"])
    compile_s = time.perf_counter() - t0

    trace_dir = "/tmp/zoo_train_trace"
    os.system(f"rm -rf {trace_dir}")
    n = 3
    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            state, m = trainer.train_step(state, images, labels, key)
        jax.block_until_ready(m["loss"])
    dev_ms = _module_device_ms(trace_dir, n)
    return {"train_device_ms": round(dev_ms, 1),
            "train_batch": batch,
            "train_compile_s": round(compile_s, 1)}


def main():
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    results = _load()
    for name in (only or FAMILIES):
        row = results.get(name)
        if row is None:
            print(f"# {name}: no forward row yet, skipping", file=sys.stderr)
            continue
        if "train_device_ms" in row and "--force" not in sys.argv:
            print(f"# {name}: train bench cached, skipping", file=sys.stderr)
            continue
        print(f"# train-benching {name} ...", file=sys.stderr, flush=True)
        try:
            row.update(bench_train(name))
        except Exception as e:  # noqa: BLE001 — record and continue the sweep
            row["train_error"] = f"{type(e).__name__}: {e}"[:200]
            print(f"# {name} FAILED: {row['train_error']}", file=sys.stderr)
        with open(RESULTS, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps({"model": name,
                          **{k: row.get(k) for k in
                             ("train_device_ms", "train_compile_s",
                              "train_error")}}), flush=True)


if __name__ == "__main__":
    main()
