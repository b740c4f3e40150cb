"""Profile one jitted train step on the real TPU — op-level device time.

Usage: python benchmarks/profile_train.py [model] [batch] [size] [augment]
Companion to profile_forward.py; the backward pass has its own hot spots
(the warp gather's gradient is a scatter-add; attention backward runs the
einsum vjp)."""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "micformer"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    augment = sys.argv[4] if len(sys.argv) > 4 else "monai"

    from micformer_tpu import registry
    from micformer_tpu.train import Trainer, TrainConfig

    model = registry.build(model_name, num_classes=8, dtype=jnp.bfloat16)
    cfg = TrainConfig(num_classes=8, augment=augment, run_dir="/tmp/proftrain")
    trainer = Trainer(model, cfg)
    state = trainer.init_state((batch, 2, size, size, size))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, 2, size, size, size))
                         .astype(np.float16))
    labels = jnp.asarray(rng.integers(0, 8, (batch, size, size, size))
                         .astype(np.uint8))
    key = jax.random.key(0)

    print("compiling...", flush=True)
    state, m = trainer.train_step(state, images, labels, key)
    jax.block_until_ready(m["loss"])

    import time
    t0 = time.perf_counter()
    for _ in range(3):
        state, m = trainer.train_step(state, images, labels, key)
    jax.block_until_ready(m["loss"])
    print(f"steady-state: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/step "
          f"(dispatch-sync caveat applies)", flush=True)

    import os
    trace_dir = "/tmp/micprof_train"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, m = trainer.train_step(state, images, labels, key)
        jax.block_until_ready(m["loss"])
    print(f"trace written to {trace_dir}")

    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from profile_forward import summarize

    summarize(trace_dir)


if __name__ == "__main__":
    main()
