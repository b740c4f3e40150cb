"""Validate mirror-TTA at sw_batch>=2 on the real chip (the round-1 HBM
device fault) and report TTA throughput. One JSON line like bench.py."""

from __future__ import annotations

import functools
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    from micformer_tpu import registry
    from micformer_tpu.infer import sliding_window_inference

    sw_batch = int(os.environ.get("MICFORMER_TTA_SWBATCH", "2"))
    model = registry.build("micformer", num_classes=8, dtype=jnp.bfloat16)
    roi = (128, 128, 128)
    x0 = jnp.zeros((1, 2) + roi, jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x0)

    def predictor(win):
        return model.apply(variables, win)

    infer = jax.jit(functools.partial(
        sliding_window_inference, roi_size=roi, predictor=predictor,
        num_classes=8, overlap=0.5, blend="gaussian", step_mode="nnunet",
        sw_batch_size=sw_batch, mirror_tta=True,
    ))
    vol = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(1, 2, 160, 160, 160)).astype(np.float32))
    out = infer(vol)
    out.block_until_ready()
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        infer(vol).block_until_ready()
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    print(json.dumps({
        "metric": "tta_volumes_per_sec", "value": round(1.0 / lat.mean(), 4),
        "unit": "volumes/s/chip", "vs_baseline": None,
        "sw_batch_size": sw_batch, "mirror_tta": True,
        "p50_latency_s": round(float(np.percentile(lat, 50)), 4),
    }))


if __name__ == "__main__":
    main()
