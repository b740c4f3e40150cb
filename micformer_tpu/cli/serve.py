"""Online serving loop — filesystem-queue inference daemon.

The production-serving surface of the framework: load a trained run ONCE,
keep the jitted sliding-window executable warm, then serve requests
continuously with pipelined dispatch — host preprocessing of request k+1
overlaps device compute of request k, the same overlap that the throughput
bench exploits (bench.py pipelined measurement).

Request protocol (drop files into --watch):
  <name>.npy                  float32/float16 [2, D, H, W] preprocessed
                              CT+MR volume (the cached-dataset layout), or
  ct_<id>_image.nii.gz        raw CT half of a pair; the matching
                              mr_<id>_image.nii.gz is picked up by the
                              dataset filename convention (mmwhs.py
                              CasePaths) and both are normalized + resized
                              exactly like training preprocessing.
Results appear in --out as <name>_seg.nii.gz plus a <name>.done sentinel
holding one JSON line of timing. A request file is claimed once its mtime is
stable (write-complete heuristic) and never reprocessed.

The reference has no serving story (its `test.ipynb` notebooks are offline
batch evals) — this is a TPU-native extension: one warm XLA executable,
static shapes by construction (fixed --target-shape / --roi), so no
per-request compiles ever happen after warmup.
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import threading
import time


def _discover_requests(watch: str, seen: set[str]):
    """New, write-complete request files (npy or ct_*_image.nii.gz)."""
    out = []
    now = time.time()
    try:
        names = sorted(os.listdir(watch))
    except FileNotFoundError:
        return out
    for fn in names:
        path = os.path.join(watch, fn)
        if path in seen or not os.path.isfile(path):
            continue
        is_npy = fn.endswith(".npy")
        is_ct = fn.startswith("ct_") and fn.endswith("_image.nii.gz")
        if not (is_npy or is_ct):
            continue
        try:
            if now - os.path.getmtime(path) < 0.2:
                continue  # possibly still being written
        except OSError:
            continue
        out.append(path)
    return out


def _load_request(path: str, target_shape, normalisation: str):
    """-> (request name, image [2, D, H, W] float32)."""
    import numpy as np

    if path.endswith(".npy"):
        img = np.asarray(np.load(path), dtype=np.float32)
        if img.ndim != 4 or img.shape[0] != 2:
            raise ValueError(f"{path}: expected [2, D, H, W], got {img.shape}")
        return os.path.basename(path)[: -len(".npy")], img

    from micformer_tpu.data import image_utils as iu
    from micformer_tpu.data.nifti import read_nifti

    mr_path = path.replace("ct_", "mr_", 1)
    norm = iu.NORMALIZERS[normalisation]
    ct = norm(read_nifti(path, dtype=np.float32))
    mr = norm(read_nifti(mr_path, dtype=np.float32))
    img = np.stack([iu.resize_trilinear(ct, target_shape),
                    iu.resize_trilinear(mr, target_shape)]).astype(np.float32)
    name = os.path.basename(path)[: -len("_image.nii.gz")]
    return name, img


def main(argv=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MICFORMER_JAX_CACHE", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from micformer_tpu import registry
    from micformer_tpu.data.nifti import write_nifti
    from micformer_tpu.infer import sliding_window_inference
    from micformer_tpu.train.checkpoint import CheckpointManager

    p = argparse.ArgumentParser("micformer_tpu.serve")
    p.add_argument("--run-dir", default=None,
                   help="trained run dir (config.yaml + checkpoints)")
    p.add_argument("--exported", default=None,
                   help="serve an AOT artifact dir (cli.export) instead of a "
                        "run dir — no model zoo / checkpoint load")
    p.add_argument("--ckpt-tag", default="best_dice",
                   choices=["best_dice", "best_loss", "latest"])
    p.add_argument("--model", default=None,
                   help="model family override (default: run config.yaml)")
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--watch", required=True, help="request drop directory")
    p.add_argument("--out", required=True, help="result directory")
    p.add_argument("--target-shape", type=int, default=128,
                   help="serving volume size (static — one executable)")
    p.add_argument("--roi", type=int, default=128)
    p.add_argument("--overlap", type=float, default=0.5)
    p.add_argument("--sw-batch-size", type=int, default=4)
    p.add_argument("--step-mode", default="monai", choices=["monai", "nnunet"])
    p.add_argument("--mirror-tta", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="serve in bfloat16 (the bench protocol)")
    p.add_argument("--normalisation", default="minmax")
    p.add_argument("--poll", type=float, default=0.5,
                   help="watch-directory poll interval (seconds)")
    p.add_argument("--max-requests", type=int, default=None,
                   help="exit after N requests (bounded runs / tests)")
    p.add_argument("--idle-exit", type=float, default=None,
                   help="exit after this many idle seconds (default: run "
                        "forever)")
    args = p.parse_args(argv)
    if not args.run_dir and not args.exported:
        p.error("one of --run-dir / --exported is required")

    os.makedirs(args.out, exist_ok=True)
    ts = (args.target_shape,) * 3

    if args.exported:
        # AOT path: the artifact IS the whole pipeline (tiling + model +
        # blending + argmax); its meta pins the serving shapes.
        from micformer_tpu.convert.aot_export import load_artifact

        call, meta = load_artifact(args.exported)
        if meta["output"] != "argmax_uint8":
            raise SystemExit("serve needs an argmax artifact (re-export "
                             "without --logits)")
        ts = tuple(meta["input_shape"][2:])
        model_name = meta.get("model", "exported")
        infer = call
    else:
        # -- model reconstruction (same rule as cli/predict.py) ------------
        model_name, model_kwargs = args.model, {"num_classes": args.num_classes}
        cfg_path = os.path.join(args.run_dir, "config.yaml")
        if os.path.exists(cfg_path):
            from micformer_tpu.config import load_config

            run_cfg = load_config(cfg_path)
            if model_name is None:
                model_name = run_cfg.model.name
            if model_name == run_cfg.model.name:
                extra = {k: tuple(v) if isinstance(v, list) else v
                         for k, v in run_cfg.model.extra.items()}
                model_kwargs = dict(num_classes=run_cfg.model.num_classes,
                                    **extra)
                if model_name == "micformer" and "embed_dim" not in model_kwargs:
                    model_kwargs["embed_dim"] = run_cfg.model.embed_dim
        model_name = model_name or "micformer"
        if args.bf16:
            model_kwargs["dtype"] = jnp.bfloat16
        model = registry.build(model_name, **model_kwargs)
        params = CheckpointManager(args.run_dir).restore_params_only(
            args.ckpt_tag)

        def predictor(win):
            out = model.apply({"params": params}, win)
            return out[0] if isinstance(out, (list, tuple)) else out

        def infer(volume):
            logits = sliding_window_inference(
                volume, (args.roi,) * 3, predictor,
                num_classes=args.num_classes, overlap=args.overlap,
                sw_batch_size=args.sw_batch_size, step_mode=args.step_mode,
                mirror_tta=args.mirror_tta)
            return jnp.argmax(logits, axis=1).astype(jnp.uint8)

    # -- warmup: compile the one static-shape executable --------------------
    t0 = time.perf_counter()
    warm = jnp.zeros((1, 2) + ts, jnp.float32)
    jax.block_until_ready(infer(warm))
    print(f"serve: {model_name} warm in {time.perf_counter() - t0:.1f}s "
          f"(shape {ts}, roi {args.roi}, sw_batch {args.sw_batch_size}); "
          f"watching {args.watch}", flush=True)

    # -- pipelined request loop --------------------------------------------
    # producer thread: watch + preprocess (host-bound); main thread: device
    # dispatch + export. Queue depth 2 keeps one request preprocessing while
    # the previous one computes.
    req_q: queue.Queue = queue.Queue(maxsize=2)
    seen: set[str] = set()
    stop = threading.Event()

    def produce():
        while not stop.is_set():
            found = _discover_requests(args.watch, seen)
            for path in found:
                seen.add(path)
                try:
                    name, img = _load_request(path, ts, args.normalisation)
                except Exception as e:  # malformed request: report, continue
                    with open(os.path.join(args.out, os.path.basename(path)
                                           + ".error"), "w") as f:
                        f.write(str(e))
                    continue
                req_q.put((name, img, time.time()))
            if not found:
                stop.wait(args.poll)
        req_q.put(None)

    producer = threading.Thread(target=produce, daemon=True)
    producer.start()

    served = 0
    lat_sum = 0.0
    idle_since = time.time()
    try:
        while True:
            try:
                item = req_q.get(timeout=args.poll)
                if item is None:
                    break
            except queue.Empty:
                if (args.idle_exit is not None
                        and time.time() - idle_since > args.idle_exit):
                    break
                continue
            name, img, t_seen = item
            t1 = time.perf_counter()
            seg = infer(jnp.asarray(img[None]))
            seg_np = np.asarray(jax.device_get(seg))[0]
            latency = time.perf_counter() - t1
            out_path = os.path.join(args.out, f"{name}_seg.nii.gz")
            write_nifti(out_path, seg_np)
            served += 1
            lat_sum += latency
            idle_since = time.time()
            stats = {"request": name, "latency_s": round(latency, 4),
                     "served": served,
                     "mean_latency_s": round(lat_sum / served, 4)}
            with open(os.path.join(args.out, f"{name}.done"), "w") as f:
                json.dump(stats, f)
            print(f"serve: {json.dumps(stats)}", flush=True)
            if args.max_requests is not None and served >= args.max_requests:
                break
    finally:
        stop.set()

    print(f"serve: exiting after {served} request(s)", flush=True)


if __name__ == "__main__":
    main()
