"""Batch inference CLI — sliding window + optional fold ensembling + TTA.

Capability parity with the vendored nnU-Net predict pipeline
(MedNeXt/nnunet_mednext/inference/predict.py:131-604 predict_cases /
predict_from_folder): iterate cases, per fold restore params, sliding-window
predict (mirror TTA optional), average fold softmax, argmax, optional
largest-CC postprocessing, NIfTI export. Case preprocessing overlaps device
inference via a background prefetch thread (`_prefetch_cases`) — the
capability the reference gets from its multiprocessing preprocessing queue
(predict.py:35-93 preprocess_multithreaded).

Cascade: `--cascade-prev-seg-dir` appends the previous stage's segmentation
as one-hot channels (nnUNetTrainerV2_CascadeFullRes semantics, un-augmented
at inference); `--save-seg-for-next-stage` exports
`<pid>_segFromPrevStage.npy` files that seed the next stage (the reference's
predict_next_stage output naming).
"""

from __future__ import annotations

import argparse
import functools
import os
import queue
import threading


def _prefetch_cases(ds, indices, depth: int = 2, workers: int = 0,
                    worker_mode: str = "thread"):
    """Yield ds[i] for i in indices, produced ahead of consumption so host
    preprocessing (IO, resize, normalize) overlaps device inference.

    workers<=1: one background thread. workers>1: a thread or fork-process
    pool (`worker_mode`) keeps `depth` cases in flight — the process mode is
    the reference's mp.Process preprocessing queue (predict.py:35-93
    preprocess_multithreaded) without its GIL ceiling."""
    indices = list(indices)
    if workers > 1:
        from micformer_tpu.data.loader import make_fetch_pool

        pool, fetch_one = make_fetch_pool(ds, workers, worker_mode)
        try:
            depth = max(depth, workers)
            inflight = [(i, fetch_one(i)) for i in indices[:depth]]
            nxt = depth
            while inflight:
                i, fut = inflight.pop(0)
                if nxt < len(indices):
                    inflight.append((indices[nxt], fetch_one(indices[nxt])))
                    nxt += 1
                yield i, fut.result()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
        return
    q: queue.Queue = queue.Queue(maxsize=depth)

    def produce():
        try:
            for i in indices:
                q.put((i, ds[i]))
            q.put(None)
        except BaseException as e:
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def main(argv=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from micformer_tpu import registry
    from micformer_tpu.data import get_datasets
    from micformer_tpu.data.nifti import write_nifti
    from micformer_tpu.infer import sliding_window_inference
    from micformer_tpu.train.checkpoint import CheckpointManager
    from micformer_tpu.pipeline.postprocess import remove_all_but_largest_cc

    p = argparse.ArgumentParser("micformer_tpu.predict")
    p.add_argument("--data", required=True)
    p.add_argument("--cache", default=None)
    p.add_argument("--model", default=None,
                   help="model family; default: the model recorded in the "
                        "first run dir's config.yaml (so plan-driven "
                        "generic_unet configs reconstruct exactly), else "
                        "'micformer'")
    p.add_argument("--run-dirs", nargs="+", required=True,
                   help="one run dir per fold to ensemble")
    p.add_argument("--ckpt-tag", default="best_dice", choices=["best_dice", "best_loss"])
    p.add_argument("--out", default="./output")
    p.add_argument("--roi", type=int, default=128)
    p.add_argument("--overlap", type=float, default=0.5)
    p.add_argument("--sw-batch-size", type=int, default=2)
    p.add_argument("--step-mode", default="monai", choices=["monai", "nnunet"])
    p.add_argument("--engine", default="3d",
                   choices=["3d", "2d", "p3d", "spatial"],
                   help="3d: volumetric tiles; 2d: slice-by-slice 2D tiling; "
                        "p3d: pseudo-3D neighborhood-as-channels "
                        "(neural_network.py:429-822 variants; both need a "
                        "2D-capable model); spatial: ONE whole-volume forward "
                        "sharded over the mesh 'space' axis with conv halo "
                        "exchange (>HBM volumes; generic_unet only)")
    p.add_argument("--spatial-shards", type=int, default=None,
                   help="device count for --engine spatial (default: all)")
    p.add_argument("--sharded-tiles", action="store_true",
                   help="shard the 3D sliding-window TILE GRID over all "
                        "devices (infer/sharded.py shard_map+psum blending) "
                        "— per-volume latency scaling on multi-chip hosts")
    p.add_argument("--pseudo3d-slices", type=int, default=5)
    p.add_argument("--mirror-tta", action="store_true")
    p.add_argument("--largest-cc", action="store_true")
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--target-shape", type=int, default=128)
    p.add_argument("--cascade-prev-seg-dir", default=None,
                   help="dir of <pid>_segFromPrevStage.npy files; their "
                        "one-hot (foreground labels) is appended as input "
                        "channels (cascade fullres stage)")
    p.add_argument("--save-softmax", action="store_true",
                   help="also save <pid>_softmax.npz (fold-averaged class "
                        "probabilities) for cross-model ensembling "
                        "(ensemble_predictions.py workflow)")
    p.add_argument("--save-seg-for-next-stage", action="store_true",
                   help="also write <pid>_segFromPrevStage.npy (model-grid "
                        "label map) to seed the cascade's next stage")
    p.add_argument("--workers", type=int, default=0,
                   help="case-prefetch workers (>1 enables the pool)")
    p.add_argument("--worker-mode", default="thread",
                   choices=["thread", "process"],
                   help="process = forked preprocessing workers (reference "
                        "predict.py:35-93 mp.Process queue equivalent)")
    p.add_argument("--overlays", action="store_true",
                   help="also write a {pid}_overlay.png per case: color "
                        "segmentation overlay on the max-foreground axial "
                        "slice (overlay_plots.py parity, "
                        "MedNeXt/nnunet_mednext/utilities/overlay_plots.py)")
    p.add_argument("--native-geometry", action="store_true",
                   help="resize predictions back to each case's stored crop "
                        "geometry before export (generate_segmentations "
                        "parity, reference utils.py:243-302)")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    ts = (args.target_shape,) * 3
    _, val_ds, test_ds = get_datasets(args.data, cache_dir=args.cache, target_shape=ts)
    ds = val_ds if args.split == "val" else test_ds

    # model reconstruction: an explicit --model wins; otherwise the train
    # run's saved config.yaml (cli/train.py save_config) — including
    # model.extra kwargs, which plan-driven generic_unet configs need
    model_name, model_kwargs = args.model, {"num_classes": args.num_classes}
    cfg_path = os.path.join(args.run_dirs[0], "config.yaml")
    if os.path.exists(cfg_path):
        from micformer_tpu.config import load_config

        run_cfg = load_config(cfg_path)
        if model_name is None:
            model_name = run_cfg.model.name
        if model_name == run_cfg.model.name:
            extra = {k: tuple(v) if isinstance(v, list) else v
                     for k, v in run_cfg.model.extra.items()}
            model_kwargs = dict(num_classes=run_cfg.model.num_classes, **extra)
            if model_name == "micformer" and "embed_dim" not in model_kwargs:
                model_kwargs["embed_dim"] = run_cfg.model.embed_dim
    model_name = model_name or "micformer"
    model = registry.build(model_name, **model_kwargs)

    fold_params = []
    for rd in args.run_dirs:
        cm = CheckpointManager(rd)
        fold_params.append(cm.restore_params_only(args.ckpt_tag))

    common = dict(num_classes=args.num_classes, overlap=args.overlap,
                  step_mode=args.step_mode, sw_batch_size=args.sw_batch_size,
                  mirror_tta=args.mirror_tta)

    def make_infer(params):
        variables = {"params": params}
        if args.engine == "3d" and len(ds):
            # inference-only: pre-gather every relative-position bias at the
            # fixed roi shape so biased attention blocks skip the per-call
            # [T²,h] table gather (see layers.rel_pos_bias_cached). No-op
            # (variables unchanged) for models without rel-pos tables.
            from micformer_tpu.models.layers import materialize_rpe_cache

            n_ch = int(np.asarray(ds[0]["image"]).shape[0])
            if args.cascade_prev_seg_dir:
                n_ch += args.num_classes - 1
            win0 = jnp.zeros((1, n_ch) + (args.roi,) * 3, jnp.float32)
            variables = materialize_rpe_cache(model, variables, win0)

        def predictor(win):
            return model.apply(variables, win)

        if args.engine == "3d":
            if args.sharded_tiles:
                from micformer_tpu.infer.sharded import (
                    sliding_window_inference_sharded,
                )
                from micformer_tpu.parallel import make_mesh

                mesh = make_mesh(data=len(jax.devices()))
                kw = {k: v for k, v in common.items() if k != "sw_batch_size"}
                return jax.jit(functools.partial(
                    sliding_window_inference_sharded, roi_size=(args.roi,) * 3,
                    predictor=predictor, mesh=mesh, **kw))
            return jax.jit(functools.partial(
                sliding_window_inference, roi_size=(args.roi,) * 3,
                predictor=predictor, **common))
        if args.engine == "spatial":
            from micformer_tpu.parallel import make_mesh
            from micformer_tpu.parallel.spatial import spatial_sharded_apply

            n = args.spatial_shards or len(jax.devices())
            mesh = make_mesh(data=1, space=n, devices=jax.devices()[:n])
            return functools.partial(spatial_sharded_apply, model,
                                     {"params": params}, mesh=mesh)
        from micformer_tpu.infer.sliding_window_2d import (
            sliding_window_inference_2d,
            sliding_window_inference_pseudo3d,
        )

        if args.engine == "2d":
            return jax.jit(functools.partial(
                sliding_window_inference_2d, roi_size_2d=(args.roi,) * 2,
                predictor_2d=predictor, **common))
        return jax.jit(functools.partial(
            sliding_window_inference_pseudo3d, roi_size_2d=(args.roi,) * 2,
            predictor_2d=predictor, pseudo3d_slices=args.pseudo3d_slices,
            **common))

    infer_fns = [make_infer(p_) for p_ in fold_params]

    # multi-process runs shard the case list by rank (the reference's
    # all_keys[rank::world] validation/predict sharding,
    # nnUNetTrainerV2_DDP.py:492); single-process gets the full list.
    from micformer_tpu.parallel import shard_cases

    case_indices = shard_cases(range(len(ds)))
    for i, s in _prefetch_cases(ds, case_indices, workers=args.workers,
                                worker_mode=args.worker_mode):
        img = np.asarray(s["image"], np.float32)
        if args.cascade_prev_seg_dir:
            from micformer_tpu.data.cascade import seg_to_onehot, resize_seg_nearest

            prev = np.load(os.path.join(
                args.cascade_prev_seg_dir,
                f"{s['patient_id']}_segFromPrevStage.npy"))
            prev = resize_seg_nearest(prev, img.shape[1:])
            onehot = seg_to_onehot(prev, list(range(1, args.num_classes)))
            img = np.concatenate([img, onehot.astype(img.dtype)], axis=0)
        vol = jnp.asarray(img)[None]
        probs = None
        for fn in infer_fns:
            logits = fn(vol)
            sm = jax.nn.softmax(logits, axis=1)
            probs = sm if probs is None else probs + sm
        probs = probs / len(infer_fns)
        if args.save_softmax:
            np.savez_compressed(
                os.path.join(args.out, f"{s['patient_id']}_softmax.npz"),
                softmax=np.asarray(probs[0], np.float16))
        seg = np.asarray(jnp.argmax(probs, axis=1))[0].astype(np.uint8)
        seg_model_space = seg  # for overlays: same grid as `img`
        if args.save_seg_for_next_stage:
            np.save(os.path.join(
                args.out, f"{s['patient_id']}_segFromPrevStage.npy"), seg)
        affine = None
        if args.native_geometry:
            from micformer_tpu.data.nifti import read_nifti
            from micformer_tpu.data.image_utils import resize_trilinear

            orig = read_nifti(ds.cases[i].ct, with_header=True)[1]
            affine = orig.affine
            # header shape is NIfTI (x,y,z); arrays are (z,y,x). Resample the
            # CLASS PROBABILITIES (trilinear) to the source grid before argmax
            # — the reference exports softmax-at-original-spacing, not a
            # nearest-resized label map (segmentation_export.py:27-120
            # save_segmentation_nifti_from_softmax resamples softmax via
            # resample_data_or_seg then argmaxes).
            zyx = tuple(int(d) for d in orig.shape[:3])[::-1]
            if zyx != seg.shape:
                sm = resize_trilinear(np.asarray(probs[0], np.float32), zyx)
                seg = np.argmax(sm, axis=0).astype(np.uint8)
        if args.largest_cc:
            seg = remove_all_but_largest_cc(seg)
        out_path = os.path.join(args.out, f"{s['patient_id']}_pred.nii.gz")
        write_nifti(out_path, seg, affine=affine)
        if args.overlays:
            from micformer_tpu.train.logging import save_overlay_png

            save_overlay_png(img, seg_model_space, os.path.join(
                args.out, f"{s['patient_id']}_overlay.png"))
        print(f"{s['patient_id']}: wrote {out_path}")


if __name__ == "__main__":
    main()
