"""Export CLI — serialize a trained run's inference pipeline to an AOT artifact.

`python -m micformer_tpu.cli.export --run-dir runs/micformer_f0 --out art/`
produces a self-contained serving artifact (StableHLO module with baked
weights + meta.json) that `cli.serve --exported art/` runs without the model
zoo or checkpoint tree. See convert/aot_export.py for the artifact format.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MICFORMER_JAX_CACHE", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from micformer_tpu import registry
    from micformer_tpu.convert.aot_export import export_artifact
    from micformer_tpu.train.checkpoint import CheckpointManager

    p = argparse.ArgumentParser("micformer_tpu.export")
    p.add_argument("--run-dir", required=True,
                   help="trained run dir (config.yaml + checkpoints)")
    p.add_argument("--out", default=None,
                   help="artifact dir (default <run-dir>/exported)")
    p.add_argument("--ckpt-tag", default="best_dice",
                   choices=["best_dice", "best_loss", "latest"])
    p.add_argument("--model", default=None,
                   help="model family override (default: run config.yaml)")
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--target-shape", type=int, default=128)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--roi", type=int, default=128)
    p.add_argument("--overlap", type=float, default=0.5)
    p.add_argument("--sw-batch-size", type=int, default=4)
    p.add_argument("--step-mode", default="monai", choices=["monai", "nnunet"])
    p.add_argument("--mirror-tta", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--logits", action="store_true",
                   help="export float logits instead of uint8 argmax")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms, e.g. tpu cpu (default: current "
                        "backend)")
    args = p.parse_args(argv)

    # model reconstruction: same rule as cli/serve.py / cli/predict.py
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
            model_kwargs = dict(num_classes=run_cfg.model.num_classes, **extra)
            if model_name == "micformer" and "embed_dim" not in model_kwargs:
                model_kwargs["embed_dim"] = run_cfg.model.embed_dim
    model_name = model_name or "micformer"
    if args.bf16:
        model_kwargs["dtype"] = jnp.bfloat16
    model = registry.build(model_name, **model_kwargs)
    params = CheckpointManager(args.run_dir).restore_params_only(args.ckpt_tag)

    out_dir = args.out or os.path.join(args.run_dir, "exported")
    meta = export_artifact(
        out_dir, model, params,
        target_shape=(args.target_shape,) * 3, roi=(args.roi,) * 3,
        num_classes=args.num_classes, overlap=args.overlap,
        sw_batch_size=args.sw_batch_size, step_mode=args.step_mode,
        mirror_tta=args.mirror_tta, argmax=not args.logits,
        batch=args.batch, platforms=args.platforms, model_name=model_name)
    size = os.path.getsize(os.path.join(out_dir, "module.jaxexp"))
    print(f"exported {model_name} -> {out_dir} "
          f"({size / 1e6:.1f} MB, platforms {meta['platforms']}, "
          f"input {meta['input_shape']}, output {meta['output']})")


if __name__ == "__main__":
    main()
