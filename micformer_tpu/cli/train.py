"""Training CLI — `python -m micformer_tpu.cli.train --data <root> --model unet3d`.

One CLI for all 10 model families (reference: 10 copied train_mmwhs_noPad.py).
"""

from __future__ import annotations

import os
import time


def main(argv=None):
    from micformer_tpu.config import build_argparser, config_from_args, save_config
    from micformer_tpu import registry
    from micformer_tpu.data import get_datasets
    from micformer_tpu.data.loader import DataLoader
    from micformer_tpu.train import Trainer, TrainConfig

    args = build_argparser().parse_args(argv)
    cfg = config_from_args(args)
    if not cfg.data.data_root:
        raise SystemExit("--data (or MICFORMER_DATA) is required")

    os.makedirs(cfg.train.run_dir, exist_ok=True)
    save_config(cfg, os.path.join(cfg.train.run_dir, "config.yaml"))

    train_ds, val_ds, bench_ds = get_datasets(
        cfg.data.data_root,
        seed=cfg.train.seed,
        fold=cfg.data.fold,
        cache_dir=cfg.data.cache_dir or None,
        target_shape=tuple(cfg.data.target_shape),
        normalisation=cfg.data.normalisation,
        single_modal=cfg.data.single_modal,
    )

    # cascade fullres stage: prev-stage seg as one-hot channels, pyramid-
    # augmented at train time (nnUNetTrainerV2_CascadeFullRes parity)
    if cfg.train.cascade_prev_seg_dir:
        from micformer_tpu.data.cascade import CascadeDataset

        train_ds = CascadeDataset(train_ds, cfg.train.cascade_prev_seg_dir,
                                  cfg.model.num_classes, augment=True,
                                  seed=cfg.train.seed)
        val_ds = CascadeDataset(val_ds, cfg.train.cascade_prev_seg_dir,
                                cfg.model.num_classes, augment=False)

    # nnU-Net fg-oversampled patch training (dataset_loading.py:158)
    if cfg.train.oversample_fg:
        from micformer_tpu.data.patch_sampler import OversampledPatchDataset

        train_ds = OversampledPatchDataset(
            train_ds,
            patch_size=tuple(cfg.data.target_shape),
            batch_size=cfg.train.batch_size,
            oversample_foreground_percent=float(cfg.train.oversample_fg),
            num_classes=cfg.model.num_classes,
            seed=cfg.train.seed,
        )

    # DDP-equivalent data parallelism: '--mesh data=N' shards the batch over
    # the mesh 'data' axis; XLA inserts the gradient psum over ICI
    mesh, batch_sharding = None, None
    if cfg.train.mesh:
        from micformer_tpu.parallel import make_mesh, data_parallel_shardings

        spec = dict(kv.split("=") for kv in str(cfg.train.mesh).split(","))
        mesh = make_mesh(**{k: int(v) for k, v in spec.items()})
        batch_sharding, _ = data_parallel_shardings(mesh)
        if cfg.train.batch_size % mesh.shape["data"] != 0:
            raise SystemExit(
                f"--batch-size {cfg.train.batch_size} not divisible by "
                f"mesh data={mesh.shape['data']}")

    train_loader = DataLoader(train_ds, batch_size=cfg.train.batch_size,
                              shuffle=True, seed=cfg.train.seed,
                              sharding=batch_sharding,
                              workers=cfg.data.workers,
                              worker_mode=cfg.data.worker_mode)
    val_loader = DataLoader(val_ds, batch_size=1, workers=cfg.data.workers,
                            worker_mode=cfg.data.worker_mode)

    import jax.numpy as jnp

    # model.extra passes arbitrary factory kwargs; yaml lists become tuples
    # (flax static fields / lru_cache'd window sizes need hashables)
    extra = {k: tuple(v) if isinstance(v, list) else v
             for k, v in cfg.model.extra.items()}
    model_kwargs = dict(num_classes=cfg.model.num_classes, **extra)
    if cfg.model.name == "micformer" and "embed_dim" not in model_kwargs:
        model_kwargs["embed_dim"] = cfg.model.embed_dim
    if cfg.train.bf16:
        model_kwargs["dtype"] = jnp.bfloat16
    model = registry.build(cfg.model.name, **model_kwargs)

    tcfg = TrainConfig(
        epochs=cfg.train.epochs,
        lr=cfg.train.lr,
        weight_decay=cfg.train.weight_decay,
        num_classes=cfg.model.num_classes,
        val_every=cfg.train.val_every,
        seed=cfg.train.seed,
        scheduler=cfg.train.scheduler,
        scheduler_per_batch=cfg.train.scheduler_per_batch,
        steps_per_epoch=len(train_loader),
        optimizer=cfg.train.optimizer,
        deep_supervision=cfg.train.deep_supervision,
        grad_clip_norm=cfg.train.grad_clip_norm,
        loss=getattr(cfg.train, "extra_loss", "mdice"),
        patience=getattr(cfg.train, "patience", None),
        run_dir=cfg.train.run_dir,
        augment=cfg.train.augment,
        num_modalities=((1 if cfg.data.single_modal else 2)
                        if cfg.train.cascade_prev_seg_dir else None),
        pretrained=cfg.train.pretrained,
        zero1=bool(cfg.train.zero1),
        roi=tuple(cfg.infer.roi),
        sw_overlap=cfg.infer.overlap,
        sw_batch_size=cfg.infer.sw_batch_size,
    )
    trainer = Trainer(model, tcfg, mesh=mesh)

    if args.throughput:
        _throughput(trainer, train_loader)
        return
    if getattr(args, "find_lr", None):
        lrs, losses = trainer.find_lr(train_loader)
        best = lrs[min(range(len(losses)), key=lambda i: losses[i])]
        print(f"find_lr: {len(lrs)} points swept; min smoothed loss at "
              f"lr={best:.2e} (full curve in {cfg.train.run_dir}/log.jsonl)")
        return

    t0 = time.perf_counter()
    trainer.fit(train_loader, val_loader, resume=cfg.train.resume)
    print(f"training done in {time.perf_counter() - t0:.1f}s "
          f"({cfg.train.epochs} epochs)")


def _throughput(trainer, loader, warmup=2, epochs=3):
    """Benchmark mode: steps/sec + volumes/sec (the --throughput flag the
    reference parses but never implements, train_mmwhs_noPad.py:66)."""
    import jax

    state = trainer.init_state(loader.peek_shape())
    rng = jax.random.key(0)
    n = 0
    t0 = None
    for e in range(warmup + epochs):
        if e == warmup:
            t0 = time.perf_counter()
            n = 0
        for images, labels, _ in loader:
            rng, k = jax.random.split(rng)
            state, _ = trainer.train_step(state, images, labels, k)
            n += images.shape[0]
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    print(f"throughput: {n / dt:.3f} volumes/s  ({dt / max(n, 1) * 1000:.1f} ms/volume)")


if __name__ == "__main__":
    main()
