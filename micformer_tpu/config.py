"""Config system: one dataclass tree + YAML load + CLI override.

Replaces the reference's three overlapping systems (SURVEY.md §2.12): argparse
per harness (train_mmwhs_noPad.py:32-66), yacs/yaml Swin tree (config.py:30-245,
configs/vt_unet_*.yaml), and nnU-Net env-var paths (paths.py:29-31). Reference
flag names are kept (--fold, --epochs, --cfg, --seed, --lr, --resume, ...) so a
reference user's muscle memory works unchanged.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    name: str = "micformer"
    num_classes: int = 8
    in_channels: int = 2          # 1 for the SingleModal ablation
    embed_dim: int = 48           # MicFormer train setting (train_mmwhs_noPad.py:92)
    extra: dict = field(default_factory=dict)


@dataclass
class DataConfig:
    data_root: str = os.environ.get("MICFORMER_DATA", "")
    cache_dir: str = os.environ.get("MICFORMER_CACHE", "")
    target_shape: tuple = (128, 128, 128)
    fold: int = 0
    normalisation: str = "minmax"
    workers: int = 2
    single_modal: bool = False


@dataclass
class TrainerConfig:
    epochs: int = 300
    batch_size: int = 1
    lr: float = 1e-4
    weight_decay: float = 0.0
    val_every: int = 10
    seed: int = 1234
    resume: bool = False
    optimizer: str = "adam"
    scheduler: str = "cosine"
    scheduler_per_batch: bool = True
    deep_supervision: bool = False
    grad_clip_norm: float | None = None
    run_dir: str = "runs/run"
    bf16: bool = False
    extra_loss: str = "mdice"
    patience: int | None = None


@dataclass
class InferenceConfig:
    roi: tuple = (128, 128, 128)
    overlap: float = 0.5
    sw_batch_size: int = 1
    blend: str = "gaussian"
    step_mode: str = "monai"
    mirror_tta: bool = False


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainerConfig = field(default_factory=TrainerConfig)
    infer: InferenceConfig = field(default_factory=InferenceConfig)


def _apply_dict(cfg, d: dict):
    for k, v in d.items():
        if not hasattr(cfg, k):
            raise KeyError(f"unknown config key: {k}")
        cur = getattr(cfg, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _apply_dict(cur, v)
        else:
            if isinstance(cur, tuple) and isinstance(v, (list, tuple)):
                v = tuple(v)
            setattr(cfg, k, v)


def load_config(path: str | None = None, overrides: dict | None = None) -> Config:
    cfg = Config()
    if path:
        import yaml

        with open(path) as f:
            _apply_dict(cfg, yaml.safe_load(f) or {})
    if overrides:
        _apply_dict(cfg, overrides)
    return cfg


def save_config(cfg: Config, path: str):
    """save_args_1 parity (utils.py:24-43): dump resolved config to yaml."""
    import yaml

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, default_flow_style=None)


def build_argparser(defaults: Config | None = None) -> argparse.ArgumentParser:
    """Reference-parity CLI flags (train_mmwhs_noPad.py:32-66)."""
    d = defaults or Config()
    p = argparse.ArgumentParser("micformer_tpu")
    p.add_argument("--data", default=d.data.data_root, help="MM-WHS crop root")
    p.add_argument("--cache", default=d.data.cache_dir)
    p.add_argument("--model", default=d.model.name)
    p.add_argument("--epochs", type=int, default=d.train.epochs)
    p.add_argument("--batch-size", type=int, default=d.train.batch_size)
    p.add_argument("--lr", type=float, default=d.train.lr)
    p.add_argument("--wd", type=float, default=d.train.weight_decay)
    p.add_argument("--val", type=int, default=d.train.val_every, help="val every N epochs")
    p.add_argument("--fold", type=int, default=d.data.fold)
    p.add_argument("--num_classes", type=int, default=d.model.num_classes)
    p.add_argument("--seed", type=int, default=d.train.seed)
    p.add_argument("--cfg", default=None, help="yaml config file")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--workers", type=int, default=d.data.workers)
    p.add_argument("--run-dir", default=d.train.run_dir)
    p.add_argument("--target-shape", type=int, default=None,
                   help="cubic target shape override (e.g. 32 for smoke runs)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--optimizer", default=d.train.optimizer,
                   choices=["adam", "adamw", "sgd_nesterov"])
    p.add_argument("--loss", default="mdice", choices=["mdice", "dice_ce"])
    p.add_argument("--scheduler", default=d.train.scheduler,
                   choices=["cosine", "poly", "constant"])
    p.add_argument("--deep-supervision", action="store_true")
    p.add_argument("--patience", type=int, default=None,
                   help="early-stop after N non-improving validations")
    p.add_argument("--grad-clip", type=float, default=None)
    p.add_argument("--single-modal", action="store_true",
                   help="CT-only ablation (SingleModal_nnformer parity)")
    p.add_argument("--throughput", action="store_true",
                   help="benchmark mode: time steps/sec, no checkpoints "
                        "(the flag the reference parsed but never implemented)")
    return p


def config_from_args(args) -> Config:
    cfg = load_config(args.cfg)
    cfg.data.data_root = args.data or cfg.data.data_root
    cfg.data.cache_dir = args.cache or cfg.data.cache_dir
    cfg.data.fold = args.fold
    cfg.data.workers = args.workers
    cfg.model.name = args.model
    cfg.model.num_classes = args.num_classes
    cfg.train.epochs = args.epochs
    cfg.train.batch_size = args.batch_size
    cfg.train.lr = args.lr
    cfg.train.weight_decay = args.wd
    cfg.train.val_every = args.val
    cfg.train.seed = args.seed
    cfg.train.resume = args.resume
    cfg.train.run_dir = args.run_dir
    cfg.train.bf16 = args.bf16
    cfg.train.optimizer = args.optimizer
    cfg.train.scheduler = args.scheduler
    cfg.train.deep_supervision = args.deep_supervision
    cfg.train.grad_clip_norm = args.grad_clip
    cfg.data.single_modal = args.single_modal
    cfg.train.extra_loss = args.loss
    cfg.train.patience = args.patience
    if args.target_shape:
        cfg.data.target_shape = (args.target_shape,) * 3
        cfg.infer.roi = cfg.data.target_shape
    return cfg
