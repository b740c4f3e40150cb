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
    worker_mode: str = "thread"      # thread | process (forked preprocessing)
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
    # train-time transform stack: "monai" = reference protocol
    # (train_mmwhs_noPad.py:116-130), "nnunet" = moreDA-style, "none" = raw
    augment: str = "monai"
    # device mesh spec, e.g. "data=8" — DDP-equivalent pjit data parallelism
    mesh: str | None = None
    # ZeRO-1 optimizer-state sharding over the mesh 'data' axis (moments at
    # 1/N per device; numerics identical to replicated training)
    zero1: bool = False
    # nnU-Net fg-oversampled patch training (dataset_loading.py:158)
    oversample_fg: float | None = None
    # cascade fullres stage: dir of <pid>_segFromPrevStage.npy lowres preds;
    # appends one-hot channels + pyramid augmentations
    # (nnUNetTrainerV2_CascadeFullRes)
    cascade_prev_seg_dir: str | None = None
    # seed weights from another run's checkpoint (non-strict, heads excluded —
    # nnU-Net run/load_pretrained_weights.py parity); "run_dir" or "run_dir:tag"
    pretrained: str | None = None


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
    """Reference-parity CLI flags (train_mmwhs_noPad.py:32-66).

    Every flag defaults to None so config_from_args can tell "explicitly
    passed" from "absent" and only explicit flags override YAML values
    (a default-valued flag used to silently clobber the --cfg preset).
    """
    d = defaults or Config()
    p = argparse.ArgumentParser("micformer_tpu")
    p.add_argument("--data", default=None, help="MM-WHS crop root")
    p.add_argument("--cache", default=None)
    p.add_argument("--model", default=None, help=f"model family (default {d.model.name})")
    p.add_argument("--epochs", type=int, default=None,
                   help=f"default {d.train.epochs}")
    p.add_argument("--batch-size", type=int, default=None,
                   help=f"default {d.train.batch_size}")
    p.add_argument("--lr", type=float, default=None, help=f"default {d.train.lr}")
    p.add_argument("--wd", type=float, default=None,
                   help=f"weight decay (default {d.train.weight_decay})")
    p.add_argument("--val", type=int, default=None,
                   help=f"val every N epochs (default {d.train.val_every})")
    p.add_argument("--fold", type=int, default=None, help=f"default {d.data.fold}")
    p.add_argument("--num_classes", type=int, default=None,
                   help=f"default {d.model.num_classes}")
    p.add_argument("--seed", type=int, default=None, help=f"default {d.train.seed}")
    p.add_argument("--cfg", default=None, help="yaml config file")
    p.add_argument("--resume", action="store_true", default=None)
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--worker-mode", default=None, choices=["thread", "process"])
    p.add_argument("--run-dir", default=None, help=f"default {d.train.run_dir}")
    p.add_argument("--target-shape", type=int, default=None,
                   help="cubic target shape override (e.g. 32 for smoke runs)")
    p.add_argument("--bf16", action="store_true", default=None)
    p.add_argument("--optimizer", default=None,
                   choices=["adam", "adamw", "sgd_nesterov"])
    p.add_argument("--loss", default=None,
                   choices=["mdice", "dice_ce", "gdl", "topk", "focal",
                            "mcc", "dice_topk", "dice_bce"])
    p.add_argument("--scheduler", default=None,
                   choices=["cosine", "poly", "constant"])
    p.add_argument("--scheduler-per-batch", default=None,
                   choices=["true", "false"],
                   help="step the schedule per batch (the reference's "
                        "CosineAnnealing quirk — faithful default) or per "
                        "epoch (the paper's intent; converges measurably "
                        "better, benchmarks/RESULTS.md)")
    p.add_argument("--augment", default=None, choices=["monai", "nnunet", "none"],
                   help="train-time transform stack (reference default: monai, "
                        "train_mmwhs_noPad.py:116-130)")
    p.add_argument("--deep-supervision", action="store_true", default=None)
    p.add_argument("--patience", type=int, default=None,
                   help="early-stop after N non-improving validations")
    p.add_argument("--grad-clip", type=float, default=None)
    p.add_argument("--single-modal", action="store_true", default=None,
                   help="CT-only ablation (SingleModal_nnformer parity)")
    p.add_argument("--mesh", default=None,
                   help="device mesh spec, e.g. 'data=8' (DDP-equivalent "
                        "pjit data parallelism over ICI)")
    p.add_argument("--zero1", action="store_true", default=None,
                   help="shard optimizer state over the mesh 'data' axis "
                        "(ZeRO-1; needs --mesh with data>1)")
    p.add_argument("--oversample-fg", type=float, default=None,
                   help="nnU-Net patch training: fraction of patches forced "
                        "to contain foreground (dataset_loading.py:158; 0.33 "
                        "is the nnU-Net default)")
    p.add_argument("--pretrained", default=None,
                   help="run dir (or run_dir:tag) whose checkpoint seeds the "
                        "model: matching-shape weights transfer, segmentation "
                        "heads do not (run/load_pretrained_weights.py parity)")
    p.add_argument("--cascade-prev-seg-dir", default=None,
                   help="cascade fullres stage: dir of "
                        "<pid>_segFromPrevStage.npy files from the lowres "
                        "stage; appended as one-hot input channels with "
                        "pyramid augmentations at train time "
                        "(nnUNetTrainerV2_CascadeFullRes parity)")
    p.add_argument("--find-lr", action="store_true", default=None,
                   help="LR range test instead of training (nnU-Net "
                        "network_trainer.find_lr parity): exponential sweep, "
                        "writes (lr, smoothed loss) pairs to log.jsonl")
    p.add_argument("--throughput", action="store_true", default=None,
                   help="benchmark mode: time steps/sec, no checkpoints "
                        "(the flag the reference parsed but never implemented)")
    return p


# (args attribute) -> (config section, field); applied only when the flag
# was explicitly passed (non-None), so YAML presets survive the merge.
_ARG_MAP = {
    "data": ("data", "data_root"),
    "cache": ("data", "cache_dir"),
    "fold": ("data", "fold"),
    "workers": ("data", "workers"),
    "worker_mode": ("data", "worker_mode"),
    "single_modal": ("data", "single_modal"),
    "model": ("model", "name"),
    "num_classes": ("model", "num_classes"),
    "epochs": ("train", "epochs"),
    "batch_size": ("train", "batch_size"),
    "lr": ("train", "lr"),
    "wd": ("train", "weight_decay"),
    "val": ("train", "val_every"),
    "seed": ("train", "seed"),
    "resume": ("train", "resume"),
    "run_dir": ("train", "run_dir"),
    "bf16": ("train", "bf16"),
    "optimizer": ("train", "optimizer"),
    "scheduler": ("train", "scheduler"),
    "augment": ("train", "augment"),
    "deep_supervision": ("train", "deep_supervision"),
    "grad_clip": ("train", "grad_clip_norm"),
    "loss": ("train", "extra_loss"),
    "patience": ("train", "patience"),
    "mesh": ("train", "mesh"),
    "zero1": ("train", "zero1"),
    "oversample_fg": ("train", "oversample_fg"),
    "cascade_prev_seg_dir": ("train", "cascade_prev_seg_dir"),
    "pretrained": ("train", "pretrained"),
}


def config_from_args(args) -> Config:
    cfg = load_config(args.cfg)
    for attr, (section, field_name) in _ARG_MAP.items():
        v = getattr(args, attr, None)
        if v is not None:
            setattr(getattr(cfg, section), field_name, v)
    spb = getattr(args, "scheduler_per_batch", None)
    if spb is not None:
        cfg.train.scheduler_per_batch = spb == "true"
    if getattr(args, "target_shape", None):
        cfg.data.target_shape = (args.target_shape,) * 3
        cfg.infer.roi = cfg.data.target_shape
    return cfg
