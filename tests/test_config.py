"""Config system tests: YAML load, CLI override, save round-trip."""

import numpy as np

from micformer_tpu.config import (
    Config,
    load_config,
    save_config,
    build_argparser,
    config_from_args,
)


def test_defaults_match_reference_protocol():
    cfg = Config()
    # BASELINE.md protocol values
    assert cfg.train.epochs == 300
    assert cfg.train.lr == 1e-4
    assert cfg.train.weight_decay == 0.0
    assert cfg.train.seed == 1234
    assert cfg.data.target_shape == (128, 128, 128)
    assert cfg.infer.overlap == 0.5
    assert cfg.model.embed_dim == 48


def test_yaml_roundtrip(tmp_path):
    cfg = Config()
    cfg.model.name = "vtunet"
    cfg.train.epochs = 42
    p = str(tmp_path / "c.yaml")
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.model.name == "vtunet"
    assert cfg2.train.epochs == 42
    assert cfg2.data.target_shape == (128, 128, 128)


def test_cli_overrides(tmp_path):
    args = build_argparser().parse_args([
        "--data", "/tmp/x", "--model", "mednext", "--epochs", "7",
        "--fold", "2", "--lr", "3e-4", "--target-shape", "32",
    ])
    cfg = config_from_args(args)
    assert cfg.model.name == "mednext"
    assert cfg.train.epochs == 7
    assert cfg.data.fold == 2
    assert abs(cfg.train.lr - 3e-4) < 1e-12
    assert cfg.data.target_shape == (32, 32, 32)
    assert cfg.infer.roi == (32, 32, 32)


def test_unknown_key_rejected(tmp_path):
    import pytest
    import yaml

    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump({"train": {"nonexistent": 1}}))
    with pytest.raises(KeyError):
        load_config(str(p))


def test_scheduler_per_batch_cli_flag():
    from micformer_tpu.config import build_argparser, config_from_args

    args = build_argparser().parse_args(["--scheduler-per-batch", "false"])
    cfg = config_from_args(args)
    assert cfg.train.scheduler_per_batch is False
    # absent -> faithful default survives (incl. through YAML merge)
    cfg2 = config_from_args(build_argparser().parse_args([]))
    assert cfg2.train.scheduler_per_batch is True
