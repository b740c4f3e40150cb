"""Round-2 protocol wiring tests: augmentation in the live train path,
sliding-window validation, latest-checkpoint crash resume, YAML-preserving
CLI merge, and per-axis flip independence (VERDICT round-1 items 1-2, 5, 7;
ADVICE high/medium findings)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu import registry
from micformer_tpu.data.synthetic import write_synthetic_dataset
from micformer_tpu.data.loader import DataLoader
from micformer_tpu.train import Trainer, TrainConfig


pytestmark = pytest.mark.slow  # heavyweight tier: pytest -m 'not slow' skips


# ---------------------------------------------------------------------------
# config merge: YAML presets survive unpassed CLI flags (ADVICE high #1)
# ---------------------------------------------------------------------------

def test_yaml_preset_not_clobbered_by_cli_defaults(tmp_path):
    import yaml
    from micformer_tpu.config import build_argparser, config_from_args

    p = tmp_path / "preset.yaml"
    p.write_text(yaml.safe_dump({
        "model": {"name": "nnformer"},
        "train": {"bf16": True, "batch_size": 2, "epochs": 500},
    }))
    args = build_argparser().parse_args(["--cfg", str(p)])
    cfg = config_from_args(args)
    assert cfg.model.name == "nnformer"
    assert cfg.train.bf16 is True
    assert cfg.train.batch_size == 2
    assert cfg.train.epochs == 500
    # explicit flags still override the preset
    args2 = build_argparser().parse_args(["--cfg", str(p), "--epochs", "7"])
    cfg2 = config_from_args(args2)
    assert cfg2.train.epochs == 7 and cfg2.model.name == "nnformer"


# ---------------------------------------------------------------------------
# per-axis flip independence (ADVICE medium: ks[6+i//3] reuse bug)
# ---------------------------------------------------------------------------

def test_nnunet_flips_are_independent_per_axis():
    from micformer_tpu.data.transforms import nnunet_train_augment

    # one-hot marker in a corner; flips move it to the mirrored corner.
    # affine (p=0.2) may resample — detect and skip those samples.
    D = 6
    label = np.zeros((2, D, D, D), np.float32)
    label[0] = 1.0
    label[0, 0, 0, 0], label[1, 0, 0, 0] = 0.0, 1.0
    image = np.zeros((1, D, D, D), np.float32)
    lab = jnp.asarray(label)
    img = jnp.asarray(image)

    fn = jax.jit(nnunet_train_augment)
    patterns = set()
    for i in range(48):
        _, out = fn(jax.random.key(i), img, lab)
        marker = np.argwhere(np.asarray(out[1]) > 0.5)
        if len(marker) != 1:
            continue  # affine resample corrupted the marker; skip
        z, y, x = marker[0]
        flips = tuple(int(c == D - 1) for c in (z, y, x))
        if all(c in (0, D - 1) for c in (z, y, x)):
            patterns.add(flips)
    # the round-1 bug correlated all three flips: only (0,0,0)/(1,1,1)
    mixed = [p for p in patterns if 0 < sum(p) < 3]
    assert mixed, f"flips perfectly correlated, patterns={patterns}"


# ---------------------------------------------------------------------------
# augmentation is live inside the jitted train step
# ---------------------------------------------------------------------------

def test_train_step_applies_monai_stack(tmp_path):
    """Statistical check: images entering the loss are z-scored (nonzero mean
    ~0 despite a large input offset) and labels flip together with images."""
    model = registry.build("unet3d", channels=(4, 8))
    cfg = TrainConfig(epochs=1, lr=1e-3, run_dir=str(tmp_path / "aug"),
                      scheduler="constant", augment="monai")
    tr = Trainer(model, cfg)

    imgs = jnp.full((2, 2, 8, 8, 8), 5.0)
    labs = jax.nn.one_hot(jnp.zeros((2, 8, 8, 8), jnp.int32), 8, axis=1)
    out_img, _ = jax.jit(tr._augment)(jax.random.key(0), imgs, labs)
    m = float(jnp.mean(out_img))
    # z-score of a constant field -> 0, then shift U(-0.1,0.1)
    assert abs(m) < 0.2, f"train images not normalized: mean {m} (expected ~0, input 5.0)"

    # flips: asymmetric image+label must move together for some key.
    # image = monotone z-gradient (z-score preserves per-channel ordering)
    img2 = np.broadcast_to(
        np.arange(1, 9, dtype=np.float32)[None, None, :, None, None],
        (1, 2, 8, 8, 8)).copy()
    lab2 = np.zeros((1, 8, 8, 8, 8), np.float32)
    lab2[0, 1, 0] = 1.0
    lab2[0, 0] = 1.0 - lab2[0, 1]
    flipped_count = 0
    for i in range(16):
        oi, ol = jax.jit(tr._augment)(jax.random.key(i), jnp.asarray(img2), jnp.asarray(lab2))
        img_flipped = bool(np.asarray(oi)[0, 0, -1].mean() < np.asarray(oi)[0, 0, 0].mean())
        lab_flipped = bool(np.asarray(ol)[0, 1, -1].sum() > np.asarray(ol)[0, 1, 0].sum())
        assert img_flipped == lab_flipped, "image and label flip desynchronized"
        flipped_count += int(img_flipped)
    assert 0 < flipped_count < 16, "z-axis flip never (or always) triggered in 16 keys"


def test_augment_none_is_identity(tmp_path):
    model = registry.build("unet3d", channels=(4, 8))
    cfg = TrainConfig(epochs=1, run_dir=str(tmp_path / "noaug"),
                      scheduler="constant", augment="none")
    tr = Trainer(model, cfg)
    imgs = jnp.full((1, 2, 8, 8, 8), 5.0)
    labs = jax.nn.one_hot(jnp.zeros((1, 8, 8, 8), jnp.int32), 8, axis=1)
    oi, ol = tr._augment(jax.random.key(0), imgs, labs)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(imgs))


# ---------------------------------------------------------------------------
# sliding-window validation path (reference utils.py:226-240 contract)
# ---------------------------------------------------------------------------

def test_validate_uses_sliding_window_for_large_volumes(tmp_path):
    root = str(tmp_path / "data")
    write_synthetic_dataset(root, n_cases=6, shape=(24, 24, 24), seed=5)
    from micformer_tpu.data import get_datasets

    # target 24^3 volumes but roi 16^3 -> validate must tile
    train, val, _ = get_datasets(root, cache_dir=root + "/c", target_shape=(24, 24, 24))
    val_loader = DataLoader(val, batch_size=1)

    model = registry.build("unet3d", channels=(4, 8))
    cfg = TrainConfig(epochs=1, run_dir=str(tmp_path / "sw"), scheduler="constant",
                      roi=(16, 16, 16), augment="monai")
    tr = Trainer(model, cfg)
    state = tr.init_state((1, 2, 24, 24, 24))
    vm = tr.validate(state, val_loader)
    assert np.isfinite(vm["val_loss"]) and np.isfinite(vm["meandice"])

    # parity: sw_eval on a roi-sized volume == direct eval (single tile)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 16, 16, 16)).astype(np.float32))
    labs = jax.nn.one_hot(jnp.zeros((1, 16, 16, 16), jnp.int32), 8, axis=1)
    direct = tr.eval_step(state, imgs, labs)
    tiled = tr.sw_eval_step(state, imgs, labs)
    np.testing.assert_allclose(float(direct["val_loss"]), float(tiled["val_loss"]), atol=1e-5)
    np.testing.assert_allclose(float(direct["meandice"]), float(tiled["meandice"]), atol=1e-5)


# ---------------------------------------------------------------------------
# latest checkpoint + crash resume (nnU-Net network_trainer.py:258-401 parity)
# ---------------------------------------------------------------------------

def test_kill_and_resume_loses_at_most_one_epoch(tmp_path):
    root = str(tmp_path / "data")
    write_synthetic_dataset(root, n_cases=6, shape=(20, 20, 20), seed=9)
    from micformer_tpu.data import get_datasets

    train, val, _ = get_datasets(root, cache_dir=root + "/c", target_shape=(16, 16, 16))
    train_loader = DataLoader(train, batch_size=1, shuffle=True, seed=0)
    spe = len(train_loader)

    run = str(tmp_path / "run")
    model = registry.build("unet3d", channels=(4, 8))
    cfg = TrainConfig(epochs=3, lr=1e-3, val_every=100, steps_per_epoch=spe,
                      run_dir=run, scheduler="constant")
    tr = Trainer(model, cfg)
    tr.fit(train_loader, None, log_every=100)  # "crash" after 3 epochs, no val
    assert tr.ckpt.exists("latest")

    cfg2 = TrainConfig(epochs=5, lr=1e-3, val_every=100, steps_per_epoch=spe,
                       run_dir=run, scheduler="constant")
    tr2 = Trainer(model, cfg2)
    state = tr2.fit(train_loader, None, resume=True, log_every=100)
    # resumed from epoch 3 -> exactly 5 epochs total of steps
    assert int(state.step) == 5 * spe

    records = [json.loads(l) for l in open(run + "/log.jsonl")]
    epochs = [r["epoch"] for r in records if "train_loss" in r]
    assert epochs.count(2) == 1, "epoch 2 retrained after resume"
