import numpy as np
import pytest

import jax.numpy as jnp

from micformer_tpu.losses import (
    hard_dice_metric,
    mdice_loss,
    mdice_val_loss,
    meandice,
    mean_iou,
    hd95,
)
from micformer_tpu.losses.dice import deep_supervision_loss, softmax_dice_ce_loss


def _torch_mdice(logits, targets, with_ce=True):
    """Oracle implementing the reference formulas (loss/dice.py:130-166) in torch."""
    torch = pytest.importorskip("torch")
    x = torch.from_numpy(logits)
    t = torch.from_numpy(targets)
    dice = 0.0
    ce = 0.0
    bce = torch.nn.BCELoss()
    for i in range(t.shape[1]):
        p = torch.sigmoid(x[:, i])
        inter = torch.sum(p * t[:, i])
        d = (2 * inter + 1.0) / (p.pow(2).sum() + t[:, i].pow(2).sum() + 1.0)
        dice = dice + (1 - d)
        if with_ce:
            ce = ce + bce(p, t[:, i])
    if with_ce:
        return float((0.7 * dice + 0.3 * ce) / t.shape[1])
    return float(dice / t.shape[1])


def test_mdice_loss_matches_reference_formula(rng):
    logits = rng.standard_normal((2, 8, 6, 6, 6)).astype(np.float32)
    targets = (rng.random((2, 8, 6, 6, 6)) > 0.7).astype(np.float32)
    assert float(mdice_loss(jnp.array(logits), jnp.array(targets))) == pytest.approx(
        _torch_mdice(logits, targets), abs=1e-5
    )


def test_mdice_val_loss(rng):
    logits = rng.standard_normal((1, 8, 5, 5, 5)).astype(np.float32)
    targets = (rng.random((1, 8, 5, 5, 5)) > 0.5).astype(np.float32)
    assert float(mdice_val_loss(jnp.array(logits), jnp.array(targets))) == pytest.approx(
        _torch_mdice(logits, targets, with_ce=False), abs=1e-5
    )


def test_hard_dice_metric_empty_handling():
    logits = np.full((1, 2, 4, 4, 4), -10.0, dtype=np.float32)  # all preds empty
    targets = np.zeros((1, 2, 4, 4, 4), dtype=np.float32)
    targets[0, 1, 0, 0, 0] = 1  # ch1 has a target voxel
    m = np.array(hard_dice_metric(jnp.array(logits), jnp.array(targets)))
    assert m[0, 0] == 1.0  # empty target + empty pred -> 1
    assert m[0, 1] == 0.0  # nonempty target + empty pred -> 0


def test_hard_dice_metric_value():
    logits = np.full((1, 1, 2, 2, 1), -10.0, dtype=np.float32)
    logits[0, 0, 0, :, 0] = 10.0  # predict 2 voxels
    targets = np.zeros((1, 1, 2, 2, 1), dtype=np.float32)
    targets[0, 0, 0, 0, 0] = 1  # one of them correct
    m = np.array(hard_dice_metric(jnp.array(logits), jnp.array(targets)))
    assert m[0, 0] == pytest.approx(2 * 1 / (2 + 1))


def test_meandice_perfect_and_value(rng):
    label = rng.integers(0, 8, (2, 6, 6, 6))
    assert float(meandice(jnp.array(label), jnp.array(label), 8)) == pytest.approx(
        1.0, abs=1e-5
    )
    pred = np.zeros_like(label)
    md = float(meandice(jnp.array(pred), jnp.array(label), 8))
    assert 0.0 <= md < 0.01


def test_mean_iou():
    pred = np.zeros((1, 3, 4, 4, 4), dtype=np.float32)
    lab = np.zeros_like(pred)
    pred[0, 1, :2] = 1
    lab[0, 1, 1:3] = 1  # IoU ch1 = 16/48; ch2 GT-empty -> nan, dropped
    # MONAI ignore_empty=True default (test.ipynb cell 4): empty-GT classes
    # are excluded from the mean
    got = float(mean_iou(jnp.array(pred), jnp.array(lab), include_background=False))
    assert got == pytest.approx(16 / 48, abs=1e-6)
    # ignore_empty=False: empty-union -> 1.0, empty-GT-nonempty-pred -> 0
    got2 = float(mean_iou(jnp.array(pred), jnp.array(lab),
                          include_background=False, ignore_empty=False))
    assert got2 == pytest.approx((16 / 48 + 1.0) / 2, abs=1e-6)


def test_mean_iou_empty_gt_nonempty_pred_ignored():
    pred = np.zeros((1, 3, 2, 2, 2), dtype=np.float32)
    lab = np.zeros_like(pred)
    pred[0, 2] = 1  # false positives on an absent structure
    lab[0, 1] = 1
    pred[0, 1] = 1
    got = float(mean_iou(jnp.array(pred), jnp.array(lab), include_background=False))
    # ch1 perfect (IoU 1), ch2 GT-empty -> dropped despite FP prediction
    assert got == pytest.approx(1.0, abs=1e-6)


def test_hd95_identical_is_zero(rng):
    m = rng.random((12, 12, 12)) > 0.6
    m[0] = True  # ensure nonempty
    assert hd95(m, m) == 0.0


def test_hd95_translation():
    a = np.zeros((16, 16, 16), bool)
    b = np.zeros_like(a)
    a[4:8, 4:8, 4:8] = True
    b[8:12, 4:8, 4:8] = True  # translated by 4 along z
    d = hd95(a, b)
    assert 2.0 <= d <= 5.0


def test_softmax_dice_ce_and_deep_supervision(rng):
    logits = rng.standard_normal((1, 4, 8, 8, 8)).astype(np.float32)
    idx = rng.integers(0, 4, (1, 8, 8, 8))
    onehot = np.moveaxis(np.eye(4, dtype=np.float32)[idx], -1, 1)
    l_full = softmax_dice_ce_loss(jnp.array(logits), jnp.array(onehot))
    assert np.isfinite(float(l_full))
    pyramid = [jnp.array(logits), jnp.array(logits[:, :, ::2, ::2, ::2])]
    l_ds = deep_supervision_loss(pyramid, jnp.array(onehot))
    assert np.isfinite(float(l_ds))
