"""Evaluation metrics: meandice, mean IoU, HD95.

Parity targets:
  - meandice: reference MicFormer/train_mmwhs_noPad.py:392-407 — argmax-based
    foreground mean Dice over classes 1..num_class-1, smooth 1e-6, intersections
    summed over the whole batch.
  - mean IoU / HD95: the reference computes these with MONAI in
    MicFormer/test.ipynb cell 4 (include_background=False, percentile=95).
    MONAI is not available here; mean_iou is reimplemented in JAX and hd95
    host-side with scipy's Euclidean distance transform (same definition:
    max of the two directed 95th-percentile surface distances).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def meandice(pred: jnp.ndarray, label: jnp.ndarray, num_class: int = 8) -> jnp.ndarray:
    """Foreground mean Dice over argmax maps (train_mmwhs_noPad.py:392-407).

    pred/label: integer class maps [B, ...]. Per class c in 1..num_class-1:
    dice_c = (2*|pred==c & label==c| + 1e-6) / (|pred==c| + |label==c| + 1e-6)
    with sums over the whole batch; returns mean over foreground classes.
    """
    smooth = 1e-6
    classes = jnp.arange(1, num_class)

    def one(c):
        p = (pred == c).astype(jnp.float32)
        l = (label == c).astype(jnp.float32)
        inter = jnp.sum(p * l)
        return (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(l) + smooth)

    return jnp.mean(jax.vmap(one)(classes))


def mean_iou(pred_onehot: jnp.ndarray, label_onehot: jnp.ndarray,
             include_background: bool = False,
             ignore_empty: bool = True) -> jnp.ndarray:
    """MONAI MeanIoU parity (monai.metrics.compute_iou semantics).

    ignore_empty=True (MONAI default, used by the reference test.ipynb cell 4):
    (batch, class) cells whose ground truth is empty score nan and are dropped
    from the mean (nanmean aggregation). ignore_empty=False: empty-union cells
    score 1.0 (both empty), otherwise inter/union.

    pred_onehot/label_onehot: [B, C, ...] binary.
    """
    p = pred_onehot.astype(jnp.float32)
    l = label_onehot.astype(jnp.float32)
    if not include_background:
        p, l = p[:, 1:], l[:, 1:]
    axes = tuple(range(2, p.ndim))
    inter = jnp.sum(p * l, axis=axes)
    y_sum = jnp.sum(l, axis=axes)
    union = jnp.sum(p, axis=axes) + y_sum - inter
    if ignore_empty:
        iou = jnp.where(y_sum > 0, inter / jnp.maximum(union, 1e-38), jnp.nan)
        return jnp.nanmean(iou)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-38), 1.0)
    return jnp.mean(iou)


def _surface_distances(a: np.ndarray, b: np.ndarray, spacing=None) -> np.ndarray:
    """Distances from surface voxels of `a` to the surface of `b` (host-side)."""
    from scipy import ndimage

    a = a.astype(bool)
    b = b.astype(bool)
    if not a.any() or not b.any():
        return np.array([np.inf])
    surf_a = a ^ ndimage.binary_erosion(a)
    surf_b = b ^ ndimage.binary_erosion(b)
    dist_to_b = ndimage.distance_transform_edt(~surf_b, sampling=spacing)
    return dist_to_b[surf_a]


def hd95(pred: np.ndarray, target: np.ndarray, spacing=None) -> float:
    """95th-percentile Hausdorff distance between two binary masks (host-side).

    Matches MONAI HausdorffDistanceMetric(percentile=95, directed=False):
    max(P95(d(surf_pred -> surf_gt)), P95(d(surf_gt -> surf_pred))).
    Returns nan when either mask is empty (MONAI convention).
    """
    pred = np.asarray(pred).astype(bool)
    target = np.asarray(target).astype(bool)
    if not pred.any() or not target.any():
        return float("nan")
    d_pt = _surface_distances(pred, target, spacing)
    d_tp = _surface_distances(target, pred, spacing)
    return float(max(np.percentile(d_pt, 95), np.percentile(d_tp, 95)))


def hd95_multiclass(pred_labels: np.ndarray, target_labels: np.ndarray,
                    num_classes: int = 8, spacing=None):
    """Per-foreground-class HD95 over integer label maps; returns list len C-1."""
    out = []
    for c in range(1, num_classes):
        out.append(hd95(pred_labels == c, target_labels == c, spacing))
    return out


def calculate_dice_tp_fp_fn(pred: np.ndarray, target: np.ndarray):
    """BraTS-style metric tuple per binary mask (reference utils.py:145-188
    capability): returns dict(dice, tp, fp, fn, sens, spec)."""
    pred = np.asarray(pred).astype(bool)
    target = np.asarray(target).astype(bool)
    tp = float(np.sum(pred & target))
    fp = float(np.sum(pred & ~target))
    fn = float(np.sum(~pred & target))
    tn = float(np.sum(~pred & ~target))
    dice = 2 * tp / max(2 * tp + fp + fn, 1e-8)
    sens = tp / max(tp + fn, 1e-8)
    spec = tn / max(tn + fp, 1e-8)
    return dict(dice=dice, tp=tp, fp=fp, fn=fn, sens=sens, spec=spec)
