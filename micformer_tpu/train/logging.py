"""Observability — TensorBoard scalars/figures/images, val.txt, CSV export.

Capability parity with the reference L6 layer (SURVEY.md §1/§5):
  - TB scalars per step/epoch (train_mmwhs_noPad.py:189-228)
  - per-class Dice box-plot figures + val.txt append (utils.py:191-212)
  - 3D volume slice montages (the reference renders GIF animations via
    monai.plot_2d_or_3d_image, train_mmwhs_noPad.py:342-389; here a center
    slice-grid image — same diagnostic, no GIF dependency)
  - CSV metric export (utils.py:290-302)

TensorBoard backend: torch.utils.tensorboard when available (torch is baked
in), else events are mirrored only to JSONL. Everything degrades gracefully —
logging never takes down a training run.
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np


class MetricsWriter:
    def __init__(self, run_dir: str, tensorboard: bool = True):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "events.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(run_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")
        self._jsonl.flush()
        if self._tb:
            self._tb.add_scalar(tag, float(value), step)

    def figure(self, tag: str, fig, step: int):
        if self._tb:
            self._tb.add_figure(tag, fig, step)

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        if self._tb:
            self._tb.add_image(tag, img_hwc, step, dataformats="HWC")

    def close(self):
        self._jsonl.close()
        if self._tb:
            self._tb.close()


def save_metrics(writer: MetricsWriter, per_class_dice: np.ndarray, class_names,
                 epoch: int, run_dir: str, teacher: bool = False):
    """utils.py:191-212 parity: per-class box plot + scalars + val.txt append."""
    per_class_dice = np.asarray(per_class_dice)  # [n_patients, C]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.boxplot(list(per_class_dice.T), labels=list(class_names))
        ax.set_ylabel("Dice")
        ax.set_title(f"epoch {epoch}")
        writer.figure("val/dice_per_class", fig, epoch)
        plt.close(fig)
    except Exception:
        pass
    means = per_class_dice.mean(0) if len(per_class_dice) else np.zeros(len(class_names))
    for name, v in zip(class_names, means):
        writer.scalar(f"val/dice_{name}", float(v), epoch)
    with open(os.path.join(run_dir, "val.txt"), "a") as f:
        f.write(f"Epoch {epoch}: " +
                ", ".join(f"{n}={v:.4f}" for n, v in zip(class_names, means)) + "\n")


def slice_montage(volume: np.ndarray, n_slices: int = 8, axis: int = 0) -> np.ndarray:
    """[D, H, W] (or [C, D, H, W] -> channel 0) to a grayscale slice grid
    [H, W*n, 1] — the Visual_3d stand-in."""
    v = np.asarray(volume)
    if v.ndim == 4:
        v = v[0]
    v = np.moveaxis(v, axis, 0)
    idx = np.linspace(0, v.shape[0] - 1, n_slices).astype(int)
    sl = v[idx]  # [n, H, W]
    lo, hi = sl.min(), sl.max()
    sl = (sl - lo) / (hi - lo + 1e-8)
    return np.concatenate(list(sl), axis=1)[..., None]


# nnU-Net's overlay color cycle (overlay_plots.py color_cycle) — label 0 is
# background/black; distinct hues for up to 14 foreground classes.
_OVERLAY_COLORS = (
    "000000", "4363d8", "f58231", "3cb44b", "e6194B", "911eb4", "ffe119",
    "bfef45", "42d4f4", "f032e6", "000075", "9A6324", "808000", "800000",
    "469990",
)


def overlay_slice(image_2d: np.ndarray, seg_2d: np.ndarray,
                  intensity: float = 0.6) -> np.ndarray:
    """Color segmentation overlay on one grayscale slice → uint8 [H, W, 3]
    (MedNeXt/nnunet_mednext/utilities/overlay_plots.py generate_overlay:
    image rescaled to [0,255], per-label additive color at `intensity`,
    rescaled again)."""
    img = np.asarray(image_2d, np.float32)
    img = img - img.min()
    img = img / (img.max() + 1e-8) * 255.0
    rgb = np.tile(img[:, :, None], (1, 1, 3))
    for lab in np.unique(seg_2d):
        hexcol = _OVERLAY_COLORS[int(lab) % len(_OVERLAY_COLORS)]
        col = np.array([int(hexcol[i:i + 2], 16) for i in (0, 2, 4)], np.float32)
        rgb[seg_2d == lab] += intensity * col
    rgb = rgb / (rgb.max() + 1e-8) * 255.0
    return rgb.astype(np.uint8)


def save_overlay_png(image: np.ndarray, seg: np.ndarray, path: str,
                     intensity: float = 0.6) -> int:
    """Pick the axial slice with the most foreground (overlay_plots.py
    plot_overlay: argmax of per-slice fg count), overlay, write a PNG.
    `image` [D,H,W] or [C,D,H,W] (channel 0 used); `seg` [D,H,W] labels.
    Returns the selected slice index."""
    img = np.asarray(image)
    if img.ndim == 4:
        img = img[0]
    seg = np.asarray(seg)
    k = int(np.argmax((seg != 0).sum(axis=(1, 2))))
    rgb = overlay_slice(img[k], seg[k], intensity)
    try:
        from PIL import Image

        Image.fromarray(rgb).save(path)
    except Exception:  # PIL unavailable: matplotlib fallback
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, rgb)
    return k


def export_csv(rows: list[dict], path: str):
    """utils.py:290-302-style pandas-to-csv parity without pandas."""
    if not rows:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    keys = list(rows[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
