"""Experiment planning — dataset fingerprint + training plan.

Capability parity (slimmed) with the vendored nnU-Net experiment planning
(MedNeXt/nnunet_mednext/experiment_planning/DatasetAnalyzer.py +
experiment_planner_baseline_3DUNet.py): collect per-case shapes/spacings and
foreground intensity statistics, then derive a plan (target spacing, patch
size, batch size, normalization scheme, class list). The MM-WHS path only
needs one plan, so the heuristics are reduced to the decisions that affect it.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np


@dataclasses.dataclass
class DatasetFingerprint:
    shapes: list
    spacings: list
    class_values: list
    intensity_mean: float
    intensity_std: float
    intensity_p005: float
    intensity_p995: float

    def to_json(self, path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)


def analyze_dataset(volumes, labels, spacings=None) -> DatasetFingerprint:
    """volumes: iterable of np arrays [C, D, H, W]; labels: [D, H, W] int."""
    shapes, fg_samples, class_vals = [], [], set()
    spacings = list(spacings) if spacings is not None else []
    for vol, lab in zip(volumes, labels):
        shapes.append(list(np.asarray(vol).shape[1:]))
        lab = np.asarray(lab)
        class_vals.update(int(v) for v in np.unique(lab))
        fg = np.asarray(vol)[0][lab > 0]
        if fg.size:
            idx = np.random.RandomState(0).choice(fg.size, min(fg.size, 10000), replace=False)
            fg_samples.append(fg.ravel()[idx])
    fg_all = np.concatenate(fg_samples) if fg_samples else np.zeros(1, np.float32)
    return DatasetFingerprint(
        shapes=shapes,
        spacings=spacings,
        class_values=sorted(class_vals),
        intensity_mean=float(fg_all.mean()),
        intensity_std=float(fg_all.std()),
        intensity_p005=float(np.percentile(fg_all, 0.5)),
        intensity_p995=float(np.percentile(fg_all, 99.5)),
    )


def plan_experiment(fp: DatasetFingerprint, max_patch=(128, 128, 128),
                    vram_budget_voxels=128 ** 3 * 2) -> dict:
    """Derive patch/batch/normalization plan (3DUNet planner decisions,
    reduced): patch = median shape clipped to max_patch and rounded to /16;
    batch grows while it fits the voxel budget (>=2 like nnU-Net's floor)."""
    med = np.median(np.asarray(fp.shapes), axis=0).astype(int)
    patch = [min(int(m), mp) for m, mp in zip(med, max_patch)]
    patch = [max(16, (p // 16) * 16) for p in patch]
    batch = max(1, int(vram_budget_voxels // max(np.prod(patch), 1)))
    return {
        "patch_size": patch,
        "batch_size": batch,
        "normalization": "zscore_clip",
        "clip": [fp.intensity_p005, fp.intensity_p995],
        "mean": fp.intensity_mean,
        "std": fp.intensity_std,
        "classes": fp.class_values,
    }
