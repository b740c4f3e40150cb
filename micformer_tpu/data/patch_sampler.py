"""Foreground-oversampled random patch sampling.

Capability parity with nnU-Net's DataLoader3D
(MedNeXt/nnunet_mednext/training/dataloading/dataset_loading.py:158): each
batch draws random patches, but a fixed fraction (oversample_foreground_percent,
nnU-Net default 0.33) is forced to contain foreground by centering the crop on
a randomly chosen foreground voxel. Also provides the class-location cache the
reference builds during unpacking (class -> voxel indices per case).
"""

from __future__ import annotations

import numpy as np


def compute_class_locations(label: np.ndarray, classes, max_per_class: int = 10000,
                            seed: int = 0):
    """{class: [n, 3] voxel coords} subsampled like nnU-Net's unpack step.

    label: [D, H, W] integer map (or [C, D, H, W] one-hot -> argmax'd).
    """
    if label.ndim == 4:
        label = np.argmax(label, axis=0)
    rng = np.random.RandomState(seed)
    out = {}
    for c in classes:
        coords = np.argwhere(label == c)
        if len(coords) > max_per_class:
            coords = coords[rng.choice(len(coords), max_per_class, replace=False)]
        if len(coords):
            out[int(c)] = coords.astype(np.int32)
    return out


def sample_patch(image: np.ndarray, label: np.ndarray, patch_size,
                 force_fg: bool, class_locations: dict | None,
                 rng: np.random.Generator):
    """One random patch [C, *patch] / [Cl, *patch]; force_fg centers on a
    random foreground voxel of a random present class (DataLoader3D semantics:
    oversampled crops guarantee the chosen class is inside the patch)."""
    spatial = np.asarray(image.shape[1:])
    ps = np.asarray(patch_size)
    pad = np.maximum(ps - spatial, 0)
    if pad.any():
        cfg = [(0, 0)] + [(p // 2, p - p // 2) for p in pad]
        image = np.pad(image, cfg)
        label = np.pad(label, cfg)
        spatial = np.asarray(image.shape[1:])

    lo = np.zeros(3, int)
    hi = spatial - ps  # inclusive upper bound of start
    if force_fg and class_locations:
        cls = list(class_locations.keys())
        c = cls[int(rng.integers(len(cls)))]
        vox = class_locations[c][int(rng.integers(len(class_locations[c])))]
        start = np.clip(vox - ps // 2, lo, hi)
    else:
        start = np.array([int(rng.integers(l, h + 1)) for l, h in zip(lo, hi)])
    sl = tuple([slice(None)] + [slice(int(s), int(s + p)) for s, p in zip(start, ps)])
    return image[sl], label[sl]


class OversampledPatchDataset:
    """Wraps a case-level dataset into an infinite patch sampler.

    batch positions >= round(batch*(1-oversample_pct)) are foreground-forced —
    the exact nnU-Net rule (dataset_loading.py get_do_oversample).
    """

    def __init__(self, base_dataset, patch_size=(128, 128, 128), batch_size=2,
                 oversample_foreground_percent: float = 0.33, num_classes: int = 8,
                 seed: int = 0, samples_per_epoch: int | None = None):
        self.base = base_dataset
        self.patch_size = tuple(patch_size)
        self.batch_size = batch_size
        self.oversample = oversample_foreground_percent
        self.num_classes = num_classes
        self.seed = seed
        self.samples_per_epoch = samples_per_epoch or len(base_dataset)
        self._loc_cache = {}
        # thread-safe deterministic draws under the multi-worker loader:
        # position i's k-th visit uses seed (seed, i, k) — no shared Generator
        import threading

        self._lock = threading.Lock()
        self._visits: dict = {}

    def _rng_for(self, i):
        with self._lock:
            k = self._visits.get(i, 0)
            self._visits[i] = k + 1
        return np.random.default_rng(np.random.SeedSequence([self.seed, i, k]))

    def __len__(self):
        return self.samples_per_epoch

    def _force_fg(self, position_in_batch: int) -> bool:
        return position_in_batch >= round(self.batch_size * (1 - self.oversample))

    def _locations(self, idx, label):
        if idx not in self._loc_cache:
            self._loc_cache[idx] = compute_class_locations(
                label, range(1, self.num_classes), seed=idx)
        return self._loc_cache[idx]

    def __getitem__(self, i):
        rng = self._rng_for(i)
        idx = int(rng.integers(len(self.base)))
        s = self.base[idx]
        image = np.asarray(s["image"], np.float32)
        label = np.asarray(s["label"], np.float32)
        force = self._force_fg(i % self.batch_size)
        locs = self._locations(idx, label) if force else None
        img_p, lab_p = sample_patch(image, label, self.patch_size, force, locs, rng)
        return dict(s, image=img_p, label=lab_p)
