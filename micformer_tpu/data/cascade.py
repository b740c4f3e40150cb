"""Cascade (lowres -> fullres) data machinery: pyramid augmentations + the
prev-stage-segmentation input channels.

Capability parity (studied, not translated) with the vendored nnU-Net cascade:
  - pyramid transforms: MedNeXt/nnunet_mednext/training/data_augmentation/
    pyramid_augmentations.py:23-139 (MoveSegAsOneHotToData,
    ApplyRandomBinaryOperatorTransform,
    RemoveRandomConnectedComponentFromOneHotEncodingTransform).
  - protocol constants: nnUNetTrainerV2_CascadeFullRes.py setup_DA_params
    (binary-op p=0.4, strel (1,8), p_per_label=1; remove-CC p=0.2,
    max-cover 0.15, fill-other 0.0); input channels += num_classes-1
    (process_plans), i.e. one-hot of the FOREGROUND labels only.
  - known defect kept out: data_augmentation_moreDA.py:137-139 passes
    `cascade_remove_conn_comp_max_size_percent_threshold` into
    `fill_with_other_class_p` and the fill prob (0.0) into
    `dont_do_if_covers_more_than_X_percent` — with a 0.0 size ceiling no
    component ever qualifies, so the reference's remove-CC augmentation is a
    silent no-op. We implement the documented intent (correct wiring) and
    expose `faithful_moreda_swap=True` to reproduce the reference behavior.

TPU-first placement: these are data-dependent morphology ops (connected
components, random-radius structuring elements) — host-side numpy in the
prefetching loader is the right home; they never trace. The device step sees
only a wider channel axis.
"""

from __future__ import annotations

import os

import numpy as np
from scipy import ndimage


def ball(radius: float) -> np.ndarray:
    """Spherical structuring element (skimage.morphology.ball semantics):
    boolean [2r+1]^3 grid of points within euclidean `radius` of the center."""
    r = int(radius)
    z, y, x = np.mgrid[-r:r + 1, -r:r + 1, -r:r + 1]
    return (z * z + y * y + x * x) <= radius * radius


_BINARY_OPS = ("dilation", "erosion", "closing", "opening")
_OP_FNS = {
    "dilation": ndimage.binary_dilation,
    "erosion": ndimage.binary_erosion,
    "closing": ndimage.binary_closing,
    "opening": ndimage.binary_opening,
}


def seg_to_onehot(seg: np.ndarray, labels) -> np.ndarray:
    """[D, H, W] int -> [len(labels), D, H, W] float32 one-hot of `labels`
    (MoveSegAsOneHotToData semantics: channels only for the listed labels —
    the cascade uses foreground labels 1..K-1)."""
    seg = np.asarray(seg)
    return np.stack([(seg == l) for l in labels]).astype(np.float32)


def apply_random_binary_operator(
    onehot: np.ndarray,
    rng: np.random.Generator,
    p_per_sample: float = 0.4,
    strel_size=(1, 8),
    p_per_label: float = 1.0,
) -> np.ndarray:
    """ApplyRandomBinaryOperatorTransform (pyramid_augmentations.py:99-141) on
    one sample's one-hot channels [K, D, H, W]: with p_per_sample, visit the
    channels in random order and (per p_per_label) apply a random morphology op
    with a random-radius ball; voxels ADDED to a channel are cleared from the
    other channels to preserve the one-hot property."""
    onehot = np.asarray(onehot)
    if rng.uniform() >= p_per_sample:
        return onehot
    out = onehot.copy()
    order = rng.permutation(out.shape[0])
    for c in order:
        if rng.uniform() >= p_per_label:
            continue
        op = _OP_FNS[_BINARY_OPS[rng.integers(len(_BINARY_OPS))]]
        selem = ball(rng.uniform(*strel_size))
        workon = out[c].astype(bool)
        res = op(workon, structure=selem)
        out[c] = res.astype(out.dtype)
        added = res & ~workon
        for oc in order:
            if oc != c:
                out[oc][added] = 0
    return out


def remove_random_connected_component(
    onehot: np.ndarray,
    rng: np.random.Generator,
    p_per_sample: float = 0.2,
    fill_with_other_class_p: float = 0.0,
    dont_do_if_covers_more_than: float = 0.15,
    p_per_label: float = 1.0,
    faithful_moreda_swap: bool = False,
) -> np.ndarray:
    """RemoveRandomConnectedComponentFromOneHotEncodingTransform
    (pyramid_augmentations.py:23-70): with p_per_sample, for each channel
    (per p_per_label) pick a random connected component covering less than
    `dont_do_if_covers_more_than` of the volume and zero it; optionally move
    it to another random channel with `fill_with_other_class_p`.

    faithful_moreda_swap=True reproduces the reference wiring defect
    (moreDA.py:137-139 swaps the two probabilities, making the transform a
    no-op at the V2-cascade defaults) — kept for strict protocol replays."""
    if faithful_moreda_swap:
        fill_with_other_class_p, dont_do_if_covers_more_than = (
            dont_do_if_covers_more_than, fill_with_other_class_p)
    onehot = np.asarray(onehot)
    if rng.uniform() >= p_per_sample:
        return onehot
    out = onehot.copy()
    num_voxels = np.prod(out.shape[1:], dtype=np.uint64)
    channels = list(range(out.shape[0]))
    for c in channels:
        if rng.uniform() >= p_per_label:
            continue
        lab, num_comp = ndimage.label(out[c].astype(bool))
        if num_comp == 0:
            continue
        sizes = ndimage.sum_labels(np.ones_like(lab), lab, index=range(1, num_comp + 1))
        ids = [i + 1 for i, s in enumerate(sizes)
               if s < num_voxels * dont_do_if_covers_more_than]
        if not ids:
            continue
        comp = ids[rng.integers(len(ids))]
        mask = lab == comp
        out[c][mask] = 0
        if rng.uniform() < fill_with_other_class_p:
            other = [i for i in channels if i != c]
            if other:
                out[other[rng.integers(len(other))]][mask] = 1
    return out


def cascade_augment_onehot(
    onehot: np.ndarray,
    rng: np.random.Generator,
    binary_op_p: float = 0.4,
    strel_size=(1, 8),
    remove_cc_p: float = 0.2,
    remove_cc_max_cover: float = 0.15,
    remove_cc_fill_other_p: float = 0.0,
) -> np.ndarray:
    """The V2-cascade train-time augmentation of the prev-stage channels, in
    moreDA order (binary op, then remove-CC) with the trainer's defaults
    (nnUNetTrainerV2_CascadeFullRes.setup_DA_params)."""
    onehot = apply_random_binary_operator(
        onehot, rng, p_per_sample=binary_op_p, strel_size=strel_size)
    return remove_random_connected_component(
        onehot, rng, p_per_sample=remove_cc_p,
        fill_with_other_class_p=remove_cc_fill_other_p,
        dont_do_if_covers_more_than=remove_cc_max_cover)


def resize_seg_nearest(seg: np.ndarray, target_shape) -> np.ndarray:
    """Nearest-neighbor resize of an integer label map to `target_shape`."""
    seg = np.asarray(seg)
    if tuple(seg.shape) == tuple(target_shape):
        return seg
    idx = tuple(
        np.minimum((np.arange(t) + 0.5) * s / t, s - 1).astype(np.int64)
        for t, s in zip(target_shape, seg.shape)
    )
    return seg[np.ix_(*idx)]


class CascadeDataset:
    """Wrap a sample-dict dataset, appending prev-stage one-hot channels.

    Sample contract stays the loader's (`image` [C,D,H,W], `label`,
    `patient_id`); `image` gains num_classes-1 channels. Prev-stage segs are
    read from `<seg_dir>/<patient_id>_segFromPrevStage.npy` (the reference's
    naming, nnUNetTrainerV2_CascadeFullRes.do_split), resized nearest to the
    image grid, one-hot over labels 1..num_classes-1, and — train only —
    pyramid-augmented per the V2 cascade protocol.
    """

    def __init__(self, base, seg_dir: str, num_classes: int,
                 augment: bool = True, seed: int = 0):
        self.base = base
        self.seg_dir = seg_dir
        self.labels = list(range(1, num_classes))
        self.augment = augment
        self._seed = seed
        # per-index visit counters give thread-safe, deterministic
        # augmentation streams under the multi-worker loader: sample i's
        # k-th visit always draws from seed (seed, i, k) regardless of the
        # interleaving of other indices (a shared Generator would race).
        import threading

        self._lock = threading.Lock()
        self._visits: dict = {}

    def _rng_for(self, i):
        with self._lock:
            k = self._visits.get(i, 0)
            self._visits[i] = k + 1
        return np.random.default_rng(
            np.random.SeedSequence([self._seed, i, k]))

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        s = dict(self.base[i])
        img = np.asarray(s["image"])
        pid = s["patient_id"]
        path = os.path.join(self.seg_dir, f"{pid}_segFromPrevStage.npy")
        seg = np.load(path)
        seg = resize_seg_nearest(seg, img.shape[1:])
        onehot = seg_to_onehot(seg, self.labels)
        if self.augment:
            onehot = cascade_augment_onehot(onehot, self._rng_for(i))
        s["image"] = np.concatenate([img, onehot.astype(img.dtype)], axis=0)
        return s
