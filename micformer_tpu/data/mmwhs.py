"""MM-WHS paired CT+MR dataset: splits, preprocessing, caching, sample assembly.

Reference-parity surface (file:line in /root/reference):
  - get_datasets_Aug KFold(5) split with val-fold halved into val/test:
    MicFormer/dataset/MMWHS.py:479-501,483-492
  - live dataset class MMWHS_noCrop_Augment: MMWHS.py:278-425 —
    load 4 NIfTIs -> full-volume min-max normalize -> trilinear resize image to
    128^3 -> 8-ch one-hot labels (bg + 7 structures) nearest-resized ->
    channels [CT, MR] -> train-time random pad_or_crop jitter -> image f16 / label bool.
  - sample dict keys: MMWHS.py:399-405.

TPU-first redesign vs the reference:
  - the reference re-reads and re-resizes 4 NIfTIs per sample per epoch on the
    CPU; here the deterministic part (read/normalize/resize/one-hot) is computed
    once and cached as .npy so steady-state epochs are memmap reads;
  - stochastic augmentation (flips/intensity) moves on-device
    (micformer_tpu/data/transforms.py) so the host never blocks the TPU.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob
from pathlib import Path

import numpy as np

from micformer_tpu.data import image_utils as iu
from micformer_tpu.data.nifti import read_nifti


def kfold_split(n_items: int, n_splits: int = 5, seed: int = 1234, fold: int = 0):
    """(train_idx, val_idx, test_idx) with sklearn-KFold-parity semantics.

    Reference: KFold(5, shuffle=True, random_state=seed) over the sorted CT file
    list; the held-out fold is halved into val/test (MMWHS.py:483-492).
    Uses sklearn when available so parity is exact; falls back to the documented
    sklearn algorithm (permutation + contiguous fold sizes) otherwise.
    """
    try:
        from sklearn.model_selection import KFold

        kf = KFold(n_splits, shuffle=True, random_state=seed)
        splits = list(kf.split(np.arange(n_items)))
        train_idx, held = splits[fold]
    except ImportError:  # pragma: no cover - sklearn is present in CI
        rng = np.random.RandomState(seed)
        perm = np.arange(n_items)
        rng.shuffle(perm)
        fold_sizes = np.full(n_splits, n_items // n_splits, dtype=int)
        fold_sizes[: n_items % n_splits] += 1
        starts = np.concatenate([[0], np.cumsum(fold_sizes)])
        held = np.sort(perm[starts[fold] : starts[fold + 1]])
        mask = np.ones(n_items, bool)
        mask[held] = False
        train_idx = np.arange(n_items)[mask]
    half = len(held) // 2
    return np.asarray(train_idx), np.asarray(held[:half]), np.asarray(held[half:])


@dataclass
class CasePaths:
    patient_id: str
    ct: str
    ct_label: str
    mr: str
    mr_label: str

    @classmethod
    def from_ct_image(cls, ct_path: str) -> "CasePaths":
        # filename convention from prepocess.py:10-13 / MMWHS.py:293-305
        ct_path = str(ct_path)
        return cls(
            patient_id=os.path.basename(ct_path).split("_")[-2],
            ct=ct_path,
            ct_label=ct_path.replace("image", "label"),
            mr=ct_path.replace("ct", "mr"),
            mr_label=ct_path.replace("ct", "mr").replace("image", "label"),
        )


def discover_cases(data_root: str, pattern: str = "ct_*_image.nii.gz"):
    """Sorted CT image list under data_root (MMWHS.py:481 glob semantics)."""
    paths = sorted(glob(os.path.join(str(data_root), pattern)))
    return [CasePaths.from_ct_image(p) for p in paths]


def preprocess_case(case: CasePaths, target_shape=(128, 128, 128), normalisation="minmax"):
    """Deterministic per-case preprocessing (MMWHS.py:308-365 semantics).

    Returns (image[2,*target] float32 in [0,1], label[16,*target] uint8) where
    image channels are [CT, MR] and label channels are CT one-hot (8) then MR
    one-hot (8). Callers slice label[:8] for supervision (MMWHS.py:399).
    """
    norm = iu.NORMALIZERS[normalisation]
    ct = norm(read_nifti(case.ct, dtype=np.float32))
    mr = norm(read_nifti(case.mr, dtype=np.float32))
    image = np.stack(
        [iu.resize_trilinear(ct, target_shape), iu.resize_trilinear(mr, target_shape)]
    ).astype(np.float32)

    ct_lab = iu.label_to_one_hot(read_nifti(case.ct_label))
    mr_lab = iu.label_to_one_hot(read_nifti(case.mr_label))
    label = np.concatenate(
        [iu.resize_nearest(ct_lab, target_shape), iu.resize_nearest(mr_lab, target_shape)]
    ).astype(np.uint8)
    return image, label


class MMWHSDataset:
    """Cached MM-WHS dataset yielding reference-parity sample dicts.

    __getitem__ -> dict(patient_id, image [2,D,H,W] float32, label [8,D,H,W]
    uint8 (CT one-hot), seg_path, crop_indexes, et_present=0, supervised=True)
    — keys per MMWHS.py:399-405. Train-time random pad/crop jitter matches
    image_utils.py:8-45; since preprocessed volumes already equal the target
    size it is an identity there, but it activates for other patch sizes.
    """

    def __init__(
        self,
        cases,
        training=True,
        target_shape=(128, 128, 128),
        normalisation="minmax",
        cache_dir=None,
        patch_size=None,
        transform=None,
        seed=1234,
        single_modal=False,
    ):
        self.cases = list(cases)
        self.training = training
        self.target_shape = tuple(target_shape)
        self.normalisation = normalisation
        self.cache_dir = Path(cache_dir) if cache_dir else None
        self.patch_size = tuple(patch_size) if patch_size else self.target_shape
        self.transform = transform
        self.single_modal = single_modal  # CT-only ablation (SingleModal_nnformer/dataset/MMWHS.py:392,400)
        self._rng = np.random.default_rng(seed)
        if self.cache_dir:
            self.cache_dir.mkdir(parents=True, exist_ok=True)

    def __len__(self):
        return len(self.cases)

    def _load(self, case: CasePaths):
        if self.cache_dir is None:
            return preprocess_case(case, self.target_shape, self.normalisation)
        tag = f"{case.patient_id}_{'x'.join(map(str, self.target_shape))}_{self.normalisation}"
        img_p = self.cache_dir / f"{tag}_img.npy"
        lab_p = self.cache_dir / f"{tag}_lab.npy"
        if img_p.exists() and lab_p.exists():
            return np.load(img_p, mmap_mode="r"), np.load(lab_p, mmap_mode="r")
        image, label = preprocess_case(case, self.target_shape, self.normalisation)
        np.save(img_p, image)
        np.save(lab_p, label)
        return image, label

    def __getitem__(self, idx):
        case = self.cases[idx]
        image, label = self._load(case)
        image = np.asarray(image, dtype=np.float32)
        if self.single_modal:
            image = image[:1]
        label_ct = np.asarray(label[:8], dtype=np.uint8)

        nz = np.sum(image, axis=0)
        crop_indexes = iu.nonzero_bbox(nz) if nz.any() else ((0, 0), (0, 0), (0, 0))

        if self.training:
            image, label_ct = iu.pad_or_crop_image(
                image, label_ct, target_size=self.patch_size, rng=self._rng
            )

        sample = dict(
            patient_id=case.patient_id,
            image=image,
            label=label_ct,
            seg_path=str(case.ct_label),
            crop_indexes=crop_indexes,
            et_present=0,
            supervised=True,
        )
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


def get_datasets(
    data_root,
    seed: int = 1234,
    fold_number: int = 0,
    normalisation: str = "minmax",
    cache_dir=None,
    target_shape=(128, 128, 128),
    train_transform=None,
    val_transform=None,
    single_modal=False,
    fold=None,
):
    """(train, val, bench) datasets — get_datasets_Aug parity (MMWHS.py:479-501),
    minus the hard-coded absolute data root (reference defect, SURVEY §2.13)."""
    cases = discover_cases(data_root)
    if not cases:
        raise FileNotFoundError(f"no ct_*_image.nii.gz under {data_root}")
    if fold is not None:
        fold_number = fold
    tr, va, te = kfold_split(len(cases), 5, seed, fold_number)
    mk = lambda idx, training, tf: MMWHSDataset(
        [cases[i] for i in idx],
        training=training,
        target_shape=target_shape,
        normalisation=normalisation,
        cache_dir=cache_dir,
        transform=tf,
        seed=seed,
        single_modal=single_modal,
    )
    return (
        mk(tr, True, train_transform),
        mk(va, False, val_transform),
        mk(te, False, val_transform),
    )
