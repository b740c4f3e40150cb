"""Foreground-oversampled patch sampler tests (nnU-Net DataLoader3D parity)."""

import numpy as np

from micformer_tpu.data.patch_sampler import (
    compute_class_locations,
    sample_patch,
    OversampledPatchDataset,
)


def _case(shape=(40, 40, 40)):
    rng = np.random.default_rng(0)
    image = rng.normal(size=(2,) + shape).astype(np.float32)
    label = np.zeros((8,) + shape, np.float32)
    label[0] = 1.0
    # one small fg blob of class 3 in a corner
    label[3, 30:34, 30:34, 30:34] = 1.0
    label[0, 30:34, 30:34, 30:34] = 0.0
    return image, label


def test_class_locations():
    _, label = _case()
    locs = compute_class_locations(label, range(1, 8))
    assert set(locs.keys()) == {3}
    assert len(locs[3]) == 64


def test_forced_fg_patch_contains_class():
    image, label = _case()
    locs = compute_class_locations(label, range(1, 8))
    rng = np.random.default_rng(1)
    for _ in range(10):
        img_p, lab_p = sample_patch(image, label, (16, 16, 16), True, locs, rng)
        assert img_p.shape == (2, 16, 16, 16)
        assert lab_p[3].sum() > 0, "forced-fg patch must contain the class"


def test_oversampled_dataset_rule():
    image, label = _case()

    class Base:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return dict(patient_id=f"p{i}", image=image, label=label)

    ds = OversampledPatchDataset(Base(), patch_size=(16, 16, 16), batch_size=3,
                                 oversample_foreground_percent=0.33)
    # nnU-Net rule: positions >= round(3*(1-0.33)) = 2 are forced
    assert not ds._force_fg(0) and not ds._force_fg(1) and ds._force_fg(2)
    s = ds[2]
    assert s["image"].shape == (2, 16, 16, 16)
    assert s["label"][3].sum() > 0
