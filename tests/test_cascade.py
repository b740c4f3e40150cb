"""Cascade machinery: pyramid augmentations, prev-stage channels, lowres plan.

Reference semantics under test:
  - pyramid_augmentations.py:23-139 (binary ops preserve one-hot, remove-CC
    removes only sub-threshold components)
  - nnUNetTrainerV2_CascadeFullRes: input channels += num_classes-1
  - moreDA.py:137-139 known defect: swapped probs make remove-CC a no-op
"""

import numpy as np
import pytest

from micformer_tpu.data.cascade import (
    CascadeDataset,
    apply_random_binary_operator,
    ball,
    cascade_augment_onehot,
    remove_random_connected_component,
    resize_seg_nearest,
    seg_to_onehot,
)


def test_ball_is_spherical():
    b = ball(2)
    assert b.shape == (5, 5, 5)
    assert b[2, 2, 2] and b[0, 2, 2] and b[2, 2, 0]
    assert not b[0, 0, 0]  # corner is sqrt(12) > 2 away


def test_seg_to_onehot_foreground_labels_only():
    seg = np.array([[[0, 1], [2, 3]]])
    oh = seg_to_onehot(seg, labels=[1, 2, 3])
    assert oh.shape == (3, 1, 2, 2)
    assert oh[0, 0, 0, 1] == 1 and oh[1, 0, 1, 0] == 1 and oh[2, 0, 1, 1] == 1
    assert oh[:, 0, 0, 0].sum() == 0  # background voxel gets no channel


def test_binary_operator_preserves_onehot(rng):
    seg = np.zeros((16, 16, 16), np.int32)
    seg[4:8, 4:8, 4:8] = 1
    seg[10:14, 10:14, 10:14] = 2
    oh = seg_to_onehot(seg, [1, 2])
    out = apply_random_binary_operator(oh, rng, p_per_sample=1.0)
    assert out.shape == oh.shape
    assert (out.sum(axis=0) <= 1.0 + 1e-6).all()  # still one-hot
    assert not np.array_equal(out, oh)  # something happened at p=1


def test_binary_operator_skipped_at_p0(rng):
    oh = seg_to_onehot(np.ones((4, 4, 4), np.int32), [1])
    out = apply_random_binary_operator(oh, rng, p_per_sample=0.0)
    np.testing.assert_array_equal(out, oh)


def test_remove_cc_removes_small_component(rng):
    vol = np.zeros((1, 16, 16, 16), np.float32)
    vol[0, 1:3, 1:3, 1:3] = 1          # small blob: 8 voxels << 15% of 4096
    vol[0, 8:16, 8:16, 8:16] = 1       # big blob: 512 voxels = 12.5% < 15%
    out = remove_random_connected_component(
        vol, rng, p_per_sample=1.0, dont_do_if_covers_more_than=0.15)
    # exactly one of the two components was removed
    assert out.sum() in (8.0, 512.0)


def test_remove_cc_faithful_swap_is_noop(rng):
    """moreDA.py:137-139 passes fill_p (0.0) into the size ceiling — no
    component is ever < 0% of the volume, so the reference transform never
    fires. faithful_moreda_swap reproduces that."""
    vol = np.zeros((1, 8, 8, 8), np.float32)
    vol[0, 1:3, 1:3, 1:3] = 1
    out = remove_random_connected_component(
        vol, rng, p_per_sample=1.0, fill_with_other_class_p=0.0,
        dont_do_if_covers_more_than=0.15, faithful_moreda_swap=True)
    np.testing.assert_array_equal(out, vol)


def test_remove_cc_fill_with_other_class(rng):
    vol = np.zeros((2, 8, 8, 8), np.float32)
    vol[0, 1:3, 1:3, 1:3] = 1           # 8 voxels, qualifies (< 50% of 512)
    vol[1, 3:8, 0:8, 0:8] = 1           # 320 voxels, adjacent to the blob
    out = remove_random_connected_component(
        vol, rng, p_per_sample=1.0, fill_with_other_class_p=1.0,
        dont_do_if_covers_more_than=0.5)
    # channel 0's blob is removed and filled into channel 1, where it merges
    # with the big component (328 voxels > 50% -> not removable again)
    assert out[0].sum() == 0
    assert out[1].sum() == 328
    assert out[1, 1:3, 1:3, 1:3].sum() == 8


def test_cascade_augment_composes(rng):
    seg = np.zeros((16, 16, 16), np.int32)
    seg[4:12, 4:12, 4:12] = 1
    oh = seg_to_onehot(seg, [1, 2])
    out = cascade_augment_onehot(oh, rng)
    assert out.shape == oh.shape
    assert (out.sum(axis=0) <= 1.0 + 1e-6).all()


def test_resize_seg_nearest():
    seg = np.arange(8).reshape(2, 2, 2)
    up = resize_seg_nearest(seg, (4, 4, 4))
    assert up.shape == (4, 4, 4)
    assert set(np.unique(up)) == set(range(8))  # labels preserved, no blending
    np.testing.assert_array_equal(resize_seg_nearest(seg, (2, 2, 2)), seg)


class _FakeBase:
    def __init__(self, n=2, shape=(2, 12, 12, 12)):
        self.shape = shape
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "image": rng.normal(size=self.shape).astype(np.float32),
            "label": rng.integers(0, 4, self.shape[1:]).astype(np.uint8),
            "patient_id": f"case{i}",
        }


def test_cascade_dataset_appends_onehot_channels(tmp_path, rng):
    num_classes = 4
    base = _FakeBase()
    for i in range(len(base)):
        seg = rng.integers(0, num_classes, (6, 6, 6)).astype(np.uint8)
        np.save(tmp_path / f"case{i}_segFromPrevStage.npy", seg)

    ds = CascadeDataset(base, str(tmp_path), num_classes, augment=False)
    s = ds[0]
    C = base.shape[0]
    assert s["image"].shape[0] == C + num_classes - 1  # process_plans parity
    onehot = s["image"][C:]
    assert set(np.unique(onehot)) <= {0.0, 1.0}
    assert (onehot.sum(axis=0) <= 1.0 + 1e-6).all()

    ds_aug = CascadeDataset(base, str(tmp_path), num_classes, augment=True, seed=3)
    s2 = ds_aug[0]
    assert s2["image"].shape == s["image"].shape


def test_augment_skips_onehot_channels():
    """Intensity transforms must not touch channels beyond num_modalities
    (MoveSegAsOneHotToData runs AFTER the intensity stack in moreDA)."""
    import jax
    import jax.numpy as jnp

    from micformer_tpu.data.transforms import batched_train_augment, val_normalize

    key = jax.random.key(0)
    img = jnp.concatenate([
        jnp.ones((1, 2, 8, 8, 8)) * 7.0,              # modalities
        (jnp.arange(8 * 8 * 8).reshape(1, 1, 8, 8, 8) % 2).astype(jnp.float32),
    ], axis=1)
    lab = jnp.zeros((1, 4, 8, 8, 8))
    out, _ = batched_train_augment(key, img, lab, num_modalities=2)
    oh = np.asarray(out[0, 2])
    assert set(np.unique(oh)) <= {0.0, 1.0}  # untouched by z-score/scale/shift

    vn = val_normalize(img, num_modalities=2)
    np.testing.assert_array_equal(np.asarray(vn[:, 2:]), np.asarray(img[:, 2:]))
    # modalities DO get normalized (constant nonzero -> 0 mean)
    assert abs(float(jnp.mean(vn[:, 0]))) < 1e-4


def test_plan_experiment_lowres_shrinks():
    from micformer_tpu.pipeline.planner import DatasetFingerprint, plan_experiment_lowres

    fp = DatasetFingerprint(
        shapes=[[320, 320, 256], [300, 340, 260]], spacings=[[1.0, 1.0, 1.0]] * 2,
        class_values=[0, 1, 2], intensity_mean=0.0, intensity_std=1.0,
        intensity_p005=-1.0, intensity_p995=1.0)
    plan = plan_experiment_lowres(fp, max_patch=(128, 128, 128))
    assert plan["stage"] == "3d_lowres"
    assert plan["downsample_factor"] > 1.0
    med = np.median(np.asarray(fp.shapes), 0)
    assert all(m / plan["downsample_factor"] <= 129 for m in med)


def test_predict_prefetch_preserves_order():
    from micformer_tpu.cli.predict import _prefetch_cases

    base = _FakeBase(n=5, shape=(1, 4, 4, 4))
    got = list(_prefetch_cases(base, range(5)))
    assert [i for i, _ in got] == list(range(5))
    assert got[3][1]["patient_id"] == "case3"
