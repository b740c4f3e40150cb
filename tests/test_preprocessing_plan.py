"""Plan-driven preprocessing tests (GenericPreprocessor parity surface)."""

import numpy as np

from micformer_tpu.pipeline.preprocessing import (
    resample_to_spacing,
    crop_to_nonzero,
    normalize_with_plan,
    preprocess_with_plan,
)
from micformer_tpu.pipeline.planner import analyze_dataset, plan_experiment


def test_resample_shape_rule(rng):
    vol = rng.normal(size=(20, 30, 40)).astype(np.float32)
    out = resample_to_spacing(vol, (2.0, 1.0, 1.0), (1.0, 1.0, 1.0))
    assert out.shape == (40, 30, 40)
    lab = (rng.random((20, 30, 40)) > 0.5).astype(np.uint8)
    out_l = resample_to_spacing(lab, (2.0, 1.0, 1.0), (1.0, 1.0, 1.0), is_label=True)
    assert out_l.shape == (40, 30, 40)
    assert set(np.unique(out_l)) <= {0, 1}  # nearest keeps labels discrete


def test_crop_to_nonzero(rng):
    img = np.zeros((1, 10, 10, 10), np.float32)
    img[:, 2:7, 3:8, 1:9] = rng.normal(size=(5, 5, 8))
    lab = np.ones((10, 10, 10), np.uint8)
    out, lab_out, bbox = crop_to_nonzero(img, lab)
    # nonzero_bbox keeps the reference's 1-voxel margin (MMWHS.py:369-373)
    assert out.shape == (1, 6, 6, 9)
    assert lab_out.shape == (6, 6, 9)
    assert bbox == ((1, 7), (2, 8), (0, 9))


def test_normalize_with_plan(rng):
    vols = [rng.normal(size=(2, 16, 16, 16)).astype(np.float32) * 100 for _ in range(2)]
    labs = [(rng.random((16, 16, 16)) > 0.5).astype(np.uint8) for _ in range(2)]
    fp = analyze_dataset(vols, labs)
    plan = plan_experiment(fp)
    out = normalize_with_plan(vols[0][0], plan)
    assert np.isfinite(out).all()
    assert out.max() <= (plan["clip"][1] - plan["mean"]) / plan["std"] + 1e-5


def test_full_chain(rng):
    img = np.zeros((2, 12, 12, 12), np.float32)
    img[:, 2:10, 2:10, 2:10] = rng.normal(size=(8, 8, 8)) * 50
    lab = (rng.random((12, 12, 12)) > 0.8).astype(np.uint8)
    fp = analyze_dataset([img], [lab])
    plan = plan_experiment(fp)
    out_img, out_lab, bbox = preprocess_with_plan(
        img, lab, plan, in_spacing=(1, 1, 1), target_spacing=(0.5, 1, 1))
    assert out_img.shape[0] == 2
    assert out_img.shape[1] == 18  # 9 voxels (8+margin) at spacing 1 -> 18 at 0.5
    assert np.isfinite(out_img).all()
