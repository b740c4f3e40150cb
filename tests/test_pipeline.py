"""Pipeline layer tests: postprocessing, evaluator, planner."""

import numpy as np
import pytest

from micformer_tpu.pipeline.postprocess import (
    largest_cc_mask,
    remove_all_but_largest_cc,
    determine_postprocessing,
    apply_postprocessing,
)
from micformer_tpu.pipeline.evaluator import evaluate_case, aggregate_scores
from micformer_tpu.pipeline.planner import analyze_dataset, plan_experiment


def _two_blob_seg():
    seg = np.zeros((16, 16, 16), np.uint8)
    seg[2:6, 2:6, 2:6] = 1       # big blob (64 voxels)
    seg[12:14, 12:14, 12:14] = 1  # small blob (8 voxels)
    return seg


def test_largest_cc():
    seg = _two_blob_seg()
    keep = largest_cc_mask(seg == 1)
    assert keep.sum() == 64
    out = remove_all_but_largest_cc(seg)
    assert (out == 1).sum() == 64
    assert out[12, 12, 12] == 0


def test_determine_postprocessing_decision():
    gt = np.zeros((16, 16, 16), np.uint8)
    gt[2:6, 2:6, 2:6] = 1
    pred = _two_blob_seg()  # extra spurious blob -> CC removal helps
    dec = determine_postprocessing([pred], [gt], labels=[1])
    assert dec[1] is True
    fixed = apply_postprocessing(pred, dec)
    assert (fixed == gt).all()


def test_evaluate_case_and_aggregate(tmp_path):
    gt = np.zeros((8, 8, 8), np.uint8)
    gt[:4] = 1
    pred = gt.copy()
    r = evaluate_case(pred, gt, labels=[1, 2])
    assert r["1"]["Dice"] == 1.0
    assert r["2"]["Dice"] == 1.0  # both empty -> 1
    assert np.isnan(r["2"]["Hausdorff Distance 95"])
    agg = aggregate_scores([r, r], json_output_file=str(tmp_path / "summary.json"))
    assert agg["mean"]["1"]["Dice"] == 1.0
    assert (tmp_path / "summary.json").exists()


def test_planner(rng):
    vols = [rng.normal(size=(2, 40, 44, 36)).astype(np.float32) for _ in range(3)]
    labs = [(rng.random(size=(40, 44, 36)) > 0.7).astype(np.uint8) for _ in range(3)]
    fp = analyze_dataset(vols, labs)
    assert fp.class_values == [0, 1]
    plan = plan_experiment(fp)
    assert all(p % 16 == 0 for p in plan["patch_size"])
    assert plan["batch_size"] >= 1


def test_normalized_surface_dice_hand_computed():
    """NSD against a hand-computed 1-voxel-shift case (surface_dice.py:20-57
    formula parity)."""
    from micformer_tpu.pipeline.evaluator import normalized_surface_dice

    a = np.zeros((12, 12, 12), bool)
    b = np.zeros((12, 12, 12), bool)
    a[2:6, 2:6, 2:6] = True
    b[3:7, 2:6, 2:6] = True  # same cube shifted by 1 voxel along z
    # every surface voxel of one cube is within 1 voxel of the other's surface
    assert normalized_surface_dice(a, b, threshold=1.0) == pytest.approx(1.0, abs=1e-6)
    # at tolerance 0 only coinciding surface voxels count: compute expected
    # directly from the definition
    from micformer_tpu.losses.metrics import _surface_distances

    d_ab = _surface_distances(a, b, None)
    d_ba = _surface_distances(b, a, None)
    tp_a = np.mean(d_ab <= 0); tp_b = np.mean(d_ba <= 0)
    fp = np.mean(d_ab > 0); fn = np.mean(d_ba > 0)
    expect = (tp_a + tp_b) / (tp_a + tp_b + fp + fn + 1e-8)
    assert normalized_surface_dice(a, b, threshold=0.0) == pytest.approx(expect)
    # identical masks -> 1; empty mask -> nan
    assert normalized_surface_dice(a, a, 0.0) == pytest.approx(1.0)
    assert np.isnan(normalized_surface_dice(a, np.zeros_like(b), 1.0))


def test_region_based_evaluation(tmp_path):
    """create_region_from_mask + per-region Dice/NSD + summary CSV layout
    (region_based_evaluation.py:95-196 parity) on hand-computed masks."""
    from micformer_tpu.pipeline.evaluator import (
        create_region_from_mask, evaluate_case_regions, evaluate_regions,
    )

    gt = np.zeros((10, 10, 10), np.uint8)
    gt[1:5, 1:5, 1:5] = 1     # 64 voxels of label 1
    gt[6:9, 6:9, 6:9] = 2     # 27 voxels of label 2
    pred = np.zeros_like(gt)
    pred[1:5, 1:5, 1:3] = 1   # half of label-1 slab (32 voxels)
    pred[6:9, 6:9, 6:9] = 2   # label 2 exact

    regions = {"one": (1,), "two": (2,), "both": (1, 2), "absent": (5,)}
    m = create_region_from_mask(gt, (1, 2))
    assert m.sum() == 64 + 27 and m.dtype == np.uint8

    dc = evaluate_case_regions(pred, gt, regions, "dc")
    assert dc[0] == pytest.approx(2 * 32 / (32 + 64))
    assert dc[1] == pytest.approx(1.0)
    assert dc[2] == pytest.approx(2 * 59 / (59 + 91))
    assert np.isnan(dc[3])  # both empty -> nan

    summary = evaluate_regions(
        [("c1", pred, gt), ("c2", gt, gt)], regions, out_dir=str(tmp_path))
    assert summary["dc"]["two"]["mean"] == pytest.approx(1.0)
    assert summary["dc"]["one"]["mean"] == pytest.approx((2 * 32 / 96 + 1.0) / 2)
    # nan-is-1 aggregation row (reference summary_<m>.csv bottom rows)
    assert summary["dc"]["absent"]["mean_nan_is_1"] == pytest.approx(1.0)
    assert np.isnan(summary["dc"]["absent"]["mean"])
    csv = (tmp_path / "summary_dc.csv").read_text().splitlines()
    assert csv[0] == "casename,one,two,both,absent"
    assert csv[1].startswith("c1,0.6667,1.0000")
    assert [row.split(",")[0] for row in csv[3:]] == [
        "mean", "median", "mean (nan is 1)", "median (nan is 1)"]
    assert (tmp_path / "summary_surface_dc.csv").exists()
    # identical masks give NSD 1 everywhere they exist
    assert summary["surface_dc"]["two"]["mean"] == pytest.approx(1.0)


def test_sanity_checks(tmp_path):
    """verify_dataset_integrity parity (sanity_checks.py:25-235): clean
    synthetic dataset passes; missing file / geometry mismatch / bad label
    values / NaNs are each reported."""
    import numpy as np

    from micformer_tpu.data.synthetic import write_synthetic_dataset
    from micformer_tpu.data.nifti import read_nifti, write_nifti
    from micformer_tpu.pipeline.sanity_checks import (
        verify_dataset_integrity, verify_contains_only_expected_labels)

    root = str(tmp_path / "ok")
    write_synthetic_dataset(root, n_cases=3, shape=(12, 12, 12), seed=3)
    rep = verify_dataset_integrity(root)
    assert rep["errors"] == [] and len(rep["cases"]) == 3

    # break things one at a time
    bad = str(tmp_path / "bad")
    write_synthetic_dataset(bad, n_cases=2, shape=(12, 12, 12), seed=4)
    import os, glob
    pid = sorted(glob.glob(os.path.join(bad, "ct_*_image.nii.gz")))[0]
    pid = os.path.basename(pid)[3:-len("_image.nii.gz")]
    # 1. geometry mismatch: rewrite the ct label with a different affine
    lab = np.asarray(read_nifti(os.path.join(bad, f"ct_{pid}_label.nii.gz")))
    aff = np.diag([2.0, 1.0, 1.0, 1.0])
    write_nifti(os.path.join(bad, f"ct_{pid}_label.nii.gz"), lab, affine=aff)
    # 2. NaN in an mr image
    img = np.asarray(read_nifti(os.path.join(bad, f"mr_{pid}_image.nii.gz"))).astype(np.float32)
    img[0, 0, 0] = np.nan
    write_nifti(os.path.join(bad, f"mr_{pid}_image.nii.gz"), img)
    # 3. drop a file of the second case
    pid2 = sorted({os.path.basename(p)[3:-len("_image.nii.gz")]
                   for p in glob.glob(os.path.join(bad, "ct_*_image.nii.gz"))})[1]
    os.remove(os.path.join(bad, f"mr_{pid2}_label.nii.gz"))

    rep = verify_dataset_integrity(bad)
    msgs = " | ".join(rep["errors"])
    assert "geometry mismatch" in msgs
    assert "NaN values" in msgs
    assert f"case {pid2}: missing" in msgs
    with pytest.raises(AssertionError):
        verify_dataset_integrity(bad, strict=True)

    ok, unexpected = verify_contains_only_expected_labels(
        np.array([0, 1, 9]), {0, 1, 2})
    assert not ok and unexpected == [9.0]
