"""Pipeline layer tests: postprocessing, evaluator, planner."""

import numpy as np

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
