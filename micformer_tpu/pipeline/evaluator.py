"""Segmentation evaluator — per-case metrics + json aggregation.

Capability parity with the vendored nnU-Net evaluator
(MedNeXt/nnunet_mednext/evaluation/evaluator.py:30-380 `Evaluator` /
`aggregate_scores`, metrics.py): per (case, class) Dice, IoU, precision,
recall, tp/fp/fn/tn, HD95 and mean surface distance; means over cases; json
export with per-case detail. Host-side numpy/scipy (metric definitions in
micformer_tpu.losses.metrics).
"""

from __future__ import annotations

import json
import os

import numpy as np

from micformer_tpu.losses.metrics import hd95, _surface_distances


def evaluate_case(pred: np.ndarray, gt: np.ndarray, labels, spacing=None) -> dict:
    """Metrics per class for one integer label map pair."""
    out = {}
    for l in labels:
        p, g = pred == l, gt == l
        tp = float(np.logical_and(p, g).sum())
        fp = float(np.logical_and(p, ~g).sum())
        fn = float(np.logical_and(~p, g).sum())
        tn = float(np.logical_and(~p, ~g).sum())
        denom = 2 * tp + fp + fn
        m = {
            "Dice": 1.0 if denom == 0 else 2 * tp / denom,
            "Jaccard": 1.0 if (tp + fp + fn) == 0 else tp / (tp + fp + fn),
            "Precision": 0.0 if (tp + fp) == 0 else tp / (tp + fp),
            "Recall": 0.0 if (tp + fn) == 0 else tp / (tp + fn),
            "True Positives": tp, "False Positives": fp,
            "False Negatives": fn, "True Negatives": tn,
        }
        if p.any() and g.any():
            m["Hausdorff Distance 95"] = hd95(p, g, spacing)
            d_pg = _surface_distances(p, g, spacing)
            d_gp = _surface_distances(g, p, spacing)
            m["Avg. Surface Distance"] = float((d_pg.mean() + d_gp.mean()) / 2)
        else:
            m["Hausdorff Distance 95"] = float("nan")
            m["Avg. Surface Distance"] = float("nan")
        out[str(int(l))] = m
    return out


def aggregate_scores(case_results, json_output_file=None, json_name="",
                     json_description="", json_author="", json_task=""):
    """nnU-Net aggregate_scores parity: {'all': [...], 'mean': {label: {metric:
    mean}}} with nan-aware means; optional json dump."""
    all_scores = {"all": list(case_results), "mean": {}}
    if case_results:
        labels = case_results[0].keys()
        for l in labels:
            all_scores["mean"][l] = {}
            metrics = case_results[0][l].keys()
            for m in metrics:
                vals = [c[l][m] for c in case_results if not np.isnan(c[l][m])]
                all_scores["mean"][l][m] = float(np.mean(vals)) if vals else float("nan")
    if json_output_file:
        os.makedirs(os.path.dirname(json_output_file) or ".", exist_ok=True)
        with open(json_output_file, "w") as f:
            json.dump({
                "name": json_name, "description": json_description,
                "author": json_author, "task": json_task,
                "results": all_scores,
            }, f, indent=2, default=str)
    return all_scores
