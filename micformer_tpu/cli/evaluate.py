"""Evaluation CLI — Dice/HD95/mIoU over predicted vs GT label maps.

Parity with the reference eval notebooks (MicFormer/test.ipynb cell 4:
meandice + MONAI HD95 + MeanIoU) and the nnU-Net evaluator json aggregation
(evaluation/evaluator.py aggregate_scores).
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    import numpy as np

    from micformer_tpu.data.nifti import read_nifti
    from micformer_tpu.pipeline.evaluator import evaluate_case, aggregate_scores

    p = argparse.ArgumentParser("micformer_tpu.evaluate")
    p.add_argument("--pred", required=True, help="dir of *_pred.nii.gz")
    p.add_argument("--gt", required=True, help="dir of matching *_gt.nii.gz (or label maps)")
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--json", default=None)
    p.add_argument("--regions", action="store_true",
                   help="also run region-based evaluation (per-structure + "
                        "whole-heart Dice and normalized surface Dice), "
                        "writing summary_dc.csv / summary_surface_dc.csv "
                        "into --pred (region_based_evaluation.py workflow)")
    p.add_argument("--nsd-tolerance", type=float, default=1.0,
                   help="normalized-surface-Dice tolerance in mm")
    args = p.parse_args(argv)

    labels = list(range(1, args.num_classes))
    results = []
    region_pairs = []
    preds = sorted(glob.glob(os.path.join(args.pred, "*_pred.nii.gz")))
    for pp in preds:
        pid = os.path.basename(pp).replace("_pred.nii.gz", "")
        gts = glob.glob(os.path.join(args.gt, f"{pid}*"))
        if not gts:
            print(f"warning: no GT for {pid}, skipping")
            continue
        pred = np.asarray(read_nifti(pp)).astype(np.int32)
        gt = np.asarray(read_nifti(gts[0])).astype(np.int32)
        results.append(evaluate_case(pred, gt, labels,
                                     nsd_tolerance_mm=args.nsd_tolerance))
        if args.regions:
            region_pairs.append((pid, pred, gt))
        dice = np.mean([results[-1][str(l)]["Dice"] for l in labels])
        print(f"{pid}: mean foreground Dice {dice:.4f}")

    agg = aggregate_scores(results, json_output_file=args.json, json_task="MM-WHS")
    if args.regions and region_pairs:
        from micformer_tpu.pipeline.evaluator import (
            evaluate_regions, get_mmwhs_regions,
        )

        region_summary = evaluate_regions(
            region_pairs, get_mmwhs_regions(), out_dir=args.pred,
            nsd_tolerance_mm=args.nsd_tolerance)
        agg["regions"] = region_summary
        if args.json:
            import json as _json

            with open(args.json) as f:
                payload = _json.load(f)
            payload["regions"] = region_summary
            with open(args.json, "w") as f:
                _json.dump(payload, f, indent=2, default=str)
        wh = region_summary["dc"]["whole heart"]["mean"]
        print(f"whole-heart region Dice: {wh:.4f}")
    if results:
        md = np.mean([agg["mean"][str(l)]["Dice"] for l in labels])
        print(f"overall mean foreground Dice: {md:.4f}")
    return agg


if __name__ == "__main__":
    main()
