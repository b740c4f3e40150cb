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
    args = p.parse_args(argv)

    labels = list(range(1, args.num_classes))
    results = []
    preds = sorted(glob.glob(os.path.join(args.pred, "*_pred.nii.gz")))
    for pp in preds:
        pid = os.path.basename(pp).replace("_pred.nii.gz", "")
        gts = glob.glob(os.path.join(args.gt, f"{pid}*"))
        if not gts:
            print(f"warning: no GT for {pid}, skipping")
            continue
        pred = np.asarray(read_nifti(pp)).astype(np.int32)
        gt = np.asarray(read_nifti(gts[0])).astype(np.int32)
        results.append(evaluate_case(pred, gt, labels))
        dice = np.mean([results[-1][str(l)]["Dice"] for l in labels])
        print(f"{pid}: mean foreground Dice {dice:.4f}")

    agg = aggregate_scores(results, json_output_file=args.json, json_task="MM-WHS")
    if results:
        md = np.mean([agg["mean"][str(l)]["Dice"] for l in labels])
        print(f"overall mean foreground Dice: {md:.4f}")
    return agg


if __name__ == "__main__":
    main()
