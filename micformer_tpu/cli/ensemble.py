"""Cross-model ensembling CLI — average saved softmax probabilities.

Capability parity with the vendored nnU-Net `inference/ensemble_predictions.py`
(merge(): load each model's exported .npz softmax per case, average, argmax,
optional postprocessing, export NIfTI). Inputs are the `--save-softmax`
outputs of `cli/predict.py` runs — so any combination of model families /
configurations can be ensembled, not just folds of one model (fold
ensembling already happens inside predict).

Usage:
  python -m micformer_tpu.cli.ensemble --inputs runA/preds runB/preds \
      --out ./ensembled [--largest-cc]
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    import numpy as np

    from micformer_tpu.data.nifti import write_nifti
    from micformer_tpu.pipeline.postprocess import remove_all_but_largest_cc

    p = argparse.ArgumentParser("micformer_tpu.ensemble")
    p.add_argument("--inputs", nargs="+", required=True,
                   help="two or more predict output dirs containing "
                        "<pid>_softmax.npz files")
    p.add_argument("--out", required=True)
    p.add_argument("--largest-cc", action="store_true")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    case_sets = []
    for d in args.inputs:
        pids = {os.path.basename(f)[: -len("_softmax.npz")]
                for f in glob.glob(os.path.join(d, "*_softmax.npz"))}
        if not pids:
            raise SystemExit(f"no *_softmax.npz under {d} "
                             f"(run predict with --save-softmax)")
        case_sets.append(pids)
    common = set.intersection(*case_sets)
    missing = set.union(*case_sets) - common
    if missing:
        print(f"warning: {len(missing)} cases not present in every input, "
              f"skipped: {sorted(missing)[:5]}...")

    for pid in sorted(common):
        probs = None
        for d in args.inputs:
            sm = np.load(os.path.join(d, f"{pid}_softmax.npz"))["softmax"]
            sm = sm.astype(np.float32)
            probs = sm if probs is None else probs + sm
        seg = np.argmax(probs / len(args.inputs), axis=0).astype(np.uint8)
        if args.largest_cc:
            seg = remove_all_but_largest_cc(seg)
        out_path = os.path.join(args.out, f"{pid}_pred.nii.gz")
        write_nifti(out_path, seg)
        print(f"{pid}: ensembled {len(args.inputs)} models -> {out_path}")


if __name__ == "__main__":
    main()
