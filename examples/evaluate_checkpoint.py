"""Scripted test.ipynb equivalent (reference MicFormer/test.ipynb, SURVEY §2.10):
rebuild the val split, load a checkpoint, run direct (non-tiled) inference,
report meandice + per-class HD95 + mIoU, optionally dump NIfTI volumes.

Usage:
  python examples/evaluate_checkpoint.py --data <root> --run-dir runs/f0 \
      --model micformer [--dump ./output] [--target-shape 128]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from micformer_tpu import registry
    from micformer_tpu.data import get_datasets
    from micformer_tpu.data.nifti import write_nifti
    from micformer_tpu.losses.metrics import meandice, mean_iou, hd95_multiclass
    from micformer_tpu.train.checkpoint import CheckpointManager

    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--cache", default=None)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--model", default="micformer")
    p.add_argument("--ckpt-tag", default="best_loss",
                   help="the notebook loads model_lower_loss.pth.tar")
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--target-shape", type=int, default=128)
    p.add_argument("--dump", default=None, help="dir for ct/mr/pred/gt NIfTIs")
    args = p.parse_args(argv)

    ts = (args.target_shape,) * 3
    _, val_ds, _ = get_datasets(args.data, cache_dir=args.cache, target_shape=ts)
    model = registry.build(args.model, num_classes=args.num_classes)
    params = CheckpointManager(args.run_dir).restore_params_only(args.ckpt_tag)

    @jax.jit
    def forward(params, x):
        return model.apply({"params": params}, x)

    dices, ious = [], []
    for i in range(len(val_ds)):
        s = val_ds[i]
        x = jnp.asarray(np.asarray(s["image"], np.float32))[None]
        logits = forward(params, x)
        pred = jnp.argmax(jax.nn.softmax(logits, axis=1), axis=1)
        gt_onehot = jnp.asarray(np.asarray(s["label"], np.float32))[None]
        gt = jnp.argmax(gt_onehot, axis=1)
        d = float(meandice(pred, gt, args.num_classes))
        pred_oh = jax.nn.one_hot(pred, args.num_classes, axis=1)
        iou = float(mean_iou(pred_oh, gt_onehot))
        hd = hd95_multiclass(np.asarray(pred)[0], np.asarray(gt)[0], args.num_classes)
        dices.append(d)
        ious.append(iou)
        print(f"{s['patient_id']}: meandice={d:.4f} mIoU={iou:.4f} "
              f"HD95={['%.1f' % h if np.isfinite(h) else 'nan' for h in hd]}")
        if args.dump:
            os.makedirs(args.dump, exist_ok=True)
            img = np.asarray(s["image"])
            write_nifti(os.path.join(args.dump, f"{s['patient_id']}_ct.nii.gz"), img[0])
            if img.shape[0] > 1:
                write_nifti(os.path.join(args.dump, f"{s['patient_id']}_mr.nii.gz"), img[1])
            write_nifti(os.path.join(args.dump, f"{s['patient_id']}_pred.nii.gz"),
                        np.asarray(pred)[0].astype(np.uint8))
            write_nifti(os.path.join(args.dump, f"{s['patient_id']}_gt.nii.gz"),
                        np.asarray(gt)[0].astype(np.uint8))
    if dices:
        print(f"mean over {len(dices)} cases: meandice={np.mean(dices):.4f} "
              f"mIoU={np.mean(ious):.4f}")


if __name__ == "__main__":
    main()
