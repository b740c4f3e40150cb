"""Registration preprocessing CLI — prepocess.py parity (L0, offline).

Reference behavior (/root/reference/prepocess.py:10-42): for each pair,
register the CT LABEL to the MR LABEL with ANTs SyN, apply the forward
transform to the CT image (linear interp) and CT label (nearestNeighbor),
then crop ALL FOUR volumes (registered CT image/label + MR image/label) to
the nonzero bounding box of the registered CT image, writing ct_crop/ and
mr_crop/ with the original file naming convention.

ANTs (antspyx) is an optional host-side dependency — this stage is offline
and never touches the TPU. Without ANTs installed, `--no-registration` still
performs the bbox-crop stage on pre-aligned pairs.
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    import numpy as np

    from micformer_tpu.data.nifti import read_nifti, write_nifti
    from micformer_tpu.data.image_utils import nonzero_bbox

    p = argparse.ArgumentParser("micformer_tpu.preprocess")
    p.add_argument("--data", required=True, help="root with ct_train/ and mr_train/")
    p.add_argument("--out", default=None, help="output root (default: --data)")
    p.add_argument("--no-registration", action="store_true",
                   help="skip ANTs registration (pairs already aligned)")
    args = p.parse_args(argv)
    out_root = args.out or args.data

    ct_imgs = sorted(glob.glob(os.path.join(args.data, "ct_train", "*_image.nii.gz")))
    os.makedirs(os.path.join(out_root, "ct_crop"), exist_ok=True)
    os.makedirs(os.path.join(out_root, "mr_crop"), exist_ok=True)

    for ct_img_p in ct_imgs:
        ct_lab_p = ct_img_p.replace("_image", "_label")
        mr_img_p = ct_img_p.replace("ct_", "mr_")
        mr_lab_p = mr_img_p.replace("_image", "_label")
        name = os.path.basename(ct_img_p)

        if not args.no_registration:
            try:
                import ants
            except ImportError:
                raise SystemExit(
                    "antspyx not installed — rerun with --no-registration for "
                    "pre-aligned pairs, or install antspyx offline")
            mr_lab = ants.image_read(mr_lab_p)
            ct_lab = ants.image_read(ct_lab_p)
            ct_img = ants.image_read(ct_img_p)
            reg = ants.registration(fixed=mr_lab, moving=ct_lab)
            ct_img_r = ants.apply_transforms(mr_lab, ct_img, reg["fwdtransforms"],
                                             interpolator="linear")
            ct_lab_r = ants.apply_transforms(mr_lab, ct_lab, reg["fwdtransforms"],
                                             interpolator="nearestNeighbor")
            ct_image = ct_img_r.numpy().transpose(2, 1, 0)
            ct_label = ct_lab_r.numpy().transpose(2, 1, 0)
        else:
            ct_image = np.asarray(read_nifti(ct_img_p))
            ct_label = np.asarray(read_nifti(ct_lab_p))

        mr_image = np.asarray(read_nifti(mr_img_p))
        mr_label = np.asarray(read_nifti(mr_lab_p))

        (z0, z1), (y0, y1), (x0, x1) = nonzero_bbox(np.abs(ct_image))
        sl = (slice(z0, z1), slice(y0, y1), slice(x0, x1))
        write_nifti(os.path.join(out_root, "ct_crop", name), ct_image[sl])
        write_nifti(os.path.join(out_root, "ct_crop", name.replace("_image", "_label")),
                    ct_label[sl])
        write_nifti(os.path.join(out_root, "mr_crop", name.replace("ct_", "mr_")),
                    mr_image[sl])
        write_nifti(os.path.join(out_root, "mr_crop",
                                 name.replace("ct_", "mr_").replace("_image", "_label")),
                    mr_label[sl])
        print(f"{name}: cropped to {ct_image[sl].shape}")


if __name__ == "__main__":
    main()
