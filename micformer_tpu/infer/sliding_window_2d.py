"""2D and pseudo-3D sliding-window inference over 3D volumes.

Capability parity with the nnU-Net engines the 3D path doesn't cover
(nnFormer/nnformer/neural_network.py:429-822):
  - `_internal_predict_3D_2Dconv_tiled` (:785): run a 2D network slice-by-
    slice along the leading spatial axis, each slice predicted by the 2D
    tiled engine (gaussian blending, optional mirror TTA over in-plane axes).
  - `predict_3D_pseudo3D_2Dconv` (:753): each output slice sees
    2*extra+1 neighboring slices stacked into channels (channel-major:
    all slices of channel 0, then channel 1, ... — the reference's
    `d.reshape((-1, H, W))` ordering), zero-padded at the volume ends.

TPU design: a slice IS a (1, rh, rw)-roi 3D volume, so both variants reuse
the jitted 3D tile loop (infer/sliding_window.py) — the D axis simply becomes
part of the tile grid, which also means slices are batched onto the MXU via
sw_batch_size instead of looping in Python like the reference.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from micformer_tpu.infer.sliding_window import sliding_window_inference


def _lift_2d_predictor(predictor_2d: Callable) -> Callable:
    """[b, C, 1, rh, rw] -> [b, K, 1, rh, rw] from a 2D predictor."""

    def predictor_3d(x):
        y = predictor_2d(x[:, :, 0])
        return y[:, :, None]

    return predictor_3d


def sliding_window_inference_2d(
    volume: jnp.ndarray,
    roi_size_2d,
    predictor_2d: Callable,
    *,
    num_classes: int = 8,
    overlap: float = 0.5,
    blend: str = "gaussian",
    step_mode: str = "monai",
    step_size: float = 0.5,
    sw_batch_size: int = 1,
    mirror_tta: bool = False,
) -> jnp.ndarray:
    """Slice-by-slice 2D tiled prediction of a [B, C, D, H, W] volume.

    predictor_2d: [b, C, rh, rw] -> [b, num_classes, rh, rw].
    Returns [B, num_classes, D, H, W] blended logits. Mirror TTA flips only
    the in-plane axes (nnU-Net 2D mirror_axes=(0, 1) convention).
    """
    return sliding_window_inference(
        volume,
        (1,) + tuple(roi_size_2d),
        _lift_2d_predictor(predictor_2d),
        num_classes=num_classes,
        overlap=overlap,
        blend=blend,
        step_mode=step_mode,
        step_size=step_size,
        sw_batch_size=sw_batch_size,
        mirror_tta=mirror_tta,
        mirror_axes=(1, 2),
    )


def sliding_window_inference_pseudo3d(
    volume: jnp.ndarray,
    roi_size_2d,
    predictor_2d: Callable,
    *,
    pseudo3d_slices: int = 5,
    num_classes: int = 8,
    overlap: float = 0.5,
    blend: str = "gaussian",
    step_mode: str = "monai",
    step_size: float = 0.5,
    sw_batch_size: int = 1,
    mirror_tta: bool = False,
) -> jnp.ndarray:
    """Pseudo-3D prediction: every slice is predicted from a (2p+1)-slice
    neighborhood stacked into channels (predict_3D_pseudo3D_2Dconv parity).

    predictor_2d: [b, C*(2p+1), rh, rw] -> [b, num_classes, rh, rw].
    """
    assert pseudo3d_slices % 2 == 1, "pseudo3d_slices must be odd"
    p = (pseudo3d_slices - 1) // 2
    B, C, D, H, W = volume.shape

    padded = jnp.pad(volume, ((0, 0), (0, 0), (p, p), (0, 0), (0, 0)))
    # [B, C, 2p+1, D, H, W] -> channel-major slabs [B, C*(2p+1), D, H, W]
    slabs = jnp.stack([padded[:, :, i:i + D] for i in range(2 * p + 1)], axis=2)
    slabs = slabs.reshape(B, C * (2 * p + 1), D, H, W)

    return sliding_window_inference_2d(
        slabs, roi_size_2d, predictor_2d,
        num_classes=num_classes, overlap=overlap, blend=blend,
        step_mode=step_mode, step_size=step_size,
        sw_batch_size=sw_batch_size, mirror_tta=mirror_tta,
    )
