"""Overlapped sliding-window inference — jitted tile loop with on-device
accumulation. Implements BOTH reference engines' semantics (SURVEY.md §2.9):

  - MONAI path (utils.py:226-240): roi 128³, overlap 0.5, constant or gaussian
    blending, sw_batch_size; step placement interval = roi*(1-overlap), last
    window clamped to the volume edge.
  - nnU-Net path (neural_network.py:266-289,250-263,291-427,501-559): even
    step placement over (img-roi)/(num-1), gaussian importance σ = roi/8
    (max-normalized, zero-floored), 8-way mirror TTA ensemble, fp16/all-on-GPU
    mode -> here: everything stays in HBM in f32 accumulators.

TPU design: tile start coordinates are static (numpy, trace time); the tile
loop is a `lax.scan` carrying the [B,C,*vol] logit/weight accumulators in HBM,
with `dynamic_slice` window reads and `dynamic_update_slice` read-modify-write
blending. Tiles are batched `sw_batch_size` at a time into one predictor call
so the MXU sees batch>1 (the reference leaves sw_batch_size=1 — SURVEY §7
hard-part 3). Mirror TTA folds the 8 flips into one batched predictor call.
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


def compute_steps_monai(image_size, roi_size, overlap: float = 0.5):
    """MONAI dense patch placement: interval = roi*(1-overlap); last start
    clamped to image-roi (utils.py sliding_window_inference semantics)."""
    starts = []
    for img, roi in zip(image_size, roi_size):
        if roi >= img:
            starts.append([0])
            continue
        interval = max(int(roi * (1 - overlap)), 1)
        num = int(np.ceil((img - roi) / interval)) + 1
        ax = [min(i * interval, img - roi) for i in range(num)]
        # dedup while keeping order (clamping can repeat the final start)
        seen, uniq = set(), []
        for s in ax:
            if s not in seen:
                seen.add(s)
                uniq.append(s)
        starts.append(uniq)
    return starts


def compute_steps_nnunet(image_size, roi_size, step_size: float = 0.5):
    """nnU-Net `_compute_steps_for_sliding_window` parity
    (neural_network.py:266-289): target step roi*step_size, steps spread
    evenly over [0, img-roi]."""
    starts = []
    for img, roi in zip(image_size, roi_size):
        assert img >= roi, "image smaller than patch — pad first"
        if roi == img:
            starts.append([0])
            continue
        num = int(np.ceil((img - roi) / (roi * step_size))) + 1
        actual = (img - roi) / max(num - 1, 1)
        starts.append([int(np.round(actual * i)) for i in range(num)])
    return starts


@functools.lru_cache(maxsize=None)
def gaussian_importance_map(roi_size, sigma_scale: float = 1.0 / 8, eps_floor: bool = True):
    """nnU-Net `_get_gaussian` parity (neural_network.py:250-263): Gaussian
    centered in the patch, σ = roi*sigma_scale, normalized to max 1, zeros
    replaced by the smallest nonzero value. Returns float32 [roi...]."""
    grids = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in roi_size], indexing="ij")
    g = np.zeros(roi_size, np.float64)
    for grid, s in zip(grids, roi_size):
        sigma = s * sigma_scale
        g += ((grid - (s - 1) / 2) / sigma) ** 2
    g = np.exp(-0.5 * g)
    g /= g.max()
    if eps_floor:
        nz = g[g > 0]
        g[g == 0] = nz.min() if nz.size else 1.0
    return g.astype(np.float32)


def _tile_starts(image_size, roi_size, mode: str, overlap: float, step_size: float):
    if mode == "nnunet":
        per_axis = compute_steps_nnunet(image_size, roi_size, step_size)
    else:
        per_axis = compute_steps_monai(image_size, roi_size, overlap)
    coords = np.stack(
        [c.ravel() for c in np.meshgrid(*[np.asarray(a) for a in per_axis], indexing="ij")],
        axis=-1,
    ).astype(np.int32)  # [nTiles, 3]
    return coords


def _flip_flags(mirror_axes):
    """All flip subsets of the mirror axes as a [F, 3] bool array (the
    nnU-Net 8-way ensemble enumeration, neural_network.py:501-559)."""
    import itertools

    subsets = []
    for r in range(len(mirror_axes) + 1):
        subsets.extend(itertools.combinations(mirror_axes, r))
    flags = np.zeros((len(subsets), 3), bool)
    for i, sub in enumerate(subsets):
        for a in sub:
            flags[i, a] = True
    return flags


def _mirror_tta_predictor(predictor: Callable, mirror_axes=(0, 1, 2)) -> Callable:
    """Wrap predictor with the nnU-Net 8-way mirror ensemble
    (neural_network.py:501-559): average of unflip(predict(flip(x))) over all
    flip subsets of the spatial axes.

    The ensemble is a `lax.scan` over flip-flag triples, NOT an unrolled sum:
    unrolled, XLA's scheduler may interleave the 8 forwards and keep several
    sets of activations live at once — the HBM device fault round 1 hit at
    sw_batch>=2. The scan serializes them (one forward's activations live at a
    time) at identical FLOPs."""
    import itertools

    subsets = []
    for r in range(len(mirror_axes) + 1):
        subsets.extend(itertools.combinations(mirror_axes, r))
    flags = np.zeros((len(subsets), 3), bool)
    for i, sub in enumerate(subsets):
        for a in sub:
            flags[i, a] = True

    def wrapped(x):
        def flip_if(t, flag):
            for a in range(3):  # spatial axes of [B, C, D, H, W]
                t = jax.lax.cond(flag[a],
                                 functools.partial(jnp.flip, axis=a + 2),
                                 lambda u: u, t)
            return t

        def body(acc, flag):
            y = flip_if(predictor(flip_if(x, flag)), flag)
            return acc + y.astype(jnp.float32), None

        out_sd = jax.eval_shape(predictor, x)
        acc, _ = jax.lax.scan(body, jnp.zeros(out_sd.shape, jnp.float32),
                              jnp.asarray(flags))
        return acc / len(subsets)

    return wrapped


def sliding_window_inference(
    volume: jnp.ndarray,
    roi_size,
    predictor: Callable,
    *,
    num_classes: int = 8,
    overlap: float = 0.5,
    blend: str = "gaussian",     # gaussian | constant
    step_mode: str = "monai",    # monai | nnunet
    step_size: float = 0.5,      # nnunet step fraction
    sw_batch_size: int = 1,
    mirror_tta: bool = False,
    mirror_axes=(0, 1, 2),
    # batched TTA (round 4): the flip variants of a tile are shape-identical,
    # so they can ride the predictor's batch axis — ONE forward at batch
    # F·sw_batch instead of a scan of F serial forwards. Measured on the real
    # chip (same-session A/B, 160³/roi 128, sw_batch 2): serial scan
    # **0.788 vol/s** vs batched 0.491 — the F·chunk·B=16-tile forward's
    # activation set thrashes HBM, while the serial scan now rides the
    # round-3/4 flagship forward improvements to the 8×-FLOP ceiling
    # (plain 6.1 vol/s ⇒ TTA ceiling ≈ 0.76). Default OFF since round 4;
    # MICFORMER_TTA_BATCHED=1 opts in (benchmarks/RESULTS.md TTA section).
    # MEMORY SCALING (ADVICE r4): the batched path materializes all F flip
    # variants of the window chunk BEFORE the forward (jnp.stack of flips) —
    # an F× activation-input footprint per chunk ON TOP of the F·sw_batch
    # forward itself. Any future default-ON flip must cap F·chunk·B (large
    # roi/sw_batch combinations hit the round-1 HBM device-fault regime).
    # None = read the env flag; an explicit bool wins (tests A/B both paths).
    tta_batched: bool | None = None,
    sigma_scale: float = 1.0 / 8,
) -> jnp.ndarray:
    """Blended tiled prediction of a full volume.

    volume: [B, C, D, H, W]; predictor: [b, C, *roi] -> [b, num_classes, *roi].
    Returns [B, num_classes, D, H, W] blended logits. Jit-safe: wrap in
    jax.jit treating everything except `volume` as static/closure.
    """
    B, C = volume.shape[:2]
    spatial = volume.shape[2:]
    roi = tuple(roi_size)

    # pad up to roi if needed (reference pads with zeros: batch_utils.py:41-54)
    pads = [max(r - s, 0) for r, s in zip(roi, spatial)]
    if any(pads):
        cfg = [(0, 0), (0, 0)] + [(p // 2, p - p // 2) for p in pads]
        volume = jnp.pad(volume, cfg)
    padded = volume.shape[2:]

    coords = _tile_starts(padded, roi, step_mode, overlap, step_size)
    n_tiles = coords.shape[0]

    tta_flags = None
    if mirror_tta:
        use_batched = (os.environ.get("MICFORMER_TTA_BATCHED", "0") == "1"
                       if tta_batched is None else tta_batched)
        if use_batched:
            tta_flags = _flip_flags(mirror_axes)        # static [F, 3]
        else:
            predictor = _mirror_tta_predictor(predictor, mirror_axes)

    if blend == "gaussian":
        wmap = jnp.asarray(gaussian_importance_map(roi, sigma_scale))
    else:
        wmap = jnp.ones(roi, jnp.float32)
    wmap_b = wmap[None, None]  # [1, 1, *roi]

    # group tiles into chunks of sw_batch_size (pad with repeats of tile 0;
    # duplicates are harmless: weighted accumulation double-counts identically
    # in numerator and denominator only if weights also double — so instead
    # mask padded lanes to zero weight).
    chunk = max(1, sw_batch_size)
    n_chunks = -(-n_tiles // chunk)
    pad_tiles = n_chunks * chunk - n_tiles
    coords_p = np.concatenate([coords, np.repeat(coords[:1], pad_tiles, 0)], 0)
    lane_valid = np.concatenate(
        [np.ones(n_tiles, np.float32), np.zeros(pad_tiles, np.float32)]
    ).reshape(n_chunks, chunk)
    coords_c = coords_p.reshape(n_chunks, chunk, 3)

    acc_shape = (B, num_classes) + padded
    logit_acc = jnp.zeros(acc_shape, jnp.float32)
    weight_acc = jnp.zeros((1, 1) + padded, jnp.float32)

    def body(carry, inp):
        logit_acc, weight_acc = carry
        starts, valid = inp  # [chunk, 3], [chunk]

        def read(start):
            return jax.lax.dynamic_slice(
                volume, (0, 0, start[0], start[1], start[2]), (B, C) + roi
            )

        windows = jax.vmap(read)(starts)                  # [chunk, B, C, *roi]
        if tta_flags is not None:
            # flips join the tile batch: one forward at batch F·chunk·B
            def flip(t, flag):
                axes = [a + 3 for a in range(3) if flag[a]]
                return jnp.flip(t, axes) if axes else t

            F = len(tta_flags)
            variants = jnp.stack([flip(windows, f) for f in tta_flags], 0)
            batch_in = variants.reshape((F * chunk * B, C) + roi)
            preds = predictor(batch_in).astype(jnp.float32)
            preds = preds.reshape((F, chunk, B, num_classes) + roi)
            preds = jnp.stack(
                [flip(preds[i], f) for i, f in enumerate(tta_flags)], 0
            ).mean(axis=0)                                # [chunk, B, ncls, *roi]
        else:
            batch_in = windows.reshape((chunk * B, C) + roi)
            preds = predictor(batch_in).astype(jnp.float32)
            preds = preds.reshape((chunk, B, num_classes) + roi)

        def write(carry, inp2):
            la, wa = carry
            start, pred, v = inp2
            idx = (0, 0, start[0], start[1], start[2])
            cur = jax.lax.dynamic_slice(la, idx, (B, num_classes) + roi)
            la = jax.lax.dynamic_update_slice(la, cur + pred * (wmap_b * v), idx)
            curw = jax.lax.dynamic_slice(wa, (0, 0) + idx[2:], (1, 1) + roi)
            wa = jax.lax.dynamic_update_slice(wa, curw + wmap_b * v, (0, 0) + idx[2:])
            return (la, wa), None

        (logit_acc, weight_acc), _ = jax.lax.scan(
            write, (logit_acc, weight_acc), (starts, preds, valid)
        )
        return (logit_acc, weight_acc), None

    (logit_acc, weight_acc), _ = jax.lax.scan(
        body,
        (logit_acc, weight_acc),
        (jnp.asarray(coords_c), jnp.asarray(lane_valid)),
    )

    out = logit_acc / weight_acc
    if any(pads):
        sl = tuple(
            [slice(None), slice(None)]
            + [slice(p // 2, p // 2 + s) for p, s in zip(pads, spatial)]
        )
        out = out[sl]
    return out
