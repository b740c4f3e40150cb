"""Multi-device sliding-window inference — tiles sharded over the mesh.

The TPU-idiomatic extension of the reference's sliding-window decomposition
(SURVEY §5 long-context row, §7.7): the tile grid is split across the mesh's
devices with shard_map; every device runs the predictor on its tile subset
against a replicated volume and accumulates into local logit/weight buffers;
one psum over the axis blends the overlaps. Linear speedup in device count
for the dominant per-tile forward cost.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from micformer_tpu.infer.sliding_window import (
    _tile_starts,
    gaussian_importance_map,
    _mirror_tta_predictor,
)


def sliding_window_inference_sharded(
    volume: jnp.ndarray,
    roi_size,
    predictor,
    mesh: Mesh,
    *,
    axis: str = "data",
    num_classes: int = 8,
    overlap: float = 0.5,
    blend: str = "gaussian",
    step_mode: str = "monai",
    step_size: float = 0.5,
    mirror_tta: bool = False,
) -> jnp.ndarray:
    """Blended tiled prediction with the tile loop sharded over `axis`.

    volume: [B, C, D, H, W] (replicated); returns replicated blended logits.
    Call under jit or eagerly; the shard_map region is jitted by the caller.
    """
    B, C = volume.shape[:2]
    spatial = volume.shape[2:]
    roi = tuple(roi_size)
    pads = [max(r - s, 0) for r, s in zip(roi, spatial)]
    if any(pads):
        cfg = [(0, 0), (0, 0)] + [(p // 2, p - p // 2) for p in pads]
        volume = jnp.pad(volume, cfg)
    padded = volume.shape[2:]

    coords = _tile_starts(padded, roi, step_mode, overlap, step_size)
    n_tiles = coords.shape[0]
    n_dev = mesh.shape[axis]
    per_dev = -(-n_tiles // n_dev)
    pad_tiles = per_dev * n_dev - n_tiles
    coords_p = np.concatenate([coords, np.repeat(coords[:1], pad_tiles, 0)], 0)
    valid = np.concatenate([np.ones(n_tiles, np.float32),
                            np.zeros(pad_tiles, np.float32)])

    if mirror_tta:
        predictor = _mirror_tta_predictor(predictor)

    wmap = (jnp.asarray(gaussian_importance_map(roi)) if blend == "gaussian"
            else jnp.ones(roi, jnp.float32))[None, None]

    def local(vol, starts, valids):
        # starts: [per_dev, 3] local shard; vol replicated
        logit_acc = jnp.zeros((B, num_classes) + padded, jnp.float32)
        weight_acc = jnp.zeros((1, 1) + padded, jnp.float32)

        def body(carry, inp):
            la, wa = carry
            start, v = inp
            win = jax.lax.dynamic_slice(
                vol, (0, 0, start[0], start[1], start[2]), (B, C) + roi)
            pred = predictor(win).astype(jnp.float32)
            idx = (0, 0, start[0], start[1], start[2])
            cur = jax.lax.dynamic_slice(la, idx, (B, num_classes) + roi)
            la = jax.lax.dynamic_update_slice(la, cur + pred * (wmap * v), idx)
            curw = jax.lax.dynamic_slice(wa, (0, 0) + idx[2:], (1, 1) + roi)
            wa = jax.lax.dynamic_update_slice(wa, curw + wmap * v, (0, 0) + idx[2:])
            return (la, wa), None

        (logit_acc, weight_acc), _ = jax.lax.scan(body, (logit_acc, weight_acc),
                                                  (starts, valids))
        logit_acc = jax.lax.psum(logit_acc, axis)
        weight_acc = jax.lax.psum(weight_acc, axis)
        return logit_acc, weight_acc

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    logits, weights = sharded(
        volume,
        jnp.asarray(coords_p.reshape(n_dev, per_dev, 3)).reshape(n_dev * per_dev, 3),
        jnp.asarray(valid),
    )
    out = logits / weights
    if any(pads):
        sl = tuple([slice(None), slice(None)]
                   + [slice(p // 2, p // 2 + s) for p, s in zip(pads, spatial)])
        out = out[sl]
    return out
