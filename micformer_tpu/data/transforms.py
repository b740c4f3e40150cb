"""On-device, jittable data augmentation (MONAI dict-transform parity).

The reference applies MONAI transforms on the CPU inside DataLoader workers
(reference MicFormer/train_mmwhs_noPad.py:116-130):

  train: RandFlipd(image+label, p=0.5, axis 0/1/2) -> NormalizeIntensityd
         (nonzero, channel_wise) -> RandScaleIntensityd(0.1, p=1) ->
         RandShiftIntensityd(0.1, p=1)
  val:   NormalizeIntensityd(nonzero, channel_wise)

The TPU-first redesign runs the same math as pure ``(key, batch) -> batch``
functions under jit so augmentation fuses into the train step and the host
pipeline stays deterministic/cheap. Semantics match MONAI:
  - NormalizeIntensity(nonzero=True, channel_wise=True): per-channel z-score
    over voxels != 0, zeros left untouched.
  - RandScaleIntensity(factors=f): x * (1 + U(-f, f)).
  - RandShiftIntensity(offsets=o): x + U(-o, o).
  - RandFlip on a spatial axis flips image and label together.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_intensity_nonzero(image: jnp.ndarray) -> jnp.ndarray:
    """Per-channel z-score over nonzero voxels; zeros stay zero.

    image: [..., C, D, H, W] — statistics are computed over the trailing 3 axes
    per channel (MONAI NormalizeIntensityd(nonzero=True, channel_wise=True)).
    """
    axes = (-3, -2, -1)
    mask = image != 0
    cnt = jnp.maximum(jnp.sum(mask, axis=axes, keepdims=True), 1)
    mean = jnp.sum(jnp.where(mask, image, 0.0), axis=axes, keepdims=True) / cnt
    var = jnp.sum(jnp.where(mask, (image - mean) ** 2, 0.0), axis=axes, keepdims=True) / cnt
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    return jnp.where(mask, (image - mean) / std, image)


def rand_flip(key, image, label, axis: int, prob: float = 0.5):
    """Flip image+label along spatial `axis` (0..2 over the last 3 dims) w.p. prob."""
    do = jax.random.bernoulli(key, prob)
    ax = image.ndim - 3 + axis
    lax_ = label.ndim - 3 + axis
    return (
        jnp.where(do, jnp.flip(image, axis=ax), image),
        jnp.where(do, jnp.flip(label, axis=lax_), label),
    )


def rand_scale_intensity(key, image, factors: float = 0.1, prob: float = 1.0):
    kf, kp = jax.random.split(key)
    f = jax.random.uniform(kf, (), minval=-factors, maxval=factors)
    out = image * (1.0 + f)
    if prob >= 1.0:
        return out
    return jnp.where(jax.random.bernoulli(kp, prob), out, image)


def rand_shift_intensity(key, image, offsets: float = 0.1, prob: float = 1.0):
    kf, kp = jax.random.split(key)
    o = jax.random.uniform(kf, (), minval=-offsets, maxval=offsets)
    out = image + o
    if prob >= 1.0:
        return out
    return jnp.where(jax.random.bernoulli(kp, prob), out, image)


def train_augment(key, image, label):
    """Full reference train-transform stack on one sample ([C,D,H,W], [K,D,H,W])."""
    keys = jax.random.split(key, 5)
    for i, axis in enumerate(range(3)):
        image, label = rand_flip(keys[i], image, label, axis)
    image = normalize_intensity_nonzero(image)
    image = rand_scale_intensity(keys[3], image)
    image = rand_shift_intensity(keys[4], image)
    return image, label


def val_normalize(image):
    """Reference val transform: nonzero channel-wise z-score only."""
    return normalize_intensity_nonzero(image)


def batched_train_augment(key, images, labels):
    """vmap over the batch dim with independent per-sample keys."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(train_augment)(keys, images, labels)
