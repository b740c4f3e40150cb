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


def _split_modalities(image, num_modalities):
    """Split [C,...] into (intensity channels, passthrough channels).

    Cascade prev-stage one-hot channels ride along at the END of the channel
    axis and must NOT receive intensity transforms (the reference appends them
    AFTER the intensity stack — moreDA.py MoveSegAsOneHotToData ordering);
    spatial transforms (flips/affine) apply to every channel."""
    if num_modalities is None or num_modalities >= image.shape[0]:
        return image, None
    return image[:num_modalities], image[num_modalities:]


def _join_modalities(mod, rest):
    return mod if rest is None else jnp.concatenate([mod, rest], axis=0)


def train_augment(key, image, label, num_modalities=None):
    """Full reference train-transform stack on one sample ([C,D,H,W], [K,D,H,W])."""
    keys = jax.random.split(key, 5)
    for i, axis in enumerate(range(3)):
        image, label = rand_flip(keys[i], image, label, axis)
    mod, rest = _split_modalities(image, num_modalities)
    mod = normalize_intensity_nonzero(mod)
    mod = rand_scale_intensity(keys[3], mod)
    mod = rand_shift_intensity(keys[4], mod)
    return _join_modalities(mod, rest), label


def val_normalize(image, num_modalities=None):
    """Reference val transform: nonzero channel-wise z-score only."""
    axis = 0 if image.ndim == 4 else 1  # [C,...] or batched [B,C,...]
    if num_modalities is None or num_modalities >= image.shape[axis]:
        return normalize_intensity_nonzero(image)
    mod, rest = jnp.split(image, [num_modalities], axis=axis)
    return jnp.concatenate([normalize_intensity_nonzero(mod), rest], axis=axis)


def batched_train_augment(key, images, labels, num_modalities=None):
    """vmap over the batch dim with independent per-sample keys."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, l: train_augment(k, i, l, num_modalities))(
        keys, images, labels)


def batched_nnunet_train_augment(key, images, labels, num_modalities=None):
    """vmap of the moreDA-flavored stack over the batch dim."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, l: nnunet_train_augment(k, i, l, num_modalities))(
        keys, images, labels)

# ---------------------------------------------------------------------------
# nnU-Net moreDA-style spatial/intensity augmentations (capability parity with
# MedNeXt/nnunet_mednext/training/data_augmentation/data_augmentation_moreDA.py
# batchgenerators pipeline), implemented as on-device jittable transforms.
# ---------------------------------------------------------------------------


def rand_gamma(key, image, gamma_range=(0.7, 1.5), prob: float = 0.3,
               invert_image: bool = False):
    """batchgenerators GammaTransform semantics: min-max normalize to [0,1],
    apply x^gamma, restore the original range."""
    kg, kp = jax.random.split(key)
    gamma = jax.random.uniform(kg, (), minval=gamma_range[0], maxval=gamma_range[1])
    sign = -1.0 if invert_image else 1.0
    x = sign * image
    mn = jnp.min(x)
    rng_ = jnp.maximum(jnp.max(x) - mn, 1e-7)
    out = sign * (((x - mn) / rng_) ** gamma * rng_ + mn)
    return jnp.where(jax.random.bernoulli(kp, prob), out, image)


def rand_gaussian_noise(key, image, sigma_range=(0.0, 0.1), prob: float = 0.1):
    kn, ks, kp = jax.random.split(key, 3)
    sigma = jax.random.uniform(ks, (), minval=sigma_range[0], maxval=sigma_range[1])
    noise = jax.random.normal(kn, image.shape, image.dtype) * sigma
    return jnp.where(jax.random.bernoulli(kp, prob), image + noise, image)


def _gaussian_blur_1d(x, sigma, axis, radius: int = 3):
    offs = jnp.arange(-radius, radius + 1, dtype=x.dtype)
    w = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-3)) ** 2)
    w = w / jnp.sum(w)
    out = jnp.zeros_like(x)
    for i, o in enumerate(range(-radius, radius + 1)):
        out = out + w[i] * jnp.roll(x, o, axis=axis)
    return out


def rand_gaussian_blur(key, image, sigma_range=(0.5, 1.0), prob: float = 0.2):
    """Separable Gaussian blur over the last 3 axes (GaussianBlurTransform)."""
    ks, kp = jax.random.split(key)
    sigma = jax.random.uniform(ks, (), minval=sigma_range[0], maxval=sigma_range[1])
    out = image
    for ax in (-3, -2, -1):
        out = _gaussian_blur_1d(out, sigma, ax)
    return jnp.where(jax.random.bernoulli(kp, prob), out, image)


def rand_affine(key, image, label, rot_range=0.26, scale_range=(0.85, 1.25),
                prob: float = 0.2):
    """Random 3D rotation + isotropic zoom (SpatialTransform's rotation/scale
    core): build an affine coordinate grid and resample — image trilinearly,
    one-hot label channels trilinearly then re-binarized by argmax upstream
    (labels here stay soft; callers argmax at loss/metric time already).

    image: [C, D, H, W]; label: [K, D, H, W].
    """
    from micformer_tpu.ops.warp import trilinear_sample

    k1, k2, k3, k4, kp = jax.random.split(key, 5)
    a = jax.random.uniform(k1, (), minval=-rot_range, maxval=rot_range)
    b = jax.random.uniform(k2, (), minval=-rot_range, maxval=rot_range)
    c = jax.random.uniform(k3, (), minval=-rot_range, maxval=rot_range)
    s = jax.random.uniform(k4, (), minval=scale_range[0], maxval=scale_range[1])

    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    ry = jnp.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    rz = jnp.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]])
    m = (rx @ ry @ rz) / s  # inverse-zoom: sample grid scaled by 1/s

    C, D, H, W = image.shape
    grids = jnp.meshgrid(jnp.arange(D, dtype=jnp.float32),
                         jnp.arange(H, dtype=jnp.float32),
                         jnp.arange(W, dtype=jnp.float32), indexing="ij")
    center = jnp.array([(D - 1) / 2, (H - 1) / 2, (W - 1) / 2])
    g = jnp.stack(grids).reshape(3, -1) - center[:, None]
    coords = (m @ g + center[:, None]).reshape(3, D, H, W)[None]

    def resample(vol):  # [K, D, H, W] -> same
        out = trilinear_sample(jnp.moveaxis(vol, 0, -1)[None], coords)[0]
        return jnp.moveaxis(out, -1, 0)

    do = jax.random.bernoulli(kp, prob)
    img_out = jnp.where(do, resample(image), image)
    lab_out = jnp.where(do, resample(label.astype(image.dtype)), label.astype(image.dtype))
    return img_out, lab_out


def nnunet_train_augment(key, image, label, num_modalities=None):
    """moreDA-flavored stack: affine -> noise -> blur -> intensity scale ->
    gamma -> flips. Per-sample [C,D,H,W]/[K,D,H,W]. Intensity transforms skip
    cascade one-hot channels beyond `num_modalities` (moreDA ordering)."""
    ks = jax.random.split(key, 9)
    image, label = rand_affine(ks[0], image, label)
    mod, rest = _split_modalities(image, num_modalities)
    mod = rand_gaussian_noise(ks[1], mod)
    mod = rand_gaussian_blur(ks[2], mod)
    mod = rand_scale_intensity(ks[3], mod, 0.25, prob=0.15)
    mod = rand_gamma(ks[4], mod, invert_image=True, prob=0.1)
    mod = rand_gamma(ks[5], mod, prob=0.3)
    image = _join_modalities(mod, rest)
    for axis in range(3):
        image, label = rand_flip(ks[6 + axis], image, label, axis)
    return image, label


def rand_elastic(key, image, label, alpha=(0.0, 200.0), sigma=(9.0, 13.0),
                 prob: float = 0.2):
    """Elastic deformation (batchgenerators SpatialTransform's elastic core):
    smooth random displacement field = gaussian-filtered noise * alpha, applied
    with trilinear resampling. image [C,D,H,W], label one-hot [K,D,H,W]."""
    from micformer_tpu.ops.warp import trilinear_sample

    ka, ks, kn, kp = jax.random.split(key, 4)
    a = jax.random.uniform(ka, (), minval=alpha[0], maxval=alpha[1])
    s = jax.random.uniform(ks, (), minval=sigma[0], maxval=sigma[1])

    C, D, H, W = image.shape
    noise = jax.random.uniform(kn, (3, D, H, W), minval=-1.0, maxval=1.0)
    # separable gaussian smoothing of the displacement field
    field = noise
    for ax in (-3, -2, -1):
        field = _gaussian_blur_1d(field, s / 3.0, ax, radius=4)
    field = field * a

    grids = jnp.meshgrid(jnp.arange(D, dtype=jnp.float32),
                         jnp.arange(H, dtype=jnp.float32),
                         jnp.arange(W, dtype=jnp.float32), indexing="ij")
    coords = (jnp.stack(grids) + field)[None]

    def resample(vol):
        out = trilinear_sample(jnp.moveaxis(vol, 0, -1)[None], coords)[0]
        return jnp.moveaxis(out, -1, 0)

    do = jax.random.bernoulli(kp, prob)
    img_out = jnp.where(do, resample(image), image)
    lab_out = jnp.where(do, resample(label.astype(image.dtype)),
                        label.astype(image.dtype))
    return img_out, lab_out
