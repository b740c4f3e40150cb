"""Dice losses — exact parity with the reference definitions, in JAX.

Parity (reference MicFormer/loss/dice.py):
  - MDiceLoss.forward (:158-166): per-channel sigmoid soft Dice with SQUARED
    denominators, smooth=1, reduced over batch+spatial jointly per channel;
    plus per-channel BCE on sigmoid probabilities; final = (0.7*dice + 0.3*ce)/C.
  - MDiceLoss_Val.forward (:216-221): Dice-only variant.
  - .metric (:223-229): hard Dice @0.5 per (patient, channel), no smooth;
    empty target -> 1.0 if prediction also empty, else 0.0.

All functions are pure and jittable. Losses accumulate in float32 regardless
of input dtype (bf16 activations upstream are fine).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def soft_dice_per_channel(logits: jnp.ndarray, targets: jnp.ndarray, smooth: float = 1.0):
    """1 - softDice per channel; reduction over batch+spatial jointly.

    logits/targets: [B, C, ...]. Returns [C] losses.
    Squared-denominator form (dice.py:143-151).
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    axes = (0,) + tuple(range(2, logits.ndim))
    inter = jnp.sum(probs * t, axis=axes)
    denom = jnp.sum(probs * probs, axis=axes) + jnp.sum(t * t, axis=axes)
    dice = (2.0 * inter + smooth) / (denom + smooth)
    return 1.0 - dice


def bce_per_channel(logits: jnp.ndarray, targets: jnp.ndarray):
    """Mean binary cross-entropy per channel on sigmoid probs (dice.py:161-164).

    Computed stably from logits: BCE = softplus(x) - x*t.
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    axes = (0,) + tuple(range(2, logits.ndim))
    bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(bce, axis=axes)


def mdice_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Train loss: (0.7*sum_c softDice_c + 0.3*sum_c BCE_c) / C (dice.py:158-166)."""
    dice = jnp.sum(soft_dice_per_channel(logits, targets))
    ce = jnp.sum(bce_per_channel(logits, targets))
    return (0.7 * dice + 0.3 * ce) / logits.shape[1]


def mdice_val_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Val loss: mean over channels of soft Dice only (dice.py:216-221)."""
    return jnp.mean(soft_dice_per_channel(logits, targets))


def hard_dice_metric(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-(patient, channel) hard Dice @0.5, `.metric` parity (dice.py:223-229).

    Returns [B, C]. Empty target -> 1.0 if pred empty else 0.0 (dice.py:135-141).
    No smoothing in the defined branch (dice.py:145).
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    pred = (probs > 0.5).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    axes = tuple(range(2, logits.ndim))
    inter = jnp.sum(pred * t, axis=axes)
    psum = jnp.sum(pred, axis=axes)
    tsum = jnp.sum(t, axis=axes)
    dice = (2.0 * inter) / jnp.maximum(psum + tsum, 1e-38)
    empty_target = tsum == 0
    return jnp.where(empty_target, jnp.where(psum == 0, 1.0, 0.0), dice)


# --- nnU-Net-style losses (capability parity with the vendored framework,
#     MedNeXt/nnunet_mednext/training/loss_functions/dice_loss.py) ---------

def softmax_dice_ce_loss(logits, target_onehot, ce_weight=1.0, dice_weight=1.0,
                         smooth=1e-5, include_background=True):
    """DC_and_CE_loss equivalent (dice_loss.py:303): softmax soft Dice + CE."""
    x = logits.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    probs = jax.nn.softmax(x, axis=1)
    axes = (0,) + tuple(range(2, x.ndim))
    inter = jnp.sum(probs * t, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(t, axis=axes)
    dice = (2.0 * inter + smooth) / (denom + smooth)
    if not include_background:
        dice = dice[1:]
    dice_loss = 1.0 - jnp.mean(dice)
    ce = -jnp.mean(jnp.sum(t * jax.nn.log_softmax(x, axis=1), axis=1))
    return dice_weight * dice_loss + ce_weight * ce


def deep_supervision_loss(logits_pyramid, target_onehot, loss_fn=softmax_dice_ce_loss):
    """MultipleOutputLoss2 equivalent (deep_supervision.py:19): weights 2^-i
    normalized, target downsampled (nearest) to each output resolution."""
    n = len(logits_pyramid)
    w = jnp.array([2.0 ** (-i) for i in range(n)])
    w = w / jnp.sum(w)
    total = 0.0
    for i, lg in enumerate(logits_pyramid):
        t = target_onehot
        if lg.shape[2:] != target_onehot.shape[2:]:
            factors = [ts // ls for ts, ls in zip(target_onehot.shape[2:], lg.shape[2:])]
            sl = tuple([slice(None), slice(None)] + [slice(None, None, f) for f in factors])
            t = target_onehot[sl]
        total = total + w[i] * loss_fn(lg, t)
    return total


# --- extended nnU-Net loss zoo (capability parity with
#     MedNeXt/nnunet_mednext/training/loss_functions/: GDL:26, TopKLoss,
#     FocalLoss, MCCLoss:196, DC_and_topk_loss:475, DC_and_BCE_loss:430) -----

def generalized_dice_loss(logits, target_onehot, smooth=1e-5,
                          square_volumes=False):
    """GDL (dice_loss.py:26): class weights = 1/volume^2, softmax probs."""
    x = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    t = target_onehot.astype(jnp.float32)
    axes = (0,) + tuple(range(2, logits.ndim))
    vol = jnp.sum(t, axis=axes)
    w = 1.0 / jnp.maximum(vol * vol, 1e-6)
    inter = jnp.sum(x * t, axis=axes)
    denom = jnp.sum(x, axis=axes) + jnp.sum(t, axis=axes)
    if square_volumes:
        denom = jnp.sum(x * x, axis=axes) + jnp.sum(t * t, axis=axes)
    gdl = (2.0 * jnp.sum(w * inter) + smooth) / (jnp.sum(w * denom) + smooth)
    return 1.0 - gdl


def topk_ce_loss(logits, target_onehot, k_percent: float = 10.0):
    """TopKLoss: mean of the k% highest per-voxel CE values."""
    x = logits.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    ce = -jnp.sum(t * jax.nn.log_softmax(x, axis=1), axis=1)  # [B, ...]
    flat = ce.reshape(-1)
    k = max(1, int(flat.shape[0] * k_percent / 100.0))
    topk = jax.lax.top_k(flat, k)[0]
    return jnp.mean(topk)


def focal_loss(logits, target_onehot, gamma: float = 2.0, alpha: float = 0.25):
    """FocalLossV2 semantics on softmax probabilities."""
    x = logits.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    logp = jax.nn.log_softmax(x, axis=1)
    p = jnp.exp(logp)
    focal = -alpha * (1 - p) ** gamma * logp
    return jnp.mean(jnp.sum(t * focal, axis=1))


def mcc_loss(logits, target_onehot, smooth: float = 1.0):
    """MCCLoss (dice_loss.py:196): 1 - Matthews correlation, voxel-normalized."""
    x = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    t = target_onehot.astype(jnp.float32)
    axes = (0,) + tuple(range(2, logits.ndim))
    n_vox = float(np.prod([logits.shape[a] for a in range(logits.ndim) if a != 1]))
    tp = jnp.sum(x * t, axis=axes) / n_vox
    fp = jnp.sum(x * (1 - t), axis=axes) / n_vox
    fn = jnp.sum((1 - x) * t, axis=axes) / n_vox
    tn = jnp.sum((1 - x) * (1 - t), axis=axes) / n_vox
    num = tp * tn - fp * fn
    den = jnp.sqrt(jnp.maximum((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn), 1e-12))
    mcc = (num + smooth) / (den + smooth)
    return 1.0 - jnp.mean(mcc)


def dice_topk_loss(logits, target_onehot, k_percent: float = 10.0):
    """DC_and_topk_loss (dice_loss.py:475): soft Dice + top-k CE."""
    dice = softmax_dice_ce_loss(logits, target_onehot, ce_weight=0.0)
    return dice + topk_ce_loss(logits, target_onehot, k_percent)


def dice_bce_loss(logits, target_onehot):
    """DC_and_BCE_loss (dice_loss.py:430): sigmoid Dice + BCE (region mode)."""
    dice = jnp.mean(soft_dice_per_channel(logits, target_onehot))
    bce = jnp.mean(bce_per_channel(logits, target_onehot))
    return dice + bce


def edice_loss(logits, region_targets):
    """EDiceLoss (reference loss/dice.py:5-60): BraTS ET/TC/WT region loss —
    per-region sigmoid soft Dice, mean over regions."""
    return jnp.mean(soft_dice_per_channel(logits, region_targets))
