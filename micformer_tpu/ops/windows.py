"""3D window partitioning for Swin-style attention — channels-last, jit-static.

Capability parity (behavior, not code) with the reference implementations:
  - window_partition / window_reverse: MicFormer/models/MICFormer_self.py:37-50,
    117-132 and VT-Unet/vtunet/vt_unet.py (same math).
  - shifted-window attention mask: VT-Unet/vtunet/vt_unet.py `compute_mask`
    (cyclic-shift region ids -> pairwise -100 mask), used by all shifted-window
    models (VT-Unet, SwinUnet3D, nnFormer, SwinUNETR-equivalent).
  - 3D relative-position-bias index: VT-Unet/vtunet/vt_unet.py:149-168.

TPU notes: partition/reverse are pure reshape+transpose (free under XLA — they
fuse into the surrounding attention einsums); masks and bias indices are
computed with numpy at trace time (static given static shapes) so nothing here
touches the device until attention itself.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B * nWindows, prod(window_size), C].

    Requires D, H, W divisible by window_size (static shapes — pad upstream at
    trace time; see models.layers.pad_to_multiple).
    """
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, C)


def window_reverse(windows: jnp.ndarray, window_size, B: int, D: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of window_partition: [B*nW, prod(ws), C] -> [B, D, H, W, C]."""
    wd, wh, ww = window_size
    C = windows.shape[-1]
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, C)


def adjust_window_shift(input_size, window_size, shift_size=None):
    """Clamp window to the input extent and zero the shift on clamped axes.

    Mirrors the `get_window_size` behavior shared by the reference Swin models
    (MICFormer_self.py:135-145): if an input dim is <= window dim, the window
    covers it entirely and shifting is disabled on that axis.
    """
    ws = list(window_size)
    ss = list(shift_size) if shift_size is not None else None
    for i in range(3):
        if input_size[i] <= window_size[i]:
            ws[i] = input_size[i]
            if ss is not None:
                ss[i] = 0
    if ss is None:
        return tuple(ws)
    return tuple(ws), tuple(ss)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(dims, window_size, shift_size) -> np.ndarray | None:
    """Attention mask for cyclic-shifted 3D windows.

    Returns float32 [nWindows_per_batch, T, T] with 0 where token pairs belong
    to the same pre-shift region and -100 otherwise (the Swin convention used
    by VT-Unet `compute_mask`), or None when no axis is shifted.

    Computed in numpy at trace time: dims/window/shift are static under jit so
    this constant folds into the compiled executable.
    """
    if not any(shift_size):
        return None
    D, H, W = dims
    wd, wh, ww = window_size
    sd, sh, sw = shift_size
    img_mask = np.zeros((D, H, W), np.int32)
    cnt = 0
    for d in (slice(0, -wd), slice(-wd, -sd if sd else None), slice(-sd, None) if sd else slice(0, 0)):
        for h in (slice(0, -wh), slice(-wh, -sh if sh else None), slice(-sh, None) if sh else slice(0, 0)):
            for w in (slice(0, -ww), slice(-ww, -sw if sw else None), slice(-sw, None) if sw else slice(0, 0)):
                img_mask[d, h, w] = cnt
                cnt += 1
    # partition region-id volume into windows -> [nW, T]
    m = img_mask.reshape(D // wd, wd, H // wh, wh, W // ww, ww)
    m = m.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def shifted_window_region_ids(dims, window_size, shift_size) -> np.ndarray | None:
    """Compact form of the shifted-window mask: int32 [nWindows, T] region ids.

    The pairwise [nW, T, T] mask is O(nW·T²) — embedding it as an HLO literal
    blows up compile payloads (470 MB for SwinUNETR's window-7 64³ stage, which
    exceeded the remote-compile request limit). Region ids are O(nW·T); the
    pairwise comparison is built in-graph by the attention core and fuses into
    the softmax. Returns None when no axis is shifted."""
    if not any(shift_size):
        return None
    D, H, W = dims
    wd, wh, ww = window_size
    sd, sh, sw = shift_size
    img_mask = np.zeros((D, H, W), np.int32)
    cnt = 0
    for d in (slice(0, -wd), slice(-wd, -sd if sd else None), slice(-sd, None) if sd else slice(0, 0)):
        for h in (slice(0, -wh), slice(-wh, -sh if sh else None), slice(-sh, None) if sh else slice(0, 0)):
            for w in (slice(0, -ww), slice(-ww, -sw if sw else None), slice(-sw, None) if sw else slice(0, 0)):
                img_mask[d, h, w] = cnt
                cnt += 1
    m = img_mask.reshape(D // wd, wd, H // wh, wh, W // ww, ww)
    return m.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size) -> np.ndarray:
    """[T, T] int32 index into a ((2wd-1)(2wh-1)(2ww-1),) bias table.

    Same construction as the 3D Swin relative-position index used by VT-Unet
    (vt_unet.py:149-168): per-axis coordinate deltas shifted to be nonnegative
    and mixed-radix flattened.
    """
    wd, wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij"))
    coords = coords.reshape(3, -1)  # [3, T]
    rel = coords[:, :, None] - coords[:, None, :]  # [3, T, T]
    rel = rel.transpose(1, 2, 0).astype(np.int64)  # [T, T, 3]
    rel[..., 0] += wd - 1
    rel[..., 1] += wh - 1
    rel[..., 2] += ww - 1
    rel[..., 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[..., 1] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


def cyclic_shift(x: jnp.ndarray, shift_size, reverse: bool = False) -> jnp.ndarray:
    """Roll a [B, D, H, W, C] volume by -shift (or +shift when reverse)."""
    if not any(shift_size):
        return x
    sign = 1 if reverse else -1
    return jnp.roll(x, shift=tuple(sign * s for s in shift_size), axis=(1, 2, 3))


def window_area_partition(x: jnp.ndarray, window_size) -> jnp.ndarray:
    """XMorpher-style 27-neighborhood K/V area expansion.

    For every window, gathers the K/V tokens of its 3x3x3 neighborhood on the
    WINDOW GRID (grid zero-padded by one window slot per side):
    [B, D, H, W, C] -> [B * nWindows, 27 * prod(window_size), C], neighbor
    slots ordered z-major then y then x (slot 13 = the window itself).

    Capability parity with the reference's dead-code K/V expansion
    (MicFormer/models/MICFormer_self.py:53-114), which the deformable-warp
    sampling superseded (SURVEY.md §2.6). Reference defects NOT replicated:
    its slot 21 is written twice and slot 20 never (stale zeros,
    MICFormer_self.py:103-105), it rejects B > 1, and it hard-codes .cuda().
    Here every slot is a static shifted slice of one padded grid tensor —
    27 dense views XLA fuses into the stack, no scatter.
    """
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    d, h, w = D // wd, H // wh, W // ww
    T = wd * wh * ww
    grid = x.reshape(B, d, wd, h, wh, w, ww, C)
    grid = grid.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, d, h, w, T, C)
    grid = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0), (0, 0)))
    slots = [
        grid[:, dz:dz + d, dy:dy + h, dx:dx + w]
        for dz in range(3) for dy in range(3) for dx in range(3)
    ]
    out = jnp.stack(slots, axis=4)              # [B, d, h, w, 27, T, C]
    return out.reshape(B * d * h * w, 27 * T, C)
