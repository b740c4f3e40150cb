"""Sinusoidal 3D positional encoding (VT-Unet FPE parity).

Reference behavior: VT-Unet/vtunet/vt_unet.py:234-270 `PositionalEncoding3D` —
per-axis channel group ch = ceil(C/6)*2 (rounded even), emb_axis =
concat(sin, cos) over frequencies 1/10000^(2i/ch), three axis groups stacked
into a (ch*3)-wide buffer then truncated to C. The reference reallocates the
encoding every forward call; here it is a trace-time numpy constant (cached),
so it folds into the compiled executable.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def sinusoidal_pe_3d(D: int, H: int, W: int, C: int) -> np.ndarray:
    """[D, H, W, C] float32 positional encoding (axes ordered like the
    reference call sites: first spatial axis gets the first channel group)."""
    ch = int(np.ceil(C / 6) * 2)
    if ch % 2:
        ch += 1
    inv_freq = 1.0 / (10000 ** (np.arange(0, ch, 2, dtype=np.float32) / ch))

    def axis_enc(n):
        ang = np.einsum("i,j->ij", np.arange(n, dtype=np.float32), inv_freq)
        return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)  # [n, ch]

    emb = np.zeros((D, H, W, ch * 3), np.float32)
    emb[..., :ch] = axis_enc(D)[:, None, None, :]
    emb[..., ch : 2 * ch] = axis_enc(H)[None, :, None, :]
    emb[..., 2 * ch :] = axis_enc(W)[None, None, :, :]
    return emb[..., :C]


@functools.lru_cache(maxsize=None)
def sinusoidal_pe_3d_interleaved(D: int, H: int, W: int, C: int) -> np.ndarray:
    """Interleaved-phase variant: per-axis channels are (sin0, cos0, sin1,
    cos1, ...) instead of (sin..., cos...). This is the layout of the pip
    `positional_encodings` package (get_emb = stack(sin, cos) + flatten) used
    by TransUNet's attention gates (TransUnet/models/blocks/
    attention_blocks.py:141-144 PositionalEncodingPermute3D); VT-Unet's
    in-repo copy uses the concatenated layout above."""
    ch = int(np.ceil(C / 6) * 2)
    if ch % 2:
        ch += 1
    inv_freq = 1.0 / (10000 ** (np.arange(0, ch, 2, dtype=np.float32) / ch))

    def axis_enc(n):
        ang = np.einsum("i,j->ij", np.arange(n, dtype=np.float32), inv_freq)
        return np.stack([np.sin(ang), np.cos(ang)], axis=-1).reshape(n, ch)

    emb = np.zeros((D, H, W, ch * 3), np.float32)
    emb[..., :ch] = axis_enc(D)[:, None, None, :]
    emb[..., ch : 2 * ch] = axis_enc(H)[None, :, None, :]
    emb[..., 2 * ch :] = axis_enc(W)[None, None, :, :]
    return emb[..., :C]
