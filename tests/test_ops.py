"""Ops-layer tests: windowing round-trips, attention parity vs numpy softmax,
warp parity vs torch grid_sample (the reference's STN backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu.ops import windows as W
from micformer_tpu.ops.attention import multi_head_attention, split_heads, merge_heads
from micformer_tpu.ops import warp as warp_ops
from micformer_tpu.ops.pe import sinusoidal_pe_3d


def test_window_partition_reverse_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 4, 6, 5)).astype(np.float32))
    ws = (2, 2, 3)
    wins = W.window_partition(x, ws)
    assert wins.shape == (2 * 4 * 2 * 2, 12, 5)
    back = W.window_reverse(wins, ws, 2, 8, 4, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_content(rng):
    # first window of first batch must equal the top-left corner block
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32))
    wins = W.window_partition(x, (2, 2, 2))
    expect = np.asarray(x)[0, :2, :2, :2].reshape(8, 3)
    np.testing.assert_array_equal(np.asarray(wins[0]), expect)


def test_shifted_window_mask_matches_swin_reference():
    """Independent check against the canonical Swin compute_mask algorithm."""
    import torch

    dims, ws, ss = (4, 4, 4), (2, 2, 2), (1, 1, 1)
    mask = W.shifted_window_mask(dims, ws, ss)
    D, H, W_ = dims
    img_mask = torch.zeros((1, D, H, W_, 1))
    cnt = 0
    for d in (slice(-ws[0]), slice(-ws[0], -ss[0]), slice(-ss[0], None)):
        for h in (slice(-ws[1]), slice(-ws[1], -ss[1]), slice(-ss[1], None)):
            for w in (slice(-ws[2]), slice(-ws[2], -ss[2]), slice(-ss[2], None)):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    m = img_mask.view(1, D // 2, 2, H // 2, 2, W_ // 2, 2, 1)
    m = m.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, 8)
    attn_mask = m.unsqueeze(1) - m.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(attn_mask == 0, 0.0)
    np.testing.assert_array_equal(mask, attn_mask.numpy())


def test_shifted_window_mask_none_when_unshifted():
    assert W.shifted_window_mask((4, 4, 4), (2, 2, 2), (0, 0, 0)) is None


def test_relative_position_index_properties():
    idx = W.relative_position_index((2, 3, 2))
    T = 12
    assert idx.shape == (T, T)
    assert idx.min() >= 0 and idx.max() < 3 * 5 * 3
    # diagonal = zero displacement = center of table
    assert len(set(idx[np.arange(T), np.arange(T)].tolist())) == 1
    # antisymmetric pairs map to mirrored entries
    assert idx[0, 1] != idx[1, 0]


def test_attention_matches_numpy(rng):
    # layout [N, T, h, d] (split_heads is a pure reshape — see ops/attention.py)
    N, T, h, d = 3, 8, 2, 4
    q = rng.normal(size=(N, T, h, d)).astype(np.float32)
    k = rng.normal(size=(N, T, h, d)).astype(np.float32)
    v = rng.normal(size=(N, T, h, d)).astype(np.float32)
    out = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    logits = np.einsum("nqhd,nkhd->nhqk", q * d ** -0.5, k)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    expect = np.einsum("nhqk,nkhd->nqhd", p, v)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_attention_mask_blocks_cross_region(rng):
    N, T, h, d = 4, 4, 1, 4
    q = rng.normal(size=(N, T, h, d)).astype(np.float32)
    k = rng.normal(size=(N, T, h, d)).astype(np.float32)
    v = rng.normal(size=(N, T, h, d)).astype(np.float32)
    # mask out tokens 2,3 from 0,1 in both windows (nW=2, batch=2)
    mask = np.zeros((2, T, T), np.float32)
    mask[:, :2, 2:] = -1e9
    mask[:, 2:, :2] = -1e9
    out = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=jnp.asarray(mask))
    # block-diagonal attention == attention restricted to each half
    out_a = multi_head_attention(jnp.asarray(q[:, :2]), jnp.asarray(k[:, :2]), jnp.asarray(v[:, :2]))
    np.testing.assert_allclose(np.asarray(out[:, :2]), np.asarray(out_a), atol=1e-5)


def test_split_merge_heads_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(5, 8, 12)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(merge_heads(split_heads(x, 3))), np.asarray(x))


def test_trilinear_sample_identity(rng):
    src = jnp.asarray(rng.normal(size=(1, 5, 6, 7, 3)).astype(np.float32))
    D, H, Wd = 5, 6, 7
    gz, gy, gx = np.meshgrid(np.arange(D), np.arange(H), np.arange(Wd), indexing="ij")
    coords = jnp.asarray(np.stack([gz, gy, gx])[None].astype(np.float32))
    out = warp_ops.trilinear_sample(src, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(src), atol=1e-6)


def test_stn_warp_matches_torch_reference(rng):
    """Parity with the reference STN chain: grid+flow -> normalize -> grid_sample
    (align_corners=False, zeros) — STN.py:9-32 semantics."""
    import torch
    import torch.nn.functional as F

    B, C, D, H, Wd = 2, 3, 6, 5, 7
    src = rng.normal(size=(B, C, D, H, Wd)).astype(np.float32)
    flow = (rng.normal(size=(B, 3, D, H, Wd)) * 1.5).astype(np.float32)

    # torch reference (reimplementation of STN.py forward)
    vectors = [torch.arange(0, s) for s in (D, H, Wd)]
    grids = torch.meshgrid(vectors, indexing="ij")
    grid = torch.stack(grids).unsqueeze(0).float()
    new_locs = grid + torch.from_numpy(flow)
    shape = (D, H, Wd)
    for i in range(3):
        new_locs[:, i] = 2 * (new_locs[:, i] / (shape[i] - 1) - 0.5)
    new_locs = new_locs.permute(0, 2, 3, 4, 1)[..., [2, 1, 0]]
    expect = F.grid_sample(torch.from_numpy(src), new_locs, mode="bilinear", align_corners=False)

    got = warp_ops.stn_warp(
        jnp.asarray(np.moveaxis(src, 1, -1)), jnp.asarray(flow)
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), expect.numpy(), atol=2e-5
    )


def test_reference_points_faithful_quirk():
    ref = np.asarray(warp_ops.reference_points(4, 6, 8, faithful=True))[0]
    # z channel normalized by H (=6), not D: values span (2*0.5/6-1, 2*3.5/6-1)
    np.testing.assert_allclose(ref[0, 0, 0, 0], 2 * 0.5 / 6 - 1, atol=1e-6)
    np.testing.assert_allclose(ref[0, -1, 0, 0], 2 * 3.5 / 6 - 1, atol=1e-6)
    ref_c = np.asarray(warp_ops.reference_points(4, 6, 8, faithful=False))[0]
    np.testing.assert_allclose(ref_c[0, -1, 0, 0], 2 * 3.5 / 4 - 1, atol=1e-6)


def test_sinusoidal_pe_3d_matches_torch_reference():
    """Parity with VT-Unet PositionalEncoding3D (vt_unet.py:234-270)."""
    import torch

    D, H, Wd, C = 3, 4, 5, 20
    channels = int(np.ceil(C / 6) * 2)
    if channels % 2:
        channels += 1
    inv_freq = 1.0 / (10000 ** (torch.arange(0, channels, 2).float() / channels))
    pos = [torch.arange(n).float() for n in (D, H, Wd)]
    sin_inp = [torch.einsum("i,j->ij", p, inv_freq) for p in pos]
    emb_x = torch.cat((sin_inp[0].sin(), sin_inp[0].cos()), -1).unsqueeze(1).unsqueeze(1)
    emb_y = torch.cat((sin_inp[1].sin(), sin_inp[1].cos()), -1).unsqueeze(1)
    emb_z = torch.cat((sin_inp[2].sin(), sin_inp[2].cos()), -1)
    emb = torch.zeros((D, H, Wd, channels * 3))
    emb[..., :channels] = emb_x
    emb[..., channels : 2 * channels] = emb_y
    emb[..., 2 * channels :] = emb_z
    expect = emb[..., :C].numpy()
    np.testing.assert_allclose(sinusoidal_pe_3d(D, H, Wd, C), expect, atol=1e-5)


def test_adjust_window_shift_clamps():
    ws, ss = W.adjust_window_shift((2, 8, 8), (4, 4, 4), (2, 2, 2))
    assert ws == (2, 4, 4) and ss == (0, 2, 2)
    assert W.adjust_window_shift((2, 8, 8), (4, 4, 4)) == (2, 4, 4)


def test_trilinear_block_gather_matches_corner_path(rng):
    """The block-gather sampler (one lax.gather of 2x2x2xC slices + shifted
    weights) must equal the 8-corner reference path, including out-of-range
    coordinates (zeros padding parity)."""
    src = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 3)).astype(np.float32))
    coords = rng.uniform(-3.0, 9.0, size=(2, 3, 4, 4, 4)).astype(np.float32)
    coords = jnp.asarray(coords)
    block = warp_ops._trilinear_sample_block(src, coords)

    orig = warp_ops.USE_BLOCK_GATHER
    warp_ops.USE_BLOCK_GATHER = False
    try:
        corner = warp_ops.trilinear_sample(src, coords)
    finally:
        warp_ops.USE_BLOCK_GATHER = orig
    np.testing.assert_allclose(np.asarray(block), np.asarray(corner), atol=1e-5)


def test_lane_major_attention_matches_batched(rng):
    """The lane-major path ([T,h,d,N] layout, window axis on the lane dim)
    must equal the batched einsum path — forward and grad."""
    from micformer_tpu.ops import attention as attention_mod

    N, T, h, d = 1024, 8, 3, 16
    q = jnp.asarray(rng.normal(size=(N, T, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(N, T, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, T, h, d)).astype(np.float32))

    def run(lane_major):
        prev = attention_mod.LANE_MAJOR
        attention_mod.LANE_MAJOR = lane_major
        try:
            return multi_head_attention(q, k, v)
        finally:
            attention_mod.LANE_MAJOR = prev

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               atol=2e-5)

    def loss(lane_major, q, k, v):
        prev = attention_mod.LANE_MAJOR
        attention_mod.LANE_MAJOR = lane_major
        try:
            return jnp.sum(multi_head_attention(q, k, v) ** 2)
        finally:
            attention_mod.LANE_MAJOR = prev

    g1 = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2))(q, k, v)
    g0 = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_trilinear_row_gather_matches_block(rng):
    """The row-gather formulation (concat-8-shift source + take_along_axis
    rows + [B,N,8] weights) must equal the block-gather path bit-for-bit."""
    src = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 3)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-3.0, 9.0, size=(2, 3, 4, 4, 4)).astype(np.float32))
    prev = warp_ops.ROW_GATHER
    try:
        warp_ops.ROW_GATHER = False
        a = warp_ops._trilinear_sample_block(src, coords)
        warp_ops.ROW_GATHER = True
        b = warp_ops._trilinear_sample_block(src, coords)
    finally:
        warp_ops.ROW_GATHER = prev
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trilinear_rows_grad_matches_corners(rng):
    """The row-gather formulation's VJP (one row scatter + dense shifted
    adds) must match the 8-corner form's gradients for both src and coords."""
    src = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 3)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-3.0, 9.0, size=(2, 3, 4, 4, 4)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 3)).astype(np.float32))

    def grads(fn):
        _, vjp = jax.vjp(fn, src, coords)
        return vjp(g)

    gc = grads(warp_ops._trilinear_sample_corners)
    gr = grads(warp_ops._trilinear_sample_rows)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gr[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gr[1]), atol=1e-5)


def test_window_area_partition_neighborhood():
    from micformer_tpu.ops.windows import window_area_partition, window_partition

    B, D, H, W, C = 2, 4, 4, 6, 3
    ws = (2, 2, 2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
    out = np.asarray(window_area_partition(x, ws))
    d, h, w = D // 2, H // 2, W // 2
    T = 8
    assert out.shape == (B * d * h * w, 27 * T, C)
    wins = np.asarray(window_partition(x, ws)).reshape(B, d * h * w, T, C)
    area = out.reshape(B, d, h, w, 27, T, C)
    # slot 13 (dz=dy=dx=1) is the window itself
    np.testing.assert_array_equal(
        area[:, :, :, :, 13].reshape(B, d * h * w, T, C), wins)
    # slot 14 (dx=+1) of window (0,0,0) is window (0,0,1)
    np.testing.assert_array_equal(
        area[:, 0, 0, 0, 14], wins.reshape(B, d, h, w, T, C)[:, 0, 0, 1])
    # out-of-grid neighbors are zero padding (corner window, dz=0 plane)
    assert np.all(area[:, 0, :, :, 0] == 0)


def test_trilinear_saved_blocks_bwd_matches_row_bwd(rng):
    """MICFORMER_WARP_BWD_SAVED_BLOCKS: the direct backward (saved forward
    blocks; no forward recompute) must match the row-gather backward for
    both src and coords, including clamp/out-of-range coordinate cases."""
    src = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 3)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-3.0, 9.0, size=(2, 3, 4, 4, 4)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 3)).astype(np.float32))

    def grads(saved):
        prev = warp_ops.BWD_SAVED_BLOCKS
        warp_ops.BWD_SAVED_BLOCKS = saved
        try:
            _, vjp = jax.vjp(warp_ops._trilinear_block_with_corner_grad,
                             src, coords)
            return vjp(g)
        finally:
            warp_ops.BWD_SAVED_BLOCKS = prev

    base = grads(False)
    direct = grads(True)
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(direct[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(base[1]), np.asarray(direct[1]),
                               atol=1e-5)
    # forward value unchanged by the flag
    prev = warp_ops.BWD_SAVED_BLOCKS
    try:
        warp_ops.BWD_SAVED_BLOCKS = True
        on = warp_ops._trilinear_block_with_corner_grad(src, coords)
        warp_ops.BWD_SAVED_BLOCKS = False
        off = warp_ops._trilinear_block_with_corner_grad(src, coords)
    finally:
        warp_ops.BWD_SAVED_BLOCKS = prev
    np.testing.assert_array_equal(np.asarray(on), np.asarray(off))


def test_mednext_up_blocked_parity(rng):
    """MICFORMER_UP_BLOCKED (deferred-interleave MedNeXt up block) ==
    the default stencil up path with the SAME parameters: the blocked form
    runs norm/expand/GELU/compress in the [B,D,H,W,8,C] parity layout and
    interleaves once at the end — exact same math up to the f32 reduction
    order inside the InstanceNorm statistics."""
    from micformer_tpu.models import mednext as mn
    from micformer_tpu.models.layers import parity_block, parity_interleave

    x = jnp.asarray(rng.normal(size=(2, 4, 5, 6, 8)).astype(np.float32))
    # parity_block is the exact inverse of parity_interleave
    y = jnp.asarray(rng.normal(size=(1, 8, 10, 12, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(parity_interleave(parity_block(y))),
                                  np.asarray(y))

    block = mn.MedNeXtBlock(out_channels=12, exp_r=2, mode="up")
    variables = block.init(jax.random.key(0), x)
    prev = mn.UP_BLOCKED
    try:
        mn.UP_BLOCKED = False
        want = block.apply(variables, x)
        mn.UP_BLOCKED = True
        got = block.apply(variables, x)
        # param tree identical under the flag
        v2 = block.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(v2)
    finally:
        mn.UP_BLOCKED = prev
    assert got.shape == want.shape == (2, 8, 10, 12, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_dw_conv_stencil_matches_grouped_conv(rng):
    """DepthwiseConv3D stencil lowering == lax.conv feature_group_count=C
    for all three MedNeXt modes (same / stride-2 down / dilated up) and
    kernel 5 (MedNeXt/nnunet_mednext/.../blocks.py:6-160 kernel options)."""
    from micformer_tpu.models.layers import dw_conv_stencil, zero_dilate

    x = jnp.asarray(rng.normal(size=(2, 8, 9, 10, 6)).astype(np.float32))

    def ref(x, w, stride=1, pad=None):
        k = w.shape[0]
        pad = [(k // 2, k // 2)] * 3 if pad is None else list(pad)
        return jax.lax.conv_general_dilated(
            x, w, (stride,) * 3, pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=x.shape[-1])

    for k in (3, 5):
        w = jnp.asarray(rng.normal(size=(k, k, k, 1, 6)).astype(np.float32))
        for stride in (1, 2):
            a = dw_conv_stencil(x, w, stride)
            b = ref(x, w, stride)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
        xd = zero_dilate(x)
        p = k // 2
        a = dw_conv_stencil(xd, w, 1, ((p + 1, p),) * 3)
        b = ref(xd, w, 1, ((p + 1, p),) * 3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pointwise_conv_stride2_odd_dims(rng):
    """PointwiseConv stride=2 on odd spatial dims matches nn.Conv SAME
    stride-2 (ceil-sized output via indices 0,2,...; ADVICE r4 fix — the
    parity view alone required even dims)."""
    import flax.linen as nn
    from micformer_tpu.models.layers import PointwiseConv

    C, F = 3, 5
    x = jnp.asarray(rng.normal(size=(1, 5, 7, 9, C)).astype(np.float32))
    ours = PointwiseConv(features=F, stride=2)
    ref = nn.Conv(F, (1, 1, 1), strides=(2, 2, 2), padding="SAME")
    p = jax.jit(ours.init)(jax.random.PRNGKey(0), x)
    got = ours.apply(p, x)
    want = ref.apply(p, x)
    assert got.shape == want.shape == (1, 3, 4, 5, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
