"""Parity tests for the lane-major block/projection paths (round-3 perf work).

The lane-major formulations (`MICFORMER_ATTN_LANE_PROJ`,
`MICFORMER_BLOCK_LANE_MAJOR`) keep the transformer-block residual stream in
[T, C, N] layout — window axis N on the 128-lane dim — and apply the SAME
parameter tree (LayerNorm/Dense modules materialized by dummy calls) as
lane-major einsums. These tests pin forward, gradient, parameter-tree and
initialization parity against the default batched paths; the reference
behavior being preserved is MicFormer's TransformerBlock3D / window attention
(MicFormer/models/MICFormer_self.py:430-524, 148-261 — studied, not copied).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import micformer_tpu.models.layers as L


def _flip(attn=None, block=None):
    prev = (L.ATTN_LANE_PROJ, L.BLOCK_LANE_MAJOR)
    if attn is not None:
        L.ATTN_LANE_PROJ = attn
    if block is not None:
        L.BLOCK_LANE_MAJOR = block
    return prev


def _restore(prev):
    L.ATTN_LANE_PROJ, L.BLOCK_LANE_MAJOR = prev


def test_attn_lane_proj_self_parity(rng):
    x = jnp.asarray(rng.normal(size=(2048, 8, 48)).astype(np.float32))
    mod = L.WindowAttention3D(48, (2, 2, 2), 3)
    params = mod.init(jax.random.PRNGKey(1), x)
    prev = _flip(attn=False)
    try:
        base = mod.apply(params, x)
        _flip(attn=True)
        lane = mod.apply(params, x)
        # init under the lane path must produce the identical tree + values
        p2 = mod.init(jax.random.PRNGKey(1), x)
    finally:
        _restore(prev)
    np.testing.assert_allclose(np.asarray(base), np.asarray(lane), atol=2e-5)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attn_lane_proj_cross_parity(rng):
    x = jnp.asarray(rng.normal(size=(1536, 8, 24)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1536, 8, 24)).astype(np.float32))
    mod = L.WindowAttention3D(24, (2, 2, 2), 3, cross=True)
    params = mod.init(jax.random.PRNGKey(2), x, ctx)
    prev = _flip(attn=False)
    try:
        base = mod.apply(params, x, ctx)
        _flip(attn=True)
        lane = mod.apply(params, x, ctx)
    finally:
        _restore(prev)
    np.testing.assert_allclose(np.asarray(base), np.asarray(lane), atol=2e-5)


def test_attn_lane_proj_ineligible_falls_back(rng):
    # rel-pos bias / mask / small N must keep the batched path (same module,
    # no error, and — for small N — identical results with the flag on/off).
    x = jnp.asarray(rng.normal(size=(64, 8, 24)).astype(np.float32))  # N < 1024
    mod = L.WindowAttention3D(24, (2, 2, 2), 3)
    params = mod.init(jax.random.PRNGKey(3), x)
    prev = _flip(attn=True)
    try:
        lane = mod.apply(params, x)
    finally:
        _restore(prev)
    base = mod.apply(params, x)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(lane))


@pytest.mark.slow
def test_swinblock_lane_major_forward_and_grad_parity(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 48)).astype(np.float32))
    mod = L.SwinBlock3D(48, 3, window_size=(2, 2, 2))
    params = mod.init(jax.random.PRNGKey(5), x)

    def loss(p):
        return jnp.mean(mod.apply(p, x) ** 2)

    prev = _flip(block=False)
    try:
        base = mod.apply(params, x)
        g0 = jax.grad(loss)(params)
        _flip(block=True)
        lane = mod.apply(params, x)
        g1 = jax.grad(loss)(params)
        p2 = mod.init(jax.random.PRNGKey(5), x)
    finally:
        _restore(prev)
    np.testing.assert_allclose(np.asarray(base), np.asarray(lane), atol=2e-5)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0), jax.tree_util.tree_leaves_with_path(g1)
    ):
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4,
            err_msg=str(ka))


def test_swinblock_lane_major_shifted_falls_back(rng):
    # shifted windows are ineligible — flag on must equal flag off exactly
    # (both run the base path).
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 24)).astype(np.float32))
    mod = L.SwinBlock3D(24, 3, window_size=(2, 2, 2), shift_size=(1, 1, 1),
                        rel_pos_bias=True)
    params = mod.init(jax.random.PRNGKey(6), x)
    base = mod.apply(params, x)
    prev = _flip(block=True, attn=True)
    try:
        lane = mod.apply(params, x)
    finally:
        _restore(prev)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(lane))


@pytest.mark.slow
def test_cross_block_lane_tail_parity(rng):
    """CrossBlock3D norm2+MLP in [C, M] lane-major layout must match the
    spatial path — forward and per-parameter relative gradients."""
    import micformer_tpu.models.micformer as M

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 24)).astype(np.float32))
    xa = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 24)).astype(np.float32))
    blk = M.CrossBlock3D(dim=24, num_heads=3)
    params = blk.init(jax.random.PRNGKey(0), x, xa)
    prev = M.CROSS_LANE_TAIL
    try:
        M.CROSS_LANE_TAIL = False
        base = blk.apply(params, x, xa)
        g0 = jax.grad(lambda p: jnp.mean(blk.apply(p, x, xa) ** 2))(params)
        M.CROSS_LANE_TAIL = True
        lane = blk.apply(params, x, xa)
        g1 = jax.grad(lambda p: jnp.mean(blk.apply(p, x, xa) ** 2))(params)
    finally:
        M.CROSS_LANE_TAIL = prev
    np.testing.assert_allclose(np.asarray(base), np.asarray(lane), atol=2e-5)
    from flax.traverse_util import flatten_dict

    f0, f1 = flatten_dict(g0["params"]), flatten_dict(g1["params"])
    for k in f0:
        scale = float(np.max(np.abs(np.asarray(f0[k])))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(f0[k]) / scale, np.asarray(f1[k]) / scale, atol=1e-4,
            err_msg="/".join(k))


@pytest.mark.slow
def test_micformer_forward_parity_with_lane_flags(rng):
    """Full-model wiring check: MicFormer forward with both lane flags ON
    must match the default build (f32, small volume)."""
    from micformer_tpu.models.micformer import MicFormer

    x = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 32)).astype(np.float32))
    model = MicFormer(num_classes=4, embed_dim=24, depths=(1, 1), num_heads=(3, 6))
    params = model.init(jax.random.PRNGKey(7), x)
    prev = _flip(attn=False, block=False)
    try:
        base = model.apply(params, x)
        _flip(attn=True, block=True)
        lane = model.apply(params, x)
    finally:
        _restore(prev)
    np.testing.assert_allclose(np.asarray(base), np.asarray(lane), atol=5e-5)


@pytest.mark.slow  # re-tier r4: >30s on the fast tier
def test_offset_lane_tail_parity(rng):
    """CrossBlock3D offset-net tail (LN+GELU+1x1 conv) in [F, M] lane-major
    layout must match the channels-last path — forward and per-parameter
    relative gradients (the offset params feed the warp coordinates, so this
    also covers the coords-consuming custom VJP)."""
    import micformer_tpu.models.micformer as M

    x = jnp.asarray(rng.normal(size=(1, 8, 16, 8, 24)).astype(np.float32))
    xa = jnp.asarray(rng.normal(size=(1, 8, 16, 8, 24)).astype(np.float32))
    blk = M.CrossBlock3D(dim=24, num_heads=3)
    params = blk.init(jax.random.PRNGKey(0), x, xa)
    prev = M.OFFSET_LANE_TAIL
    try:
        M.OFFSET_LANE_TAIL = False
        base = blk.apply(params, x, xa)
        g0 = jax.grad(lambda p: jnp.mean(blk.apply(p, x, xa) ** 2))(params)
        M.OFFSET_LANE_TAIL = True
        lane = blk.apply(params, x, xa)
        g1 = jax.grad(lambda p: jnp.mean(blk.apply(p, x, xa) ** 2))(params)
    finally:
        M.OFFSET_LANE_TAIL = prev
    np.testing.assert_allclose(np.asarray(base), np.asarray(lane), atol=2e-5)
    from flax.traverse_util import flatten_dict

    f0, f1 = flatten_dict(g0["params"]), flatten_dict(g1["params"])
    for k in f0:
        scale = float(np.max(np.abs(np.asarray(f0[k])))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(f0[k]) / scale, np.asarray(f1[k]) / scale, atol=1e-4,
            err_msg="/".join(k))


def test_ln_bf16_apply_parity(rng):
    """MICFORMER_LN_BF16_APPLY: bf16-apply LayerNorm must (a) keep the flax
    param tree, (b) match the flax bf16 LN within bf16 quantization noise,
    and (c) be a no-op on f32 inputs (the torch-transplant parity dtype)."""
    import flax.linen as nn

    x32 = jnp.asarray(rng.normal(size=(4, 4, 4, 4, 48)).astype(np.float32))
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            return L.apply_layer_norm(
                nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16), x)

    prev = L.LN_BF16_APPLY
    try:
        L.LN_BF16_APPLY = False
        m = Wrap()
        params = m.init(jax.random.PRNGKey(0), x32.astype(jnp.bfloat16))
        base = m.apply(params, x32.astype(jnp.bfloat16))
        L.LN_BF16_APPLY = True
        params_on = m.init(jax.random.PRNGKey(0), x32.astype(jnp.bfloat16))
        got = m.apply(params_on, x32.astype(jnp.bfloat16))
        # param tree unchanged by the flag
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_on)
        np.testing.assert_allclose(
            np.asarray(base, np.float32), np.asarray(got, np.float32), atol=0.05)
        # grads flow and roughly agree
        g0 = jax.grad(lambda p: jnp.mean(m.apply(p, x32.astype(jnp.bfloat16)).astype(jnp.float32) ** 2))(params)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree_util.tree_leaves(g0))
        # f32 input: flag is inert, bit-identical to the flax module
        f_on = m.apply(params, x32)
        L.LN_BF16_APPLY = False
        f_off = m.apply(params, x32)
        np.testing.assert_array_equal(np.asarray(f_on), np.asarray(f_off))
    finally:
        L.LN_BF16_APPLY = prev


def test_conv3_stack_bwd_parity(rng):
    """MICFORMER_CONV3_STACK_BWD: the consolidated-backward conv must match
    the tap-loop autodiff — forward bit-equal (same 27-dot HLO), dx/dw/db
    within accumulation-order noise in f32 and bf16."""
    x32 = rng.normal(size=(2, 6, 5, 7, 12)).astype(np.float32)

    def run(stack, dt):
        prev = L.CONV3_STACK_BWD
        L.CONV3_STACK_BWD = stack
        try:
            mod = L.Conv3x3ViaDot(5, dtype=dt)
            x = jnp.asarray(x32, dt)
            params = mod.init(jax.random.PRNGKey(3), x)

            def loss(p, xx):
                return jnp.mean(mod.apply(p, xx).astype(jnp.float32) ** 2)

            fwd = mod.apply(params, x)
            (gp, gx) = jax.grad(loss, argnums=(0, 1))(params, x)
            return fwd, gp, gx
        finally:
            L.CONV3_STACK_BWD = prev

    for dt, atol in ((jnp.float32, 1e-5), (jnp.bfloat16, 0.02)):
        f0, gp0, gx0 = run(False, dt)
        f1, gp1, gx1 = run(True, dt)
        np.testing.assert_allclose(np.asarray(f0, np.float32),
                                   np.asarray(f1, np.float32), atol=atol)
        np.testing.assert_allclose(np.asarray(gx0, np.float32),
                                   np.asarray(gx1, np.float32), atol=atol)
        flat0 = jax.tree_util.tree_leaves_with_path(gp0)
        flat1 = dict((jax.tree_util.keystr(k), v)
                     for k, v in jax.tree_util.tree_leaves_with_path(gp1))
        for k, v0 in flat0:
            v1 = flat1[jax.tree_util.keystr(k)]
            scale = max(1.0, float(np.max(np.abs(np.asarray(v0, np.float32)))))
            np.testing.assert_allclose(
                np.asarray(v0, np.float32) / scale,
                np.asarray(v1, np.float32) / scale,
                atol=atol, err_msg=f"{jax.tree_util.keystr(k)} dt={dt}")


def test_embed_via_dot_parity(rng):
    """MICFORMER_EMBED_VIA_DOT: the space-to-depth matmul embed must match
    the k=s=patch conv — same param tree, forward + grads."""
    x32 = rng.normal(size=(2, 8, 8, 12, 2)).astype(np.float32)

    def run(flag, dt, atol):
        prev = L.EMBED_VIA_DOT
        L.EMBED_VIA_DOT = flag
        try:
            mod = L.PatchEmbed3D(10, (4, 4, 4), use_norm=True, dtype=dt)
            x = jnp.asarray(x32, dt)
            params = mod.init(jax.random.PRNGKey(5), x)
            fwd = mod.apply(params, x)
            g = jax.grad(lambda p: jnp.mean(
                mod.apply(p, x).astype(jnp.float32) ** 2))(params)
            return params, fwd, g
        finally:
            L.EMBED_VIA_DOT = prev

    for dt, atol in ((jnp.float32, 1e-5), (jnp.bfloat16, 0.02)):
        p0, f0, g0 = run(False, dt, atol)
        p1, f1, g1 = run(True, dt, atol)
        assert (jax.tree_util.tree_structure(p0)
                == jax.tree_util.tree_structure(p1))
        np.testing.assert_allclose(np.asarray(f0, np.float32),
                                   np.asarray(f1, np.float32), atol=atol)
        for (k, v0), (_, v1) in zip(
                jax.tree_util.tree_leaves_with_path(g0),
                jax.tree_util.tree_leaves_with_path(g1)):
            scale = max(1.0, float(np.max(np.abs(np.asarray(v0, np.float32)))))
            np.testing.assert_allclose(
                np.asarray(v0, np.float32) / scale,
                np.asarray(v1, np.float32) / scale, atol=atol,
                err_msg=f"{jax.tree_util.keystr(k)} dt={dt}")


def test_ln_stats_via_dot_parity(rng):
    """MICFORMER_LN_STATS_VIA_DOT: MXU ones-dot LN stats must match the flax
    bf16 LN within bf16 quantization noise, keep the param tree, and stay
    inert on f32 inputs."""
    import flax.linen as nn

    x32 = rng.normal(size=(4, 4, 4, 4, 48)).astype(np.float32)

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            return L.apply_layer_norm(
                nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16), x)

    prev = L.LN_STATS_VIA_DOT
    try:
        m = Wrap()
        xb = jnp.asarray(x32, jnp.bfloat16)
        L.LN_STATS_VIA_DOT = False
        params = m.init(jax.random.PRNGKey(0), xb)
        base = m.apply(params, xb)
        L.LN_STATS_VIA_DOT = True
        params_on = m.init(jax.random.PRNGKey(0), xb)
        got = m.apply(params_on, xb)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params_on))
        np.testing.assert_allclose(np.asarray(base, np.float32),
                                   np.asarray(got, np.float32), atol=0.05)
        g = jax.grad(lambda p: jnp.mean(
            m.apply(p, xb).astype(jnp.float32) ** 2))(params)
        assert all(np.all(np.isfinite(np.asarray(v)))
                   for v in jax.tree_util.tree_leaves(g))
        # f32 input: flag inert, bit-identical to the flax module
        f_on = m.apply(params, jnp.asarray(x32))
        L.LN_STATS_VIA_DOT = False
        f_off = m.apply(params, jnp.asarray(x32))
        np.testing.assert_array_equal(np.asarray(f_on), np.asarray(f_off))
    finally:
        L.LN_STATS_VIA_DOT = prev
