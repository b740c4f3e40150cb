"""Inference-time relative-position bias cache (layers.rel_pos_bias_cached).

At inference the rel-pos bias is constant per checkpoint, so
`materialize_rpe_cache` pre-gathers every biased attention block's [h,T,T]
bias into an `rpe_cache` collection once; applies that pass the cache read
it instead of re-running the per-call [T²,h] table gather (the
"param-dependent so XLA can't hoist" class from the round-4 SwinUNETR
profile). Reference behavior being reformulated: vt_unet.py:149-168 gathers
per call. These tests pin: (a) cached forward == uncached forward for every
biased family, (b) the cache is a no-op for families without rel-pos
tables, (c) the cache actually removes the gather from the lowered HLO.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from micformer_tpu import registry
from micformer_tpu.models.layers import (
    WindowAttention3D,
    materialize_rpe_cache,
)

# NOTE: the full-family materialize+forward pairs compile 4-stage models
# twice on the CPU backend (~1-2 min each) — slow tier; the module-level
# test below keeps the cache mechanics in the fast tier.


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class _TinyBiased(nn.Module):
    """One biased WindowAttention3D over a single 2x2x2 window."""

    @nn.compact
    def __call__(self, x):
        return WindowAttention3D(dim=4, window_size=(2, 2, 2), num_heads=2,
                                 rel_pos_bias=True)(x)


def test_cache_mechanics_module_level(rng):
    """Fast-tier pin of rel_pos_bias_cached: cached forward == uncached,
    cache collection holds the gathered [h,T,T] bias, repeat applies with
    the cache are pure reads (variables unchanged)."""
    model = _TinyBiased()
    x = jnp.asarray(rng.normal(size=(3, 8, 4)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    want = model.apply(variables, x)
    cached = materialize_rpe_cache(model, variables, x)
    assert "rpe_cache" in cached
    (bias,) = jax.tree.leaves(cached["rpe_cache"])
    assert bias.shape == (2, 8, 8)
    got = model.apply(cached, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
    # idempotent: materializing again returns an equal cache
    again = materialize_rpe_cache(model, cached, x)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(again["rpe_cache"])[0]),
                               np.asarray(bias))


BIASED = [
    ("swinunetr", dict(feature_size=4, num_heads=(1, 2, 4, 8),
                       window_size=(2, 2, 2)), (1, 2, 32, 32, 32)),
    ("vtunet", dict(embed_dim=12, num_heads=(1, 2, 3, 4),
                    window_size=(2, 2, 2)), (1, 2, 32, 32, 32)),
    ("nnformer", dict(embed_dim=8, depths=(1, 1, 1, 1),
                      num_heads=(1, 2, 4, 8)), (1, 1, 32, 32, 32)),
]


def _build(name, kw, shape, rng):
    model = registry.build(name, num_classes=3, **kw)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    return model, variables, x


@pytest.mark.slow
@pytest.mark.parametrize("name,kw,shape", BIASED)
def test_cached_forward_matches_uncached(name, kw, shape, rng):
    model, variables, x = _build(name, kw, shape, rng)
    want = model.apply(variables, x)
    cached = materialize_rpe_cache(model, variables, x)
    assert "rpe_cache" in cached, f"{name} has rel-pos tables but no cache"
    got = model.apply(cached, x)
    # the cached bias is the same gather result fed as a constant; outputs
    # are numerically identical up to XLA fusion-order noise
    want, got = np.asarray(want), np.asarray(got)
    if isinstance(want, tuple):
        want, got = want[0], got[0]
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_noop_for_unbiased_model(rng):
    model = registry.build("unet_conv", num_classes=3)
    x = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 16)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    cached = materialize_rpe_cache(model, variables, x)
    assert cached is variables  # unchanged object: no cache collection


@pytest.mark.slow
def test_cache_removes_gather_from_hlo(rng):
    name, kw, shape = BIASED[0]
    model, variables, x = _build(name, kw, shape, rng)
    cached = materialize_rpe_cache(model, variables, x)

    def n_gathers(v):
        txt = jax.jit(lambda v, x: model.apply(v, x)).lower(v, x).as_text()
        return txt.count("gather")

    base, after = n_gathers(variables), n_gathers(cached)
    assert after < base, (base, after)
