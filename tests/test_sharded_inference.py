"""Spatially-sharded sliding-window inference over the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu.parallel import make_mesh
from micformer_tpu.infer import sliding_window_inference
from micformer_tpu.infer.sharded import sliding_window_inference_sharded


def test_sharded_matches_single_device(rng):
    w = rng.normal(size=(8, 2)).astype(np.float32)

    def predictor(x):
        return jnp.einsum("oc,bcdhw->bodhw", jnp.asarray(w), x)

    vol = jnp.asarray(rng.normal(size=(1, 2, 32, 24, 24)).astype(np.float32))
    mesh = make_mesh()
    single = sliding_window_inference(vol, (16, 16, 16), predictor)
    multi = sliding_window_inference_sharded(vol, (16, 16, 16), predictor, mesh)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single), atol=1e-4)


def test_sharded_jits(rng):
    import functools

    def predictor(x):
        return jnp.repeat(x[:, :1] * 3.0, 8, axis=1)

    mesh = make_mesh()
    f = jax.jit(functools.partial(
        sliding_window_inference_sharded, roi_size=(16, 16, 16),
        predictor=predictor, mesh=mesh, step_mode="nnunet"))
    vol = jnp.asarray(rng.normal(size=(1, 2, 24, 24, 24)).astype(np.float32))
    out = f(vol)
    assert out.shape == (1, 8, 24, 24, 24)
    np.testing.assert_allclose(np.asarray(out[:, :1]), np.asarray(vol[:, :1]) * 3.0, atol=1e-4)
