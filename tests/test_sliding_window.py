"""Sliding-window engine tests: step placement parity, blending vs dense
forward, mirror TTA invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu.infer import (
    sliding_window_inference,
    compute_steps_monai,
    compute_steps_nnunet,
    gaussian_importance_map,
)


def test_nnunet_steps_match_reference_algorithm():
    """Independent recomputation of neural_network.py:266-289 semantics."""
    # img 224, roi 128, step 0.5 -> num = ceil(96/64)+1 = 3; actual = 48
    assert compute_steps_nnunet((224,), (128,), 0.5) == [[0, 48, 96]]
    # exact fit
    assert compute_steps_nnunet((128,), (128,)) == [[0]]
    # img 130, roi 128 -> num=2, starts [0, 2]
    assert compute_steps_nnunet((130,), (128,)) == [[0, 2]]


def test_monai_steps_cover_volume():
    starts = compute_steps_monai((200,), (128,), overlap=0.5)[0]
    assert starts[0] == 0 and starts[-1] == 200 - 128
    # full coverage
    covered = np.zeros(200, bool)
    for s in starts:
        covered[s : s + 128] = True
    assert covered.all()


def test_gaussian_importance_properties():
    g = gaussian_importance_map((16, 16, 16))
    assert g.shape == (16, 16, 16)
    assert g.max() == pytest.approx(1.0)
    assert (g > 0).all()
    # peak near center
    assert g[7:9, 7:9, 7:9].max() == g.max()


def test_sliding_window_matches_dense_for_linear_predictor(rng):
    """A linear (1x1 conv) predictor must give identical results tiled vs
    dense — any blending scheme is exact for position-independent models."""
    w = rng.normal(size=(8, 2)).astype(np.float32)

    def predictor(x):  # [b, 2, ...] -> [b, 8, ...]
        return jnp.einsum("oc,bcdhw->bodhw", jnp.asarray(w), x)

    vol = jnp.asarray(rng.normal(size=(1, 2, 24, 24, 24)).astype(np.float32))
    dense = predictor(vol)
    for step_mode in ("monai", "nnunet"):
        for blend in ("constant", "gaussian"):
            out = sliding_window_inference(
                vol, (16, 16, 16), predictor, num_classes=8,
                step_mode=step_mode, blend=blend,
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                       atol=1e-4, err_msg=f"{step_mode}/{blend}")


def test_sliding_window_small_volume_pads(rng):
    def predictor(x):
        return jnp.repeat(x[:, :1], 8, axis=1)

    vol = jnp.asarray(rng.normal(size=(1, 2, 10, 12, 16)).astype(np.float32))
    out = sliding_window_inference(vol, (16, 16, 16), predictor)
    assert out.shape == (1, 8, 10, 12, 16)


def test_sw_batch_size_equivalence(rng):
    w = rng.normal(size=(8, 2)).astype(np.float32)

    def predictor(x):
        return jnp.einsum("oc,bcdhw->bodhw", jnp.asarray(w), x)

    vol = jnp.asarray(rng.normal(size=(1, 2, 32, 24, 24)).astype(np.float32))
    a = sliding_window_inference(vol, (16, 16, 16), predictor, sw_batch_size=1)
    b = sliding_window_inference(vol, (16, 16, 16), predictor, sw_batch_size=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_mirror_tta_exact_for_flip_equivariant_predictor(rng):
    """For a pointwise predictor, TTA must equal the plain prediction."""
    def predictor(x):
        return jnp.concatenate([x, x * 2, x ** 2, -x], axis=1)

    vol = jnp.asarray(rng.normal(size=(1, 2, 16, 16, 16)).astype(np.float32))
    plain = sliding_window_inference(vol, (16, 16, 16), predictor, mirror_tta=False)
    tta = sliding_window_inference(vol, (16, 16, 16), predictor, mirror_tta=True)
    np.testing.assert_allclose(np.asarray(tta), np.asarray(plain), atol=1e-5)


def test_sliding_window_jits(rng):
    import functools

    def predictor(x):
        return jnp.repeat(x[:, :1] * 2.0, 8, axis=1)

    f = jax.jit(functools.partial(
        sliding_window_inference, roi_size=(16, 16, 16), predictor=predictor,
        step_mode="nnunet", sw_batch_size=2))
    vol = jnp.asarray(rng.normal(size=(1, 2, 24, 24, 24)).astype(np.float32))
    out = f(vol)
    assert out.shape == (1, 8, 24, 24, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol[:, :1]) * 2 * np.ones((1, 8, 1, 1, 1)), atol=1e-4)


def test_mirror_tta_batched_matches_scan(rng):
    """The batched-TTA path (flips riding the predictor batch axis) must be
    numerically equivalent to the serial-scan ensemble for an arbitrary
    (non-equivariant) predictor."""
    vol = jnp.asarray(rng.normal(size=(1, 2, 20, 18, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))

    def predictor(x):  # non-equivariant: mixes a spatially-shifted copy
        y = jnp.einsum("bcdhw,ck->bkdhw", x, w)
        return y + 0.3 * jnp.roll(y, 1, axis=2)

    a = sliding_window_inference(vol, (16, 16, 16), predictor,
                                 num_classes=3, mirror_tta=True,
                                 tta_batched=True)
    b = sliding_window_inference(vol, (16, 16, 16), predictor,
                                 num_classes=3, mirror_tta=True,
                                 tta_batched=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
