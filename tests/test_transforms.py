"""On-device augmentation tests: MONAI-parity stack + nnU-Net moreDA stack."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu.data import transforms as T


@pytest.fixture
def sample(rng):
    img = jnp.asarray(rng.normal(size=(2, 12, 12, 12)).astype(np.float32))
    lab = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 8, size=(12, 12, 12))), 8
    ).transpose(3, 0, 1, 2)
    return img, lab


def test_normalize_intensity_nonzero(rng):
    img = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
    img[:, :2] = 0.0  # zero region must stay zero
    out = np.asarray(T.normalize_intensity_nonzero(jnp.asarray(img)))
    assert (out[:, :2] == 0).all()
    nz = out[img != 0]
    assert abs(nz.mean()) < 0.1


def test_rand_flip_consistency(sample):
    img, lab = sample
    i2, l2 = T.rand_flip(jax.random.key(3), img, lab, axis=1, prob=1.0)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(jnp.flip(img, 2)))
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(jnp.flip(lab, 2)))


def test_monai_stack_shapes_jit(sample):
    img, lab = sample
    i2, l2 = jax.jit(T.train_augment)(jax.random.key(0), img, lab)
    assert i2.shape == img.shape and l2.shape == lab.shape
    assert np.isfinite(np.asarray(i2)).all()


def test_gamma_preserves_range(sample):
    img, _ = sample
    out = T.rand_gamma(jax.random.key(1), img, prob=1.0)
    np.testing.assert_allclose(float(out.min()), float(img.min()), atol=1e-4)
    np.testing.assert_allclose(float(out.max()), float(img.max()), atol=1e-4)


def test_affine_identity_at_zero_rotation(sample):
    img, lab = sample
    i2, l2 = T.rand_affine(jax.random.key(2), img, lab, rot_range=0.0,
                           scale_range=(1.0, 1.0), prob=1.0)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(img), atol=1e-4)


def test_nnunet_stack_jit(sample):
    img, lab = sample
    i2, l2 = jax.jit(T.nnunet_train_augment)(jax.random.key(0), img, lab)
    assert i2.shape == img.shape and l2.shape == lab.shape
    assert np.isfinite(np.asarray(i2)).all()


def test_blur_reduces_variance(sample):
    img, _ = sample
    out = T.rand_gaussian_blur(jax.random.key(5), img, sigma_range=(1.0, 1.0), prob=1.0)
    assert float(jnp.var(out)) < float(jnp.var(img))
