import numpy as np
import pytest

from micformer_tpu.data import image_utils as iu


def test_minmax_normalize(rng):
    x = rng.uniform(-50, 150, (6, 6, 6)).astype(np.float32)
    n = iu.minmax_normalize(x)
    assert n.min() == 0.0 and n.max() == pytest.approx(1.0)


def test_zscore_normalize_nonzero_only(rng):
    x = rng.standard_normal((8, 8, 8)).astype(np.float32)
    x[:2] = 0
    n = iu.zscore_normalize(x)
    assert np.all(n[:2] == 0)
    nz = n[n != 0]
    assert abs(nz.mean()) < 1e-4
    assert abs(nz.std() - 1.0) < 1e-3


def test_resize_trilinear_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.standard_normal((9, 11, 7)).astype(np.float32)
    for out_shape in [(16, 16, 16), (5, 6, 7), (9, 11, 7)]:
        mine = iu.resize_trilinear(x, out_shape)
        ref = (
            F.interpolate(
                torch.from_numpy(x)[None, None], size=out_shape, mode="trilinear"
            )[0, 0]
            .numpy()
        )
        np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-5)


def test_resize_nearest_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.integers(0, 5, (3, 9, 11, 7)).astype(np.float32)
    for out_shape in [(16, 16, 16), (4, 5, 6)]:
        mine = iu.resize_nearest(x, out_shape)
        ref = (
            F.interpolate(torch.from_numpy(x)[None], size=out_shape, mode="nearest")[0]
            .numpy()
        )
        np.testing.assert_array_equal(mine, ref)


def test_one_hot_roundtrip(rng):
    vals = np.array([0] + list(iu.MMWHS_LABEL_VALUES))
    label = vals[rng.integers(0, 8, (6, 6, 6))]
    oh = iu.label_to_one_hot(label)
    assert oh.shape == (8, 6, 6, 6)
    assert np.all(oh.sum(axis=0) == 1)
    np.testing.assert_array_equal(iu.one_hot_to_label(oh), label)


def test_one_hot_background_semantics():
    # ch0 is 1 - (label != 0): any unknown nonzero value gets NO channel but
    # also isn't background (reference MMWHS.py:414-420 behavior)
    label = np.array([[[0, 205, 999]]])
    oh = iu.label_to_one_hot(label)
    assert oh[0, 0, 0, 0] == 1  # bg
    assert oh[1, 0, 0, 1] == 1  # 205 channel
    assert oh[:, 0, 0, 2].sum() == 0  # unknown value: all-zero column


def test_pad_or_crop_shapes(rng):
    g = np.random.default_rng(3)
    img = rng.standard_normal((2, 20, 10, 16)).astype(np.float32)
    seg = rng.integers(0, 2, (8, 20, 10, 16)).astype(np.uint8)
    out_img, out_seg = iu.pad_or_crop_image(img, seg, target_size=(16, 16, 16), rng=g)
    assert out_img.shape == (2, 16, 16, 16)
    assert out_seg.shape == (8, 16, 16, 16)
    # identity when shapes already match
    out2, seg2 = iu.pad_or_crop_image(out_img, out_seg, target_size=(16, 16, 16), rng=g)
    np.testing.assert_array_equal(out2, out_img)


def test_pad_batch_to_max_shape():
    assert iu.pad_batch_to_max_shape([(100, 120, 90), (110, 100, 100)]) == (112, 128, 112)
    assert iu.pad_batch_to_max_shape([(16, 16, 16)]) == (16, 16, 16)


def test_remove_unwanted_background():
    x = np.zeros((1, 10, 12, 9), np.float32)
    x[0, 2:5, 3:8, 1:4] = 1.0
    out = iu.remove_unwanted_background(x)
    assert out.shape == (1, 3, 5, 3)
    assert np.all(out == 1.0)


def test_random_crop_identical_and_channel_preserved(rng):
    g = np.random.default_rng(3)
    a = rng.standard_normal((2, 12, 14, 10)).astype(np.float32)
    b = (a > 0).astype(np.float32)
    ca, cb = iu.random_crop(a, b, min_perc=0.5, max_perc=0.9, rng=g)
    assert ca.shape == cb.shape
    assert ca.shape[0] == 2                       # channel axis never cropped
    assert all(s <= f for s, f in zip(ca.shape[1:], a.shape[1:]))
    # crops are taken at identical positions: mask relation is preserved
    assert np.array_equal(cb, (ca > 0).astype(np.float32))
    with pytest.raises(ValueError):
        iu.random_crop(a, b[:1])


def test_collate_pad_batch_deterministic_and_random():
    ims = [np.ones((2, 10, 12, 14), np.float32), np.ones((2, 16, 8, 14), np.float32)]
    lbs = [np.ones((8,) + im.shape[1:], np.uint8) for im in ims]
    bi, bl = iu.collate_pad_batch(ims, lbs)
    assert bi.shape == (2, 2, 16, 16, 16) and bl.shape == (2, 8, 16, 16, 16)
    # deterministic mode left-aligns: original content in the corner
    assert np.all(bi[0, :, :10, :12, :14] == 1.0) and bi[0, :, 10:].sum() == 0
    g = np.random.default_rng(0)
    ri, rl = iu.collate_pad_batch(ims, lbs, rng=g)
    assert ri.shape == bi.shape
    assert ri[0].sum() == bi[0].sum()             # padding only moves content


def test_pad_batch1_to_compatible_size():
    x = np.ones((1, 2, 100, 128, 97), np.float32)
    padded, pads = iu.pad_batch1_to_compatible_size(x)
    assert padded.shape == (1, 2, 112, 128, 112)
    assert pads == (12, 0, 15)
    assert np.all(padded[..., :100, :, :97] == 1.0)
