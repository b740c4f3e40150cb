import numpy as np
import pytest

from micformer_tpu.data.mmwhs import (
    MMWHSDataset,
    discover_cases,
    get_datasets,
    kfold_split,
)
from micformer_tpu.data.synthetic import synthetic_batch, write_synthetic_dataset


def test_kfold_split_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.model_selection import KFold

    n = 20
    for fold in range(5):
        tr, va, te = kfold_split(n, 5, seed=1234, fold=fold)
        kf = KFold(5, shuffle=True, random_state=1234)
        ref_tr, ref_held = list(kf.split(np.arange(n)))[fold]
        np.testing.assert_array_equal(tr, ref_tr)
        np.testing.assert_array_equal(np.concatenate([va, te]), ref_held)
        assert len(va) == len(ref_held) // 2  # val is first half (MMWHS.py:487-489)
        assert set(tr) | set(va) | set(te) == set(range(n))


def test_synthetic_end_to_end(tmp_path):
    root = tmp_path / "data"
    write_synthetic_dataset(root, n_cases=5, shape=(24, 28, 20), seed=1)
    cases = discover_cases(root)
    assert len(cases) == 5
    assert cases[0].patient_id == "1001"
    assert "label" in cases[0].ct_label and "mr" in cases[0].mr

    train, val, bench = get_datasets(
        root, seed=1234, cache_dir=tmp_path / "cache", target_shape=(16, 16, 16)
    )
    assert len(train) == 4 and len(val) == 0 and len(bench) == 1

    s = train[0]
    assert s["image"].shape == (2, 16, 16, 16)
    assert s["label"].shape == (8, 16, 16, 16)
    assert s["image"].dtype == np.float32
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert set(np.unique(s["label"])) <= {0, 1}
    # one-hot: channels sum to 1 everywhere
    np.testing.assert_array_equal(s["label"].sum(axis=0), np.ones((16, 16, 16)))
    assert s["supervised"] is True and s["et_present"] == 0

    # cache hit second time
    s2 = bench[0]
    s3 = bench[0]
    np.testing.assert_array_equal(s2["image"], s3["image"])


def test_dataset_patch_jitter(tmp_path):
    root = tmp_path / "data"
    write_synthetic_dataset(root, n_cases=1, shape=(24, 24, 24), seed=2)
    cases = discover_cases(root)
    ds = MMWHSDataset(
        cases, training=True, target_shape=(20, 20, 20), patch_size=(16, 16, 16),
        cache_dir=tmp_path / "c",
    )
    s = ds[0]
    assert s["image"].shape == (2, 16, 16, 16)
    assert s["label"].shape == (8, 16, 16, 16)


def test_loader_batching(tmp_path):
    from micformer_tpu.data.loader import DataLoader

    root = tmp_path / "data"
    write_synthetic_dataset(root, n_cases=3, shape=(16, 16, 16), seed=3)
    ds = MMWHSDataset(discover_cases(root), training=True, target_shape=(8, 8, 8))
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=0, device_put=False)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0][0].shape == (2, 2, 8, 8, 8)
    assert batches[1][0].shape == (1, 2, 8, 8, 8)
    ids = [pid for b in batches for pid in b[2]["patient_id"]]
    assert sorted(ids) == ["1001", "1002", "1003"]


def test_synthetic_batch_shapes():
    img, lab = synthetic_batch(0, batch=2, shape=(8, 8, 8))
    assert img.shape == (2, 2, 8, 8, 8)
    assert lab.shape == (2, 8, 8, 8, 8)
    np.testing.assert_allclose(lab.sum(axis=1), 1.0)


def test_transforms_parity(rng):
    import jax
    import jax.numpy as jnp

    from micformer_tpu.data import transforms as T

    img = rng.standard_normal((2, 6, 6, 6)).astype(np.float32)
    img[0, :2] = 0.0
    out = np.array(T.normalize_intensity_nonzero(jnp.array(img)))
    # zeros untouched
    assert np.all(out[0, :2] == 0)
    # nonzero voxels per channel are z-scored
    for c in range(2):
        nz = out[c][img[c] != 0]
        assert abs(nz.mean()) < 1e-4
        assert abs(nz.std() - 1.0) < 1e-2

    key = jax.random.key(0)
    lab = (rng.random((8, 6, 6, 6)) > 0.5).astype(np.float32)
    a_img, a_lab = T.train_augment(key, jnp.array(img), jnp.array(lab))
    assert a_img.shape == img.shape and a_lab.shape == lab.shape

    b_img, b_lab = T.batched_train_augment(
        key, jnp.array(img[None].repeat(2, 0)), jnp.array(lab[None].repeat(2, 0))
    )
    assert b_img.shape == (2, 2, 6, 6, 6)


def test_loader_multiworker_deterministic():
    """workers>1 parallelizes sample fetch WITHIN a batch; batch contents and
    order must be identical to the single-thread loader."""
    from micformer_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {"image": rng.normal(size=(2, 4, 4, 4)).astype(np.float32),
                    "label": np.full((4, 4, 4), i % 3, np.uint8),
                    "patient_id": str(i)}

    a = DataLoader(DS(), batch_size=3, shuffle=True, seed=5, device_put=False)
    b = DataLoader(DS(), batch_size=3, shuffle=True, seed=5, device_put=False,
                   workers=4)
    for (ia, la, ma), (ib, lb, mb) in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        assert ma["patient_id"] == mb["patient_id"]
