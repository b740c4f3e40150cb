"""End-to-end trainer tests on synthetic data (CPU backend, tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu import registry
from micformer_tpu.data.synthetic import write_synthetic_dataset
from micformer_tpu.data.loader import DataLoader
from micformer_tpu.train import Trainer, TrainConfig


pytestmark = pytest.mark.slow  # heavyweight tier: pytest -m 'not slow' skips


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    from micformer_tpu.data import get_datasets

    root = str(tmp_path_factory.mktemp("vdata"))
    write_synthetic_dataset(root, n_cases=6, shape=(24, 24, 24), seed=3)
    train, val, bench = get_datasets(root, seed=1234, cache_dir=root + "/cache",
                                     target_shape=(16, 16, 16))
    return (
        DataLoader(train, batch_size=2, shuffle=True, seed=0),
        DataLoader(val, batch_size=1),
    )


def test_trainer_loss_decreases(loaders, tmp_path):
    train_loader, val_loader = loaders
    model = registry.build("unet3d", channels=(4, 8, 16))
    cfg = TrainConfig(epochs=8, lr=3e-3, val_every=4, steps_per_epoch=len(train_loader),
                      run_dir=str(tmp_path / "run"), scheduler="constant")
    tr = Trainer(model, cfg)
    state = tr.fit(train_loader, val_loader, log_every=100)

    import json
    records = [json.loads(l) for l in open(cfg.run_dir + "/log.jsonl")]
    tl = [r["train_loss"] for r in records if "train_loss" in r]
    assert tl[-1] < tl[0], f"loss did not decrease: {tl}"
    assert int(state.step) == 8 * len(train_loader)
    # best-dice checkpoint written during fit
    assert tr.ckpt.exists("best_dice") and tr.ckpt.exists("best_loss")


def test_checkpoint_roundtrip(tmp_path):
    from micformer_tpu.train.checkpoint import CheckpointManager

    model = registry.build("unet3d", channels=(4, 8))
    x = jnp.ones((1, 2, 8, 8, 8))
    params = model.init(jax.random.key(0), x)["params"]
    cm = CheckpointManager(str(tmp_path / "ck"))
    cm.save("best_dice", {"params": params, "epoch": 5})
    restored = cm.restore("best_dice", {"params": params, "epoch": 0})
    assert int(restored["epoch"]) == 5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_parallel_train_step(loaders, tmp_path):
    """DDP-equivalent: batch sharded over 8 virtual devices, params replicated;
    one step must run and produce finite loss + sharded->replicated grads."""
    from micformer_tpu.parallel import make_mesh

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    model = registry.build("unet3d", channels=(4, 8))
    cfg = TrainConfig(epochs=1, lr=1e-3, run_dir=str(tmp_path / "dp"), scheduler="constant")
    tr = Trainer(model, cfg, mesh=mesh)
    state = tr.init_state((8, 2, 16, 16, 16))
    images = jnp.ones((8, 2, 16, 16, 16))
    labels = jax.nn.one_hot(jnp.zeros((8, 16, 16, 16), jnp.int32), 8, axis=1)
    state2, metrics = tr.train_step(state, images, labels, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_zero1_matches_replicated_training(tmp_path):
    """ZeRO-1 optimizer-state sharding: 3 train steps with the Adam moments
    sharded over the 'data' axis must match fully-replicated training, and
    the moment leaves must actually be partitioned (1/N per device)."""
    from jax.sharding import PartitionSpec as P

    from micformer_tpu.parallel import make_mesh

    mesh = make_mesh()
    model = registry.build("unet3d", channels=(4, 8))
    base = dict(epochs=1, lr=1e-3, scheduler="constant", seed=3,
                augment="none")
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 2, 16, 16, 16)).astype(np.float32))
    labels = jax.nn.one_hot(
        jnp.asarray(np.random.default_rng(1).integers(0, 8, (8, 16, 16, 16))), 8, axis=1)

    def run(zero1, run_dir):
        tr = Trainer(model, TrainConfig(run_dir=run_dir, zero1=zero1, **base),
                     mesh=mesh)
        state = tr.init_state((8, 2, 16, 16, 16))
        for i in range(3):
            state, metrics = tr.train_step(state, images, labels,
                                           jax.random.key(i))
        return state, metrics

    s_rep, m_rep = run(False, str(tmp_path / "rep"))
    s_z1, m_z1 = run(True, str(tmp_path / "z1"))

    # moments are sharded over 'data' on some axis; params stay replicated
    def spec_of(x):
        return tuple(getattr(x.sharding, "spec", ()) or ())

    sharded = [x for x in jax.tree.leaves(s_z1.opt_state)
               if "data" in spec_of(x)]
    assert sharded, "zero1 left every optimizer leaf replicated"
    for p in jax.tree.leaves(s_z1.params):
        assert "data" not in spec_of(p), "params must stay replicated"

    np.testing.assert_allclose(float(m_z1["loss"]), float(m_rep["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_rep.params), jax.tree.leaves(s_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_nan_guard_skips_step(tmp_path):
    model = registry.build("unet3d", channels=(4, 8))
    cfg = TrainConfig(epochs=1, lr=1e-3, run_dir=str(tmp_path / "nan"), scheduler="constant")
    tr = Trainer(model, cfg)
    state = tr.init_state((1, 2, 8, 8, 8))
    images = jnp.full((1, 2, 8, 8, 8), jnp.nan)
    labels = jnp.zeros((1, 8, 8, 8, 8))
    p0 = jax.tree.leaves(state.params)[0].copy()
    state2, metrics = tr.train_step(state, images, labels, jax.random.key(0))
    assert bool(metrics["skipped"])
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state2.params)[0]), np.asarray(p0))


def test_case_parallel_validation_matches_serial(loaders, tmp_path):
    """Live val-case sharding (nnUNetTrainerV2_DDP.py:492 parity): validate()
    on a >1-device mesh evaluates one case per device via shard_map; its
    metrics must equal the serial per-case loop bit-for-bit."""
    from micformer_tpu.parallel import make_mesh

    _, val_loader = loaders
    model = registry.build("unet3d", channels=(4, 8))
    cfg = TrainConfig(epochs=1, lr=1e-3, run_dir=str(tmp_path / "cps"),
                      scheduler="constant", seed=7)
    serial = Trainer(model, cfg, mesh=None)
    state = serial.init_state((1, 2, 16, 16, 16))
    ref = serial.validate(state, val_loader)

    mesh = make_mesh()
    par = Trainer(model, TrainConfig(**{**cfg.__dict__,
                                        "run_dir": str(tmp_path / "cpp")}),
                  mesh=mesh)
    got = par.validate(par.init_state((1, 2, 16, 16, 16)), val_loader)
    assert got["per_class_dice"].shape == ref["per_class_dice"].shape
    np.testing.assert_array_equal(got["per_class_dice"], ref["per_class_dice"])
    assert got["val_loss"] == ref["val_loss"]
    assert got["meandice"] == ref["meandice"]


def test_case_parallel_validation_sliding_window(loaders, tmp_path):
    """Case-parallel validate through the sliding-window eval path (roi
    smaller than the volume) must also match serial exactly."""
    from micformer_tpu.parallel import make_mesh

    _, val_loader = loaders
    model = registry.build("unet3d", channels=(4, 8))
    base = dict(epochs=1, lr=1e-3, scheduler="constant", seed=7,
                roi=(8, 8, 8), sw_batch_size=1)
    serial = Trainer(model, TrainConfig(run_dir=str(tmp_path / "sws"), **base))
    state = serial.init_state((1, 2, 16, 16, 16))
    ref = serial.validate(state, val_loader)

    par = Trainer(model, TrainConfig(run_dir=str(tmp_path / "swp"), **base),
                  mesh=make_mesh())
    got = par.validate(par.init_state((1, 2, 16, 16, 16)), val_loader)
    np.testing.assert_array_equal(got["per_class_dice"], ref["per_class_dice"])
    assert got["val_loss"] == ref["val_loss"]
    assert got["meandice"] == ref["meandice"]
