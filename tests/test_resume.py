"""Full resume test: fit -> checkpoint -> new Trainer resumes params,
optimizer state, step and epoch."""

import json

import numpy as np
import pytest

from micformer_tpu import registry
from micformer_tpu.data.loader import DataLoader
from micformer_tpu.train import Trainer, TrainConfig


pytestmark = pytest.mark.slow  # heavyweight tier: pytest -m 'not slow' skips


class TinyDS:
    def __init__(self, n=4, shape=(12, 12, 12)):
        rng = np.random.default_rng(0)
        self.samples = []
        for i in range(n):
            img = rng.normal(size=(2,) + shape).astype(np.float32)
            lab = np.zeros((8,) + shape, np.float32)
            lab[0] = 1
            self.samples.append(dict(patient_id=f"p{i}", image=img, label=lab,
                                     crop_indexes=None))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_fit_then_resume(tmp_path):
    ds = TinyDS()
    loader = DataLoader(ds, batch_size=2)
    cfg = TrainConfig(epochs=2, lr=1e-3, val_every=1, run_dir=str(tmp_path),
                      scheduler="constant")
    model = registry.build("unet3d", channels=(4, 8))
    t1 = Trainer(model, cfg)
    state1 = t1.fit(loader, loader, log_every=100)
    assert t1.ckpt.exists("best_dice")

    cfg2 = TrainConfig(epochs=4, lr=1e-3, val_every=1, run_dir=str(tmp_path),
                       scheduler="constant")
    t2 = Trainer(registry.build("unet3d", channels=(4, 8)), cfg2)
    state2 = t2.fit(loader, loader, resume=True, log_every=100)
    # resumed from epoch ckpt and continued to 4 epochs total
    records = [json.loads(l) for l in open(str(tmp_path) + "/log.jsonl")]
    epochs_trained = sorted({r["epoch"] for r in records if "train_loss" in r})
    assert max(epochs_trained) == 3
    # step carried over, not reset (2 epochs x 2 steps saved at best ckpt)
    assert int(state2.step) > int(state1.step) - 4


def test_checkpoint_schema_meta_and_best_k(tmp_path):
    """Schema-version sidecar + best-k retention: archives the K best
    'best_dice' checkpoints by metric and prunes the rest."""
    import numpy as np
    from micformer_tpu.train.checkpoint import CheckpointManager, SCHEMA_VERSION

    cm = CheckpointManager(str(tmp_path), keep_best_k=2)
    for step, metric in [(1, 0.3), (2, 0.6), (3, 0.5), (4, 0.8)]:
        state = {"params": {"w": np.full((2,), float(step))},
                 "step": np.asarray(step)}
        cm.save("best_dice", state, metric=metric)

    meta = cm.meta("best_dice")
    assert meta["schema_version"] == SCHEMA_VERSION
    import os
    archived = sorted(d for d in os.listdir(tmp_path)
                      if d.startswith("ckpt_best_dice_k") and not d.endswith(".json"))
    # k=2 retention: metrics 0.8 (step 4) and 0.6 (step 2) survive
    assert archived == ["ckpt_best_dice_k2", "ckpt_best_dice_k4"], archived
    best = cm.restore_any("best_dice_k4")
    np.testing.assert_array_equal(best["params"]["w"], np.full((2,), 4.0))
    assert cm.meta("best_dice_k4")["metric"] == 0.8
