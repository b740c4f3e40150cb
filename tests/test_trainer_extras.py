"""Early-stopping (patience) and find_lr trainer extras."""

import numpy as np

from micformer_tpu import registry
from micformer_tpu.data.loader import DataLoader
from micformer_tpu.train import Trainer, TrainConfig
from tests.test_resume import TinyDS


def test_patience_early_stop(tmp_path):
    ds = TinyDS()
    loader = DataLoader(ds, batch_size=2)
    # lr=0 -> no learning -> val metric never improves -> stop after
    # patience validations (first val sets the EMA baseline)
    cfg = TrainConfig(epochs=50, lr=0.0, val_every=1, run_dir=str(tmp_path),
                      scheduler="constant", patience=2)
    tr = Trainer(registry.build("unet3d", channels=(4, 8)), cfg)
    state = tr.fit(loader, loader, log_every=1000)
    import json

    records = [json.loads(l) for l in open(str(tmp_path) + "/log.jsonl")]
    epochs = [r["epoch"] for r in records if "train_loss" in r]
    assert max(epochs) < 49, "early stopping did not trigger"


def test_find_lr_sweeps(tmp_path):
    ds = TinyDS()
    loader = DataLoader(ds, batch_size=2)
    cfg = TrainConfig(epochs=1, run_dir=str(tmp_path), scheduler="constant")
    tr = Trainer(registry.build("unet3d", channels=(4, 8)), cfg)
    lrs, losses = tr.find_lr(loader, num_iters=8, init_lr=1e-5, final_lr=1e-1)
    assert len(lrs) == len(losses) == 8
    assert lrs[0] < lrs[-1]
    assert all(np.isfinite(losses))
