"""Early-stopping (patience) and find_lr trainer extras."""

import numpy as np

from micformer_tpu import registry
from micformer_tpu.data.loader import DataLoader
from micformer_tpu.train import Trainer, TrainConfig
from tests.test_resume import TinyDS

import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: pytest -m 'not slow' skips


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


def test_pretrained_seeding_transfers_body_not_head(tmp_path):
    """--pretrained: body weights transfer from another run's checkpoint,
    segmentation heads stay at init (load_pretrained_weights.py parity)."""
    import jax
    import jax.numpy as jnp
    from micformer_tpu import registry
    from micformer_tpu.train import Trainer, TrainConfig
    from micformer_tpu.train.checkpoint import CheckpointManager
    from micformer_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {"image": rng.normal(size=(1, 16, 16, 16)).astype(np.float32),
                    "label": rng.integers(0, 3, (16, 16, 16)).astype(np.uint8),
                    "patient_id": str(i)}

    model = registry.build("unet3d", num_classes=3, channels=(2, 4, 8))
    # donor run: save a checkpoint with recognizably-shifted weights
    donor = Trainer(model, TrainConfig(epochs=1, num_classes=3, augment="none",
                                       run_dir=str(tmp_path / "donor")))
    st = donor.init_state((1, 1, 16, 16, 16))
    shifted = jax.tree.map(lambda a: a + 1.0, st.params)
    donor.ckpt.save("best_dice", {"params": shifted, "opt_state": st.opt_state,
                                  "step": st.step, "epoch": 0,
                                  "best_dice": 0.0, "best_loss": 0.0})

    trainer = Trainer(model, TrainConfig(
        epochs=1, val_every=10, num_classes=3, augment="none",
        run_dir=str(tmp_path / "run"), pretrained=str(tmp_path / "donor")))
    loader = DataLoader(DS(), batch_size=1, device_put=False)
    state = trainer.fit(loader)

    import json
    log = [json.loads(l) for l in open(tmp_path / "run" / "log.jsonl")]
    rep = next(l["pretrained"] for l in log if "pretrained" in l)
    assert rep["loaded"] > 0 and rep["skipped"] > 0


import json


def test_run_export(tmp_path):
    from micformer_tpu.train.run_export import (
        get_run_data, get_run_dataframe, export_runs_csv)

    rd = tmp_path / "run1"
    rd.mkdir()
    with open(rd / "events.jsonl", "w") as f:
        f.write(json.dumps({"tag": "val/meandice", "value": 0.5, "step": 1}) + "\n")
        f.write(json.dumps({"tag": "val/meandice", "value": 0.7, "step": 2}) + "\n")
    with open(rd / "log.jsonl", "w") as f:
        f.write(json.dumps({"epoch": 1, "loss": 0.9, "note": "x"}) + "\n")

    data = get_run_data(str(rd))
    assert data["val/meandice"] == [(1, 0.5), (2, 0.7)]
    assert data["loss"] == [(1, 0.9)]

    df = get_run_dataframe(str(rd))
    if df is not None:
        assert "val/meandice" in df.columns and len(df) == 2

    out = export_runs_csv([str(rd)], str(tmp_path / "all.csv"))
    rows = open(out).read().splitlines()
    assert rows[0] == "run,metric,step,value"
    assert any(r.startswith("run1,val/meandice,2,0.7") for r in rows)


def test_overlay_png(tmp_path):
    """overlay_plots.py parity: max-foreground slice selection + additive
    color overlay, PNG written (utilities/overlay_plots.py plot_overlay)."""
    from micformer_tpu.train.logging import overlay_slice, save_overlay_png

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)
    seg = np.zeros((8, 16, 16), np.uint8)
    seg[5, 4:12, 4:12] = 3      # slice 5 has the most foreground
    seg[2, 0, 0] = 1
    path = str(tmp_path / "ov.png")
    k = save_overlay_png(img, seg, path)
    assert k == 5
    assert path and __import__("os").path.getsize(path) > 0
    rgb = overlay_slice(img[0, 5], seg[5])
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
    # labeled region must be colored (channels differ); background grayscale
    assert not np.all(rgb[8, 8, 0] == rgb[8, 8, 2])
    assert rgb[0, 0, 0] == rgb[0, 0, 1] == rgb[0, 0, 2]
