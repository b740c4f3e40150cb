"""Extended loss zoo: sanity properties + torch cross-checks where cheap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu.losses import dice as D


@pytest.fixture
def batch(rng):
    logits = jnp.asarray(rng.normal(size=(2, 4, 6, 6, 6)).astype(np.float32))
    labels = jax.nn.one_hot(jnp.asarray(rng.integers(0, 4, size=(2, 6, 6, 6))), 4, axis=1)
    return logits, labels


def test_all_losses_finite_and_positive(batch):
    logits, t = batch
    for fn in [D.generalized_dice_loss, D.topk_ce_loss, D.focal_loss,
               D.mcc_loss, D.dice_topk_loss, D.dice_bce_loss, D.edice_loss]:
        v = float(fn(logits, t))
        assert np.isfinite(v) and v >= 0, fn.__name__


def test_perfect_prediction_minimizes(batch):
    _, t = batch
    perfect = (t * 20.0 - 10.0)  # logits strongly favoring the true class
    for fn, tol in [(D.generalized_dice_loss, 0.05), (D.topk_ce_loss, 0.01),
                    (D.focal_loss, 0.01), (D.mcc_loss, 0.1)]:
        v = float(fn(perfect, t))
        assert v < tol, f"{fn.__name__}: {v}"


def test_topk_matches_torch(rng):
    import torch

    logits = rng.normal(size=(1, 4, 5, 5, 5)).astype(np.float32)
    target = rng.integers(0, 4, size=(1, 5, 5, 5))
    t_onehot = jax.nn.one_hot(jnp.asarray(target), 4, axis=1)
    ours = float(D.topk_ce_loss(jnp.asarray(logits), t_onehot, k_percent=10))
    lt = torch.from_numpy(logits)
    ce = torch.nn.functional.cross_entropy(lt, torch.from_numpy(target).long(),
                                           reduction="none").reshape(-1)
    k = max(1, int(ce.numel() * 0.10))
    expect = float(ce.topk(k)[0].mean())
    np.testing.assert_allclose(ours, expect, rtol=1e-5)


def test_gradients_flow(batch):
    logits, t = batch
    for fn in [D.generalized_dice_loss, D.mcc_loss, D.dice_topk_loss]:
        g = jax.grad(lambda l: fn(l, t))(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


def test_model_selection():
    from micformer_tpu.pipeline.model_selection import (
        find_best_configuration, candidate_ensembles, mean_fg_dice)

    def agg(d):
        return {"mean": {"0": {"Dice": 0.99}, "1": {"Dice": d}, "2": {"Dice": d}}}

    configs = {"unet3d": agg(0.80), "micformer": agg(0.90)}
    ens = {("micformer", "unet3d"): agg(0.88)}
    out = find_best_configuration(configs, ens)
    assert out["best"] == "micformer"
    assert not out["is_ensemble"]
    assert mean_fg_dice(agg(0.5)) == pytest.approx(0.5)
    assert candidate_ensembles(["a", "b", "c"]) == [("a", "b"), ("a", "c"), ("b", "c")]
