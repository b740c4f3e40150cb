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


def test_deep_supervision_matches_torch_multiple_output_loss2(rng):
    """deep_supervision_loss == torch MultipleOutputLoss2 with nnU-Net's
    normalized 2^-i weights (deep_supervision.py:19-46) and nearest-downsampled
    targets, highest resolution first."""
    import torch
    import jax.numpy as jnp
    from micformer_tpu.losses.dice import deep_supervision_loss

    C = 3
    shapes = [(1, C, 8, 8, 8), (1, C, 4, 4, 4), (1, C, 2, 2, 2)]
    pyramid = [rng.normal(size=s).astype(np.float32) for s in shapes]
    target = rng.normal(size=shapes[0]).astype(np.float32)

    mse = lambda lg, t: jnp.mean((lg - t) ** 2)
    got = float(deep_supervision_loss([jnp.asarray(p) for p in pyramid],
                                      jnp.asarray(target), loss_fn=mse))

    # torch oracle: MultipleOutputLoss2 with explicit normalized weights
    import sys
    sys.path.insert(0, "/root/reference/MedNeXt")
    try:
        from nnunet_mednext.training.loss_functions.deep_supervision import (
            MultipleOutputLoss2,
        )
    except Exception:
        MultipleOutputLoss2 = None
    finally:
        sys.path.pop(0)
    w = np.array([2.0 ** (-i) for i in range(3)])
    w = w / w.sum()
    targets = [target, target[:, :, ::2, ::2, ::2], target[:, :, ::4, ::4, ::4]]
    tmse = lambda a, b: torch.mean((a - b) ** 2)
    if MultipleOutputLoss2 is not None:
        mol = MultipleOutputLoss2(tmse, weight_factors=list(w))
        want = float(mol([torch.from_numpy(p) for p in pyramid],
                         [torch.from_numpy(t) for t in targets]))
    else:  # reference unavailable: inline oracle with the same algebra
        want = float(sum(wi * np.mean((p - t) ** 2)
                         for wi, p, t in zip(w, pyramid, targets)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow  # builds a full nnFormer (~1 min CPU)
def test_nnformer_ds_pyramid_highest_res_first():
    import jax
    import jax.numpy as jnp
    from micformer_tpu import registry

    model = registry.build("nnformer", num_classes=3, embed_dim=24,
                           deep_supervision=True)
    x = jnp.zeros((1, 2, 32, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert isinstance(out, (list, tuple))
    sizes = [o.shape[2] for o in out]
    assert sizes == sorted(sizes, reverse=True), sizes
    assert out[0].shape[2:] == (32, 32, 32)
