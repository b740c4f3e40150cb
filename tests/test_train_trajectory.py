"""Cross-framework training-TRAJECTORY parity (VERDICT r3 item 2).

The strongest correctness evidence available without the MM-WHS dataset:
transplant the SAME init into the reference torch harness and into Trainer,
run N optimizer steps on identical fixed batches, and assert the per-step
loss curves track. This pins the optimizer/scheduler/grad integration that
one-step loss parity cannot (reference loop: train_mmwhs_noPad.py:172-207,
Adam lr 1e-4 + MDiceLoss; nnU-Net preset: SGD nesterov + poly LR,
nnUNetTrainerV2.py:391-405).

Both sides run f32 on CPU with stochastic paths off (torch eval-mode forward
== flax drop_path 0); gradients differ only by summation order, so the loss
curves should track to ~1e-4 and drift sub-linearly. Measured deltas are
recorded in docs/PARITY.md.
"""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "MicFormer", "models")),
        reason="reference repo not mounted",
    ),
    pytest.mark.slow,
]


def _ref_mdice():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_loss_traj", os.path.join(REFERENCE, "MicFormer", "loss", "dice.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.MDiceLoss()


def _batches(n, shape, seed):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(n,) + shape).astype(np.float32)
    labs = rng.integers(0, 8, size=(n, shape[0]) + shape[2:])
    ys = np.eye(8, dtype=np.float32)[labs].transpose(0, 1, 5, 2, 3, 4)
    # ys: [n, B, 8, D, H, W]
    return xs, ys


def _jax_trajectory(fmodel, params, xs, ys, cfg_kw, n_steps):
    from micformer_tpu.train.trainer import Trainer, TrainConfig

    cfg = TrainConfig(num_classes=8, augment="none", nan_guard=False,
                      loss="mdice", run_dir=tempfile.mkdtemp(prefix="traj_"),
                      **cfg_kw)
    tr = Trainer(fmodel, cfg)
    state = tr.init_state(xs.shape[1:])
    params = jax.tree.map(jnp.asarray, params)
    state = state.replace(params=params, opt_state=tr.tx.init(params))
    losses = []
    for s in range(n_steps):
        state, m = tr.train_step(state, jnp.asarray(xs[s]), jnp.asarray(ys[s]),
                                 jax.random.key(s))
        losses.append(float(m["loss"]))
    return losses


def _torch_trajectory(tmodel, opt, lr_for_step, loss_mod, xs, ys, n_steps):
    import torch

    losses = []
    for s in range(n_steps):
        if lr_for_step is not None:
            for grp in opt.param_groups:
                grp["lr"] = lr_for_step(s)
        opt.zero_grad()
        out = tmodel(torch.from_numpy(xs[s]))
        loss = loss_mod(out, torch.from_numpy(ys[s]))
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


def _assert_tracks(losses_t, losses_j, tol_first, tol_max):
    deltas = [abs(a - b) for a, b in zip(losses_t, losses_j)]
    assert deltas[0] < tol_first, f"step-0 delta {deltas[0]:.2e}"
    assert max(deltas) < tol_max, (
        f"max per-step delta {max(deltas):.2e} (trajectory t={losses_t} "
        f"j={losses_j})")
    # sub-linear divergence: the last-quarter mean delta must not exceed
    # 10x the first-quarter mean (catching systematic optimizer mismatch
    # while allowing float-drift growth)
    q = max(len(deltas) // 4, 1)
    head = float(np.mean(deltas[:q])) + 1e-9
    tail = float(np.mean(deltas[-q:]))
    assert tail < max(10 * head, tol_max), (head, tail)
    return max(deltas)


def test_micformer_adam_trajectory_parity():
    """20 Adam steps (lr 1e-4, the MM-WHS protocol,
    train_mmwhs_noPad.py:114,172-207) on transplanted-identical inits and
    identical batches: per-step MDice losses must track."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert import (load_reference_micformer,
                                       micformer_params_from_torch)

    torch.manual_seed(0)
    n_steps = 20
    tmodel = load_reference_micformer(REFERENCE, embed_dim=24, num_classes=8)
    params = micformer_params_from_torch(tmodel.state_dict())
    # drop_path 0 == torch eval-mode forward (stochastic depth off)
    fmodel = registry.build("micformer", num_classes=8, embed_dim=24,
                            drop_path_rate=0.0)

    xs, ys = _batches(n_steps, (1, 2, 64, 64, 64), seed=42)
    ys = ys.reshape(n_steps, 1, 8, 64, 64, 64)

    losses_j = _jax_trajectory(
        fmodel, params, xs, ys,
        dict(optimizer="adam", lr=1e-4, scheduler="constant"), n_steps)
    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-4, weight_decay=0)
    losses_t = _torch_trajectory(tmodel, opt, None, _ref_mdice(), xs, ys,
                                 n_steps)
    worst = _assert_tracks(losses_t, losses_j, tol_first=2e-5, tol_max=5e-3)
    print(f"micformer adam trajectory: max per-step loss delta {worst:.2e}")


def test_mednext_sgd_poly_trajectory_parity():
    """20 SGD-nesterov steps with per-step poly LR (the nnU-Net preset the
    rebuild exposes as optimizer='sgd_nesterov' + scheduler='poly';
    nnUNetTrainerV2.py:391-405) on MedNeXt-S with transplanted init."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert.zoo_import import (load_reference_mednext,
                                                  mednext_params_from_torch)

    torch.manual_seed(1)
    n_steps = 20
    tmodel = load_reference_mednext(size="S", in_channels=2, num_classes=8)
    tmodel.train()  # mednext has no dropout; train mode only flips nothing
    params = mednext_params_from_torch(tmodel.state_dict())
    fmodel = registry.build("mednext", size="S", faithful_up=True)

    xs, ys = _batches(n_steps, (1, 2, 32, 32, 32), seed=7)
    ys = ys.reshape(n_steps, 1, 8, 32, 32, 32)

    losses_j = _jax_trajectory(
        fmodel, params, xs, ys,
        dict(optimizer="sgd_nesterov", lr=1e-2, scheduler="poly",
             epochs=1, steps_per_epoch=n_steps), n_steps)
    opt = torch.optim.SGD(tmodel.parameters(), lr=1e-2, momentum=0.99,
                          nesterov=True)
    lr_fn = lambda s: 1e-2 * (1 - s / n_steps) ** 0.9
    losses_t = _torch_trajectory(tmodel, opt, lr_fn, _ref_mdice(), xs, ys,
                                 n_steps)
    worst = _assert_tracks(losses_t, losses_j, tol_first=2e-5, tol_max=5e-3)
    print(f"mednext sgd/poly trajectory: max per-step loss delta {worst:.2e}")


def test_nnformer_augmented_ds_trajectory_parity():
    """50 Adam steps on nnFormer with deep supervision AND the augmentation
    stack inside the compared loop (VERDICT r4 item 6).

    The flax side runs the LIVE path: Trainer(augment='monai',
    deep_supervision=True) — RandFlip x3 / NormalizeIntensityd /
    RandScale/ShiftIntensity (train_mmwhs_noPad.py:116-125) execute INSIDE
    the jitted train step from the per-step PRNG key. The torch side consumes
    the byte-identical augmented batches, produced by evaluating the same
    transform fn with the same derived key outside the loop, through the
    vendored MultipleOutputLoss2 (deep_supervision.py:19-46) over MDiceLoss
    with the same nearest-downsampled target pyramid. This pins, under
    gradient flow over 50 steps, the three paths no other trajectory row
    covers: the scrambled rel-pos-bias remap (nnFormer_tumor.py:184-186),
    the deep-supervision loss wiring, and the augmentation stack."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert.zoo_import import (load_reference_nnformer,
                                                  nnformer_params_from_torch)
    from micformer_tpu.data.transforms import batched_train_augment
    from micformer_tpu.train.trainer import Trainer, TrainConfig

    torch.manual_seed(5)
    n_steps = 50
    crop = (64, 64, 64)
    tmodel = load_reference_nnformer(crop_size=crop, in_channels=2,
                                     num_classes=8, deep_supervision=True)
    with torch.no_grad():  # make the rpe remap load-bearing under grad too
        for name, p in tmodel.named_parameters():
            if "relative_position_bias_table" in name:
                p.mul_(20.0)
    params = nnformer_params_from_torch(tmodel.state_dict(), crop_size=crop,
                                        deep_supervision=True)
    # drop_path 0 == torch eval-mode forward (loader returns .eval())
    fmodel = registry.build("nnformer", num_classes=8, deep_supervision=True,
                            drop_path_rate=0.0)

    xs, ys = _batches(n_steps, (1, 2) + crop, seed=11)
    ys = ys.reshape((n_steps, 1, 8) + crop)

    # --- flax side: live Trainer path, augmentation inside the jitted step
    cfg = TrainConfig(num_classes=8, augment="monai", nan_guard=False,
                      loss="mdice", deep_supervision=True,
                      optimizer="adam", lr=1e-4, scheduler="constant",
                      run_dir=tempfile.mkdtemp(prefix="traj_"))
    tr = Trainer(fmodel, cfg)
    state = tr.init_state(xs.shape[1:])
    jparams = jax.tree.map(jnp.asarray, params)
    state = state.replace(params=jparams, opt_state=tr.tx.init(jparams))
    losses_j, aug_batches = [], []
    for s in range(n_steps):
        step_key = jax.random.key(s)
        # replicate the step's internal split to pre-compute the torch copy
        aug_key, _ = jax.random.split(step_key)
        ax, ay = batched_train_augment(aug_key, jnp.asarray(xs[s]),
                                       jnp.asarray(ys[s]), 2)
        aug_batches.append((np.asarray(ax), np.asarray(ay)))
        state, m = tr.train_step(state, jnp.asarray(xs[s]),
                                 jnp.asarray(ys[s]), step_key)
        losses_j.append(float(m["loss"]))

    # --- torch side: identical augmented batches + vendored DS loss
    import sys as _sys
    _sys.path.insert(0, os.path.join(REFERENCE, "MedNeXt"))
    try:
        from nnunet_mednext.training.loss_functions.deep_supervision import (
            MultipleOutputLoss2)
    finally:
        _sys.path.pop(0)
    w = np.array([2.0 ** (-i) for i in range(3)])
    mol = MultipleOutputLoss2(_ref_mdice(), weight_factors=list(w / w.sum()))
    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-4, weight_decay=0)
    losses_t = []
    for s in range(n_steps):
        ax, ay = aug_batches[s]
        opt.zero_grad()
        outs = tmodel(torch.from_numpy(ax))
        tgt = torch.from_numpy(ay)
        tgts = [tgt, tgt[:, :, ::2, ::2, ::2], tgt[:, :, ::4, ::4, ::4]]
        loss = mol(outs, tgts)
        loss.backward()
        opt.step()
        losses_t.append(float(loss))

    worst = _assert_tracks(losses_t, losses_j, tol_first=2e-5, tol_max=5e-3)
    print(f"nnformer adam/ds/augmented trajectory (50 steps): "
          f"max per-step loss delta {worst:.2e}")
