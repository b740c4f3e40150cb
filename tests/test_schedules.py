"""LR schedule parity vs torch (CosineAnnealingLR stepped per batch — the
reference quirk, train_mmwhs_noPad.py:148,206-207) and nnU-Net poly_lr."""

import numpy as np

from micformer_tpu.train.schedules import cosine_annealing, poly_lr


def test_cosine_matches_torch_per_batch_quirk():
    import torch

    base_lr, epochs = 1e-4, 300
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(m.parameters(), lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)
    ours = cosine_annealing(base_lr, epochs, per_batch=True)
    # reference: scheduler.step() after every batch; compare 700 steps
    # (past T_max, where torch's recursive form continues the cosine)
    for step in range(700):
        np.testing.assert_allclose(
            float(ours(step)), opt.param_groups[0]["lr"], rtol=1e-3,
            atol=1e-9, err_msg=f"step {step}")  # f32 cos near the minimum
        sched.step()


def test_cosine_per_epoch_mode():
    s = cosine_annealing(1.0, t_max=10, steps_per_epoch=16, per_batch=False)
    assert float(s(0)) == 1.0
    # within one epoch the lr is constant
    np.testing.assert_allclose(float(s(5)), 1.0)
    np.testing.assert_allclose(float(s(16 * 5)), 0.5, atol=1e-6)


def test_poly_lr_matches_nnunet():
    # nnUNetTrainerV2: initial 1e-2, exponent 0.9, per-epoch over 1000
    s = poly_lr(1e-2, 1000, 0.9)
    for ep in [0, 100, 999]:
        expect = 1e-2 * (1 - ep / 1000) ** 0.9
        np.testing.assert_allclose(float(s(ep)), expect, rtol=1e-4)
    assert float(s(1000)) == 0.0
