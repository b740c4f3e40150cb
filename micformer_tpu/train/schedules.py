"""LR schedules with reference-exact semantics.

  - cosine_annealing: torch CosineAnnealingLR closed form
    eta_min + (base-eta_min)*(1+cos(pi*t/T_max))/2 — periodic past T_max.
    The reference steps it PER BATCH with T_max=epochs
    (train_mmwhs_noPad.py:148,206-207, quirk SURVEY §2.13), so with 16
    steps/epoch the LR reaches eta_min within ~19 epochs and oscillates;
    `per_batch=True` reproduces that faithfully, `per_batch=False` gives the
    intended per-epoch annealing.
  - poly_lr: nnU-Net polynomial decay (nnUNetTrainerV2.py:391-405):
    initial * (1 - epoch/max_epochs)**exponent.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0,
                     steps_per_epoch: int = 1, per_batch: bool = True):
    """Returns an optax-compatible schedule fn of the global step count."""

    def schedule(step):
        t = step if per_batch else step // max(steps_per_epoch, 1)
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t / t_max)) / 2

    return schedule


def poly_lr(initial_lr: float, max_steps: int, exponent: float = 0.9):
    def schedule(step):
        frac = jnp.clip(step / max_steps, 0.0, 1.0)
        return initial_lr * (1 - frac) ** exponent

    return schedule
