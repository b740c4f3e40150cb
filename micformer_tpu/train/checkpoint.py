"""Orbax checkpointing — dual best-Dice / best-loss policy + resume.

Reference parity (utils.py:57-65,114-138; train_mmwhs_noPad.py:230-254):
  - save_checkpoint -> best-dice  (model_best.pth.tar equivalent: 'best_dice')
  - save_checkpoint_loss -> best-loss ('best_loss')
  - reload_ckpt_bis: resume weights + epoch; tolerates weights-only trees.
Extends the reference by also persisting opt_state, PRNG key and best metrics
(the reference drops optimizer state on the live resume path — SURVEY §5).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, run_dir: str):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.run_dir, f"ckpt_{tag}")

    def save(self, tag: str, state: Any, force: bool = True):
        path = self._path(tag)
        self._ckptr.save(path, state, force=force)
        self._ckptr.wait_until_finished()

    def restore(self, tag: str, template: Any) -> Any:
        return self._ckptr.restore(self._path(tag), template)

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))

    def restore_any(self, tag: str) -> Any:
        """Template-free restore: returns whatever tree the checkpoint holds
        (arrays as committed). Used by inference-side loaders that don't know
        the optimizer-state structure."""
        return self._ckptr.restore(self._path(tag))

    def restore_params_only(self, tag: str, params_template: Any = None) -> Any:
        """reload_ckpt_bis-style weights-only reload (utils.py:125-138):
        tolerant of checkpoints holding extra entries (opt_state, step)."""
        full = self.restore_any(tag)
        return full["params"] if isinstance(full, dict) and "params" in full else full
