"""Orbax checkpointing — dual best-Dice / best-loss policy + resume.

Reference parity (utils.py:57-65,114-138; train_mmwhs_noPad.py:230-254):
  - save_checkpoint -> best-dice  (model_best.pth.tar equivalent: 'best_dice')
  - save_checkpoint_loss -> best-loss ('best_loss')
  - reload_ckpt_bis: resume weights + epoch; tolerates weights-only trees.
Extends the reference by also persisting opt_state, PRNG key and best metrics
(the reference drops optimizer state on the live resume path — SURVEY §5).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

import orbax.checkpoint as ocp

# Schema version of the checkpoint payload written by Trainer. History:
#   1 (round 1): params/opt_state/step
#   2 (round 2): + epoch, best_dice, best_loss
# Recorded in a sidecar meta.json per checkpoint dir; readers can branch on
# it instead of try/except-probing tree shapes.
SCHEMA_VERSION = 2


class CheckpointManager:
    def __init__(self, run_dir: str, keep_best_k: int | None = None):
        """keep_best_k: when set, every `save(tag, ..., metric=...)` with a
        tag prefixed 'best' ALSO archives a copy under ckpt_<tag>_k<step> and
        prunes to the K best by metric (nnU-Net keeps one best + latest; the
        retention generalizes that for model averaging / selection sweeps)."""
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.keep_best_k = keep_best_k

    def _path(self, tag: str) -> str:
        return os.path.join(self.run_dir, f"ckpt_{tag}")

    def _meta_path(self, tag: str) -> str:
        return self._path(tag) + ".meta.json"

    def save(self, tag: str, state: Any, force: bool = True,
             metric: float | None = None):
        path = self._path(tag)
        self._ckptr.save(path, state, force=force)
        self._ckptr.wait_until_finished()
        with open(self._meta_path(tag), "w") as f:
            json.dump({"schema_version": SCHEMA_VERSION, "tag": tag,
                       "metric": metric, "time": time.time()}, f)
        if self.keep_best_k and tag.startswith("best") and metric is not None:
            step = int(state["step"]) if isinstance(state, dict) and "step" in state else 0
            self._archive_best(tag, path, metric, step)

    def _archive_best(self, tag: str, path: str, metric: float, step: int):
        arch = self._path(f"{tag}_k{step}")
        if not os.path.isdir(arch):
            shutil.copytree(path, arch)
        with open(arch + ".meta.json", "w") as f:
            json.dump({"schema_version": SCHEMA_VERSION, "tag": tag,
                       "metric": metric, "step": step, "time": time.time()}, f)
        entries = []
        for m in os.listdir(self.run_dir):
            if m.startswith(f"ckpt_{tag}_k") and m.endswith(".meta.json"):
                with open(os.path.join(self.run_dir, m)) as f:
                    entries.append((json.load(f).get("metric", 0.0),
                                    m[: -len(".meta.json")]))
        entries.sort(reverse=True)
        for _, name in entries[self.keep_best_k:]:
            shutil.rmtree(os.path.join(self.run_dir, name), ignore_errors=True)
            try:
                os.remove(os.path.join(self.run_dir, name + ".meta.json"))
            except OSError:
                pass

    def meta(self, tag: str) -> dict:
        """Sidecar metadata ({} for pre-versioning checkpoints)."""
        try:
            with open(self._meta_path(tag)) as f:
                return json.load(f)
        except OSError:
            return {}

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
