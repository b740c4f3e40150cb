"""Run-history export utilities — the `utils/wandb_api.py` capability slot.

The reference pulls run scalars from the wandb API into pandas frames and
syncs offline run folders (TransUnet/utils/wandb_api.py:11-66). This
framework's primary sink is the always-on JSONL metrics stream
(train/logging.py); these helpers give the same two workflows over it:

  - get_run_data(run_dir): run history -> {metric: [(step, value), ...]}
    (+ a pandas DataFrame when pandas is importable, like the reference's
    return type).
  - export_runs_csv(run_dirs, out_csv): merge many runs into one long-format
    CSV (the "sync offline runs to one place" workflow).

When the real wandb package is importable (not in this image), `to_wandb`
replays a run's history into a live wandb run.
"""

from __future__ import annotations

import csv
import json
import os


def get_run_data(run_dir: str):
    """Run history -> {metric: [(step, value), ...]} from the run dir's JSONL
    sinks: `events.jsonl` ({tag, value, step} records, train/logging.py:40)
    and `log.jsonl` (flat per-epoch dicts, train/trainer.py)."""
    series: dict = {}
    ev = os.path.join(run_dir, "events.jsonl")
    if os.path.exists(ev):
        with open(ev) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if "tag" in rec:
                    series.setdefault(rec["tag"], []).append(
                        (rec.get("step", 0), float(rec["value"])))
    lg = os.path.join(run_dir, "log.jsonl")
    if os.path.exists(lg):
        with open(lg) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                step = rec.get("step", rec.get("epoch", 0))
                for k, v in rec.items():
                    if k in ("step", "epoch") or isinstance(v, bool) \
                            or not isinstance(v, (int, float)):
                        continue
                    series.setdefault(k, []).append((step, float(v)))
    return series


def get_run_dataframe(run_dir: str):
    """pandas DataFrame of the run history (reference get_wandb_run_data
    returns a frame); None when pandas is unavailable."""
    try:
        import pandas as pd
    except ImportError:
        return None
    series = get_run_data(run_dir)
    rows: dict = {}
    for metric, pts in series.items():
        for step, v in pts:
            rows.setdefault(step, {})[metric] = v
    return pd.DataFrame([{"step": s, **m} for s, m in sorted(rows.items())])


def export_runs_csv(run_dirs, out_csv: str):
    """Merge several runs' histories into one long-format CSV
    (run, metric, step, value) — the offline-run sync workflow."""
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["run", "metric", "step", "value"])
        for rd in run_dirs:
            name = os.path.basename(os.path.normpath(rd))
            for metric, pts in sorted(get_run_data(rd).items()):
                for step, v in pts:
                    w.writerow([name, metric, step, v])
    return out_csv


def to_wandb(run_dir: str, project: str = "micformer_tpu", **init_kwargs):
    """Replay a run's JSONL history into wandb when the package exists."""
    try:
        import wandb
    except ImportError:
        return None
    run = wandb.init(project=project, name=os.path.basename(run_dir),
                     **init_kwargs)
    series = get_run_data(run_dir)
    steps: dict = {}
    for metric, pts in series.items():
        for step, v in pts:
            steps.setdefault(step, {})[metric] = v
    for step in sorted(steps):
        run.log(steps[step], step=int(step))
    run.finish()
    return run
