"""Experiment logging: JSONL metrics stream + optional wandb.

Reference behavior: wandb runs per stage with per-batch/per-epoch metrics
and RD-curve images (train.py:36-43, step.py:107-115,188-198,
plot.py:88-93). Here the primary sink is an append-only metrics.jsonl
(machine-readable, survives preemption); wandb attaches when the package
and credentials exist.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, project: str = "epic_tpu",
                 use_wandb: bool = False, config: Optional[Dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, config=config)
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = {"t": time.time(), "step": step, **{
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()}}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, path: str, step: Optional[int] = None):
        self.log({f"image/{name}": path}, step)
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Image(path)}, step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
