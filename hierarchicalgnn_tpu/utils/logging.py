"""Metric logging: JSONL run logs with a wandb-compatible surface.

The reference logs through Lightning's ``self.log``/``log_dict`` into
Weights & Biases (reference ``Notebooks/script.py:31``,
``bipartite_classification_base.py:215-222``).  Here a ``MetricLogger``
appends JSON lines to the run directory and mirrors periodic summaries to
stdout; a wandb backend can be slotted in where available (zero-egress
environments fall back to files automatically).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any


class MetricLogger:
    def __init__(self, run_dir: str, log_every_n_steps: int = 50,
                 stream=None, wandb_project: str | None = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._file = open(self.path, "a")
        self.log_every_n_steps = log_every_n_steps
        self.stream = stream or sys.stdout
        self._start = time.time()
        self._wandb = None
        if wandb_project:
            try:
                import wandb
                self._wandb = wandb.init(project=wandb_project,
                                         dir=run_dir, resume="allow")
            except Exception:
                # zero-egress or wandb absent: JSONL remains the record
                self._wandb = None

    def log(self, metrics: dict[str, Any], step: int, epoch: int | None = None,
            prefix: str = "", force_print: bool = False):
        record = {"step": int(step), "time": time.time() - self._start}
        if epoch is not None:
            record["epoch"] = int(epoch)
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            try:
                record[key] = float(v)
            except (TypeError, ValueError):
                record[key] = v
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items()
                             if isinstance(v, (int, float))}, step=int(step))
        if force_print or (self.log_every_n_steps
                           and step % self.log_every_n_steps == 0):
            parts = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                             for k, v in record.items() if k != "time")
            print(parts, file=self.stream, flush=True)

    def close(self):
        self._file.close()
