"""Metric logging behind a thin interface.

Keeps the reference's wandb surface (project 'thermal-3d-vision', metric names
batch_loss/learning_rate/global_step/train_loss/val_loss/basic_loss/…,
train_thermal_dustr.py:63-65,296-303,374-378) so existing dashboards carry
over, but degrades to stdout when wandb is unavailable or disabled.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, project: str = "thermal-3d-vision", run_name: Optional[str] = None,
                 config: Optional[dict] = None, use_wandb: bool = True,
                 log_file: Optional[str] = None):
        self._wandb = None
        self._file = open(log_file, "a") if log_file else None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, config=config or {}, name=run_name)
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, float]):
        metrics = {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
                   for k, v in metrics.items()}
        if self._wandb is not None:
            self._wandb.log(metrics)
        if self._file is not None:
            self._file.write(json.dumps({"t": time.time(), **metrics}) + "\n")
            self._file.flush()

    def log_images(self, tag: str, images: Dict[str, "object"]):
        if self._wandb is not None:
            self._wandb.log({f"{tag}/{k}": self._wandb.Image(v) for k, v in images.items()})

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._file is not None:
            self._file.close()
