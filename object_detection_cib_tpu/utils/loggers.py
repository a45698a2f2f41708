"""Metric loggers: CSV + TensorBoard + W&B + MLflow + console progress table.

Capability parity: the reference's pluggable logger set (kod/configs/
logger/*: csv, tensorboard, wandb, mlflow) and headless progress table
(kod/lightning/callbacks/progress.py:25-50). W&B/MLflow are import-guarded:
the real client is used when the package + credentials exist, otherwise the
logger degrades to a no-op with one warning (this sandbox has neither).
"""

from __future__ import annotations

import csv
import time
import warnings
from pathlib import Path
from typing import Dict, List, Optional


class CSVLogger:
    def __init__(self, save_dir: Path):
        self.dir = Path(save_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / "metrics.csv"
        self._fieldnames: Optional[List[str]] = None
        # resume-append: a pre-existing metrics.csv (ckpt_path resume) keeps
        # its rows; adopt its header so subsequent writes append
        if self.path.exists():
            with open(self.path) as fp:
                header = fp.readline().strip()
            if header:
                self._fieldnames = header.split(",")

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


class WandbLogger:
    """Weights & Biases logger (parity: kod/configs/logger/wandb.yaml).

    Import-guarded: raises ImportError at construction when the client is
    missing so build_loggers can degrade to a no-op.
    """

    def __init__(self, save_dir: Path, project: str = "kod", name: Optional[str] = None,
                 tags: Optional[list] = None, group: str = ""):
        import wandb  # not installed in this sandbox; real elsewhere

        self._run = wandb.init(
            dir=str(save_dir), project=project, name=name,
            tags=list(tags or []), group=group or None,
        )

    def log(self, metrics: Dict[str, float], step: int):
        self._run.log({k: float(v) for k, v in metrics.items()}, step=step)

    def finalize(self):
        self._run.finish()


class MLflowLogger:
    """MLflow logger (parity: kod/configs/logger/mlflow.yaml)."""

    def __init__(self, tracking_uri: str, experiment_name: str = "kod",
                 run_name: Optional[str] = None):
        import mlflow  # not installed in this sandbox; real elsewhere

        self._mlflow = mlflow
        mlflow.set_tracking_uri(tracking_uri)
        mlflow.set_experiment(experiment_name)
        self._run = mlflow.start_run(run_name=run_name)

    def log(self, metrics: Dict[str, float], step: int):
        self._mlflow.log_metrics(
            {k: float(v) for k, v in metrics.items()}, step=step
        )

    def finalize(self):
        self._mlflow.end_run()


def build_loggers(logger_cfg: Optional[dict]) -> list:
    """Instantiate loggers from the cfg.logger group (csv/tensorboard/...).

    Only process 0 gets real loggers (parity: every reference logger is
    rank-zero-guarded by Lightning; kod/lightning/logger.py:10-32).
    """
    from object_detection_cib_tpu.parallel.distributed import is_main_process

    out = []
    if not logger_cfg or not is_main_process():
        return out
    for name, sub in logger_cfg.items():
        try:
            if name == "csv":
                out.append(CSVLogger(sub["save_dir"]))
            elif name == "tensorboard":
                out.append(TensorBoardLogger(sub["save_dir"]))
            elif name == "wandb":
                out.append(
                    WandbLogger(
                        sub.get("save_dir", "."), project=sub.get("project", "kod"),
                        name=sub.get("name"), tags=sub.get("tags"),
                        group=sub.get("group", ""),
                    )
                )
            elif name == "mlflow":
                out.append(
                    MLflowLogger(
                        sub.get("tracking_uri", "file:./mlruns"),
                        experiment_name=sub.get("experiment_name", "kod"),
                        run_name=sub.get("run_name"),
                    )
                )
            else:
                out.append(NoOpLogger())
        except Exception as e:  # missing client/credentials -> warn once, no-op
            warnings.warn(f"logger '{name}' unavailable ({e!r}); using no-op")
            out.append(NoOpLogger())
    return out


class RichEpochProgress:
    """Rich live progress bar for one epoch (RichProgressBar analog)."""

    def __init__(self, epoch: int, total: int):
        from rich.progress import (
            BarColumn,
            Progress,
            TextColumn,
            TimeElapsedColumn,
        )

        self._p = Progress(
            TextColumn(f"epoch {epoch}"),
            BarColumn(),
            TextColumn("{task.completed}/{task.total}"),
            TimeElapsedColumn(),
            TextColumn("{task.fields[postfix]}"),
            transient=True,
        )
        self._p.start()
        self._task = self._p.add_task("train", total=total, postfix="")

    def advance(self, metrics: Optional[Dict[str, float]] = None):
        postfix = (
            " ".join(f"{k}={float(v):.3f}" for k, v in metrics.items())
            if metrics
            else ""
        )
        self._p.update(self._task, advance=1, postfix=postfix)

    def close(self):
        self._p.stop()


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
