"""Orbax checkpointing of TrainState + best-metric tracking.

Capability parity: Lightning ModelCheckpoint as configured by the reference
(kod/configs/callbacks/model_checkpoint.yaml: monitor 'map', mode max,
save_top_k 1, save_last) and ckpt_path resume/eval
(kod/lightning/tasks/trainer.py:120-138). TPU-native: async Orbax saves of
the full replicated TrainState (params, BN stats, momentum buffers, step).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from object_detection_cib_tpu.train.steps import TrainState


class CheckpointManager:
    def __init__(self, directory: Path, monitor: str = "map", mode: str = "max"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best_value: Optional[float] = None
        self._ckpt = ocp.StandardCheckpointer()
        self._meta_path = self.directory / "meta.json"
        if self._meta_path.exists():
            meta = json.loads(self._meta_path.read_text())
            self.best_value = meta.get("best_value")

    def _save(self, name: str, state: TrainState):
        # Truly async: the save runs on orbax's background thread and
        # overlaps the next training epoch. The wait happens *before* the
        # next save (orbax forbids overlapping saves on one checkpointer,
        # and force=True deletes the destination first) — by which point
        # the previous save has long finished, so the epoch path never
        # blocks on serialization. wait_until_finished() is exposed for
        # restore/end-of-fit.
        self._ckpt.wait_until_finished()
        path = self.directory / name
        self._ckpt.save(path, state, force=True)

    def wait_until_finished(self):
        self._ckpt.wait_until_finished()

    def save_last(self, state: TrainState):
        self._save("last", state)

    def maybe_save_best(self, state: TrainState, metrics: dict) -> bool:
        value = metrics.get(self.monitor)
        if value is None:
            return False
        better = (
            self.best_value is None
            or (self.mode == "max" and value > self.best_value)
            or (self.mode == "min" and value < self.best_value)
        )
        if better:
            self.best_value = float(value)
            self._save("best", state)
            # orbax coordinates the array save across hosts; the sidecar
            # metadata is a plain file -> write once (process 0)
            if jax.process_index() == 0:
                self._meta_path.write_text(
                    json.dumps(
                        {"best_value": self.best_value, "monitor": self.monitor}
                    )
                )
        return better

    def restore(self, state_like: TrainState, name: str = "last") -> TrainState:
        self._ckpt.wait_until_finished()
        path = self.directory / name
        return self._ckpt.restore(path, target=state_like)


def restore_checkpoint(path: Path, state_like: TrainState) -> TrainState:
    """Restore from an explicit checkpoint dir (the ckpt_path flag)."""
    return ocp.StandardCheckpointer().restore(
        Path(path).absolute(), target=state_like
    )
