"""sampler_debug correctness + early-stopping knob parity.

sampler_debug (ref kod/lightning/callbacks/sampler_debug.py:34-77 counts
instances from the batches actually trained on): the dump must describe the
epoch that was trained, and enabling the flag must not perturb the sampler
RNG / training stream (the round-3 bug re-drew a fresh epoch per dump).

early stopping (ref kod/configs/callbacks/early_stopping.yaml ->
lightning EarlyStopping): monitor / patience / mode / min_delta /
check_finite semantics.
"""

from pathlib import Path

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from object_detection_cib_tpu.config import compose
from object_detection_cib_tpu.train.trainer import Trainer

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def _fused_cfg(tmp_path, sub, *extra):
    """Fused device-pipeline run with a seeded class-aware sampler."""
    return compose(
        CONFIG_DIR,
        overrides=[
            "experiment=imbalance/class_aware/default",
            "dataset_name=fake",
            "data.fake_mode=True",
            "data.batch_size=8",
            "data.target_image_size=64",
            "data.max_targets=40",
            "data.num_workers=2",
            "data.pipeline=device",
            "data.device_cache=True",
            "+data.sampler.seed=7",
            "model.net.widen_factor=0.25",
            "model.net.deepen_factor=0.34",
            f"paths.output_dir={tmp_path}/{sub}",
            f"callbacks.model_checkpoint.dirpath={tmp_path}/{sub}/ck",
            "callbacks.model_checkpoint.every_n_epochs=2",
            "logger=csv",
            f"logger.csv.save_dir={tmp_path}/{sub}/csv",
            "trainer.max_epochs=4",
            "trainer.check_val_every_n_epoch=4",
            "seed=11",
            *extra,
        ],
    )


def _counts_from_indices(train_info, idx):
    counts = {c: 0 for c in train_info.classes}
    for i in np.asarray(idx):
        for t in train_info.samples[int(i)].targets:
            counts[t.class_name] += 1
    return counts


def test_sampler_debug_counts_match_trained_epochs(tmp_path, monkeypatch):
    """Dumped per-class counts equal the plan each epoch actually consumed —
    including under dispatch-ahead, where epoch k+1's plan is drawn before
    epoch k's dump (the FIFO must not skew)."""
    from object_detection_cib_tpu.data.device_pipeline import (
        DeviceDataPipeline,
    )

    captured = []
    orig = DeviceDataPipeline._epoch_plan

    def spy(self):
        groups, secs, keys = orig(self)
        captured.append(np.concatenate([groups.ravel(), secs.ravel()]))
        return groups, secs, keys

    monkeypatch.setattr(DeviceDataPipeline, "_epoch_plan", spy)

    cfg = _fused_cfg(tmp_path, "dump", "callbacks.sampler_debug=True")
    t = Trainer(cfg)
    t.fit()

    assert len(captured) >= 4
    for epoch in range(4):
        f = Path(f"{tmp_path}/dump/sampler_stats_epoch{epoch}.json")
        assert f.exists(), f"missing dump for epoch {epoch}"
        dumped = json.loads(f.read_text())
        expect = _counts_from_indices(t.train_info, captured[epoch])
        assert dumped == expect, f"epoch {epoch} counts diverge"


def test_sampler_debug_flag_is_inert(tmp_path):
    """Params after fit() are bitwise identical with the flag on vs off:
    the dump must never advance the sampler RNG (round-3 regression)."""
    import jax

    t_on = Trainer(_fused_cfg(tmp_path, "on", "callbacks.sampler_debug=True"))
    t_on.fit()
    t_off = Trainer(_fused_cfg(tmp_path, "off"))
    t_off.fit()
    for la, lb in zip(
        jax.tree.leaves(t_on.state.params), jax.tree.leaves(t_off.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_sampler_debug_host_pipeline(tmp_path):
    """Host (parity) pipeline path: dump exists and matches the primary
    epoch indices the Prefetcher consumed."""
    cfg = compose(
        CONFIG_DIR,
        overrides=[
            "experiment=imbalance/class_aware/default",
            "dataset_name=fake",
            "data.fake_mode=True",
            "data.batch_size=8",
            "data.target_image_size=64",
            "data.max_targets=40",
            "data.num_workers=2",
            "+data.sampler.seed=7",
            "model.net.widen_factor=0.25",
            "model.net.deepen_factor=0.34",
            f"paths.output_dir={tmp_path}/host",
            f"callbacks.model_checkpoint.dirpath={tmp_path}/host/ck",
            "callbacks.sampler_debug=True",
            "logger=csv",
            f"logger.csv.save_dir={tmp_path}/host/csv",
            "trainer.max_epochs=1",
            "seed=11",
        ],
    )
    t = Trainer(cfg)
    t.fit()
    f = Path(f"{tmp_path}/host/sampler_stats_epoch0.json")
    assert f.exists()
    dumped = json.loads(f.read_text())
    assert sum(dumped.values()) > 0
    # the recorded plan was popped by the dump; replaying the same seeded
    # sampler reproduces it (ClassAwareSampler is deterministic per seed)
    from object_detection_cib_tpu.data.samplers import ClassAwareSampler

    ref = ClassAwareSampler(t.train_info, seed=7)
    idx = ref.epoch_indices()[: (len(t.train_info.samples) // 8) * 8]
    assert dumped == _counts_from_indices(t.train_info, idx)


# ---------------------------------------------------------------------------
# early stopping
# ---------------------------------------------------------------------------


def _es_trainer(tmp_path, sub, values, monkeypatch, *es_overrides):
    """Tiny trainer whose validate() replays a scripted metric sequence and
    whose train_step is a no-op (the test targets the fit-loop ES logic)."""
    cfg = compose(
        CONFIG_DIR,
        overrides=[
            "experiment=yv5n",
            "dataset_name=fake",
            "data.fake_mode=True",
            "data.batch_size=8",
            "data.target_image_size=64",
            "data.max_targets=40",
            "data.num_workers=2",
            "model.net.widen_factor=0.25",
            f"paths.output_dir={tmp_path}/{sub}",
            f"callbacks.model_checkpoint.dirpath={tmp_path}/{sub}/ck",
            "logger=csv",
            f"logger.csv.save_dir={tmp_path}/{sub}/csv",
            f"trainer.max_epochs={len(values)}",
            "seed=3",
            *es_overrides,
        ],
    )
    t = Trainer(cfg)
    from object_detection_cib_tpu.train.steps import StepMetrics

    zero = StepMetrics(
        *([np.float32(0.0)] * len(StepMetrics._fields))
    )
    # train_step is an instance attribute (jitted closure): patch on t
    monkeypatch.setattr(t, "train_step", lambda state, batch: (state, zero))
    seen = []

    def fake_validate():
        seen.append(len(seen))
        return {"map": float(values[len(seen) - 1])}

    monkeypatch.setattr(t, "validate", fake_validate)
    return t, seen


def test_early_stopping_patience_max_mode(tmp_path, monkeypatch):
    vals = [0.5, 0.4, 0.4, 0.4, 0.9, 0.9]
    t, seen = _es_trainer(
        tmp_path, "max", vals, monkeypatch,
        "callbacks=early_stopping",
        "callbacks.early_stopping.patience=3",
    )
    t.fit()
    # epochs 1,2,3 fail to improve on 0.5 -> stop after the 4th check
    assert len(seen) == 4


def test_early_stopping_min_delta(tmp_path, monkeypatch):
    # improvements smaller than min_delta do not reset patience
    vals = [0.5, 0.52, 0.54, 0.56, 0.9]
    t, seen = _es_trainer(
        tmp_path, "mindelta", vals, monkeypatch,
        "callbacks=early_stopping",
        "callbacks.early_stopping.patience=2",
        "callbacks.early_stopping.min_delta=0.1",
    )
    t.fit()
    assert len(seen) == 3  # 0.52, 0.54 are not >0.5+0.1 -> stop at check 3


def test_early_stopping_min_mode(tmp_path, monkeypatch):
    # mode=min: decreasing metric is improvement; increase exhausts patience
    vals = [0.5, 0.4, 0.6, 0.6, 0.3, 0.3]
    t, seen = _es_trainer(
        tmp_path, "min", vals, monkeypatch,
        "callbacks=early_stopping",
        "callbacks.early_stopping.patience=2",
        "callbacks.early_stopping.mode=min",
    )
    t.fit()
    assert len(seen) == 4  # 0.6,0.6 after best 0.4 -> stop


def test_early_stopping_check_finite(tmp_path, monkeypatch):
    vals = [0.5, float("nan"), 0.9, 0.9]
    t, seen = _es_trainer(
        tmp_path, "finite", vals, monkeypatch,
        "callbacks=early_stopping",
        "callbacks.early_stopping.patience=10",
        "callbacks.early_stopping.check_finite=True",
    )
    t.fit()
    assert len(seen) == 2  # NaN stops immediately regardless of patience


def test_early_stopping_drains_async_checkpoint(tmp_path, monkeypatch):
    """The early-stop exit must leave a complete 'last' checkpoint on disk
    (saves are async; the exit path drains before returning)."""
    vals = [0.5, 0.4, 0.4]
    t, seen = _es_trainer(
        tmp_path, "drain", vals, monkeypatch,
        "callbacks=early_stopping",
        "callbacks.early_stopping.patience=2",
    )
    drained = []
    orig_wait = type(t.ckpt).wait_until_finished
    monkeypatch.setattr(
        type(t.ckpt), "wait_until_finished",
        lambda self: (drained.append(1), orig_wait(self))[1],
    )
    t.fit()
    assert len(seen) == 3
    assert drained, "early-stop return skipped the async-save drain"
    from object_detection_cib_tpu.train.checkpoint import restore_checkpoint

    restored = restore_checkpoint(f"{tmp_path}/drain/ck/last", t.state)
    assert restored is not None
