"""Orbax checkpoint round-trip + best-metric tracking tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.core.types import FeatureShape
from object_detection_cib_tpu.models.yolov5 import build_network
from object_detection_cib_tpu.train.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
)
from object_detection_cib_tpu.train.optim import OptimizerConfig, SmartSGD
from object_detection_cib_tpu.train.steps import create_train_state


@pytest.fixture(scope="module")
def state():
    net = build_network(3, "n")
    opt = SmartSGD(OptimizerConfig(max_epochs=10), steps_per_epoch=10)
    return create_train_state(net, jax.random.PRNGKey(0), FeatureShape(64, 64), opt)


def _trees_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_save_restore_roundtrip(tmp_path, state):
    cm = CheckpointManager(tmp_path / "ck")
    cm.save_last(state)
    zeroed = jax.tree.map(jnp.zeros_like, state)
    restored = cm.restore(zeroed, "last")
    assert _trees_equal(restored, state)
    # explicit-path restore (the ckpt_path flag)
    restored2 = restore_checkpoint(tmp_path / "ck" / "last", zeroed)
    assert _trees_equal(restored2, state)


def test_best_tracking(tmp_path, state):
    cm = CheckpointManager(tmp_path / "ck", monitor="map", mode="max")
    assert cm.maybe_save_best(state, {"map": 0.3})
    assert not cm.maybe_save_best(state, {"map": 0.2})
    assert cm.maybe_save_best(state, {"map": 0.5})
    assert cm.best_value == 0.5
    # persistence of best metric across manager instances
    cm2 = CheckpointManager(tmp_path / "ck", monitor="map", mode="max")
    assert cm2.best_value == 0.5
    assert not cm2.maybe_save_best(state, {"map": 0.4})


def test_missing_monitor_ignored(tmp_path, state):
    cm = CheckpointManager(tmp_path / "ck")
    assert not cm.maybe_save_best(state, {"loss": 1.0})
