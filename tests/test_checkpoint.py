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


def test_background_save_reads_snapshot_not_live_state(tmp_path, state):
    """save_last must persist the values AT SAVE TIME even if the caller's
    live buffers are overwritten right after (the trainer donates
    self.state to the next epoch while the writer fetches a device-side
    snapshot — see Trainer._state_snapshot)."""
    snap_jit = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    snap = snap_jit(state)
    # snapshot is a different set of buffers with identical contents
    for a, b in zip(jax.tree.leaves(snap), jax.tree.leaves(state)):
        assert a is not b
    assert _trees_equal(snap, state)

    cm = CheckpointManager(tmp_path / "ck")
    cm.save_last(snap)
    # simulate the donation: clobber the snapshot's SOURCE immediately;
    # the background writer must still see the snapshot's values
    mutated = jax.tree.map(lambda x: x * 0 - 1, state)
    jax.block_until_ready(mutated)
    cm.wait_until_finished()
    restored = cm.restore(jax.tree.map(jnp.zeros_like, state), "last")
    assert _trees_equal(restored, state)


def test_background_save_queues_in_order(tmp_path, state):
    """Two quick saves: the second drains the first; final on-disk 'last'
    is the second state."""
    cm = CheckpointManager(tmp_path / "ck")
    s2 = jax.tree.map(lambda x: x + 1, state)
    cm.save_last(state)
    cm.save_last(s2)
    cm.wait_until_finished()
    restored = cm.restore(jax.tree.map(jnp.zeros_like, state), "last")
    assert _trees_equal(restored, s2)
