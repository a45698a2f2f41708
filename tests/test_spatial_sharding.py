"""DP x SP (spatial) sharding equivalence: full train step on a (4, 2) mesh
with images sharded over (data, model) must match single-device training.

Spatial sharding = the detector analog of sequence parallelism (SURVEY.md
§5.7): XLA GSPMD inserts conv halo exchanges; head outputs are constrained
to data-only sharding before the loss (see make_train_step.head_sharding).
Uses 256px input so every feature map keeps >= 2 rows per model shard
(degenerate 1-row shards exercise GSPMD halo edge cases).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from object_detection_cib_tpu.core.types import FeatureShape, default_anchors
from object_detection_cib_tpu.models.yolov5 import build_network
from object_detection_cib_tpu.parallel.mesh import make_mesh
from object_detection_cib_tpu.train.optim import OptimizerConfig, SmartSGD
from object_detection_cib_tpu.train.steps import (
    Batch,
    create_train_state,
    jit_train_step,
    make_train_step,
)

IMG, NC = 256, 5


def _make_batch(B, T=8, seed=1):
    rng = np.random.default_rng(seed)
    images = rng.random((B, IMG, IMG, 3)).astype(np.float32)
    boxes = np.zeros((B, T, 4), np.float32)
    labels = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), bool)
    for b in range(B):
        for t in range(2):
            x, y = rng.uniform(5, IMG - 80, 2)
            w, h = rng.uniform(20, 70, 2)
            boxes[b, t] = [x, y, x + w, y + h]
            labels[b, t] = rng.integers(0, NC)
            mask[b, t] = True
    return Batch(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(mask),
    )


@pytest.mark.slow
def test_dp_sp_matches_single_device():
    net = build_network(NC, "n")
    shape = FeatureShape(IMG, IMG)
    opt = SmartSGD(OptimizerConfig(max_epochs=10), steps_per_epoch=10)
    state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    anchors = default_anchors()
    batch = _make_batch(8)

    s1, m1 = jax.jit(make_train_step(net, anchors, shape, opt))(state, batch)

    mesh = make_mesh(num_data=4, num_model=2)
    head_sh = NamedSharding(mesh, P("data"))
    step_sp = make_train_step(net, anchors, shape, opt, head_sharding=head_sh)
    jstep = jit_train_step(step_sp, mesh, spatial=True)
    img_sh = NamedSharding(mesh, P("data", "model"))
    data_sh = NamedSharding(mesh, P("data"))
    b2 = Batch(
        jax.device_put(batch.images, img_sh),
        jax.device_put(batch.boxes, data_sh),
        jax.device_put(batch.labels, data_sh),
        jax.device_put(batch.mask, data_sh),
    )
    state2 = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
    s2, m2 = jstep(state2, b2)

    assert float(m2.total) == pytest.approx(float(m1.total), rel=1e-5)
    worst = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params))
    )
    assert worst < 1e-4, worst


def test_spatial_guard_rejects_thin_shards():
    """H=128 over model=2 leaves the stride-32 level with 2 rows/shard
    (boundary: allowed); H=64 leaves 1 row/shard (rejected with the mesh
    math in the message); H=96 is non-divisible at stride-32 (rejected)."""
    net = build_network(NC, "n")
    opt = SmartSGD(OptimizerConfig(max_epochs=10), steps_per_epoch=10)
    mesh = make_mesh(num_data=4, num_model=2)
    head_sh = NamedSharding(mesh, P("data"))

    def make(img):
        shape = FeatureShape(img, img)
        step = make_train_step(net, default_anchors(), shape, opt,
                               head_sharding=head_sh)
        jstep = jit_train_step(step, mesh, spatial=True)
        state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
        rng = np.random.default_rng(0)
        batch = Batch(
            jnp.asarray(rng.random((8, img, img, 3), np.float32)),
            jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]] * 8),
            jnp.zeros((8, 1), jnp.int32),
            jnp.ones((8, 1), bool),
        )
        return jstep, state, batch

    for bad in (64, 96):
        jstep, state, batch = make(bad)
        with pytest.raises(ValueError, match="rows per shard"):
            jstep(state, batch)

    # boundary case passes the guard (trace-time check; the full
    # compile+run of this program lives in the slow tier — it alone cost
    # ~70 s of the fast tier's 5-minute budget on the 1-core CI host)
    jstep, state, batch = make(128)
    jax.eval_shape(jstep, state, batch)


@pytest.mark.slow
def test_spatial_boundary_shard_runs():
    """The 2-rows-per-shard boundary program actually compiles and runs."""
    net = build_network(NC, "n")
    opt = SmartSGD(OptimizerConfig(max_epochs=10), steps_per_epoch=10)
    mesh = make_mesh(num_data=4, num_model=2)
    head_sh = NamedSharding(mesh, P("data"))
    shape = FeatureShape(128, 128)
    step = make_train_step(net, default_anchors(), shape, opt,
                           head_sharding=head_sh)
    jstep = jit_train_step(step, mesh, spatial=True)
    state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    rng = np.random.default_rng(0)
    batch = Batch(
        jnp.asarray(rng.random((8, 128, 128, 3), np.float32)),
        jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]] * 8),
        jnp.zeros((8, 1), jnp.int32),
        jnp.ones((8, 1), bool),
    )
    _, metrics = jstep(state, batch)
    assert np.isfinite(float(metrics.total))
