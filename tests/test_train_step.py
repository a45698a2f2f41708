"""End-to-end train/eval step tests, single-device and on an 8-device mesh.

The mesh test is the TPU analog of the reference's `trainer=ddp_sim`
CPU-DDP simulation (kod/configs/trainer/ddp_sim.yaml).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# jit-compile heavy on the 1-CPU CI host: run in the slow tier
# (`pytest -m slow`); the default tier stays under 5 minutes.
pytestmark = pytest.mark.slow

from object_detection_cib_tpu.core.types import FeatureShape, default_anchors
from object_detection_cib_tpu.models.yolov5 import build_network
from object_detection_cib_tpu.parallel.mesh import make_mesh, shard_batch_pytree
from object_detection_cib_tpu.train.optim import OptimizerConfig, SmartSGD
from object_detection_cib_tpu.train.steps import (
    Batch,
    create_train_state,
    jit_eval_step,
    jit_train_step,
    make_eval_step,
    make_train_step,
    create_train_state,
)

IMG = 64
NC = 5


def _make_batch(B, T=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.random((B, IMG, IMG, 3)).astype(np.float32)
    # a couple of valid boxes per image
    boxes = np.zeros((B, T, 4), np.float32)
    labels = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), bool)
    for b in range(B):
        for t in range(2):
            x, y = rng.uniform(5, 40, 2)
            w, h = rng.uniform(8, 20, 2)
            boxes[b, t] = [x, y, x + w, y + h]
            labels[b, t] = rng.integers(0, NC)
            mask[b, t] = True
    return Batch(
        images=jnp.asarray(images),
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray(labels),
        mask=jnp.asarray(mask),
    )


@pytest.fixture(scope="module")
def setup():
    net = build_network(NC, "n")
    anchors = default_anchors()
    shape = FeatureShape(IMG, IMG)
    opt = SmartSGD(OptimizerConfig(max_epochs=10), steps_per_epoch=10)
    state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    step = make_train_step(net, anchors, shape, opt)
    return net, anchors, shape, opt, state, step


def test_train_step_runs_and_loss_decreases(setup):
    net, anchors, shape, opt, state, step = setup
    jstep = jax.jit(step, donate_argnums=())
    batch = _make_batch(2)
    losses = []
    for _ in range(8):
        state, metrics = jstep(state, batch)
        losses.append(float(metrics.total))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses  # overfits a fixed batch
    assert int(state.step) == 8


def test_metrics_components_finite(setup):
    net, anchors, shape, opt, state, step = setup
    _, m = jax.jit(step)(state, _make_batch(2))
    for v in [m.box, m.obj, m.cls, m.lr]:
        assert np.isfinite(float(v))


def test_mesh_train_step_matches_single_device(setup):
    net, anchors, shape, opt, state, step = setup
    batch = _make_batch(8, seed=1)

    # single device reference
    s1, m1 = jax.jit(step)(state, batch)

    # 8-device data-parallel mesh
    mesh = make_mesh()
    assert mesh.devices.size == 8
    jstep = jit_train_step(step, mesh)
    sharded = shard_batch_pytree(batch, mesh)
    # deep-copy state to avoid donation invalidating the fixture's buffers
    state2 = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
    s8, m8 = jstep(state2, sharded)

    assert float(m8.total) == pytest.approx(float(m1.total), rel=2e-3)
    # params must agree after one update (global BN stats + psum grads)
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    worst = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(l1, l8)
    )
    assert worst < 5e-4, worst


def test_eval_step(setup):
    net, anchors, shape, opt, state, step = setup
    eval_step = make_eval_step(net, anchors, max_nms=256, max_det=20)
    res = jax.jit(eval_step)(state.params, state.batch_stats, _make_batch(2).images)
    assert res.boxes.shape == (2, 20, 4)
    assert res.num_valid.shape == (2,)


def test_eval_step_on_mesh(setup):
    net, anchors, shape, opt, state, step = setup
    mesh = make_mesh()
    eval_step = make_eval_step(net, anchors, max_nms=128, max_det=10)
    jes = jit_eval_step(eval_step, mesh)
    images = shard_batch_pytree(_make_batch(8).images, mesh)
    res = jes(state.params, state.batch_stats, images)
    assert res.boxes.shape == (8, 10, 4)


@pytest.mark.parametrize("policy", ["conv_out", "conv_out_bn_stats", "nothing"])
def test_remat_policy_equivalence(setup, policy):
    """remat recompute must not change the step's math (same grads/params).

    remat_policy trades HBM activation traffic for recompute FLOPs
    (ROOFLINE.md); it must be a pure scheduling change.
    """
    net, anchors, shape, opt, state, step = setup
    batch = _make_batch(2, seed=7)
    base_state, base_m = jax.jit(step, donate_argnums=())(state, batch)
    rstep = make_train_step(net, anchors, shape, opt, remat_policy=policy)
    new_state, new_m = jax.jit(rstep, donate_argnums=())(state, batch)
    np.testing.assert_allclose(
        float(base_m.total), float(new_m.total), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(base_state.params), jax.tree.leaves(new_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
    for a, b in zip(
        jax.tree.leaves(base_state.batch_stats),
        jax.tree.leaves(new_state.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
