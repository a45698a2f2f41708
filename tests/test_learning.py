"""Learning-signal test: overfitting a tiny synthetic set must lift mAP
well above zero. This validates assignment, loss, optimizer, decode, NMS,
and mAP evaluation working together end-to-end (marked slow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.core.types import FeatureShape, default_anchors
from object_detection_cib_tpu.eval.coco_map import MeanAveragePrecisionEvaluator
from object_detection_cib_tpu.models.yolov5 import build_network
from object_detection_cib_tpu.train.optim import OptimizerConfig, SmartSGD, WarmupParams
from object_detection_cib_tpu.train.steps import (
    Batch,
    create_train_state,
    make_eval_step,
    make_train_step,
)

IMG = 96
NC = 3


def _make_batch(B=8, T=6, seed=0):
    """Colored-rectangle detection task: class = color."""
    rng = np.random.default_rng(seed)
    colors = np.asarray([[220, 40, 40], [40, 220, 40], [40, 40, 220]], np.float32)
    images = rng.uniform(0.3, 0.6, (B, IMG, IMG, 3)).astype(np.float32)
    boxes = np.zeros((B, T, 4), np.float32)
    labels = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), bool)
    for b in range(B):
        for t in range(3):
            w, h = rng.integers(20, 45, 2)
            x = rng.integers(0, IMG - w)
            y = rng.integers(0, IMG - h)
            c = int(rng.integers(0, NC))
            images[b, y : y + h, x : x + w] = colors[c] / 255.0
            boxes[b, t] = [x, y, x + w, y + h]
            labels[b, t] = c
            mask[b, t] = True
    return Batch(
        images=jnp.asarray(images),
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray(labels),
        mask=jnp.asarray(mask),
    )


@pytest.mark.slow
def test_overfit_lifts_map():
    anchors = default_anchors()
    shape = FeatureShape(IMG, IMG)
    net = build_network(NC, "n")
    # no warmup: nw floors at 100 steps (ref exp.py:167-173) and would eat
    # most of this short run
    steps = 300
    opt = SmartSGD(
        OptimizerConfig(lr0=0.01, max_epochs=100, warmup=None),
        steps_per_epoch=10,
    )
    state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    train_step = jax.jit(make_train_step(net, anchors, shape, opt))
    eval_step = jax.jit(
        make_eval_step(net, anchors, conf_thres=0.01, max_nms=512, max_det=50)
    )
    batch = _make_batch()

    first_loss = None
    for i in range(steps):
        state, m = train_step(state, batch)
        if first_loss is None:
            first_loss = float(m.total)
    last_loss = float(m.total)
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)

    res = eval_step(state.params, state.batch_stats, batch.images)
    ev = MeanAveragePrecisionEvaluator(NC, ious=(0.5,))
    ev.add_batch(res, batch.boxes, batch.labels, batch.mask)
    m50 = ev.get_report()["mAP_50"]
    assert m50 > 0.5, f"overfit mAP50 = {m50}"
