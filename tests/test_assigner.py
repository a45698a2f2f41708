"""Golden tests for the fixed-shape YOLOv5 label assigner.

Expectations hand-derived from the reference algorithm
(kod/core/label_assignment/yv5.py:207-296): grid-unit conversion, wh-ratio
anchor gate, and the 0.5-offset neighbour-cell expansion.
"""

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_cib_tpu.core.assigner import assign_targets
from object_detection_cib_tpu.core.types import (
    AnchorBoxInfo,
    FeatureShape,
    LevelAnchors,
)


def _single_level_anchors(anchor_wh_px=(16, 16)):
    fs = FeatureShape
    a = AnchorBoxInfo(stride=8, boxes_wh=[fs(*anchor_wh_px)])
    # use the same tiny anchor set at all three strides; tests inspect ll only
    return LevelAnchors(
        ll=a,
        ml=AnchorBoxInfo(stride=16, boxes_wh=[fs(*anchor_wh_px)]),
        hl=AnchorBoxInfo(stride=32, boxes_wh=[fs(*anchor_wh_px)]),
    )


def _assign_one(cx, cy, w, h, anchors=None, img=64):
    boxes = jnp.asarray(
        [[[cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]]], jnp.float32
    )
    labels = jnp.asarray([[3]], jnp.int32)
    mask = jnp.asarray([[True]])
    return assign_targets(
        boxes, labels, mask, FeatureShape(img, img), anchors or _single_level_anchors()
    )


def _valid_matches(level):
    v = np.asarray(level.valid)
    return {
        "n": int(v.sum()),
        "cells": set(
            zip(
                np.asarray(level.grid_x)[v].tolist(),
                np.asarray(level.grid_y)[v].tolist(),
            )
        ),
        "txywh": np.asarray(level.txywh)[v],
        "labels": np.asarray(level.labels)[v],
        "anchors": np.asarray(level.anchors_wh)[v],
    }


def test_center_of_cell_only_base_offset():
    # center (20,20)px -> grid (2.5,2.5): frac=0.5 disables all neighbours
    res = _assign_one(20, 20, 16, 16)
    m = _valid_matches(res.ll)
    assert m["n"] == 1
    assert m["cells"] == {(2, 2)}
    np.testing.assert_allclose(m["txywh"][0], [0.5, 0.5, 2.0, 2.0], atol=1e-5)
    assert m["labels"][0] == 3
    np.testing.assert_allclose(m["anchors"][0], [2.0, 2.0])


def test_neighbour_cells_left_and_down():
    # grid center (2.3, 2.7): j (left-of-center) and m (below-inverse) fire
    res = _assign_one(2.3 * 8, 2.7 * 8, 16, 16)
    m = _valid_matches(res.ll)
    assert m["n"] == 3
    assert m["cells"] == {(2, 2), (1, 2), (2, 3)}


def test_neighbour_cells_right_and_up():
    # grid center (2.7, 2.3): inverse-x (l) and y (k) fire
    res = _assign_one(2.7 * 8, 2.3 * 8, 16, 16)
    m = _valid_matches(res.ll)
    assert m["n"] == 3
    assert m["cells"] == {(2, 2), (3, 2), (2, 1)}


def test_edge_guard_no_neighbour_below_one():
    # grid center (0.3, 0.3): gx<1 suppresses j/k; inv far from boundary
    res = _assign_one(0.3 * 8, 0.3 * 8, 16, 16)
    m = _valid_matches(res.ll)
    assert m["n"] == 1
    assert m["cells"] == {(0, 0)}


def test_anchor_ratio_filter():
    # gt w=160px -> 20 grid vs anchor 2 grid: ratio 10 >= 4 -> rejected
    res = _assign_one(32, 32, 160, 16)
    assert int(np.asarray(res.ll.valid).sum()) == 0
    # boundary: ratio just below threshold passes
    res = _assign_one(32, 32, 16 * 3.9, 16 * 3.9)
    assert int(np.asarray(res.ll.valid).sum()) >= 1


def test_padding_mask_respected():
    boxes = jnp.zeros((2, 5, 4), jnp.float32)
    labels = jnp.zeros((2, 5), jnp.int32)
    mask = jnp.zeros((2, 5), bool)
    res = assign_targets(
        boxes, labels, mask, FeatureShape(64, 64), _single_level_anchors()
    )
    for lvl in res.levels():
        assert int(np.asarray(lvl.valid).sum()) == 0


def test_multi_anchor_and_sample_indices():
    fs = FeatureShape
    anchors = LevelAnchors(
        ll=AnchorBoxInfo(stride=8, boxes_wh=[fs(16, 16), fs(160, 160)]),
        ml=AnchorBoxInfo(stride=16, boxes_wh=[fs(16, 16)]),
        hl=AnchorBoxInfo(stride=32, boxes_wh=[fs(16, 16)]),
    )
    # sample 0: 16px box matches anchor 0 only; sample 1: 120px box matches
    # anchor 1 only (ratios: vs a0 = 7.5 fail, vs a1 = 1.33 pass)
    boxes = jnp.asarray(
        [
            [[12.0, 12.0, 28.0, 28.0]],
            [[0.0, 0.0, 120.0, 120.0]],
        ]
    )
    labels = jnp.asarray([[1], [2]], jnp.int32)
    mask = jnp.ones((2, 1), bool)
    res = assign_targets(boxes, labels, mask, FeatureShape(64, 64), anchors)
    v = np.asarray(res.ll.valid)
    samples = np.asarray(res.ll.sample_idx)[v]
    anchors_idx = np.asarray(res.ll.anchor_idx)[v]
    for s, a in zip(samples, anchors_idx):
        assert (s, a) in [(0, 0), (1, 1)]
    assert set(samples.tolist()) == {0, 1}


def test_jit_and_shapes_static():
    anchors = _single_level_anchors()
    f = jax.jit(
        lambda b, l, m: assign_targets(b, l, m, FeatureShape(64, 64), anchors)
    )
    boxes = jnp.zeros((2, 7, 4))
    res = f(boxes, jnp.zeros((2, 7), jnp.int32), jnp.zeros((2, 7), bool))
    K = 2 * 7 * 1 * 3  # default offset capacity is the compacted 3-slot form
    assert res.ll.sample_idx.shape == (K,)
    assert res.ll.txywh.shape == (K, 4)


def test_compact_assignment_preserves_loss():
    """Compacted table (valid-first stable sort, truncated) yields the
    identical loss + gradient whenever n_valid <= cap."""
    from object_detection_cib_tpu.core.assigner import compact_level_assignment
    from object_detection_cib_tpu.core.types import default_anchors
    from object_detection_cib_tpu.models.yolov5 import DetectionHeadResult, Yolov5NetworkResult
    from object_detection_cib_tpu.train.loss import yolov5_loss
    from object_detection_cib_tpu.core.assigner import Assignment

    rng = np.random.default_rng(3)
    B, T, nc, img = 3, 9, 6, 64
    boxes = np.zeros((B, T, 4), np.float32)
    labels = rng.integers(0, nc, (B, T)).astype(np.int32)
    mask = np.zeros((B, T), bool)
    for b in range(B):
        for t in range(rng.integers(2, T)):
            x, y = rng.uniform(2, img - 30, 2)
            w, h = rng.uniform(6, 24, 2)
            boxes[b, t] = [x, y, x + w, y + h]
            mask[b, t] = True
    anchors = default_anchors()
    fs = FeatureShape(img, img)
    assignment = assign_targets(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask), fs, anchors
    )
    cap = 64 * B
    compacted = Assignment(
        *(compact_level_assignment(lv, cap) for lv in assignment.levels())
    )
    for lv, cv in zip(assignment.levels(), compacted.levels()):
        n_valid = int(np.asarray(lv.valid).sum())
        assert n_valid <= cap
        assert int(np.asarray(cv.valid).sum()) == n_valid
        # compacted valid block equals the valid subset, in original order
        ov = np.asarray(lv.valid)
        for field in ("sample_idx", "anchor_idx", "grid_y", "grid_x", "labels"):
            np.testing.assert_array_equal(
                np.asarray(getattr(lv, field))[ov],
                np.asarray(getattr(cv, field))[:n_valid],
            )
        np.testing.assert_allclose(
            np.asarray(lv.txywh)[ov], np.asarray(cv.txywh)[:n_valid]
        )

    def make_net(seed):
        r = np.random.default_rng(seed)
        levels = []
        for s in (8, 16, 32):
            g = img // s
            levels.append(
                DetectionHeadResult.from_parts(
                    box=jnp.asarray(r.normal(size=(B, g, g, 3, 4)), jnp.float32),
                    obj=jnp.asarray(r.normal(size=(B, g, g, 3, 1)), jnp.float32),
                    cls=jnp.asarray(r.normal(size=(B, g, g, 3, nc)), jnp.float32),
                )
            )
        return Yolov5NetworkResult(*levels)

    net = make_net(11)
    l_full = yolov5_loss(net, assignment, fs)
    l_comp = yolov5_loss(net, compacted, fs)
    np.testing.assert_allclose(
        float(l_full.total), float(l_comp.total), rtol=1e-6
    )

    # gradients w.r.t. the prediction maps match too
    def tot(netres, asg):
        r = yolov5_loss(netres, asg, fs)
        return r.total

    raws = [lv.raw for lv in net]

    def tot_from_raws(rs, asg):
        n2 = Yolov5NetworkResult(
            *(lv._replace(raw=r) for lv, r in zip(net, rs))
        )
        return tot(n2, asg)

    g_full = jax.grad(lambda rs: tot_from_raws(rs, assignment))(raws)
    g_comp = jax.grad(lambda rs: tot_from_raws(rs, compacted))(raws)
    for a, b in zip(g_full, g_comp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
