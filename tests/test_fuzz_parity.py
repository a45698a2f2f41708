"""Differential fuzzing of the parity-critical algorithms against literal
numpy oracles (tests/oracles.py) of the reference semantics.

  * NMS        vs kod/core/nms.py:9-75 + torchvision greedy rule
  * assignment vs kod/core/label_assignment/yv5.py:207-296 (both the
               reference 5-slot offset table and the compacted 3-slot form)
  * mAP        vs pycocotools COCOeval accumulate loops (the definition the
               reference's avg_mAP is computed with)

Counts: >=1000 random cases per algorithm (batched for jit reuse).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.core.assigner import assign_targets
from object_detection_cib_tpu.core.nms import non_max_suppression
from object_detection_cib_tpu.core.types import AnchorBoxInfo, FeatureShape, LevelAnchors
from object_detection_cib_tpu.eval.coco_map import MeanAveragePrecisionEvaluator

from oracles import ref_assign, ref_coco_accumulate, ref_nms


# --------------------------------------------------------------------------
# NMS fuzz
# --------------------------------------------------------------------------
def _random_dets(rng, B, N, nc, clustered=True):
    """Random detections with clustered boxes (so suppression happens) and
    strictly distinct scores (torch sort tie order is unspecified)."""
    centers = rng.uniform(40, 280, (B, N // 8 + 1, 2))
    det = np.zeros((B, N, 5 + nc), np.float32)
    for b in range(B):
        c = centers[b, rng.integers(0, centers.shape[1], N)]
        jitter = rng.normal(0, 8, (N, 2))
        wh = rng.uniform(10, 60, (N, 2))
        xy = c + jitter
        det[b, :, 0:2] = xy - wh / 2
        det[b, :, 2:4] = xy + wh / 2
    det[..., 4] = rng.uniform(0, 1, (B, N))
    det[..., 5:] = rng.uniform(0, 1, (B, N, nc))
    # make every score product distinct at float32
    det[..., 4] += np.arange(B * N).reshape(B, N) * 1e-6
    return np.asarray(det, np.float32)


@pytest.mark.parametrize("multi_label", [True, False])
def test_fuzz_nms(multi_label):
    B, N, nc = 8, 96, 4
    conf, iou_t, max_det = 0.25, 0.6, 25
    f = jax.jit(
        lambda d: non_max_suppression(
            d, conf, iou_t, max_det=max_det, max_nms=512, multi_label=multi_label
        )
    )
    rng = np.random.default_rng(7 if multi_label else 8)
    n_img = 0
    for it in range(70):
        det = _random_dets(rng, B, N, nc)
        res = jax.tree.map(np.asarray, f(jnp.asarray(det)))
        for b in range(B):
            n_img += 1
            ours = np.concatenate(
                [
                    res.boxes[b][res.valid[b]],
                    res.scores[b][res.valid[b], None],
                    res.classes[b][res.valid[b], None].astype(np.float64),
                ],
                axis=1,
            )
            exp = ref_nms(
                det[b].astype(np.float64), conf, iou_t,
                max_det=max_det, multi_label=multi_label,
            )
            assert len(ours) == len(exp), (it, b, len(ours), len(exp))
            # same descending-score order on both sides
            np.testing.assert_allclose(ours[:, 4], exp[:, 4], rtol=2e-6)
            np.testing.assert_array_equal(ours[:, 5], exp[:, 5])
            np.testing.assert_allclose(ours[:, :4], exp[:, :4], atol=1e-3)
    assert n_img >= 500


def test_fuzz_nms_class_filter_and_empty():
    B, N, nc = 4, 64, 3
    f = jax.jit(
        lambda d: non_max_suppression(
            d, 0.25, 0.5, classes=(0, 2), max_det=10, max_nms=256
        )
    )
    rng = np.random.default_rng(11)
    for it in range(40):
        det = _random_dets(rng, B, N, nc)
        if it % 5 == 0:
            det[..., 4] = 0.0  # nothing passes the gate
        res = jax.tree.map(np.asarray, f(jnp.asarray(det)))
        for b in range(B):
            exp = ref_nms(
                det[b].astype(np.float64), 0.25, 0.5, max_det=10, classes=(0, 2)
            )
            assert int(res.num_valid[b]) == len(exp)
            if len(exp):
                assert set(np.unique(res.classes[b][res.valid[b]])) <= {0, 2}


# --------------------------------------------------------------------------
# Assignment fuzz
# --------------------------------------------------------------------------
_ANCHORS = LevelAnchors(
    ll=AnchorBoxInfo(stride=8, boxes_wh=[FeatureShape(10, 13), FeatureShape(16, 30), FeatureShape(33, 23)]),
    ml=AnchorBoxInfo(stride=16, boxes_wh=[FeatureShape(30, 61), FeatureShape(62, 45), FeatureShape(59, 119)]),
    hl=AnchorBoxInfo(stride=32, boxes_wh=[FeatureShape(116, 90), FeatureShape(156, 198), FeatureShape(373, 326)]),
)


def _match_multiset(level, quant=1e4):
    """LevelAssignment -> multiset of rounded match tuples."""
    v = np.asarray(level.valid)
    s = np.asarray(level.sample_idx)[v]
    a = np.asarray(level.anchor_idx)[v]
    gy = np.asarray(level.grid_y)[v]
    gx = np.asarray(level.grid_x)[v]
    t = np.asarray(level.txywh)[v]
    lb = np.asarray(level.labels)[v]
    aw = np.asarray(level.anchors_wh)[v]
    out = {}
    for i in range(len(s)):
        key = (
            int(s[i]), int(a[i]), int(gy[i]), int(gx[i]),
            round(float(t[i, 0]) * quant), round(float(t[i, 1]) * quant),
            round(float(t[i, 2]) * quant), round(float(t[i, 3]) * quant),
            int(lb[i]),
            round(float(aw[i, 0]) * quant), round(float(aw[i, 1]) * quant),
        )
        out[key] = out.get(key, 0) + 1
    return out


def _oracle_multiset(matches, quant=1e4):
    out = {}
    for m in matches:
        key = (
            m[0], m[1], m[2], m[3],
            round(m[4] * quant), round(m[5] * quant),
            round(m[6] * quant), round(m[7] * quant),
            m[8],
            round(m[9] * quant), round(m[10] * quant),
        )
        out[key] = out.get(key, 0) + 1
    return out


def _random_targets(rng, B, T, img, nc=5, grid16=True):
    """Padded targets; coordinates on a 1/16-pixel grid so every grid-unit
    value is exactly representable in both f32 and f64 (comparisons exact).
    The 1/16 grid also lands on exact-integer cell coordinates often —
    exercising the degenerate duplicate-offset case on purpose."""
    boxes = np.zeros((B, T, 4), np.float32)
    labels = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), bool)
    for b in range(B):
        n = rng.integers(0, T + 1)
        for t in range(n):
            x1, y1 = rng.integers(0, (img - 24) * 16, 2) / 16.0
            w, h = rng.integers(16, 320 * 16, 2) / 16.0
            boxes[b, t] = [x1, y1, min(x1 + w, img), min(y1 + h, img)]
            labels[b, t] = rng.integers(0, nc)
            mask[b, t] = True
    return boxes, labels, mask


@pytest.mark.parametrize("capacity", [5, 3])
def test_fuzz_assigner(capacity):
    B, T, img = 4, 10, 416
    shape = FeatureShape(img, img)
    f = jax.jit(
        lambda b, l, m: assign_targets(
            b, l, m, shape, _ANCHORS, threshold=4.0, offset_capacity=capacity
        )
    )
    rng = np.random.default_rng(100 + capacity)
    n_cases = 0
    for it in range(90):
        boxes, labels, mask = _random_targets(rng, B, T, img)
        res = f(jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask))
        per_image_boxes = [boxes[b][mask[b]] for b in range(B)]
        per_image_labels = [labels[b][mask[b]] for b in range(B)]
        for level, info in zip(res.levels(), _ANCHORS.levels()):
            n_cases += 1
            exp = ref_assign(
                per_image_boxes, per_image_labels,
                np.asarray([(a.width, a.height) for a in info.boxes_wh]),
                info.stride, img, img,
            )
            exp_ms = _oracle_multiset(exp)
            got_ms = _match_multiset(level)
            if capacity == 5:
                assert got_ms == exp_ms, (it, info.stride)
            else:
                # compacted: identical except duplicate center-cell matches
                # (exact-integer coordinate) are emitted once, not twice
                diff = {
                    k: exp_ms[k] - got_ms.get(k, 0)
                    for k in exp_ms
                    if exp_ms[k] != got_ms.get(k, 0)
                }
                assert all(v == 1 for v in diff.values()), (it, info.stride, diff)
                # every dropped match is a duplicate (count 2 in oracle) at a
                # cell-center txy of exactly (0.5 or 1-ish integer frac)
                for k, v in exp_ms.items():
                    if k not in got_ms or got_ms[k] < v:
                        assert v >= 2, (k, v)
                assert all(k in exp_ms and got_ms[k] <= exp_ms[k] for k in got_ms)
    assert n_cases >= 250


# --------------------------------------------------------------------------
# mAP fuzz
# --------------------------------------------------------------------------
def test_fuzz_coco_map():
    rng = np.random.default_rng(3)
    nc = 3
    n_datasets = 0
    for it in range(120):
        n_img = rng.integers(1, 6)
        images = []
        ev = MeanAveragePrecisionEvaluator(nc)
        for _ in range(n_img):
            G = rng.integers(0, 8)
            gt_boxes = np.zeros((G, 4))
            for g in range(G):
                x, y = rng.uniform(0, 300, 2)
                w, h = rng.uniform(10, 80, 2)
                gt_boxes[g] = [x, y, x + w, y + h]
            gt_cls = rng.integers(0, nc, G)
            D = rng.integers(0, 14)
            dt_boxes = np.zeros((D, 4))
            for d in range(D):
                if G and rng.random() < 0.7:  # near a gt: overlaps happen
                    gb = gt_boxes[rng.integers(0, G)]
                    shift = rng.normal(0, 12, 4)
                    dt_boxes[d] = gb + shift
                    dt_boxes[d, 2] = max(dt_boxes[d, 2], dt_boxes[d, 0] + 2)
                    dt_boxes[d, 3] = max(dt_boxes[d, 3], dt_boxes[d, 1] + 2)
                else:
                    x, y = rng.uniform(0, 300, 2)
                    w, h = rng.uniform(10, 80, 2)
                    dt_boxes[d] = [x, y, x + w, y + h]
            dt_cls = rng.integers(0, nc, D)
            dt_scores = rng.uniform(0.05, 1.0, D)
            images.append(
                dict(
                    dt_boxes=dt_boxes, dt_scores=dt_scores, dt_cls=dt_cls,
                    gt_boxes=gt_boxes, gt_cls=gt_cls,
                )
            )
            ev.add_image(dt_boxes, dt_scores, dt_cls, gt_boxes, gt_cls)
        exp = ref_coco_accumulate(images, nc, (0.3, 0.5, 0.75, 0.9))
        got = np.stack([ev._ap_for_class(c) for c in range(nc)])
        np.testing.assert_allclose(got, exp, atol=1e-6, equal_nan=True)
        # second, independent oracle: verbatim pycocotools transcription
        # (tests/oracle_pycoco.py) — a shared misreading of COCOeval
        # semantics cannot pass both
        from oracle_pycoco import pycoco_ap

        exp2 = pycoco_ap(images, nc, (0.3, 0.5, 0.75, 0.9))
        np.testing.assert_allclose(got, exp2, atol=1e-6, equal_nan=True)
        n_datasets += 1
    assert n_datasets == 120


def test_coco_map_golden_cases():
    """Hand-computable COCOeval golden values through both oracles and the
    production evaluator."""
    from oracle_pycoco import pycoco_ap

    thrs = (0.5,)

    def ap_of(images, nc=1):
        ev = MeanAveragePrecisionEvaluator(nc, ious=thrs)
        for img in images:
            ev.add_image(
                img["dt_boxes"], img["dt_scores"], img["dt_cls"],
                img["gt_boxes"], img["gt_cls"],
            )
        got = np.stack([ev._ap_for_class(c) for c in range(nc)])
        exp = pycoco_ap(images, nc, thrs)
        np.testing.assert_allclose(got, exp, atol=1e-9, equal_nan=True)
        return got

    box = np.asarray([[10.0, 10.0, 50.0, 50.0]])
    # 1 gt, 1 perfect det -> AP 1.0
    img = dict(dt_boxes=box, dt_scores=np.asarray([0.9]),
               dt_cls=np.zeros(1, int), gt_boxes=box, gt_cls=np.zeros(1, int))
    np.testing.assert_allclose(ap_of([img]), [[1.0]])

    # 1 gt; FP ranked above the TP: precision at recall>0 is 1/2, and the
    # 101-pt interpolation includes recall=0 -> AP = 0.5 exactly
    img = dict(
        dt_boxes=np.vstack([box + 200.0, box]),
        dt_scores=np.asarray([0.95, 0.9]),
        dt_cls=np.zeros(2, int), gt_boxes=box, gt_cls=np.zeros(1, int),
    )
    np.testing.assert_allclose(ap_of([img]), [[0.5]])

    # 2 gts, only one detected -> recall caps at 0.5: 51 of 101 recall
    # points get precision 1, rest 0 -> AP = 51/101
    img = dict(
        dt_boxes=box, dt_scores=np.asarray([0.9]), dt_cls=np.zeros(1, int),
        gt_boxes=np.vstack([box, box + 300.0]), gt_cls=np.zeros(2, int),
    )
    np.testing.assert_allclose(ap_of([img]), [[51.0 / 101.0]])

    # no dets at all -> AP 0; class with no gt -> NaN
    img = dict(
        dt_boxes=np.zeros((0, 4)), dt_scores=np.zeros(0),
        dt_cls=np.zeros(0, int), gt_boxes=box, gt_cls=np.zeros(1, int),
    )
    out = ap_of([img], nc=2)
    np.testing.assert_allclose(out[0], [0.0])
    assert np.isnan(out[1]).all()
