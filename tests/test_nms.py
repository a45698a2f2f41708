"""Device NMS semantics tests (parity with kod/core/nms.py:9-75)."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_cib_tpu.core.nms import non_max_suppression


def _mk_det(rows, nc):
    """rows: list of (xyxy, obj, cls_vec). Returns (1, N, 5+nc)."""
    out = []
    for box, obj, cls in rows:
        out.append(list(box) + [obj] + list(cls))
    return jnp.asarray([out], jnp.float32)


def test_overlapping_same_class_suppressed():
    det = _mk_det(
        [
            ([0, 0, 10, 10], 0.9, [0.8]),
            ([1, 1, 11, 11], 0.8, [0.7]),  # IoU ~0.68 with first
            ([50, 50, 60, 60], 0.9, [0.9]),
        ],
        nc=1,
    )
    res = non_max_suppression(det, conf_thres=0.25, iou_thres=0.45)
    assert int(res.num_valid[0]) == 2
    kept = np.asarray(res.boxes[0][: res.num_valid[0]])
    assert [0, 0, 10, 10] in kept.tolist()
    assert [50, 50, 60, 60] in kept.tolist()


def test_overlapping_different_class_kept():
    det = _mk_det(
        [
            ([0, 0, 10, 10], 0.9, [0.9, 0.0]),
            ([1, 1, 11, 11], 0.8, [0.0, 0.9]),
        ],
        nc=2,
    )
    res = non_max_suppression(det, conf_thres=0.25, iou_thres=0.45)
    assert int(res.num_valid[0]) == 2
    assert set(np.asarray(res.classes[0][:2]).tolist()) == {0, 1}


def test_multilabel_expansion():
    # nc>1: one box with two strong classes -> two detections (ref nms.py:46-48)
    det = _mk_det([([0, 0, 10, 10], 1.0, [0.9, 0.8, 0.001])], nc=3)
    res = non_max_suppression(det, conf_thres=0.25, iou_thres=0.45)
    assert int(res.num_valid[0]) == 2
    cls = np.asarray(res.classes[0][:2]).tolist()
    assert set(cls) == {0, 1}
    np.testing.assert_allclose(np.asarray(res.scores[0][:2]), [0.9, 0.8], atol=1e-6)


def test_conf_composition_obj_times_cls():
    det = _mk_det([([0, 0, 10, 10], 0.5, [0.8])], nc=1)
    res = non_max_suppression(det, conf_thres=0.25, iou_thres=0.45)
    assert int(res.num_valid[0]) == 1
    assert float(res.scores[0][0]) == np.float32(0.5) * np.float32(0.8)


def test_obj_gate():
    # obj below conf_thres is dropped regardless of cls (ref nms.py:37)
    det = _mk_det([([0, 0, 10, 10], 0.1, [1.0])], nc=1)
    res = non_max_suppression(det, conf_thres=0.25, iou_thres=0.45)
    assert int(res.num_valid[0]) == 0


def test_class_filter():
    det = _mk_det(
        [
            ([0, 0, 10, 10], 0.9, [0.9, 0.0]),
            ([20, 20, 30, 30], 0.9, [0.0, 0.9]),
        ],
        nc=2,
    )
    res = non_max_suppression(det, conf_thres=0.25, iou_thres=0.45, classes=[1])
    assert int(res.num_valid[0]) == 1
    assert int(res.classes[0][0]) == 1


def test_max_det_cap_and_score_order():
    rng = np.random.default_rng(0)
    n = 50
    boxes = []
    for i in range(n):
        x = float(i * 20)
        boxes.append(([x, 0, x + 10, 10], float(rng.uniform(0.3, 1.0)), [1.0]))
    det = _mk_det(boxes, nc=1)
    res = non_max_suppression(det, conf_thres=0.25, iou_thres=0.45, max_det=10)
    assert int(res.num_valid[0]) == 10
    s = np.asarray(res.scores[0][:10])
    assert np.all(np.diff(s) <= 1e-7)  # descending


def test_batched_and_jittable():
    det = jnp.zeros((4, 32, 5 + 3))
    f = jax.jit(lambda d: non_max_suppression(d, 0.25, 0.45, max_det=5, max_nms=16))
    res = f(det)
    assert res.boxes.shape == (4, 5, 4)
    assert int(res.num_valid.sum()) == 0
