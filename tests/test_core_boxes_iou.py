"""Golden-value unit tests for box conversions and the IoU family.

Golden values hand-derived from the reference formulas
(kod/core/bbox/iou.py:77-246) on small cases.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.core import boxes as B
from object_detection_cib_tpu.core import iou as I


def test_cxcywh_xyxy_roundtrip():
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.uniform(0, 100, (7, 3, 4)).astype(np.float32))
    out = B.xyxy_to_cxcywh(B.cxcywh_to_xyxy(b))
    np.testing.assert_allclose(out, b, atol=1e-4)


def test_cxcywh_to_xyxy_values():
    b = jnp.asarray([[10.0, 20.0, 4.0, 6.0]])
    out = np.asarray(B.cxcywh_to_xyxy(b))
    np.testing.assert_allclose(out, [[8.0, 17.0, 12.0, 23.0]])


def test_scale_boxes():
    b = jnp.asarray([[8.0, 16.0, 12.0, 24.0]])
    out = np.asarray(B.scale_boxes(b, 0.5, 0.25))
    np.testing.assert_allclose(out, [[4.0, 4.0, 6.0, 6.0]])


def _iou_manual(b1, b2):
    x1 = max(b1[0], b2[0]); y1 = max(b1[1], b2[1])
    x2 = min(b1[2], b2[2]); y2 = min(b1[3], b2[3])
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    return inter / (a1 + a2 - inter + 1e-7)


def test_iou_values():
    b1 = [0.0, 0.0, 10.0, 10.0]
    b2 = [5.0, 5.0, 15.0, 15.0]
    got = float(I.compute_iou(jnp.asarray(b1), jnp.asarray(b2)))
    assert got == pytest.approx(_iou_manual(b1, b2), abs=1e-6)
    # identical boxes -> ~1
    got = float(I.compute_iou(jnp.asarray(b1), jnp.asarray(b1)))
    assert got == pytest.approx(1.0, abs=1e-5)
    # disjoint -> 0
    got = float(I.compute_iou(jnp.asarray(b1), jnp.asarray([20.0, 20, 30, 30])))
    assert got == 0.0


def test_giou_values():
    b1 = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b2 = jnp.asarray([5.0, 5.0, 15.0, 15.0])
    # manual: inter=25, union=175, iou=25/175; convex=15*15=225
    # penalty = (225-175)/225
    expect = 25.0 / (175.0 + 1e-7) - 50.0 / (225.0 + 1e-7)
    assert float(I.compute_giou(b1, b2)) == pytest.approx(expect, abs=1e-6)


def test_diou_values():
    b1 = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b2 = jnp.asarray([5.0, 5.0, 15.0, 15.0])
    # centers (5,5) vs (10,10): d2=50; convex diag2 = 225+225=450
    expect = 25.0 / (175.0 + 1e-7) - 50.0 / (450.0 + 1e-7)
    assert float(I.compute_diou(b1, b2)) == pytest.approx(expect, abs=1e-6)


def test_ciou_values():
    b1 = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b2 = jnp.asarray([5.0, 5.0, 15.0, 20.0])
    iou = _iou_manual([0, 0, 10, 10], [5, 5, 15, 20])
    # convex box (0,0)-(15,20): diag2 = 225+400
    d = ((10.0 - 5.0) ** 2 + (12.5 - 5.0) ** 2) / (625.0 + 1e-7)
    v = (4 / math.pi**2) * (
        math.atan(10.0 / (15.0 + 1e-7)) - math.atan(10.0 / (10.0 + 1e-7))
    ) ** 2
    alpha = v / ((1 - iou) + v + 1e-7)
    expect = iou - d - alpha * v
    assert float(I.compute_ciou(b1, b2)) == pytest.approx(expect, abs=1e-6)


def test_ciou_same_box_is_one():
    b = jnp.asarray([3.0, 4.0, 13.0, 24.0])
    assert float(I.compute_ciou(b, b)) == pytest.approx(1.0, abs=1e-5)


def test_ciou_alpha_stop_gradient():
    """CIoU's alpha is computed under stop_gradient (ref iou.py:241-242):
    the gradient must equal d/dx of (iou - D - alpha*v) with alpha constant."""
    b2 = jnp.asarray([5.0, 5.0, 15.0, 20.0])

    def f(w):
        b1 = jnp.asarray([0.0, 0.0, 0.0, 0.0]) + jnp.stack(
            [0.0 * w, 0.0 * w, w, w + 2.0]
        )
        return I.compute_ciou(b1, b2)

    g = jax.grad(f)(10.0)
    assert np.isfinite(float(g))


def test_pairwise_iou_matches_aligned_diag():
    rng = np.random.default_rng(1)
    x1y1 = rng.uniform(0, 50, (6, 2))
    wh = rng.uniform(1, 50, (6, 2))
    bx = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)
    b = jnp.asarray(bx)
    mat = I.compute_iou_pairwise(b, b)
    np.testing.assert_allclose(np.diag(np.asarray(mat)), 1.0, atol=1e-5)
    aligned = I.compute_iou(b[:, None, :].repeat(6, 1), b[None, :, :].repeat(6, 0))
    np.testing.assert_allclose(np.asarray(mat), np.asarray(aligned), atol=1e-5)


def test_iou_dispatcher():
    b1 = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b2 = jnp.asarray([5.0, 5.0, 15.0, 15.0])
    for t in ["iou", "giou", "diou", "ciou"]:
        fn = I.get_iou_fn(t)
        assert np.isfinite(float(fn(b1, b2)))
    assert float(I.get_iou_fn(I.IoUType.iou)(b1, b2)) == float(
        I.compute_iou(b1, b2)
    )
