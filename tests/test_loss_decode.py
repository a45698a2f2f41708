"""Loss + decode semantics tests (parity with kod loss.py / layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from object_detection_cib_tpu.core.assigner import assign_targets
from object_detection_cib_tpu.core.types import (
    AnchorBoxInfo,
    FeatureShape,
    LevelAnchors,
)
from object_detection_cib_tpu.eval.decode import decode_predictions
from object_detection_cib_tpu.models.yolov5 import (
    DetectionHeadResult,
    Yolov5NetworkResult,
)
from object_detection_cib_tpu.train.loss import (
    LossParams,
    bce_with_logits,
    yolov5_loss,
)

IMG = 64
NC = 4


def _anchors():
    # ml/hl anchors chosen so the 16px test box fails their ratio gate
    # (>= 4x) and matches only the ll level.
    fs = FeatureShape
    return LevelAnchors(
        ll=AnchorBoxInfo(8, [fs(16, 16)]),
        ml=AnchorBoxInfo(16, [fs(128, 128)]),
        hl=AnchorBoxInfo(32, [fs(256, 256)]),
    )


def _zeros_net(B=1, nc=NC, A=1, img=IMG):
    levels = []
    for s in (8, 16, 32):
        g = img // s
        levels.append(
            DetectionHeadResult.from_parts(
                box=jnp.zeros((B, g, g, A, 4)),
                obj=jnp.full((B, g, g, A, 1), -10.0),
                cls=jnp.zeros((B, g, g, A, nc)),
            )
        )
    return Yolov5NetworkResult(*levels)


def test_bce_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(13, 7)).astype(np.float32)
    t = (rng.random((13, 7)) > 0.5).astype(np.float32)
    pw = rng.uniform(0.5, 3.0, (7,)).astype(np.float32)

    ours = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(t), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4)

    ours_pw = np.asarray(
        bce_with_logits(jnp.asarray(x), jnp.asarray(t), pos_weight=jnp.asarray(pw))
    )
    ref_pw = F.binary_cross_entropy_with_logits(
        torch.from_numpy(x),
        torch.from_numpy(t),
        reduction="none",
        pos_weight=torch.from_numpy(pw),
    ).numpy()
    np.testing.assert_allclose(ours_pw, ref_pw, atol=2e-4)


def _assign_one_box():
    # gt: center of cell (2,2) at stride 8, w=h=anchor -> raw-zero logits
    # decode exactly onto it (sigmoid(0)*2-0.5 = 0.5 offset; (2*0.5)^2*a = a)
    boxes = jnp.asarray([[[12.0, 12.0, 28.0, 28.0]]])
    labels = jnp.asarray([[2]], jnp.int32)
    mask = jnp.ones((1, 1), bool)
    return assign_targets(boxes, labels, mask, FeatureShape(IMG, IMG), _anchors())


def test_perfect_prediction_zero_loc_loss():
    assignment = _assign_one_box()
    net = _zeros_net()
    res = yolov5_loss(net, assignment, FeatureShape(IMG, IMG))
    assert float(res.localization) == pytest.approx(0.0, abs=1e-5)
    # obj target at the matched cell is IoU=1 -> BCE vs logits -10 is high
    assert float(res.objectness) > 0.0
    assert np.isfinite(float(res.classification))


def test_empty_targets_zero_loc_cls():
    boxes = jnp.zeros((2, 3, 4))
    labels = jnp.zeros((2, 3), jnp.int32)
    mask = jnp.zeros((2, 3), bool)
    assignment = assign_targets(boxes, labels, mask, FeatureShape(IMG, IMG), _anchors())
    net = _zeros_net(B=2)
    res = yolov5_loss(net, assignment, FeatureShape(IMG, IMG))
    assert float(res.localization) == 0.0
    assert float(res.classification) == 0.0
    assert float(res.objectness) > 0.0  # background BCE vs -10 logits


def test_lambda_scaling():
    # obj scales by (img/640)^2, cls by nc/80 (ref loss.py:229-237)
    assignment = _assign_one_box()
    net = _zeros_net()
    p = LossParams()
    res = yolov5_loss(net, assignment, FeatureShape(IMG, IMG), p)
    # recompute with neutral lambdas: factor out scaling
    res_ref = yolov5_loss(
        net,
        assignment,
        FeatureShape(IMG, IMG),
        p._replace(lambda_objectness=2.0),
    )
    assert float(res_ref.objectness) == pytest.approx(
        2.0 * float(res.objectness), rel=1e-5
    )


def test_class_weights_change_cls_loss():
    assignment = _assign_one_box()
    net = _zeros_net()
    base = yolov5_loss(net, assignment, FeatureShape(IMG, IMG))
    w = jnp.asarray([1.0, 1.0, 5.0, 1.0])
    weighted = yolov5_loss(
        net, assignment, FeatureShape(IMG, IMG), class_weights=w
    )
    assert float(weighted.classification) > float(base.classification)


def test_loss_gradients_finite():
    assignment = _assign_one_box()

    def f(x):
        levels = []
        for s in (8, 16, 32):
            g = IMG // s
            levels.append(
                DetectionHeadResult.from_parts(
                    box=jnp.full((1, g, g, 1, 4), x),
                    obj=jnp.full((1, g, g, 1, 1), x),
                    cls=jnp.full((1, g, g, 1, NC), x),
                )
            )
        return yolov5_loss(
            Yolov5NetworkResult(*levels), assignment, FeatureShape(IMG, IMG)
        ).total

    g = jax.grad(f)(0.3)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_decode_zero_logits():
    net = _zeros_net()
    det = decode_predictions(net, _anchors())
    n_expected = 8 * 8 + 4 * 4 + 2 * 2
    assert det.shape == (1, n_expected, 5 + NC)
    d = np.asarray(det[0, 0])
    # cell (0,0) stride 8: center = 0.5*8 = 4, wh = anchor 16 -> xyxy
    np.testing.assert_allclose(d[:4], [4 - 8, 4 - 8, 4 + 8, 4 + 8], atol=1e-5)
    assert d[4] == pytest.approx(jax.nn.sigmoid(-10.0), abs=1e-6)
    np.testing.assert_allclose(d[5:], 0.5, atol=1e-6)


def test_decode_grid_offsets():
    net = _zeros_net()
    det = np.asarray(decode_predictions(net, _anchors())[0])
    # second cell along W at stride 8 -> center x = 1.5*8 = 12
    cx = (det[1, 0] + det[1, 2]) / 2
    assert cx == pytest.approx(12.0, abs=1e-4)
