"""Golden tests for the COCO-style mAP evaluator (avg over IoU .3/.5/.75/.9,
per-class AP50 — parity with the reference evaluator config,
kod/lightning/callbacks/pycoco_map_eval.py:45-48)."""

import numpy as np
import pytest

from object_detection_cib_tpu.eval.coco_map import MeanAveragePrecisionEvaluator


def _ev(nc=2, ious=(0.3, 0.5, 0.75, 0.9)):
    return MeanAveragePrecisionEvaluator(nc, ious=ious,
                                         class_names=[f"c{i}" for i in range(nc)])


def test_perfect_detections():
    ev = _ev()
    gt = np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    cls = np.asarray([0, 1])
    ev.add_image(gt, np.asarray([0.9, 0.8]), cls, gt, cls)
    rep = ev.get_report()
    assert rep["avg_mAP"] == pytest.approx(1.0)
    assert rep["tag_wise_AP_50"][0] == pytest.approx(1.0)


def test_no_detections():
    ev = _ev()
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    ev.add_image(
        np.zeros((0, 4)), np.zeros(0), np.zeros(0, int), gt, np.asarray([0])
    )
    rep = ev.get_report()
    assert rep["mAP_50"] == 0.0


def test_missed_gt_half_recall():
    ev = _ev(nc=1, ious=(0.5,))
    gt = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    det = np.asarray([[0, 0, 10, 10]], np.float32)
    ev.add_image(det, np.asarray([0.9]), np.asarray([0]), gt, np.asarray([0, 0]))
    # precision 1 up to recall .5 -> 51/101 points
    assert ev.get_report()["mAP_50"] == pytest.approx(51 / 101, abs=1e-6)


def test_fp_after_full_recall_does_not_hurt():
    ev = _ev(nc=1, ious=(0.5,))
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    det = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    ev.add_image(
        det, np.asarray([0.9, 0.5]), np.asarray([0, 0]), gt, np.asarray([0, 0])[:1]
    )
    assert ev.get_report()["mAP_50"] == pytest.approx(1.0)


def test_fp_before_tp_hurts():
    ev = _ev(nc=1, ious=(0.5,))
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    det = np.asarray([[50, 50, 60, 60], [0, 0, 10, 10]], np.float32)
    # FP has HIGHER score -> precision at recall 1 is 0.5
    ev.add_image(
        det, np.asarray([0.9, 0.5]), np.asarray([0, 0]), gt, np.asarray([0])
    )
    assert ev.get_report()["mAP_50"] == pytest.approx(0.5)


def test_iou_threshold_sensitivity():
    ev = _ev(nc=1, ious=(0.3, 0.9))
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    det = np.asarray([[2, 0, 12, 10]], np.float32)  # IoU = 8/12 ≈ 0.667
    ev.add_image(det, np.asarray([0.9]), np.asarray([0]), gt, np.asarray([0]))
    rep = ev.get_report()
    assert rep["mAP_30"] == pytest.approx(1.0)
    assert rep["mAP_90"] == pytest.approx(0.0)


def test_duplicate_detections_one_matches():
    ev = _ev(nc=1, ious=(0.5,))
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    det = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    ev.add_image(
        det, np.asarray([0.9, 0.8]), np.asarray([0, 0]), gt, np.asarray([0])
    )
    # second duplicate is FP after full recall -> AP still 1
    assert ev.get_report()["mAP_50"] == pytest.approx(1.0)


def test_class_without_gt_is_nan_excluded():
    ev = _ev(nc=3, ious=(0.5,))
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    ev.add_image(gt, np.asarray([0.9]), np.asarray([0]), gt, np.asarray([0]))
    rep = ev.get_report()
    # classes 1,2 have no GT anywhere; mAP averages only class 0
    assert rep["mAP_50"] == pytest.approx(1.0)


def test_results_dict_keys():
    ev = _ev()
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    ev.add_image(gt, np.asarray([0.9]), np.asarray([0]), gt, np.asarray([0]))
    d = ev.results_dict()
    for k in ["map", "map30", "map50", "map75", "map90", "map50_c0"]:
        assert k in d, d.keys()


def test_streaming_multiple_images_equals_joint():
    rng = np.random.default_rng(0)
    ev1 = _ev(nc=1, ious=(0.5,))
    for seed in range(5):
        r = np.random.default_rng(seed)
        gt = np.asarray([[0, 0, 10, 10]], np.float32) + r.uniform(0, 50)
        noise = r.uniform(-2, 2, (1, 4)).astype(np.float32)
        ev1.add_image(
            gt + noise, np.asarray([r.random()]), np.asarray([0]), gt,
            np.asarray([0]),
        )
    rep = ev1.get_report()
    assert 0.0 <= rep["mAP_50"] <= 1.0
