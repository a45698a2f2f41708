"""Numpy reference oracles for differential fuzzing.

Each oracle is a deliberately-literal reimplementation of the upstream
algorithm's semantics (loops and all), written from the reference source:

  * ref_nms:        kod/core/nms.py:9-75 + torchvision.ops.nms greedy rule
  * ref_assign:     kod/core/label_assignment/yv5.py:207-296
  * ref_coco_accum: pycocotools cocoeval.py evaluateImg/accumulate loops, as
                    wrapped by kod/lightning/callbacks/pycoco_map_eval.py

They trade speed for obviousness; the production implementations in
object_detection_cib_tpu are fuzzed against them in test_fuzz_parity.py.
"""

from __future__ import annotations

import numpy as np


# --------------------------------------------------------------------------
# NMS oracle
# --------------------------------------------------------------------------
def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) -> (N,M), torchvision box_iou semantics."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def greedy_nms_indices(boxes: np.ndarray, scores: np.ndarray, thr: float):
    """torchvision.ops.nms: keep-list in descending score order; a box is
    suppressed iff IoU with an already-kept box is strictly > thr."""
    order = np.argsort(-scores, kind="mergesort")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(boxes):
            iou = _iou_xyxy(boxes[i : i + 1], boxes)[0]
            suppressed |= iou > thr
            suppressed[i] = True  # self
    return np.asarray(keep, np.int64)


def ref_nms(
    det: np.ndarray,  # (N, 5+nc): xyxy, obj, cls...
    conf_thres: float,
    iou_thres: float,
    max_det: int = 300,
    max_nms: int = 30000,
    multi_label=None,
    classes=None,
) -> np.ndarray:
    """Single-image reference NMS -> (n, 6) [x1,y1,x2,y2,conf,cls]."""
    nc = det.shape[1] - 5
    if multi_label is None:
        multi_label = nc > 1
    max_wh = 4096.0

    x = det[det[:, 4] > conf_thres]
    if not len(x):
        return np.zeros((0, 6))
    x = x.copy()
    x[:, 5 : 5 + nc] *= x[:, 4:5]  # conf = obj * cls
    box = x[:, :4]

    if multi_label:
        i, j = np.nonzero(x[:, 5 : 5 + nc] > conf_thres)
        x = np.concatenate(
            [box[i], x[i, j + 5, None], j[:, None].astype(np.float64)], 1
        )
    else:
        conf = x[:, 5:].max(1, keepdims=True)
        j = x[:, 5:].argmax(1, keepdims=True)
        x = np.concatenate([box, conf, j.astype(np.float64)], 1)[
            conf.reshape(-1) > conf_thres
        ]

    if classes is not None:
        x = x[np.isin(x[:, 5], np.asarray(classes, np.float64))]

    n = len(x)
    if not n:
        return np.zeros((0, 6))
    if n > max_nms:
        x = x[np.argsort(-x[:, 4], kind="mergesort")[:max_nms]]

    c = x[:, 5:6] * max_wh
    keep = greedy_nms_indices(x[:, :4] + c, x[:, 4], iou_thres)
    keep = keep[:max_det]
    return x[keep]


# --------------------------------------------------------------------------
# Label-assignment oracle
# --------------------------------------------------------------------------
_OFF = np.asarray(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]
) * 0.5


def ref_assign(
    per_image_boxes_xyxy,  # list of (n_i, 4) pixel boxes
    per_image_labels,  # list of (n_i,) int
    anchors_px: np.ndarray,  # (A, 2) pixel anchor wh
    stride: int,
    image_w: int,
    image_h: int,
    threshold: float = 4.0,
):
    """Reference Yolov5 assignment for one level.

    Returns a list of match tuples
      (sample, anchor, gy_clamped, gx_clamped, tx, ty, tw, th, label, aw, ah)
    in the reference's emission order (anchor-major, then target, then
    offset-row via boolean mask stacking order: self, j, k, l, m).
    """
    # _make_batched_targets: rows (sample, label, cx, cy, w, h) / stride
    rows = []
    for s, (bx, lb) in enumerate(zip(per_image_boxes_xyxy, per_image_labels)):
        for b, c in zip(np.asarray(bx, np.float64), lb):
            cx = (b[0] + b[2]) / 2 / stride
            cy = (b[1] + b[3]) / 2 / stride
            w = (b[2] - b[0]) / stride
            h = (b[3] - b[1]) / stride
            rows.append([s, c, cx, cy, w, h])
    anchors_grid = np.asarray(anchors_px, np.float64) / stride

    # _repeat_for_anchors + _filter_targets (anchor-major order)
    cand = []
    for a in range(len(anchors_grid)):
        for r in rows:
            wh = np.asarray(r[4:6])
            ratio = wh / anchors_grid[a]
            if np.max(np.maximum(ratio, 1.0 / ratio)) < threshold:
                cand.append(r + [a])

    # _incorporate_neighbouring_cells: stack (self, j, k, l, m) masks.
    # torch indexing targets.repeat((5,1,1))[mask] iterates offset-row-major.
    grid_w = image_w / stride
    grid_h = image_h / stride
    out_w = image_w // stride
    out_h = image_h // stride
    matches = []
    for o in range(5):
        for r in cand:
            s, c, cx, cy, w, h, a = r
            inv_x, inv_y = grid_w - cx, grid_h - cy
            ok = [
                True,
                (cx % 1 < 0.5) and (cx > 1),
                (cy % 1 < 0.5) and (cy > 1),
                (inv_x % 1 < 0.5) and (inv_x > 1),
                (inv_y % 1 < 0.5) and (inv_y > 1),
            ][o]
            if not ok:
                continue
            off = _OFF[o]
            # torch .long() truncates toward zero
            gi = int(cx - off[0])
            gj = int(cy - off[1])
            tx = cx - gi  # cxcy - gij, UNCLAMPED gij (ref yv5.py:281)
            ty = cy - gj
            matches.append(
                (
                    int(s),
                    int(a),
                    int(np.clip(gj, 0, out_h - 1)),
                    int(np.clip(gi, 0, out_w - 1)),
                    tx,
                    ty,
                    w,
                    h,
                    int(c),
                    anchors_grid[a][0],
                    anchors_grid[a][1],
                )
            )
    return matches


# --------------------------------------------------------------------------
# COCO eval oracle (pycocotools cocoeval.py loops, no crowd/ignore/area)
# --------------------------------------------------------------------------
def ref_coco_accumulate(
    images,  # list of dicts: {dt_boxes, dt_scores, dt_cls, gt_boxes, gt_cls}
    num_classes: int,
    iou_thrs,
    max_dets: int = 100,
):
    """Returns (C, T) AP array with NaN for classes with no GT.

    Follows COCOeval.evaluateImg + accumulate literally for the useCats=1,
    no-ignore configuration the reference uses.
    """
    iou_thrs = np.asarray(iou_thrs, np.float64)
    T = len(iou_thrs)
    rec_thrs = np.linspace(0.0, 1.0, 101)
    aps = np.full((num_classes, T), np.nan)

    for c in range(num_classes):
        # per-image evaluation
        dt_scores_all, dtm_all = [], []
        npig = 0
        for img in images:
            dmask = np.asarray(img["dt_cls"]) == c
            gmask = np.asarray(img["gt_cls"]) == c
            dt_b = np.asarray(img["dt_boxes"], np.float64).reshape(-1, 4)[dmask]
            dt_s = np.asarray(img["dt_scores"], np.float64)[dmask]
            gt_b = np.asarray(img["gt_boxes"], np.float64).reshape(-1, 4)[gmask]
            G = len(gt_b)
            npig += G
            # sort dets by -score (mergesort, like pycocotools), cap maxDet
            order = np.argsort(-dt_s, kind="mergesort")[:max_dets]
            dt_b, dt_s = dt_b[order], dt_s[order]
            D = len(dt_s)
            dtm = np.zeros((T, D), np.int64) - 1
            if D and G:
                ious = _iou_xyxy(dt_b, gt_b)
                for t in range(T):
                    gtm = np.zeros(G, np.int64) - 1
                    for d in range(D):
                        iou = min(iou_thrs[t], 1 - 1e-10)
                        m = -1
                        for g in range(G):
                            if gtm[g] > -1:
                                continue
                            if ious[d, g] < iou:
                                continue
                            iou = ious[d, g]
                            m = g
                        if m == -1:
                            continue
                        gtm[m] = d
                        dtm[t, d] = m
            dt_scores_all.append(dt_s)
            dtm_all.append(dtm)

        if npig == 0:
            continue
        dt_scores = (
            np.concatenate(dt_scores_all) if dt_scores_all else np.zeros(0)
        )
        inds = np.argsort(-dt_scores, kind="mergesort")
        if len(dtm_all):
            dtm = np.concatenate(dtm_all, axis=1)[:, inds]
        else:
            dtm = np.zeros((T, 0), np.int64)
        tps = dtm > -1
        fps = dtm == -1
        tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
        fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
        for t in range(T):
            tp, fp = tp_sum[t], fp_sum[t]
            nd = len(tp)
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            q = np.zeros(101)
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds_r = np.searchsorted(rc, rec_thrs, side="left")
            for ri, pi in enumerate(inds_r):
                if pi < nd:
                    q[ri] = pr[pi]
            aps[c, t] = q.mean()
    return aps
