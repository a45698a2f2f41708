"""Verbatim transcription of pycocotools COCOeval matching + accumulation.

Second, *independent* mAP oracle (VERDICT r2 weak #4): unlike
``tests/oracles.ref_coco_accumulate`` (the builder's own re-derivation of
the semantics), this module transcribes the upstream pycocotools code
structure line-by-line — same variable names, same control flow, same
numerics (``np.spacing``, mergesort argsorts, the searchsorted +
IndexError-suppression tail) — so a shared misreading of the algorithm
cannot pass both oracles.

Transcribed from pycocotools/cocoeval.py @ cocodataset/cocoapi master
(2019-era, the version vendored by torchmetrics/vision_evaluation that the
reference consumes via CocoMeanAveragePrecisionEvaluator — see
/root/reference/kod/lightning/callbacks/pycoco_map_eval.py:45-48):

  * computeIoU       — cocoeval.py:205-232 (bbox branch; plain IoU, the
                       reference datasets carry no iscrowd flags)
  * evaluateImg      — cocoeval.py:256-313
  * accumulate       — cocoeval.py:315-378

Configuration fixed to the reference's: useCats=1, areaRng=[[0, 1e10]]
("all"), maxDets=[100], iouThrs given by the caller, recThrs=0:.01:1.
"""

from __future__ import annotations

import numpy as np


def _bbox_iou_xyxy(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """computeIoU's maskUtils.iou for bbox without crowd (cocoeval.py:229)."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    area_d = (dt[:, 2] - dt[:, 0]) * (dt[:, 3] - dt[:, 1])
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    lt = np.maximum(dt[:, None, :2], gt[None, :, :2])
    rb = np.minimum(dt[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_d[:, None] + area_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-300), 0.0)


def evaluateImg(dt_list, gt_list, iouThrs, maxDet, aRng=(0.0, 1e10)):
    """cocoeval.py:256-313, one (imgId, catId) cell.

    dt_list: list of {'id', 'score', 'bbox' (xyxy), 'area'}
    gt_list: list of {'id', 'bbox' (xyxy), 'area', 'ignore', 'iscrowd'}
    """
    gt = list(gt_list)
    dt = list(dt_list)
    if len(gt) == 0 and len(dt) == 0:
        return None

    for g in gt:  # cocoeval.py:266-270
        if g.get("ignore", 0) or (g["area"] < aRng[0] or g["area"] > aRng[1]):
            g["_ignore"] = 1
        else:
            g["_ignore"] = 0

    # sort dt highest score first, sort gt ignore last  (cocoeval.py:272-276)
    gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
    gt = [gt[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
    dt = [dt[i] for i in dtind[0:maxDet]]
    iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
    # load computed ious  (cocoeval.py:278-279)
    ious_full = _bbox_iou_xyxy(
        np.asarray([d["bbox"] for d in dt], np.float64).reshape(-1, 4),
        np.asarray([g["bbox"] for g in gt_list], np.float64).reshape(-1, 4),
    )
    ious = ious_full[:, gtind] if len(ious_full) > 0 else ious_full

    T = len(iouThrs)
    G = len(gt)
    D = len(dt)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gtIg = np.array([g["_ignore"] for g in gt])
    dtIg = np.zeros((T, D))
    if np.size(ious):  # cocoeval.py:287-305
        for tind, t in enumerate(iouThrs):
            for dind, d in enumerate(dt):
                # information about best match so far (m=-1 -> unmatched)
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gt):
                    # if this gt already matched, and not a crowd, continue
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    # if dt matched to reg gt, and on ignore gt, stop
                    if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                        break
                    # continue to next gt unless better match made
                    if ious[dind, gind] < iou:
                        continue
                    # if match successful and best so far, store appropriately
                    iou = ious[dind, gind]
                    m = gind
                # if match made store id of match for both dt and gt
                if m == -1:
                    continue
                dtIg[tind, dind] = gtIg[m]
                dtm[tind, dind] = gt[m]["id"]
                gtm[tind, m] = d["id"]
    # set unmatched detections outside of area range to ignore
    # (cocoeval.py:306-308)
    a = np.array(
        [d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]
    ).reshape((1, len(dt)))
    dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "gtMatches": gtm,
        "dtScores": [d["score"] for d in dt],
        "gtIgnore": gtIg,
        "dtIgnore": dtIg,
    }


def accumulate(evalImgs_per_class, iouThrs, maxDet=100):
    """cocoeval.py:315-378 for K classes, A=1 area, M=1 maxDets.

    evalImgs_per_class: list (len K) of lists of evaluateImg results
    (None entries allowed, as upstream). Returns ``precision`` of shape
    (T, R, K) with -1 where undefined, ``recall`` (T, K), and ``scores``
    (T, R, K).
    """
    iouThrs = np.asarray(iouThrs, np.float64)
    recThrs = np.linspace(
        0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1, endpoint=True
    )  # Params.setDetParams, cocoeval.py:507
    T = len(iouThrs)
    R = len(recThrs)
    K = len(evalImgs_per_class)
    precision = -np.ones((T, R, K))
    recall = -np.ones((T, K))
    scores = -np.ones((T, R, K))

    for k in range(K):  # cocoeval.py:335-377 (a/m loops collapsed: A=M=1)
        E = [e for e in evalImgs_per_class[k] if e is not None]
        if len(E) == 0:
            continue
        dtScores = np.concatenate([e["dtScores"][0:maxDet] for e in E])
        # different sorting method generates slightly different results.
        # mergesort is used to be consistent as Matlab implementation.
        inds = np.argsort(-dtScores, kind="mergesort")
        dtScoresSorted = dtScores[inds]

        dtm = np.concatenate(
            [e["dtMatches"][:, 0:maxDet] for e in E], axis=1
        )[:, inds]
        dtIg = np.concatenate(
            [e["dtIgnore"][:, 0:maxDet] for e in E], axis=1
        )[:, inds]
        gtIg = np.concatenate([e["gtIgnore"] for e in E])
        npig = np.count_nonzero(gtIg == 0)
        if npig == 0:
            continue
        tps = np.logical_and(dtm, np.logical_not(dtIg))
        fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))

        tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
        fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
        for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
            tp = np.array(tp)
            fp = np.array(fp)
            nd = len(tp)
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            q = np.zeros((R,))
            ss = np.zeros((R,))

            if nd:
                recall[t, k] = rc[-1]
            else:
                recall[t, k] = 0

            # numpy is slow without cython optimization for accessing
            # elements use python array gets significant speed improvement
            pr = pr.tolist()
            q = q.tolist()

            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]

            inds2 = np.searchsorted(rc, recThrs, side="left")
            try:
                for ri, pi in enumerate(inds2):
                    q[ri] = pr[pi]
                    ss[ri] = dtScoresSorted[pi]
            except Exception:
                pass
            precision[t, :, k] = np.array(q)
            scores[t, :, k] = np.array(ss)
    return precision, recall, scores


def pycoco_ap(images, num_classes, iou_thrs, max_dets=100):
    """Drive evaluateImg+accumulate over the fuzz harness's image dicts.

    Returns (C, T) AP (mean precision over recall thresholds, -1 entries
    excluded as in COCOeval.summarize cocoeval.py:427-434), NaN for classes
    with no GT — the same interface as oracles.ref_coco_accumulate.
    """
    iou_thrs = np.asarray(iou_thrs, np.float64)
    T = len(iou_thrs)
    next_id = [1]

    def mk(boxes, scores=None):
        out = []
        for i in range(len(boxes)):
            b = np.asarray(boxes[i], np.float64)
            d = {
                "id": next_id[0],
                "bbox": b,
                "area": float((b[2] - b[0]) * (b[3] - b[1])),
            }
            if scores is not None:
                d["score"] = float(scores[i])
            else:
                d["ignore"] = 0
            out.append(d)
            next_id[0] += 1
        return out

    per_class = []
    for c in range(num_classes):
        evs = []
        for img in images:
            dmask = np.asarray(img["dt_cls"]) == c
            gmask = np.asarray(img["gt_cls"]) == c
            dt = mk(
                np.asarray(img["dt_boxes"], np.float64).reshape(-1, 4)[dmask],
                np.asarray(img["dt_scores"], np.float64)[dmask],
            )
            gt = mk(
                np.asarray(img["gt_boxes"], np.float64).reshape(-1, 4)[gmask]
            )
            evs.append(evaluateImg(dt, gt, iou_thrs, max_dets))
        per_class.append(evs)

    precision, _, _ = accumulate(per_class, iou_thrs, max_dets)
    aps = np.full((num_classes, T), np.nan)
    for c in range(num_classes):
        for t in range(T):
            s = precision[t, :, c]
            s = s[s > -1]
            aps[c, t] = np.mean(s) if s.size else np.nan
    return aps
