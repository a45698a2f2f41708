"""Device-side batched non-max suppression with static shapes.

Capability parity: kod/core/nms.py:9-75 (which loops over images in Python
and calls the torchvision C++ NMS per image, synchronizing with the host).
The TPU redesign keeps everything on device with fixed shapes:

  * conf gate: candidate iff obj_conf > conf_thres           (ref nms.py:37)
  * score:     conf = obj_conf * cls_conf                    (ref nms.py:41)
  * multi-label: when nc > 1 every (box, class) pair with score > conf_thres
    is an independent candidate                              (ref nms.py:46-48)
  * per-class NMS via the +class*4096 box-offset trick       (ref nms.py:66-69)
  * caps: top-`max_nms` pre-NMS, `max_det` post               (ref nms.py:24-26)

Instead of ragged filtering, candidates are ranked with top_k at a static
capacity (``max_nms``) and suppressed with an O(K^2) IoU matrix + greedy
sequential mask (K fori_loop steps of vector ops — XLA-friendly, no host
sync). Output is a fixed (B, max_det, 6) tensor + per-image valid count.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from object_detection_cib_tpu.core.iou import compute_iou_pairwise

_MAX_WH = 4096.0  # class-offset multiplier (ref nms.py:24)


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # (B, max_det, 4) xyxy
    scores: jnp.ndarray  # (B, max_det)
    classes: jnp.ndarray  # (B, max_det) int32
    valid: jnp.ndarray  # (B, max_det) bool
    num_valid: jnp.ndarray  # (B,) int32


def _greedy_nms_mask(boxes: jnp.ndarray, live: jnp.ndarray, iou_thres: float):
    """Greedy NMS over score-sorted boxes. Returns keep mask (K,) bool.

    boxes: (K, 4) sorted by descending score; live: (K,) candidate validity.

    TPU-first formulation: greedy NMS is the unique fixpoint of
        keep[i] = live[i] and not exists j<i with keep[j] and iou(j,i)>thr
    whose dependency graph is a DAG (strictly lower-triangular), so Jacobi
    iteration converges to the exact greedy solution in at most
    suppression-chain-depth steps (typically < 10). Each step is one dense
    (K, K) masked reduce — MXU/VPU-friendly — instead of K sequential
    dynamic-slice iterations (a ~50x latency win at K=2048).
    """
    K = boxes.shape[0]
    iou = compute_iou_pairwise(boxes, boxes)  # (K, K)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    # suppress[j, i]: higher-scored j kills i
    suppress = (iou > iou_thres) & (row < col)

    def cond(state):
        keep, prev, it = state
        return (it < K) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        killed = jnp.any(suppress & keep[:, None], axis=0)
        return live & ~killed, keep, it + 1

    init = (live, jnp.zeros_like(live), jnp.zeros((), jnp.int32))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


def non_max_suppression(
    detections: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes: Optional[Sequence[int]] = None,
    max_det: int = 300,
    max_nms: int = 2048,
    multi_label: Optional[bool] = None,
    impl: str = "auto",
) -> NMSResult:
    """Batched NMS on raw decoded detections.

    Args:
      detections: (B, N, 5 + nc) — xyxy, obj_conf, per-class conf (all
        sigmoided), as produced by eval decode (parity with ref layers.py).
      conf_thres / iou_thres: thresholds (ref defaults 0.25 / 0.45; the val
        loop uses 0.001 / 0.6 — kod/.../exp.py:45-46).
      classes: optional static allow-list of class ids.
      max_det: max detections kept per image (ref nms.py:25).
      max_nms: static candidate capacity fed to suppression. The reference
        allows 30000 ragged candidates; on TPU we keep the top `max_nms` by
        score, which is lossless w.r.t. the final top-`max_det` picks unless
        more than `max_nms` candidates beat them pre-NMS.
      multi_label: defaults to nc > 1 (ref nms.py:27).
    """
    B, N, D = detections.shape
    nc = D - 5
    if multi_label is None:
        multi_label = nc > 1

    boxes = detections[..., :4]  # (B, N, 4)
    obj = detections[..., 4]  # (B, N)
    cls = detections[..., 5:]  # (B, N, nc)

    obj_ok = obj > conf_thres  # (B, N) confidence gate

    if multi_label:
        # scores (B, N, nc): conf = obj * cls; candidate iff score>thres & obj_ok
        scores = cls * obj[..., None]
        cand = (scores > conf_thres) & obj_ok[..., None]
        flat_scores = jnp.where(cand, scores, -1.0).reshape(B, N * nc)
        class_ids = jnp.broadcast_to(
            jnp.arange(nc, dtype=jnp.int32)[None, None, :], (B, N, nc)
        ).reshape(B, N * nc)
        box_ids = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, :, None], (B, N, nc)
        ).reshape(B, N * nc)
    else:
        # best class only (ref nms.py:50-51): conf = obj * max cls
        best = jnp.argmax(cls, axis=-1).astype(jnp.int32)  # (B, N)
        best_conf = jnp.take_along_axis(cls, best[..., None], axis=-1)[..., 0]
        scores = best_conf * obj
        cand = (scores > conf_thres) & obj_ok
        flat_scores = jnp.where(cand, scores, -1.0)
        class_ids = best
        box_ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))

    if classes is not None:
        allow = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)
        flat_scores = jnp.where(allow[class_ids], flat_scores, -1.0)

    k = min(max_nms, flat_scores.shape[1])
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)  # (B, K)
    top_class = jnp.take_along_axis(class_ids, top_idx, axis=1)  # (B, K)
    top_box_id = jnp.take_along_axis(box_ids, top_idx, axis=1)  # (B, K)
    top_boxes = jnp.take_along_axis(boxes, top_box_id[..., None], axis=1)  # (B,K,4)
    live = top_scores > 0.0

    # per-class offset so cross-class pairs never overlap (ref nms.py:66-69)
    offset_boxes = top_boxes + (top_class.astype(jnp.float32) * _MAX_WH)[..., None]

    # Pallas sweep kernel: recomputes IoU tiles in VMEM instead of holding
    # a (K, K) matrix in HBM; the production path on TPU. K<=2048 keeps the
    # (K, 256) f32 tile within the ~2-3MB VMEM scratch budget.
    if impl == "auto":
        impl = (
            "pallas"
            if k % 256 == 0 and k <= 2048 and jax.default_backend() != "cpu"
            else "xla"
        )
    if impl in ("pallas", "pallas_interpret") and k % 256 == 0 and k <= 2048:
        from object_detection_cib_tpu.ops.pallas_nms import pallas_greedy_nms_mask

        keep = pallas_greedy_nms_mask(
            offset_boxes, live, iou_thres, interpret=impl == "pallas_interpret"
        )
    else:
        keep = jax.vmap(_greedy_nms_mask, in_axes=(0, 0, None))(
            offset_boxes, live, iou_thres
        )  # (B, K)

    # compact kept detections to the front, cap at max_det
    kept_scores = jnp.where(keep, top_scores, -1.0)
    order = jnp.argsort(-kept_scores, axis=1)[:, :max_det]  # stable desc
    out_scores = jnp.take_along_axis(kept_scores, order, axis=1)
    out_boxes = jnp.take_along_axis(top_boxes, order[..., None], axis=1)
    out_class = jnp.take_along_axis(top_class, order, axis=1)
    out_valid = out_scores > 0.0
    out_scores = jnp.where(out_valid, out_scores, 0.0)

    return NMSResult(
        boxes=out_boxes * out_valid[..., None],
        scores=out_scores,
        classes=jnp.where(out_valid, out_class, -1),
        valid=out_valid,
        num_valid=out_valid.sum(axis=1).astype(jnp.int32),
    )
