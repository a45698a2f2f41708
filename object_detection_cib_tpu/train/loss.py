"""YOLOv5 composite loss (CIoU box + BCE objectness + BCE classification).

Capability parity: kod/lightning/experiments/yv5_baseline/loss.py:25-248,
re-expressed as masked fixed-shape computation under jit:

  * box decode at matched cells: xy = sigmoid*2-0.5, wh = (sigmoid*2)^2*anchor
                                             (ref loss.py:77-80)
  * localization: (1 - CIoU).mean over matches (ref loss.py:94-96) -> masked
    mean over valid slots
  * objectness: BCE(mean over full map) with target = detached clamped IoU
    scattered at matched indices (ref loss.py:100-126), per-level weights
    4.0/1.0/0.4 (ref loss.py:40-42)
  * classification: one-hot BCE with optional per-class pos_weight — the
    loss-reweighing imbalance strategy (ref loss.py:58-63,155-160)
  * dynamic lambda scaling: obj by (img/640)^2, cls by nc/80
                                             (ref loss.py:229-237)

Losses are computed in fp32 regardless of network compute dtype.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from object_detection_cib_tpu.core.assigner import Assignment, LevelAssignment
from object_detection_cib_tpu.core.boxes import cxcywh_to_xyxy
from object_detection_cib_tpu.core.iou import IoUType, get_iou_fn
from object_detection_cib_tpu.core.types import FeatureShape
from object_detection_cib_tpu.models.yolov5 import (
    DetectionHeadResult,
    Yolov5NetworkResult,
)


class LossParams(NamedTuple):
    """ref Yolov5LossParams defaults (loss.py:34-43)."""

    lambda_classification: float = 0.5
    lambda_localization: float = 0.05
    lambda_objectness: float = 1.0
    lambda_ll_objectness: float = 4.0
    lambda_ml_objectness: float = 1.0
    lambda_hl_objectness: float = 0.4
    iou_type: str = "ciou"
    eps: float = 1e-7


class LossResult(NamedTuple):
    localization: jnp.ndarray
    objectness: jnp.ndarray
    classification: jnp.ndarray

    @property
    def total(self) -> jnp.ndarray:
        return self.localization + self.objectness + self.classification


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Elementwise BCE-with-logits, torch semantics.

    loss = pw * t * softplus(-x) + (1 - t) * softplus(x)
    """
    pos = jax.nn.softplus(-logits)
    neg = jax.nn.softplus(logits)
    if pos_weight is not None:
        pos = pos * pos_weight
    return targets * pos + (1.0 - targets) * neg


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.maximum(mask.sum(), 1.0)
    return (x * mask).sum() / cnt


def _level_losses(
    head: DetectionHeadResult,
    assign: LevelAssignment,
    iou_fn,
    class_weights: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (loc_loss, obj_loss_unweighted, cls_loss) for one level.

    Consumes the head's flat (B, H, W, A*(5+nc)) tensor: one row-gather at
    the matched cells yields (K, C) in fp32; box/obj/cls are sliced from the
    small gathered rows, so the big prediction map is never relaid out or
    upcast (it stays bf16 and is touched once more by the fused
    softplus-reduce of the objectness term).
    """
    raw = head.raw
    A, nc = head.num_anchors, head.num_classes
    B, H, W, _ = raw.shape
    s, gy, gx, a = assign.sample_idx, assign.grid_y, assign.grid_x, assign.anchor_idx
    valid = assign.valid.astype(jnp.float32)
    K = s.shape[0]
    # One row-gather in the map's native dtype; anchor selection below is a
    # one-hot multiply-sum over the tiny static A axis instead of a second
    # gather: multiplying by exact 0/1 and summing a single survivor is exact
    # in bf16, and the backward is a broadcast — the [rng, a] gather's
    # backward was a K-sized scatter-add per use (profiled at ~30% of the
    # whole train step at B=128).
    rows = raw[s, gy, gx]  # (K, A*(5+nc)) gather, bf16
    sel = jax.nn.one_hot(a, A, dtype=rows.dtype)  # (K, A) exact 0/1

    def pick(x):  # (K, A, C) -> (K, C) fp32 anchor select
        return (x * sel[:, :, None]).sum(axis=1).astype(jnp.float32)

    # --- localization (ref loss.py:65-98)
    p = pick(rows[:, : A * 4].reshape(K, A, 4))  # (K, 4)
    pred_xy = jax.nn.sigmoid(p[:, 0:2]) * 2.0 - 0.5
    pred_wh = (jax.nn.sigmoid(p[:, 2:4]) * 2.0) ** 2 * assign.anchors_wh
    pred_xyxy = cxcywh_to_xyxy(jnp.concatenate([pred_xy, pred_wh], axis=-1))
    gt_xyxy = cxcywh_to_xyxy(assign.txywh)
    iou = iou_fn(pred_xyxy, gt_xyxy)  # (K,)
    loc_loss = _masked_mean(1.0 - iou, valid)

    # --- objectness (ref loss.py:100-126): target = detached clamped IoU at
    # matched cells, 0 elsewhere, BCE-mean over the whole map. Instead of
    # scattering the target (TPU scatters serialize), use the identity
    # BCE(x, t) - BCE(x, 0) = -t*x:
    #   mean BCE = [sum softplus(x) - sum_matched t*x] / N
    # One gather replaces the scatter. (Duplicate (cell,anchor) matches sum
    # their corrections where the reference's scatter keeps the last write —
    # a rare, bounded deviation.)
    iou_t = jax.lax.stop_gradient(jnp.clip(iou, 0.0))
    obj_map = raw[..., A * 4 : A * 5]  # (B, H, W, A) lane slice, bf16-safe
    matched_x = (rows[:, A * 4 : A * 5] * sel).sum(axis=1).astype(jnp.float32)
    n_cells = B * H * W * A
    obj_loss = (
        jax.nn.softplus(obj_map.astype(jnp.float32)).sum()
        - (iou_t * matched_x * valid).sum()
    ) / n_cells

    # --- classification (ref loss.py:128-164)
    pc = pick(rows[:, A * 5 :].reshape(K, A, nc))  # (K, nc)
    one_hot = jax.nn.one_hot(assign.labels, nc, dtype=jnp.float32)
    cls_el = bce_with_logits(pc, one_hot, pos_weight=class_weights)  # (K, nc)
    # reference mean over (matches x classes); masked rows excluded
    cls_loss = (cls_el * valid[:, None]).sum() / jnp.maximum(valid.sum() * nc, 1.0)

    return loc_loss, obj_loss, cls_loss


def yolov5_loss(
    net_result: Yolov5NetworkResult,
    assignment: Assignment,
    image_shape: FeatureShape,
    params: LossParams = LossParams(),
    class_weights: Optional[jnp.ndarray] = None,
) -> LossResult:
    """Full three-level loss. All inputs fixed-shape; jit/pjit-safe.

    class_weights: optional (nc,) per-class BCE pos_weight — the
    loss-reweighing imbalance mitigation (ref tasks/trainer.py:54-60).
    """
    iou_fn = get_iou_fn(IoUType(params.iou_type), eps=params.eps)
    level_obj_w = (
        params.lambda_ll_objectness,
        params.lambda_ml_objectness,
        params.lambda_hl_objectness,
    )

    loc = obj = cls = 0.0
    for head, assign, w in zip(net_result.levels(), assignment.levels(), level_obj_w):
        l, o, c = _level_losses(head, assign, iou_fn, class_weights)
        loc = loc + l
        obj = obj + w * o
        cls = cls + c

    nc = net_result.ll.num_classes
    lambda_obj = params.lambda_objectness * (image_shape.width / 640.0) ** 2
    lambda_cls = params.lambda_classification * (nc / 80.0)

    return LossResult(
        localization=params.lambda_localization * loc,
        objectness=lambda_obj * obj,
        classification=lambda_cls * cls,
    )
