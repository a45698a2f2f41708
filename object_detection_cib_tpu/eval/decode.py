"""Inference-side prediction decode: head outputs -> (B, N, 4+1+nc).

Capability parity: kod/lightning/experiments/yv5_baseline/layers.py:15-155.
Per level:  xy = (sigmoid*2 - 0.5 + grid) * stride
            wh = (sigmoid*2)^2 * anchor_px          (ref layers.py:55-63)
then cxcywh -> xyxy, obj/cls sigmoid, flatten and concat all levels
(ref Yolov5PredictionAssembler, layers.py:127-155). The flattening order is
(H, W, A) per level — NMS and mAP are order-invariant, so parity holds.

Grids are built with broadcasted_iota inside jit (no host-side meshgrid
buffers as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from object_detection_cib_tpu.core.boxes import cxcywh_to_xyxy
from object_detection_cib_tpu.core.types import LevelAnchors
from object_detection_cib_tpu.models.yolov5 import (
    DetectionHeadResult,
    Yolov5NetworkResult,
)


def _decode_level(
    head: DetectionHeadResult, anchors_px: jnp.ndarray, stride: int
) -> jnp.ndarray:
    box = head.box.astype(jnp.float32)
    B, H, W, A, _ = box.shape
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # (1,H,W,1,2)

    xy = (jax.nn.sigmoid(box[..., 0:2]) * 2.0 - 0.5 + grid) * stride
    wh = (jax.nn.sigmoid(box[..., 2:4]) * 2.0) ** 2 * anchors_px[None, None, None]
    xyxy = cxcywh_to_xyxy(jnp.concatenate([xy, wh], axis=-1))

    obj = jax.nn.sigmoid(head.obj.astype(jnp.float32))
    cls = jax.nn.sigmoid(head.cls.astype(jnp.float32))

    n = H * W * A
    return jnp.concatenate(
        [
            xyxy.reshape(B, n, 4),
            obj.reshape(B, n, 1),
            cls.reshape(B, n, -1),
        ],
        axis=-1,
    )


def decode_predictions(
    net_result: Yolov5NetworkResult, anchors: LevelAnchors
) -> jnp.ndarray:
    """(B, sum_l H_l*W_l*A, 4+1+nc) decoded detections in input-image pixels."""
    outs = []
    for head, info in zip(net_result.levels(), anchors.levels()):
        outs.append(_decode_level(head, jnp.asarray(info.as_array()), info.stride))
    return jnp.concatenate(outs, axis=1)
