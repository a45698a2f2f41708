"""Bounding-box coordinate conversions, pure jnp (jittable, any batch shape).

Capability parity: kod/core/bbox/boxes.py (cxcywh<->xyxy converters and
scaling). The reference keeps scalar NamedTuple box types plus tensor
converters; on TPU everything is batched arrays, so only the tensor ops
survive the redesign.
"""

from __future__ import annotations

import jax.numpy as jnp


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [cx, cy, w, h] -> [x1, y1, x2, y2]."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x1, y1, x2, y2] -> [cx, cy, w, h]."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def scale_boxes(boxes: jnp.ndarray, x_factor, y_factor) -> jnp.ndarray:
    """Scale x coords by ``x_factor`` and y coords by ``y_factor``.

    Works for both xyxy and cxcywh layouts (both store x at dims 0,2 and y at
    dims 1,3) — matches CXCYWHBoundingBox.scale_tensor /
    XYXYBoundingBox.scale_tensor (kod/core/bbox/boxes.py:45,99).
    """
    fac = jnp.asarray([x_factor, y_factor, x_factor, y_factor], boxes.dtype)
    return boxes * fac


def box_area(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> (...,) area."""
    return (boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) * (
        boxes_xyxy[..., 3] - boxes_xyxy[..., 1]
    )
