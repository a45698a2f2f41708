"""YOLOv5 anchor-target assignment as fixed-shape masked computation.

Capability parity: kod/core/label_assignment/yv5.py:45-319, re-expressed for
XLA. The reference pipeline is ragged (boolean-mask filtering changes shapes
at yv5.py:160-176 and 178-205); here every step runs at static capacity
``B x T x A x n_off`` (batch x max-targets x anchors x offset-candidates,
n_off=3 compacted / 5 reference-table) with a
validity mask carried instead of filtering:

  1. batched targets: per-image GT -> cxcywh / stride     (ref yv5.py:68-121)
  2. anchor filter:   max(wh/a, a/wh) < threshold         (ref yv5.py:160-176)
  3. neighbour cells: self + up to 2 of 4 neighbours via the 0.5-offset
     trick                                                 (ref yv5.py:178-205)
  4. emit (sample, anchor, gy, gx) indices (clamped), cell-relative gt boxes
     (cxcy - gij, wh), per-match scaled anchors            (ref yv5.py:254-296)

The loss gathers/scatters with these indices; invalid slots carry index 0 and
are zeroed through the mask (scatter uses them with a masked no-op update).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_cib_tpu.core.boxes import xyxy_to_cxcywh
from object_detection_cib_tpu.core.types import FeatureShape, LevelAnchors

# Offset candidate table (ref yv5.py:56-66): self, right, down, left, up —
# applied as gij = floor(cxcy - off * 0.5).
_OFFSETS = np.asarray(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]], np.float32
)
_OFF_BIAS = 0.5
NUM_OFFSETS = 3  # default capacity: compacted (see _assign_level)


class LevelAssignment(NamedTuple):
    """Per-level assignment at capacity K = B*T*A*n_off, flattened.

    Index arrays address the head output laid out (B, H, W, A, p) — the
    TPU-native NHWC layout (reference gathers on (B, A, H, W, p)).
    """

    sample_idx: jnp.ndarray  # (K,) int32 — batch index
    anchor_idx: jnp.ndarray  # (K,) int32
    grid_y: jnp.ndarray  # (K,) int32, clamped to [0, H-1]
    grid_x: jnp.ndarray  # (K,) int32, clamped to [0, W-1]
    txywh: jnp.ndarray  # (K, 4) cell-relative gt: (cxcy - gij, wh) grid units
    labels: jnp.ndarray  # (K,) int32
    anchors_wh: jnp.ndarray  # (K, 2) anchor (w, h) in grid units
    valid: jnp.ndarray  # (K,) bool


class Assignment(NamedTuple):
    ll: LevelAssignment
    ml: LevelAssignment
    hl: LevelAssignment

    def levels(self) -> Tuple[LevelAssignment, ...]:
        return (self.ll, self.ml, self.hl)


def _assign_level(
    boxes_xyxy: jnp.ndarray,  # (B, T, 4) pixels
    labels: jnp.ndarray,  # (B, T) int32
    mask: jnp.ndarray,  # (B, T) bool
    anchors_px: np.ndarray,  # (A, 2) anchor w,h pixels (static)
    stride: int,
    image_shape: FeatureShape,
    threshold: float,
    offset_capacity: int = 3,
) -> LevelAssignment:
    B, T, _ = boxes_xyxy.shape
    A = anchors_px.shape[0]

    grid_w = image_shape.width / stride  # float, matches ref yv5.py:183-187
    grid_h = image_shape.height / stride
    out_w = image_shape.width // stride
    out_h = image_shape.height // stride

    anchors_grid = jnp.asarray(anchors_px / stride, jnp.float32)  # (A, 2)

    # 1. targets in grid units
    t = xyxy_to_cxcywh(boxes_xyxy.astype(jnp.float32)) / float(stride)  # (B,T,4)
    cxcy = t[..., 0:2]
    wh = t[..., 2:4]

    # 2. anchor ratio filter (B, T, A)
    ratio = wh[:, :, None, :] / anchors_grid[None, None, :, :]  # (B,T,A,2)
    worst = jnp.maximum(ratio, 1.0 / ratio).max(axis=-1)
    anchor_ok = (worst < threshold) & mask[:, :, None]

    # 3. neighbour-cell candidates — independent of anchor.
    gx, gy = cxcy[..., 0], cxcy[..., 1]
    inv_x, inv_y = grid_w - gx, grid_h - gy
    j = (gx % 1.0 < _OFF_BIAS) & (gx > 1.0)
    k = (gy % 1.0 < _OFF_BIAS) & (gy > 1.0)
    l = (inv_x % 1.0 < _OFF_BIAS) & (inv_x > 1.0)
    m = (inv_y % 1.0 < _OFF_BIAS) & (inv_y > 1.0)

    n_off = offset_capacity
    if offset_capacity == 3:
        # Compacted candidate slots: (center, x-neighbour, y-neighbour).
        # j/l (and k/m) are mutually exclusive except when the coordinate is
        # an exact integer — there the reference's 5-slot table emits BOTH,
        # but the l/m candidate cell floor(g + 0.5) == floor(g) duplicates
        # the center match; the compact form keeps j/k and drops that
        # duplicate. Only deviation: one repeated loss term on
        # measure-zero coordinates (see tests/test_assigner_fuzz.py).
        off_x = jnp.where(j, _OFF_BIAS, -_OFF_BIAS)  # (B,T)
        off_y = jnp.where(k, _OFF_BIAS, -_OFF_BIAS)
        zeros = jnp.zeros_like(off_x)
        offsets = jnp.stack(
            [
                jnp.stack([zeros, zeros], -1),
                jnp.stack([off_x, zeros], -1),
                jnp.stack([zeros, off_y], -1),
            ],
            axis=-2,
        )  # (B, T, 3, 2)
        off_ok = jnp.stack([jnp.ones_like(j), j | l, k | m], axis=-1)
    else:
        assert offset_capacity == 5
        offsets = jnp.broadcast_to(
            jnp.asarray(_OFFSETS * _OFF_BIAS), (B, T, 5, 2)
        )
        off_ok = jnp.stack([jnp.ones_like(j), j, k, l, m], axis=-1)

    # combined validity (B, T, A, n_off)
    valid = anchor_ok[..., None] & off_ok[:, :, None, :]

    # gij = floor(cxcy - off); torch .long() truncates, but operands are >= 0
    # whenever the offset is valid, so floor is equivalent (ref yv5.py:281).
    shifted = cxcy[:, :, None, :] - offsets  # (B,T,n_off,2)
    gij = jnp.floor(shifted)
    txy = (cxcy[:, :, None, :] - gij)[:, :, None, :, :]  # (B,T,1,n_off,2)
    gij = gij.astype(jnp.int32)
    gi = jnp.clip(gij[..., 0], 0, out_w - 1)[:, :, None, :]
    gj = jnp.clip(gij[..., 1], 0, out_h - 1)[:, :, None, :]

    # broadcast everything to (B, T, A, n_off) and flatten
    def bc(x, extra_dims=()):
        return jnp.broadcast_to(x, (B, T, A, n_off) + extra_dims)

    K = B * T * A * n_off
    sample_idx = bc(
        jnp.arange(B, dtype=jnp.int32)[:, None, None, None]
    ).reshape(K)
    anchor_idx = bc(jnp.arange(A, dtype=jnp.int32)[None, None, :, None]).reshape(K)
    grid_y = bc(gj).reshape(K)
    grid_x = bc(gi).reshape(K)
    txywh = jnp.concatenate(
        [
            bc(txy, (2,)).reshape(K, 2),
            bc(wh[:, :, None, None, :], (2,)).reshape(K, 2),
        ],
        axis=-1,
    )
    labels_k = bc(labels.astype(jnp.int32)[:, :, None, None]).reshape(K)
    anchors_k = bc(anchors_grid[None, None, :, None, :], (2,)).reshape(K, 2)
    valid_k = valid.reshape(K)

    # Zero out indices of invalid slots so downstream gathers are cheap and
    # in-bounds regardless of padding contents.
    zero = jnp.zeros((), jnp.int32)
    sample_idx = jnp.where(valid_k, sample_idx, zero)
    anchor_idx = jnp.where(valid_k, anchor_idx, zero)
    grid_y = jnp.where(valid_k, grid_y, zero)
    grid_x = jnp.where(valid_k, grid_x, zero)
    labels_k = jnp.where(valid_k, labels_k, zero)

    return LevelAssignment(
        sample_idx=sample_idx,
        anchor_idx=anchor_idx,
        grid_y=grid_y,
        grid_x=grid_x,
        txywh=txywh,
        labels=labels_k,
        anchors_wh=anchors_k,
        valid=valid_k,
    )


def compact_level_assignment(
    level: LevelAssignment, cap: int
) -> LevelAssignment:
    """Stable-compact valid slots to the front and truncate to ``cap``.

    The assignment table is shape-stable at K = B*T*A*n_off but typically
    ~2% occupied (T is the padded-target capacity); the loss's row-gather at
    K slots has a serialized scatter-add backward on TPU that was profiled
    at 8 ms/step @640 (scalar-core bound, ~3 GB/s). One multi-operand
    stable sort (valid-first; vector-unit custom call, no gathers) shrinks
    every downstream gather/scatter by K/cap.

    Exact whenever n_valid <= cap; overflowing slots (monitor: compare
    `valid.sum()` against cap) are dropped in original-order tail position.
    """
    K = int(level.valid.shape[0])
    cap = min(int(cap), K)
    # sort only (key, iota) and gather the surviving rows: the 13-operand
    # stable sort moved every payload column through the sort network
    # (profiled 0.66 ms/level at K=138k @416 b=128 — 2 ms/step over the 3
    # levels); sorting the permutation instead is ~6x fewer sort bytes and
    # the payload becomes `cap` tiny row-gathers. Identical result: the
    # stable single-key sort orders ties by position, which is exactly the
    # iota payload's order.
    keys = jnp.where(level.valid, 0, 1).astype(jnp.int32)
    iota = jnp.arange(K, dtype=jnp.int32)
    _, perm = jax.lax.sort(
        (keys, iota), dimension=0, is_stable=True, num_keys=1
    )
    idx = perm[:cap]
    return LevelAssignment(
        sample_idx=level.sample_idx[idx],
        anchor_idx=level.anchor_idx[idx],
        grid_y=level.grid_y[idx],
        grid_x=level.grid_x[idx],
        txywh=level.txywh[idx],
        labels=level.labels[idx],
        anchors_wh=level.anchors_wh[idx],
        valid=level.valid[idx],
    )


def assign_targets(
    boxes_xyxy: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    image_shape: FeatureShape,
    anchors: LevelAnchors,
    threshold: float = 4.0,
    offset_capacity: int = 3,
) -> Assignment:
    """Assign padded GT to the three pyramid levels (jittable, static shapes).

    Args:
      boxes_xyxy: (B, T, 4) gt boxes in input-image pixels, zero-padded.
      labels:     (B, T) int class ids, zero-padded.
      mask:       (B, T) bool, True for real targets.
      image_shape: static input FeatureShape (w, h).
      anchors:    static LevelAnchors (strides + per-level anchor wh pixels).
      threshold:  wh-ratio gate (ref yv5.py:49, default 4.0).
    """
    per_level = []
    for info in anchors.levels():
        per_level.append(
            _assign_level(
                boxes_xyxy,
                labels,
                mask,
                info.as_array(),
                info.stride,
                image_shape,
                threshold,
                offset_capacity,
            )
        )
    return Assignment(*per_level)
