"""Pallas TPU kernel: greedy-NMS suppression fixpoint in VMEM.

The device NMS (core/nms.py) computes a (K, K) IoU matrix and runs a Jacobi
fixpoint to the exact greedy solution. Under plain XLA each Jacobi sweep
re-streams the suppression matrix from HBM; this kernel keeps boxes, the
suppression bitmask, and the keep vector resident in VMEM for the whole
solve (K<=1024 on v5e: the bf16 mask is <=2MB; K=2048's 8MB exceeds the
VMEM budget and the caller falls back to the XLA path), so fixpoint
iterations cost VPU time only.

Single-program grid: the IoU matrix is built tile-by-tile (TILE x K) from
the (K, 4) boxes and thresholded immediately to bf16 0/1 (fp32 KxK is never
materialized), then the Jacobi loop runs on the in-VMEM mask. Batched with
vmap (one program per image).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256
_JACOBI_ITERS = 32


def _nms_kernel(boxes_ref, live_ref, keep_ref, supp_ref, *, thr: float):
    """boxes (K,4) f32, live (K,1) f32 -> keep (K,1) f32.

    supp_ref: (K, K) bf16 VMEM scratch; supp[j, i]=1 iff the higher-scored
    (earlier) box j overlaps i beyond `thr`.
    """
    K = boxes_ref.shape[0]
    boxes = boxes_ref[:]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    n_tiles = K // _TILE

    # Static unroll over row tiles; per-tile slices come straight from the
    # VMEM ref with pl.ds (array dynamic_slice is not lowerable here).
    for t in range(n_tiles):
        s = t * _TILE
        tb = boxes_ref[pl.ds(s, _TILE), :]  # (T, 4)
        bx1, by1, bx2, by2 = tb[:, 0], tb[:, 1], tb[:, 2], tb[:, 3]
        barea = (bx2 - bx1) * (by2 - by1)
        ix1 = jnp.maximum(bx1[:, None], x1[None, :])  # (T, K)
        iy1 = jnp.maximum(by1[:, None], y1[None, :])
        ix2 = jnp.minimum(bx2[:, None], x2[None, :])
        iy2 = jnp.minimum(by2[:, None], y2[None, :])
        inter = jnp.clip(ix2 - ix1, 0.0) * jnp.clip(iy2 - iy1, 0.0)
        union = barea[:, None] + area[None, :] - inter
        iou = inter / (union + 1e-7)
        rows = jax.lax.broadcasted_iota(jnp.int32, (_TILE, K), 0) + s
        cols = jax.lax.broadcasted_iota(jnp.int32, (_TILE, K), 1)
        tile = jnp.where((iou > thr) & (rows < cols), 1.0, 0.0).astype(jnp.bfloat16)
        supp_ref[pl.ds(s, _TILE), :] = tile

    live = live_ref[:, 0]  # (K,) f32 0/1

    # Jacobi sweeps on the VMEM mask; converges in suppression-chain depth
    # steps. Fixed iteration count (exact for chains <= _JACOBI_ITERS, which
    # covers any realistic detection layout); f32 state — Mosaic lowers
    # vector f32 arithmetic more reliably than bool vectors.
    def body(_, keep):
        killed = (supp_ref[:] * keep[:, None].astype(jnp.bfloat16)).max(axis=0)
        return live * (1.0 - killed.astype(jnp.float32))

    keep = jax.lax.fori_loop(0, _JACOBI_ITERS, body, live)
    keep_ref[:, 0] = keep


def pallas_greedy_nms_mask(
    boxes: jnp.ndarray,
    live: jnp.ndarray,
    iou_thres: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B?, K, 4) boxes + (B?, K) live -> exact greedy keep mask.

    K must be a multiple of 256 (pad candidates with live=False otherwise).
    """

    def run(b, l):
        K = b.shape[0]
        assert K % _TILE == 0, f"K={K} must be a multiple of {_TILE}"
        out = pl.pallas_call(
            functools.partial(_nms_kernel, thr=float(iou_thres)),
            out_shape=jax.ShapeDtypeStruct((K, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((K, K), jnp.bfloat16)],
            interpret=interpret,
        )(b.astype(jnp.float32), jnp.where(l, 1.0, 0.0)[:, None])
        return out[:, 0] > 0.5

    if boxes.ndim == 2:
        return run(boxes, live)
    return jax.vmap(run)(boxes, live)
