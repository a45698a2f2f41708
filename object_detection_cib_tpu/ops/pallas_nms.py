"""Pallas TPU kernel: exact greedy NMS in one grid pass, no K x K HBM matrix.

The XLA reference path (core/nms.py `_greedy_nms_mask`) materializes the
(K, K) IoU matrix (16MB f32 per image at the production K=2048) and re-reads
it on every Jacobi sweep until the fixpoint. This kernel exploits that the
suppression dependency graph is strictly lower-triangular (boxes are in
descending-score order): processing column tiles LEFT TO RIGHT with the keep
vector held in VMEM scratch makes every cross-tile dependency already final
(block Gauss-Seidel), so a single pass over tiles is exact; only the
within-tile chains need iteration, done by a Jacobi fixpoint on the tile's
(TILE, TILE) IoU block in VMEM.

Memory: boxes (K, 4) + keep (K,) stay in VMEM the whole solve (36KB at
K=2048); per tile a (K, TILE) IoU block is recomputed from boxes (2MB f32 at
K=2048 — inside the ~3MB scratch budget this remote compiler tolerates).
Nothing K^2-sized ever touches HBM.

Matches torchvision.ops.nms semantics as used by kod/core/nms.py:69
(suppress when IoU strictly > threshold, higher-scored==earlier index wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256
_EPS = 1e-7  # same union eps as core/iou.py compute_iou_pairwise


def _make_tile_kernel(thr: float):
    """Kernel for one column tile (grid axis 0; vmap batching prepends its
    own axis transparently — program_id(0) stays the tile index).

    refs: boxes (K,4) f32 full, live (K,1) f32 full, out (TILE,1) f32 block,
    keep (K,1) f32 VMEM scratch carried across the sequential tile grid.
    """

    def kernel(boxes_ref, live_ref, out_ref, keep_ref):
        K = boxes_ref.shape[0]
        t = pl.program_id(0)  # tile index
        s = t * _TILE

        # reset keep state at each image's first tile
        @pl.when(t == 0)
        def _():
            keep_ref[:] = live_ref[:]

        jb = boxes_ref[:]  # (K, 4) candidate suppressors
        ib = boxes_ref[pl.ds(s, _TILE), :]  # (TILE, 4) targets
        jx1, jy1, jx2, jy2 = jb[:, 0], jb[:, 1], jb[:, 2], jb[:, 3]
        ix1, iy1, ix2, iy2 = ib[:, 0], ib[:, 1], ib[:, 2], ib[:, 3]
        jarea = (jx2 - jx1) * (jy2 - jy1)
        iarea = (ix2 - ix1) * (iy2 - iy1)

        ox1 = jnp.maximum(jx1[:, None], ix1[None, :])
        oy1 = jnp.maximum(jy1[:, None], iy1[None, :])
        ox2 = jnp.minimum(jx2[:, None], ix2[None, :])
        oy2 = jnp.minimum(jy2[:, None], iy2[None, :])
        inter = jnp.clip(ox2 - ox1, 0.0) * jnp.clip(oy2 - oy1, 0.0)
        union = jarea[:, None] + iarea[None, :] - inter
        over = jnp.where(inter / (union + _EPS) > thr, 1.0, 0.0)  # (K, TILE)

        rows = jax.lax.broadcasted_iota(jnp.int32, (K, _TILE), 0)

        # cross-tile suppression: keep state for rows < s is FINAL (tiles are
        # processed left to right), rows >= s masked out here
        keep = keep_ref[:, :][:, 0]  # (K,)
        cross = (over * jnp.where(rows < s, keep[:, None], 0.0)).max(axis=0)
        live_t = live_ref[pl.ds(s, _TILE), :][:, 0]  # (TILE,)
        k_local = live_t * (1.0 - cross)  # (TILE,)

        # within-tile Jacobi to fixpoint (chain depth <= TILE iterations;
        # terminates exactly, no fixed cap). The (TILE, TILE) self-IoU block
        # is recomputed from the tile boxes — Mosaic cannot dynamic-slice a
        # computed array (only refs), and recompute is cheaper than a
        # scratch round-trip anyway.
        tx1 = jnp.maximum(ix1[:, None], ix1[None, :])
        ty1 = jnp.maximum(iy1[:, None], iy1[None, :])
        tx2 = jnp.minimum(ix2[:, None], ix2[None, :])
        ty2 = jnp.minimum(iy2[:, None], iy2[None, :])
        tinter = jnp.clip(tx2 - tx1, 0.0) * jnp.clip(ty2 - ty1, 0.0)
        tunion = iarea[:, None] + iarea[None, :] - tinter
        tile_over = jnp.where(tinter / (tunion + _EPS) > thr, 1.0, 0.0)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1)
        )
        supp = tile_over * jnp.where(tri, 1.0, 0.0)  # (TILE, TILE)
        base = k_local

        def cond(st):
            cur, prev = st
            return jnp.any(cur != prev)

        def body(st):
            cur, _ = st
            killed = (supp * cur[:, None]).max(axis=0)
            return base * (1.0 - killed), cur

        k_final, _ = jax.lax.while_loop(
            cond, body, (base, jnp.zeros_like(base))
        )

        keep_ref[pl.ds(s, _TILE), :] = k_final[:, None]
        out_ref[:, :] = k_final[:, None]

    return kernel


def pallas_greedy_nms_mask(
    boxes: jnp.ndarray,
    live: jnp.ndarray,
    iou_thres: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B?, K, 4) boxes + (B?, K) live -> exact greedy keep mask.

    boxes must be in descending-score order (class-offset applied by the
    caller); K a multiple of 256. Any K whose (K, 256) f32 block fits VMEM
    works — 2048 (the production cap) uses 2MB.
    """

    def run(b, l):
        K = b.shape[0]
        assert K % _TILE == 0, f"K={K} must be a multiple of {_TILE}"
        out = pl.pallas_call(
            _make_tile_kernel(float(iou_thres)),
            grid=(K // _TILE,),
            out_shape=jax.ShapeDtypeStruct((K, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec((K, 4), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_TILE, 1), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((K, 1), jnp.float32)],
            interpret=interpret,
        )(b.astype(jnp.float32), jnp.where(l, 1.0, 0.0)[:, None])
        return out[:, 0] > 0.5

    if boxes.ndim == 2:
        return run(boxes, live)
    return jax.vmap(run)(boxes, live)
