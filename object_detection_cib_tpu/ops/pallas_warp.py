"""Pallas TPU kernel: the fused mosaic+affine separable warp in ONE kernel.

`ops.augment.mosaic_affine_batch` (planar fast path) evaluates

    out[g,c,y,x] = sum_q  Ay[g,q] @ (img[g,q,c] - FILL) @ Ax[g,q]^T

as two dense einsums. The tap matrices are 2-sparse (bilinear: <=2 nonzeros
per output row), so the dense formulation does ~200x the necessary MACs, and
XLA executes it as 384 small batched matmuls plus an HBM round-trip for the
(G,4,C,S,S) intermediate — measured 4.5 ms/128-batch @416 at ~12% MXU
utilization (ROOFLINE.md "dense separable-warp tap matmuls" lever).

This kernel re-orders the contraction to y-pass-then-x-pass and runs both
passes back to back in VMEM per (group, row-block, quadrant) grid step:

    Wy    = 2-sparse row-blend matrix, built in-register from the per-row
            tap scalars (j0, w0, w1) with an iota compare — never hits HBM
    ybl_c = Wy @ (img[g,q,c] - FILL)          (MXU, bf16 x bf16 -> f32)
    out  += ybl_c @ Ax[g,q]^T                 (MXU, accumulated over q)

The (G,4,C,S,S) intermediate never exists; the only HBM traffic is the u8
source planes (read once per quadrant), Ax, and the f32 output block.

Contribution skip (r4): a mosaic quadrant's y-window covers only ~half the
output rows, so for a given output row block ~35-45% of the (row-block,
quadrant) grid steps have every tap weight zeroed — their two dense dots
would produce exact zeros. Per-step activity flags are scalar-prefetched
into SMEM; dead steps skip all six dots, and their block fetches are
remapped to the running active quadrant's index so the pipeline elides
their source-plane DMAs (repeated block indices are not re-copied). This
is the banded-formulation FLOP reduction ROOFLINE.md left on the table,
realized at row-block granularity.

Numerics: identical accuracy class as the einsum path's precision="fast"
(bf16 multiplier operands, f32 accumulation) — the pass order swap (y-then-x
vs x-then-y) reassociates the 4-tap bilinear sum, so pixels can differ from
the einsum fast path by ~1 unit pre-rint, the same bound fast already has vs
exact (tests/test_pallas_warp.py asserts the bound vs BOTH paths).

Restrictions (fall back to the einsum path otherwise; the caller gates):
  * planar images (G, 4, 3, S, S), S % 8 == 0, S <= 512 (VMEM budget:
    the whole (3, S, S) u8 quadrant block stays resident per grid step —
    520 KB @416; @640 the block alone is 1.2 MB and the remote Mosaic
    compiler's ~2-3 MB scratch ceiling starts to bite)
  * single process (a pallas_call is opaque to GSPMD — same gating as
    ops/pallas_gather.py / ops/pallas_hsv.py)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports(shape, planar: bool, precision: str) -> bool:
    """shape = sample.images.shape (B, 3, S, S) planar."""
    if not planar or precision != "fast":
        return False
    s = shape[-1]
    return shape[-2] == s and s % 8 == 0 and s <= 512


def _pick_yb(s: int) -> int:
    # output row-block: big enough to load the MXU's M dim, small enough
    # to keep the out block + scratch in VMEM
    for yb in (128, 104, 80, 64, 40, 32, 16, 8):
        if s % yb == 0:
            return yb
    return s


def _kernel(act_ref, qf_ref, j0_ref, w0_ref, w1_ref, img_ref, ax_ref,
            out_ref, acc_ref, *, fill, yb, s):
    # grid (G, S//yb, 4): q innermost; quadrants accumulate into a VMEM f32
    # scratch and the epilogue (re-add FILL, rint, cast) runs in-kernel at
    # the last quadrant — the f32 accumulator never touches HBM, and the
    # output block is written once in its final (usually bf16) dtype. This
    # removed a measured 0.7 ms round/convert fusion plus the f32 output
    # write at @416 b=128.
    #
    # act/qf are scalar-prefetched (SMEM): act[g, q, yblk] says whether
    # quadrant q contributes ANY nonzero tap to this output row block (a
    # mosaic quadrant covers ~half the output rows, so ~35-45% of grid
    # steps are dead). Dead steps skip all six dots, and their block
    # fetches are remapped (index maps below) to the running active
    # quadrant so consecutive grid steps present identical block indices
    # and the pipeline elides the u8 source-plane DMA entirely.
    g = pl.program_id(0)
    y = pl.program_id(1)
    q = pl.program_id(2)

    @pl.when(q == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    @pl.when(act_ref[g, q, y] != 0)
    def _compute():
        # Wy (yb, S): 2-sparse row-blend matrix from the tap scalars.
        # j0 is pre-clamped to [-2, S] so the iota compare is safe; w0/w1
        # carry the bounds/window zeroing (augment._tap_scalars_windowed).
        # build the blend matrix in f32 — Mosaic can't minor-dim-reshape
        # sub-32-bit vectors (w0[:, None] on bf16 fails to lower); the
        # final (yb, S) matrix casts to bf16 elementwise, which lowers fine
        j0 = j0_ref[0, 0, 0, 0, :]  # (yb,) int32
        w0 = w0_ref[0, 0, 0, 0, :]  # (yb,) f32
        w1 = w1_ref[0, 0, 0, 0, :]
        hh = jax.lax.broadcasted_iota(jnp.int32, (yb, s), 1)
        hit0 = hh == j0[:, None]
        hit1 = hh == (j0[:, None] + 1)
        zero = jnp.zeros((), jnp.float32)
        wy = (
            jnp.where(hit0, w0[:, None], zero)
            + jnp.where(hit1, w1[:, None], zero)
        ).astype(jnp.bfloat16)  # (yb, S)

        ax = ax_ref[0, 0]  # (S(out x), S(src w)) bf16

        res = []
        for c in range(3):
            # img - FILL is integer-valued in [-114, 141]: exact in bf16.
            # Cast via int32 — Mosaic has no direct u8 -> f32 lowering.
            img_c = (
                img_ref[0, 0, c].astype(jnp.int32).astype(jnp.float32) - fill
            ).astype(jnp.bfloat16)  # (S, S)
            ybl = jax.lax.dot(
                wy, img_c, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)  # (yb, S)
            res.append(
                jax.lax.dot_general(
                    ybl,
                    ax,
                    (((1,), (1,)), ((), ())),  # contract src w; out (yb, x)
                    preferred_element_type=jnp.float32,
                )
            )
        # a skipped quadrant contributed exact zeros in the dense path
        # (wy == 0 -> val == 0), so skip-then-accumulate is bit-identical
        acc_ref[...] = acc_ref[...] + jnp.stack(res, axis=0)  # (3, yb, S)

    @pl.when(q == 3)
    def _epilogue():
        out_ref[0] = jnp.rint(acc_ref[...] + fill).astype(out_ref.dtype)


def warp_quadrants(
    imgs: jnp.ndarray,
    ax: jnp.ndarray,
    j0: jnp.ndarray,
    w0: jnp.ndarray,
    w1: jnp.ndarray,
    fill: float,
    *,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """imgs (G,4,3,S,S) u8/float; ax (G,4,S,S) float [out-x, src-w];
    j0/w0/w1 (G,4,S) y-tap scalars -> (G,3,S,S) out_dtype equal
    (fast-precision class) to
    rint(sum_q Ay_q @ (img_q - fill) @ Ax_q^T + fill) — the full warp
    INCLUDING the fill-re-add/round epilogue, applied in-kernel.
    """
    g, four, c, s, s2 = imgs.shape
    assert four == 4 and c == 3 and s == s2, imgs.shape
    yb = _pick_yb(s)
    nyb = s // yb
    kern = functools.partial(_kernel, fill=float(fill), yb=yb, s=s)
    # y-tap scalars blocked (1, yb) per (g, yblk, q). The singleton dim
    # before yb makes the block's last-two dims EQUAL the array's last-two
    # dims — Mosaic requires block dims be (8, 128)-divisible or
    # array-equal, and a (1, yb) block over a (nyb, yb) trailing shape
    # violates that whenever nyb > 1 (S=416 hit it on hardware).
    j0b = jnp.clip(j0.astype(jnp.int32), -2, s).reshape(g, four, nyb, 1, yb)
    w0b = w0.astype(jnp.float32).reshape(g, four, nyb, 1, yb)
    w1b = w1.astype(jnp.float32).reshape(g, four, nyb, 1, yb)
    # per-(g, q, yblk) contribution flags: a quadrant whose y-window misses
    # the whole row block has every tap weight zeroed — its two dots would
    # produce exact zeros. act feeds the kernel's compute skip; qfetch
    # remaps each dead step's block fetch to the running active quadrant
    # (fall back to the first active, or 0 when the row block is pure
    # fill) so the pipeline sees repeated indices and elides the DMA.
    act = ((w0b != 0) | (w1b != 0)).any(-1).any(-1)  # (G, 4, nyb)
    a_t = act.transpose(0, 2, 1)  # (G, nyb, 4) in grid order
    qidx = jnp.arange(4, dtype=jnp.int32)
    last_act = jax.lax.cummax(
        jnp.where(a_t, qidx, jnp.int32(-1)), axis=2
    )  # (G, nyb, 4): max active q' <= q, -1 if none yet
    first_act = jnp.argmax(a_t, axis=-1).astype(jnp.int32)  # 0 when none
    qfetch = jnp.where(last_act >= 0, last_act, first_act[..., None])
    # pure-fill row blocks (no active quadrant at all): first_act=argmax of
    # all-False = 0 would fetch quadrant 0's ~520 KB block for nothing on
    # the block's first step. Remap ALL of a dead block's steps to the last
    # fetch index of the latest preceding block with any activity — the
    # index then also matches across the block boundary, so the DMA is
    # elided entirely (chained dead blocks inherit the same index).
    blk_act = a_t.any(-1)  # (G, nyb)
    l_idx = qfetch[:, :, 3]  # each block's final fetch index (pre-fix)
    yi = jnp.arange(nyb, dtype=jnp.int32)
    latest = jax.lax.cummax(
        jnp.where(blk_act, yi, jnp.int32(-1)), axis=1
    )  # latest active block <= y, -1 if none yet
    carried = jnp.take_along_axis(l_idx, jnp.maximum(latest, 0), axis=1)
    fill_idx = jnp.where(latest >= 0, carried, 0)
    qfetch = jnp.where(blk_act[..., None], qfetch, fill_idx[..., None])
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g, nyb, four),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, 1, yb),
                    lambda i, y, q, act, qf: (i, qf[i, y, q], y, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, 1, yb),
                    lambda i, y, q, act, qf: (i, qf[i, y, q], y, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, 1, yb),
                    lambda i, y, q, act, qf: (i, qf[i, y, q], y, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 3, s, s),
                    lambda i, y, q, act, qf: (i, qf[i, y, q], 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, s, s),
                    lambda i, y, q, act, qf: (i, qf[i, y, q], 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 3, yb, s), lambda i, y, q, act, qf: (i, 0, y, 0)
            ),
            scratch_shapes=[pltpu.VMEM((3, yb, s), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((g, 3, s, s), out_dtype),
        interpret=interpret,
    )(act.astype(jnp.int32), qfetch, j0b, w0b, w1b, imgs,
      ax.astype(jnp.bfloat16))
