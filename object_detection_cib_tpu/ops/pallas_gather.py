"""Pallas TPU row-gather: DMA exactly the requested corpus rows.

XLA's gather lowering for ``corpus[idx]`` on TPU ("mini-gather") slices and
re-lays-out the ENTIRE corpus every call — measured 14-21 ms for 512 rows of
a 5,000-image 416px corpus (it scans all 2.6 GB). Replacing the row gather
with a scalar-prefetch Pallas kernel whose per-step block origin is
``idx[i]`` turns it into 512 direct HBM->HBM block DMAs: 0.81 ms measured
(654 GB/s on the 0.53 GB actually moved).

The corpus must be stored tile-aligned so each row is a whole number of
(8, 128) tiles: shape (N, 8, D/8) with D % 1024 == 0 (any image size
divisible by 32; a row is then one contiguous ~D-byte block). The caller
reshapes (N, H, W, C) -> (N, 8, D/8) once at cache-build time and the
gathered block back afterwards — row-major order is unchanged, so the
reshapes are pure views of the same byte stream.

Used by data/device_pipeline.py's HBM-resident dataset mode (the
counterpart of the reference's RAM cache, kod/data/detection.py:66-76).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports(shape) -> bool:
    """Row byte-count must tile evenly: D % (8 * 128) == 0."""
    d = 1
    for s in shape[1:]:
        d *= s
    return d % 1024 == 0


def _copy_kernel(idx_ref, in_ref, out_ref):
    out_ref[...] = in_ref[...]


def gather_rows_flat(
    flat: jnp.ndarray, idx: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """flat (N, 8, D8); idx (K,) int32 -> (K, 8, D8) == flat[idx].

    The corpus must already be stored in the tile-aligned flat form (store
    it that way with device_put at cache-build time: reshaping a tiled
    (N, H, W, C) array inside a jitted program re-lays-out the WHOLE corpus
    per call — measured 24 ms at 5k images).
    """
    n, eight, d8 = flat.shape
    assert eight == 8 and d8 % 128 == 0, flat.shape
    k = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, 8, d8), lambda i, idx_ref: (idx_ref[i], 0, 0))
        ],
        out_specs=pl.BlockSpec((1, 8, d8), lambda i, idx_ref: (i, 0, 0)),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 8, d8), flat.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), flat)


def gather_rows_planar(
    corpus: jnp.ndarray, idx: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """corpus (N, C, H, W); idx (K,) int32 -> (K, C, H, W) == corpus[idx].

    Planar-corpus variant: blocks are whole (H, W) channel planes, so the
    output keeps the array's native (H, W)-minor tiled layout — exactly the
    operand form the downstream separable-warp matmuls consume. The flat
    (N, 8, D/8) form (gather_rows_flat) instead emits a packed byte stream
    that XLA must relayout+reshape into image form before the warp (a
    measured 4.7 ms/128-batch @416 pure data-formatting chain, ROOFLINE.md).
    Per-plane VMEM block H*W bytes (u8): 173 KB @416, 410 KB @640 — safely
    under the Mosaic scratch cap with double buffering.
    """
    n, c, h, w = corpus.shape
    k = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k, c),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, w), lambda i, j, idx_ref: (idx_ref[i], j, 0, 0)
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w), lambda i, j, idx_ref: (i, j, 0, 0)
        ),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c, h, w), corpus.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), corpus)


def gather_rows(
    corpus: jnp.ndarray, idx: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """corpus (N, ...) with row size % 1024 == 0; idx (K,) int32 -> (K, ...).

    Exact equivalent of ``corpus[idx]`` (out-of-range behavior aside: indices
    must be in [0, N)). interpret=True runs the kernel in interpreter mode
    for CPU tests. Prefer gather_rows_flat with a pre-flattened corpus in
    jitted hot paths (see its docstring).
    """
    n = corpus.shape[0]
    row_shape = corpus.shape[1:]
    d = 1
    for s in row_shape:
        d *= s
    assert d % 1024 == 0, f"row size {d} not tile-alignable"
    out = gather_rows_flat(
        corpus.reshape(n, 8, d // 8), idx, interpret=interpret
    )
    return out.reshape((idx.shape[0],) + row_shape)
