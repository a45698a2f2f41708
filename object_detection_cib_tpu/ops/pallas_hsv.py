"""Pallas TPU kernel: the full HSV jitter block in ONE kernel, planar form.

The XLA lowering of `ops.augment.hsv_batch` (channel_axis=1) splits the
elementwise chain into several multi-output fusions and then disagrees with
itself about the (B, 1, H, W) plane orientation: the fused-epoch profile
shows ~8 pure layout copies flipping f32[128,1,416,416] between
{2,3,1,0} and {3,2,1,0} (~2.4 ms/step) around ~4 ms of actual HSV math
(runs/r4/profile_fused_planar.log). One Pallas kernel has no internal
fusion boundaries, so there is nothing to relayout: it reads each image's
3 planes tile-by-tile, runs the identical fixed-point BGR->HSV -> jitter
LUT -> HSV2BGR arithmetic (see hsv_batch's docstring for the cv2 parity
derivation, ref kod/data/augmentations/default.py:354-383), and writes the
jittered planes back. Bit-identical to hsv_batch (asserted by
tests/test_pallas_hsv.py, CPU interpret + TPU).

Single-process TPU only (a pallas_call is opaque to GSPMD — the multi-host
fused path keeps the XLA implementation, same gating as
ops/pallas_gather.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(img_ref, r_ref, out_ref):
    # img_ref block (1, 3, bh, W) f32; r_ref (B, 3) f32 in SMEM (full array
    # — Mosaic requires SMEM blocks to match the array dims), indexed by the
    # grid's image axis
    i = pl.program_id(0)
    # cast to f32 in VMEM first: Mosaic cannot legalize math.roundeven on
    # bf16 vectors (the bf16 stage boundary keeps the HBM I/O half-width;
    # the in-register convert is free)
    x = img_ref[0].astype(jnp.float32)  # (3, bh, W)
    img = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)
    # cv2 BGR2HSV on an RGB array: channel order (b,g,r) = (ch0,ch1,ch2)
    bch, gch, rch = img[0], img[1], img[2]

    v = jnp.maximum(jnp.maximum(bch, gch), rch)
    vmin = jnp.minimum(jnp.minimum(bch, gch), rch)
    diff = v - vmin

    def exact_floordiv(num, den):
        # identical to hsv_batch.exact_floordiv: the remainder correction
        # absorbs up to +-1 quotient ulp, so any correctly-rounded-ish f32
        # divide (XLA's or Mosaic's) yields the same integer result
        q = jnp.floor(
            num.astype(jnp.float32) / den.astype(jnp.float32)
        ).astype(jnp.int32)
        rem = num - q * den
        return q + jnp.where(rem >= den, 1, 0) - jnp.where(rem < 0, 1, 0)

    sdiv_v = jnp.where(
        v > 0, exact_floordiv(2 * 1044480 + v, jnp.maximum(2 * v, 1)), 0
    )
    hdiv_d = jnp.where(
        diff > 0,
        exact_floordiv(2 * 122880 + diff, jnp.maximum(2 * diff, 1)),
        0,
    )
    s = (diff * sdiv_v + 2048) >> 12

    vr = v == rch
    vg = v == gch
    h_num = jnp.where(
        vr, gch - bch, jnp.where(vg, bch - rch + 2 * diff, rch - gch + 4 * diff)
    )
    h = (h_num * hdiv_d + 2048) >> 12
    h = h + jnp.where(h < 0, 180, 0)

    # jitter LUT stage (f32, truncating like .astype(uint8))
    r0 = r_ref[i, 0]
    r1 = r_ref[i, 1]
    r2 = r_ref[i, 2]
    # fmod-free hue wrap, bit-identical to hsv_batch (see its comment)
    hx = h.astype(jnp.float32) * r0
    hx = jnp.where(hx >= 360.0, hx - 360.0, hx)
    hx = jnp.where(hx >= 180.0, hx - 180.0, hx)
    h = jnp.floor(hx).astype(jnp.int32)
    s = jnp.floor(
        jnp.clip(s.astype(jnp.float32) * r1, 0.0, 255.0)
    ).astype(jnp.int32)
    v = jnp.floor(
        jnp.clip(v.astype(jnp.float32) * r2, 0.0, 255.0)
    ).astype(jnp.int32)

    # cv2 HSV2BGR 8U: f32 sector math, h scaled by 6/180
    hf = h.astype(jnp.float32) * jnp.float32(6.0 / 180.0)
    sf = s.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    vf = v.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    sector = jnp.floor(hf)
    ff = hf - sector
    sector = jnp.minimum(sector.astype(jnp.int32), 5)
    tab0 = vf
    tab1 = vf * (1.0 - sf)
    tab2 = vf * (1.0 - sf * ff)
    tab3 = vf * (1.0 - sf * (1.0 - ff))
    w = jnp.where
    b_out = w(sector < 2, tab1, w(sector == 2, tab3, w(sector < 5, tab0, tab2)))
    g_out = w(sector == 0, tab3, w(sector < 3, tab0, w(sector == 3, tab2, tab1)))
    r_out = w(sector == 1, tab2,
              w((sector == 2) | (sector == 3), tab1,
                w(sector == 4, tab3, tab0)))
    out = jnp.stack([b_out, g_out, r_out], axis=0)  # (3, bh, W)
    out_ref[0] = jnp.clip(jnp.floor(out * 255.0), 0, 255).astype(
        out_ref.dtype
    )


def _block_h(h: int) -> int:
    for bh in (64, 32, 16, 8):
        if h % bh == 0:
            return bh
    return h


def hsv_planar(
    images: jnp.ndarray, r: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """images (B, 3, H, W) float, r (B, 3) f32 gains -> jittered images.

    Exact drop-in for `hsv_batch(images, key=None, r=r, channel_axis=1)`.
    VMEM per grid step at bh=32/W=416: 160 KB in + 160 KB out + temps —
    well under the remote Mosaic scratch cap.
    """
    B, C, H, W = images.shape
    assert C == 3, images.shape
    bh = _block_h(H)
    out = pl.pallas_call(
        _kernel,
        grid=(B, H // bh),
        in_specs=[
            pl.BlockSpec((1, 3, bh, W), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec(
                (B, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, 3, bh, W), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct(images.shape, images.dtype),
        interpret=interpret,
    )(images, r.astype(jnp.float32))
    return out
