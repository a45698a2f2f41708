"""On-device (jit/XLA) batched augmentation stage — the TPU hot path.

Re-designs the reference's cv2/albumentations host pipeline
(kod/data/mosaic.py, kod/data/augmentations/default.py — see
data/host_augment.py for the numpy parity implementations) as fixed-shape
vectorized device ops, so per-sample Python/cv2 work never gates step time:

  * mosaic4_batch   — 4-image mosaic onto a 2Sx2S canvas via pad +
                      dynamic-roll + rectangle select (placement arithmetic
                      identical to ref mosaic.py:71-133; candidate filter as
                      masks; vector ops only — a 2-D gather formulation runs
                      on the TPU scalar core ~300x slower)
  * affine_batch    — warpAffine/warpPerspective, border fill 114 (ref
                      default.py:279-351; matrix composition T@S@R@P@C
                      identical). Axis-aligned maps (the production recipe:
                      degrees=shear=perspective=0) run as two batched
                      matmuls on the MXU (separable bilinear); the general
                      case falls back to inverse-map bilinear gather
  * hsv_batch       — HSV jitter with the same per-channel gain semantics as
                      the reference's uint8 LUTs (ref default.py:354-383)
  * flip_batch      — horizontal flip + box mirror at width-1
  * mixup_batch     — beta(32,32) blend + target-list concat

Boxes ride along as fixed-capacity (T, 4) arrays with validity masks; the
candidate filters (wh>2, area ratio>0.1, AR<20) become mask updates instead
of ragged filtering. Randomness comes from jax.random keys (threaded, not
global — SURVEY.md §5.2).

All functions are batched (leading B) and jit/vmap-safe; the whole stage can
fuse into the train step so augmentation overlaps with compute on device.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

FILL = 114.0


class DeviceSample(NamedTuple):
    """Fixed-shape device-side sample batch.

    images: (B, S, S, 3) float32 or uint8 — content in the top-left (h, w)
            window, rest = FILL padding (uint8 until the warp; placement
            ops are exact in either dtype)
    sizes:  (B, 2) int32 (h, w) actual content sizes
    boxes:  (B, T, 4) xyxy float32
    labels: (B, T) int32
    mask:   (B, T) bool
    """

    images: jnp.ndarray
    sizes: jnp.ndarray
    boxes: jnp.ndarray
    labels: jnp.ndarray
    mask: jnp.ndarray


def _box_candidates_mask(orig, proc, mask, wh_thr=2.0, ar_thr=20.0, area_thr=0.1,
                         eps=1e-16):
    """Masked version of the reference candidate filter (default.py:193-215)."""
    w1 = orig[..., 2] - orig[..., 0]
    h1 = orig[..., 3] - orig[..., 1]
    w2 = proc[..., 2] - proc[..., 0]
    h2 = proc[..., 3] - proc[..., 1]
    ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    ok = (
        (w2 > wh_thr)
        & (h2 > wh_thr)
        & (w2 * h2 / (w1 * h1 + eps) > area_thr)
        & (ar < ar_thr)
    )
    return mask & ok


# ---------------------------------------------------------------------------
# mosaic
# ---------------------------------------------------------------------------

def _mosaic_placement(sizes, center, target_size: int):
    """Per-quadrant canvas placement (ref mosaic.py:71-133).

    sizes (4, 2), center (2,) -> x1a, y1a, x2a, y2a, x1b, y1b each (4,):
    destination rectangle [x1a, x2a) x [y1a, y2a) on the 2Sx2S canvas and
    the source-image origin (x1b, y1b) it is copied from.
    """
    S2 = 2 * target_size
    xc, yc = center[0], center[1]
    h = sizes[:, 0]
    w = sizes[:, 1]
    x1a = jnp.stack([jnp.maximum(xc - w[0], 0), xc, jnp.maximum(xc - w[2], 0), xc])
    y1a = jnp.stack([jnp.maximum(yc - h[0], 0), jnp.maximum(yc - h[1], 0), yc, yc])
    x2a = jnp.stack([xc, jnp.minimum(xc + w[1], S2), xc, jnp.minimum(xc + w[3], S2)])
    y2a = jnp.stack([yc, yc, jnp.minimum(S2, yc + h[2]), jnp.minimum(S2, yc + h[3])])
    x1b = jnp.stack([w[0] - (x2a[0] - x1a[0]), jnp.zeros_like(xc),
                     w[2] - (x2a[2] - x1a[2]), jnp.zeros_like(xc)])
    y1b = jnp.stack([h[0] - (y2a[0] - y1a[0]), h[1] - (y2a[1] - y1a[1]),
                     jnp.zeros_like(yc), jnp.zeros_like(yc)])
    return x1a, y1a, x2a, y2a, x1b, y1b


def _mosaic_boxes(boxes, labels, mask, x1a, y1a, x1b, y1b, S2):
    """Translate per-quadrant boxes onto the canvas + candidate filter."""
    padw = (x1a - x1b).astype(jnp.float32)  # (4,)
    padh = (y1a - y1b).astype(jnp.float32)
    shift = jnp.stack([padw, padh, padw, padh], axis=-1)  # (4, 4)
    b = boxes + shift[:, None, :]  # (4, T, 4)
    T = boxes.shape[1]
    b_flat = b.reshape(4 * T, 4)
    m_flat = mask.reshape(4 * T)
    l_flat = labels.reshape(4 * T)
    trunc = jnp.clip(b_flat, 0, S2)
    m_flat = _box_candidates_mask(b_flat, trunc, m_flat, eps=1e-7)
    b_flat = jnp.clip(b_flat, 0, S2 - 1)
    return b_flat, l_flat, m_flat


def _mosaic_one(imgs, sizes, boxes, labels, mask, center, target_size: int):
    """imgs (4,S,S,3), sizes (4,2), boxes (4,T,4) -> canvas (2S,2S,3) + (4T,) targets."""
    S = target_size
    S2 = 2 * S
    x1a, y1a, x2a, y2a, x1b, y1b = _mosaic_placement(sizes, center, S)

    yy = jax.lax.broadcasted_iota(jnp.int32, (S2, S2), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (S2, S2), 1)

    # Quadrant placement is a pure integer translation, so it maps to
    # pad + dynamic roll + rectangle select — vector ops only. A 2-D gather
    # formulation of the same thing runs on the TPU scalar core and was
    # measured ~300x slower (the round-2 device-pipeline wall; see
    # tools/bench_pipeline.py). Inside the destination rectangle the source
    # index y - dy = y1b + (y - y1a) lies in [y1b, y2b) ⊂ [0, S), so the
    # roll's wraparound and the pad contents are never observed.
    # dtype follows the input: the placement is exact in uint8, and staying
    # uint8 through the mosaic quarters the roll/select HBM traffic (the
    # f32 cast happens inside the downstream warp's matmul read)
    canvas = jnp.full((S2, S2, 3), FILL, imgs.dtype)
    S = imgs.shape[1]
    for i in range(4):
        inside = (
            (yy >= y1a[i]) & (yy < y2a[i]) & (xx >= x1a[i]) & (xx < x2a[i])
        )
        dy = y1a[i] - y1b[i]
        dx = x1a[i] - x1b[i]
        padded = jnp.pad(
            imgs[i], ((0, S2 - S), (0, S2 - S), (0, 0)), constant_values=FILL
        )
        rolled = jnp.roll(padded, (dy, dx), (0, 1))
        canvas = jnp.where(inside[..., None], rolled, canvas)

    b_flat, l_flat, m_flat = _mosaic_boxes(
        boxes, labels, mask, x1a, y1a, x1b, y1b, S2
    )
    return canvas, b_flat, l_flat, m_flat


def mosaic4_batch(
    sample: DeviceSample, key: jax.Array, target_size: int
) -> DeviceSample:
    """Group the batch into 4s and mosaic each group.

    Input B must be divisible by 4; output batch is B//4 with target
    capacity 4T. Centers drawn uniform in [S/2, 3S/2] (ref mosaic.py:58-62).
    """
    B, S, _, _ = sample.images.shape
    assert B % 4 == 0
    G = B // 4
    centers = jax.random.randint(
        key, (G, 2), target_size // 2, 2 * target_size - target_size // 2
    )
    imgs = sample.images.reshape(G, 4, S, S, 3)
    sizes = sample.sizes.reshape(G, 4, 2)
    boxes = sample.boxes.reshape(G, 4, -1, 4)
    labels = sample.labels.reshape(G, 4, -1)
    mask = sample.mask.reshape(G, 4, -1)

    canvas, b, l, m = jax.vmap(_mosaic_one, in_axes=(0, 0, 0, 0, 0, 0, None))(
        imgs, sizes, boxes, labels, mask, centers, target_size
    )
    S2 = 2 * target_size
    out_sizes = jnp.full((G, 2), S2, jnp.int32)
    return DeviceSample(canvas, out_sizes, b, l, m)


# ---------------------------------------------------------------------------
# affine / perspective
# ---------------------------------------------------------------------------

class AffineBatchValues(NamedTuple):
    """Per-image affine randoms, (B,) each (semantics of ref AffineRandValues)."""

    perspective_x: jnp.ndarray
    perspective_y: jnp.ndarray
    degrees: jnp.ndarray
    scale: jnp.ndarray
    shear_x: jnp.ndarray
    shear_y: jnp.ndarray
    translate_x: jnp.ndarray
    translate_y: jnp.ndarray


def sample_affine_values_batch(
    key: jax.Array,
    batch: int,
    degrees: float = 0.0,
    translate: float = 0.1,
    scale: float = 0.5,
    shear: float = 0.0,
    perspective: float = 0.0,
) -> AffineBatchValues:
    ks = jax.random.split(key, 8)
    u = lambda k, lo, hi: jax.random.uniform(k, (batch,), minval=lo, maxval=hi)
    return AffineBatchValues(
        perspective_x=u(ks[0], -perspective, perspective),
        perspective_y=u(ks[1], -perspective, perspective),
        degrees=u(ks[2], -degrees, degrees),
        scale=u(ks[3], 1 - scale, 1 + scale),
        shear_x=u(ks[4], -shear, shear),
        shear_y=u(ks[5], -shear, shear),
        translate_x=u(ks[6], 0.5 - translate, 0.5 + translate),
        translate_y=u(ks[7], 0.5 - translate, 0.5 + translate),
    )


def _affine_matrices(v: AffineBatchValues, in_w, in_h, out_w, out_h):
    """Batched M = T@S@R@P@C (ref default.py:218-247). Returns (B, 3, 3)."""
    B = v.degrees.shape[0]
    zeros = jnp.zeros((B,))
    ones = jnp.ones((B,))

    def mat(rows):
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )  # (B, 3, 3)

    C = mat([[ones, zeros, -ones * (in_w / 2)],
             [zeros, ones, -ones * (in_h / 2)],
             [zeros, zeros, ones]])
    P = mat([[ones, zeros, zeros],
             [zeros, ones, zeros],
             [v.perspective_x, v.perspective_y, ones]])
    # cv2.getRotationMatrix2D(angle, (0,0), scale) = [[a, b], [-b, a]] with
    # a = scale*cos(angle), b = scale*sin(angle)
    rad = v.degrees * (math.pi / 180.0)
    cos, sin = jnp.cos(rad) * v.scale, jnp.sin(rad) * v.scale
    R = mat([[cos, sin, zeros],
             [-sin, cos, zeros],
             [zeros, zeros, ones]])
    sx = jnp.tan(v.shear_x * (math.pi / 180.0))
    sy = jnp.tan(v.shear_y * (math.pi / 180.0))
    S = mat([[ones, sx, zeros],
             [sy, ones, zeros],
             [zeros, zeros, ones]])
    T = mat([[ones, zeros, v.translate_x * out_w],
             [zeros, ones, v.translate_y * out_h],
             [zeros, zeros, ones]])
    return T @ S @ R @ P @ C


def _bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """img (H,W,3); xs/ys (h,w) float sample coords; border fill FILL.

    cv2 5.x warpAffine INTER_LINEAR parity: full-precision float bilinear
    (cv2 5 dropped the old 5-bit fixed-point path) with per-tap constant
    border substitution, rounded to the integer pixel grid like cv2's uint8
    output. Measured vs cv2.warpAffine over random rotations/scales/shifts:
    99.98% bit-exact, max |diff| 1 (f32 coordinate rounding at .5 blend
    boundaries) — tests/test_device_augment.py bounds it.
    """
    H, W = img.shape[:2]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb[..., None], v, FILL)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return jnp.rint(top * (1 - fy) + bot * fy)


def _tap_matrix(s: jnp.ndarray, n: int):
    """Bilinear 1-D sampling operator. s (B, out) float source coords ->
    A (B, out, n) tap weights (OOB taps zeroed) + cov (B, out) in-bounds
    weight mass (1 - cov is the FILL border contribution)."""
    i0f = jnp.floor(s)
    f = s - i0f
    i0 = i0f.astype(jnp.int32)
    j = jnp.arange(n, dtype=jnp.int32)
    in0 = (i0 >= 0) & (i0 < n)
    in1 = (i0 + 1 >= 0) & (i0 + 1 < n)
    w0 = jnp.where(in0, 1.0 - f, 0.0)
    w1 = jnp.where(in1, f, 0.0)
    hit0 = j == i0[..., None]
    hit1 = j == (i0 + 1)[..., None]
    A = w0[..., None] * hit0 + w1[..., None] * hit1
    return A, w0 + w1


def _axis_aligned_warp(imgs: jnp.ndarray, minv: jnp.ndarray, out_size: int):
    """Separable scale+translate warp as two batched matmuls (MXU path).

    Bit-equivalent bilinear math to `_bilinear_sample` for axis-aligned
    inverse maps (minv[0,1] == minv[1,0] == 0, no perspective): the x-pass
    computes v0*(1-fx) + v1*fx with per-tap FILL border substitution, the
    y-pass blends rows likewise — the same two-stage arithmetic, executed
    as dense dots over the 2-nonzero tap matrices instead of per-pixel
    gathers (which run on the TPU scalar core, measured ~300x slower).
    """
    B, H, W, _ = imgs.shape
    o = jnp.arange(out_size, dtype=jnp.float32)
    z = minv[:, 2, 2, None]
    sx = (minv[:, 0, 0, None] * o + minv[:, 0, 2, None]) / z  # (B, out)
    sy = (minv[:, 1, 1, None] * o + minv[:, 1, 2, None]) / z
    Ax, covx = _tap_matrix(sx, W)  # (B, out, W)
    Ay, covy = _tap_matrix(sy, H)  # (B, out, H)
    hi = jax.lax.Precision.HIGHEST
    h1 = jnp.einsum("bhwc,bxw->bhxc", imgs, Ax, precision=hi)
    h1 = h1 + ((1.0 - covx) * FILL)[:, None, :, None]
    out = jnp.einsum("byh,bhxc->byxc", Ay, h1, precision=hi)
    out = out + ((1.0 - covy) * FILL)[:, :, None, None]
    return jnp.rint(out)


def affine_batch(
    sample: DeviceSample,
    values: AffineBatchValues,
    out_size: int,
    border: Tuple[int, int] = (0, 0),
    axis_aligned: bool = False,
) -> DeviceSample:
    """Warp images+boxes; candidate-filter boxes into the mask.

    For the mosaic path the input canvas is 2Sx2S with border (-S/2,-S/2),
    giving an SxS output (ref detection.py:130 usage).

    axis_aligned: static promise that degrees == shear == perspective == 0
    (the reference's production recipe, ref default.py:31-35 defaults) —
    the warp separates into two 1-D passes executed as batched matmuls on
    the MXU instead of per-pixel gathers. Same bilinear math; equivalence
    tested against the gather path.
    """
    B, H, W, _ = sample.images.shape
    in_w = W + border[1] * 2  # note: equals out size when border negative
    in_h = H + border[0] * 2
    assert in_w == out_size and in_h == out_size, (in_w, in_h, out_size)

    M = _affine_matrices(values, W, H, in_w, in_h)  # (B, 3, 3)
    Minv = jnp.linalg.inv(M)

    if axis_aligned:
        out_imgs = _axis_aligned_warp(sample.images, Minv, out_size)
    else:
        yy = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 1)
        ones = jnp.ones_like(xx)
        dst = jnp.stack([xx, yy, ones], axis=-1)  # (h, w, 3)

        def warp_one(img, minv):
            src = dst @ minv.T  # (h, w, 3)
            sx = src[..., 0] / src[..., 2]
            sy = src[..., 1] / src[..., 2]
            return _bilinear_sample(img, sx, sy)

        out_imgs = jax.vmap(warp_one)(sample.images, Minv)

    proc, new_mask = _affine_boxes(sample.boxes, sample.mask, values, M, out_size)
    out_sizes = jnp.full((B, 2), out_size, jnp.int32)
    return DeviceSample(out_imgs, out_sizes, proc, sample.labels, new_mask)


def _affine_boxes(boxes, mask, values: AffineBatchValues, M, out_size: int):
    """4-corner box transform + candidate filter (ref default.py:250-276)."""
    B = boxes.shape[0]
    b = boxes  # (B, T, 4)
    corners = jnp.stack(
        [
            b[..., 0], b[..., 1],
            b[..., 2], b[..., 3],
            b[..., 0], b[..., 3],
            b[..., 2], b[..., 1],
        ],
        axis=-1,
    ).reshape(B, -1, 4, 2)  # (B, T, 4corners, 2)
    ones_c = jnp.ones(corners.shape[:-1] + (1,))
    hom = jnp.concatenate([corners, ones_c], axis=-1)  # (B, T, 4, 3)
    proj = jnp.einsum("btcj,bij->btci", hom, M)
    persp = (values.perspective_x != 0.0) | (values.perspective_y != 0.0)
    xy = jnp.where(
        persp[:, None, None, None],
        proj[..., :2] / proj[..., 2:3],
        proj[..., :2],
    )
    x_min = xy[..., 0].min(axis=-1)
    x_max = xy[..., 0].max(axis=-1)
    y_min = xy[..., 1].min(axis=-1)
    y_max = xy[..., 1].max(axis=-1)
    proc = jnp.stack(
        [
            jnp.clip(x_min, 0, out_size - 1),
            jnp.clip(y_min, 0, out_size - 1),
            jnp.clip(x_max, 0, out_size - 1),
            jnp.clip(y_max, 0, out_size - 1),
        ],
        axis=-1,
    )
    new_mask = _box_candidates_mask(
        boxes * values.scale[:, None, None], proc, mask
    )
    return proc, new_mask


# ---------------------------------------------------------------------------
# fused mosaic + axis-aligned affine (the production fast path)
# ---------------------------------------------------------------------------

def _tap_scalars_windowed(s: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray):
    """Per-row bilinear tap scalars with the quadrant window applied:
    s (B, out) float source coords, lo/hi (B,) int window -> (j0, w0, w1)
    each (B, out); tap k lives at source index j0+k with weight wk (zeroed
    when outside [lo, hi)). The dense `_tap_matrix_windowed` form is exactly
    scatter(j0, w0) + scatter(j0+1, w1) of these."""
    i0f = jnp.floor(s)
    f = s - i0f
    i0 = i0f.astype(jnp.int32)
    lo = lo[:, None]
    hi = hi[:, None]
    in0 = (i0 >= lo) & (i0 < hi)
    in1 = (i0 + 1 >= lo) & (i0 + 1 < hi)
    w0 = jnp.where(in0, 1.0 - f, 0.0)
    w1 = jnp.where(in1, f, 0.0)
    return i0, w0, w1


def _tap_matrix_windowed(s: jnp.ndarray, n: int, lo: jnp.ndarray,
                         hi: jnp.ndarray):
    """Like `_tap_matrix`, but a tap is kept only when its source index lies
    in the per-row window [lo, hi) (both (B,) int arrays). Used by the fused
    mosaic-warp: the window realizes the quadrant's canvas rectangle in
    source-image coordinates."""
    i0, w0, w1 = _tap_scalars_windowed(s, lo, hi)
    j = jnp.arange(n, dtype=jnp.int32)
    hit0 = j == i0[..., None]
    hit1 = j == (i0 + 1)[..., None]
    return w0[..., None] * hit0 + w1[..., None] * hit1


def mosaic_affine_batch(
    sample: DeviceSample,
    key: jax.Array,
    values: AffineBatchValues,
    target_size: int,
    flip_do: Optional[jnp.ndarray] = None,
    precision: str = "exact",
    planar: bool = False,
    out_dtype=None,
    warp_pallas: bool = False,
    pallas_interpret: bool = False,
) -> DeviceSample:
    """Fused 4-image mosaic + axis-aligned affine warp, canvas-free.

    Computes exactly the composition
        affine_batch(mosaic4_batch(sample, key, S), values, S,
                     border=(-S//2, -S//2), axis_aligned=True)
    without materializing the 2Sx2S canvas. The mosaic's per-quadrant
    placement is an integer translation, and the separable bilinear warp is
    linear in the canvas, so with the canvas written as
        canvas = FILL + sum_q rect_q * (src_q - FILL)
    the warp distributes into per-quadrant matmuls over the ORIGINAL SxS
    source images:
        out = FILL + sum_q  Ayq @ (img_q - FILL) @ Axq^T
    where Axq/Ayq are the warp's 2-nonzero bilinear tap matrices with their
    source coordinates shifted by the quadrant's integer offset and windowed
    to the quadrant's placement rectangle (`_tap_matrix_windowed`). Tap
    weights are bit-identical to the canvas path (integer shifts are exact
    in f32); final pixels match up to 1 unit from summation-order rounding
    ahead of the rint (equivalence-tested).

    Replaces ~27 ms/128-batch of canvas pad/roll/select HBM traffic @416
    with MXU work that was already being done. Boxes run through the same
    `_mosaic_boxes` + `_affine_boxes` helpers as the unfused path —
    bit-identical.

    flip_do: optional (B//4,) bool — folds the downstream horizontal flip
    into the x tap matrices (out[:, ::-1] == reversing Ax's output rows),
    saving a full-image flip+select pass. Box mirroring stays in
    `flip_batch` semantics and must be applied by the caller via
    `flip_boxes`.

    planar: images are channel-first (B, 3, S, S) and the output is
    (B//4, 3, S, S). Bit-identical pixel math (the einsums contract w then
    h in the same per-element order); exists because the HBM-resident
    corpus gather emits planar blocks whose (H, W) minor dims are already
    in the layout the tap matmuls consume — the NHWC form's C=3 minor dim
    forces XLA to relayout the gathered batch every step (a measured
    4.7 ms/128-batch pure data-formatting chain @416, ROOFLINE.md).
    """
    if planar:
        B, _, S, _ = sample.images.shape
    else:
        B, S, _, _ = sample.images.shape
    assert B % 4 == 0
    G = B // 4
    S2 = 2 * target_size
    centers = jax.random.randint(
        key, (G, 2), target_size // 2, 2 * target_size - target_size // 2
    )  # same draw as mosaic4_batch
    imgs = sample.images.reshape(
        (G, 4, 3, S, S) if planar else (G, 4, S, S, 3)
    )
    sizes = sample.sizes.reshape(G, 4, 2)
    boxes = sample.boxes.reshape(G, 4, -1, 4)
    labels = sample.labels.reshape(G, 4, -1)
    mask = sample.mask.reshape(G, 4, -1)

    x1a, y1a, x2a, y2a, x1b, y1b = jax.vmap(
        _mosaic_placement, in_axes=(0, 0, None)
    )(sizes, centers, target_size)  # each (G, 4)

    mb, ml, mm = jax.vmap(_mosaic_boxes, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
        boxes, labels, mask, x1a, y1a, x1b, y1b, S2
    )  # (G, 4T, ...) on the canvas

    # affine matrices for the canvas -> out warp (same as affine_batch with
    # border=(-S//2, -S//2): in = 2S canvas, out = S)
    M = _affine_matrices(values, S2, S2, target_size, target_size)
    Minv = jnp.linalg.inv(M)

    o = jnp.arange(target_size, dtype=jnp.float32)
    if flip_do is not None:
        # fold the horizontal output flip into the sample coordinates:
        # flipped output column ox reads what column out-1-ox reads unflipped
        # (cheaper than reversing the built tap matrices — a (G,4,out,S)
        # reverse measured 2.3 ms/128-batch, this is free)
        o = jnp.where(flip_do[:, None], target_size - 1.0 - o, o)  # (G, out)
    z = Minv[:, 2, 2, None]
    sx = (Minv[:, 0, 0, None] * o + Minv[:, 0, 2, None]) / z  # (G, out) canvas x
    sy = (Minv[:, 1, 1, None] * jnp.arange(target_size, dtype=jnp.float32)
          + Minv[:, 1, 2, None]) / z
    # stacked per-quadrant taps (G, 4, out, S): one batched einsum per pass
    # (4 chained matmuls + adds serialize the MXU and the accumulation)
    Ax = jnp.stack(
        [
            _tap_matrix_windowed(
                sx - (x1a[:, q] - x1b[:, q])[:, None].astype(jnp.float32),
                S, x1b[:, q], x1b[:, q] + (x2a[:, q] - x1a[:, q]),
            )
            for q in range(4)
        ],
        axis=1,
    )

    if warp_pallas and planar and precision == "fast":
        # one Pallas kernel for both separable passes: the y-pass runs as a
        # 2-sparse row blend built in-register from the tap scalars, the
        # x-pass as an MXU matmul, accumulated over quadrants in VMEM — the
        # (G,4,C,S,S) intermediate never touches HBM and XLA's 384-way
        # batched-small-matmul lowering (measured ~12% MXU utilization,
        # ROOFLINE.md) is replaced by well-shaped single dots. Same
        # fast-precision numerics class (bf16 operands, f32 accumulation).
        from object_detection_cib_tpu.ops import pallas_warp as _pw

        taps = [
            _tap_scalars_windowed(
                sy - (y1a[:, q] - y1b[:, q])[:, None].astype(jnp.float32),
                y1b[:, q], y1b[:, q] + (y2a[:, q] - y1a[:, q]),
            )
            for q in range(4)
        ]
        j0 = jnp.stack([t[0] for t in taps], axis=1)  # (G, 4, S)
        w0 = jnp.stack([t[1] for t in taps], axis=1)
        w1 = jnp.stack([t[2] for t in taps], axis=1)
        out_imgs = _pw.warp_quadrants(
            imgs, Ax, j0, w0, w1, FILL,
            out_dtype=(jnp.float32 if out_dtype is None else out_dtype),
            interpret=pallas_interpret,
        )  # (G, 3, S, S): fill-re-add + rint + cast applied in-kernel
        proc, new_mask = _affine_boxes(mb, mm, values, M, target_size)
        out_sizes = jnp.full((G, 2), target_size, jnp.int32)
        return DeviceSample(out_imgs, out_sizes, proc, ml, new_mask)

    Ay = jnp.stack(
        [
            _tap_matrix_windowed(
                sy - (y1a[:, q] - y1b[:, q])[:, None].astype(jnp.float32),
                S, y1b[:, q], y1b[:, q] + (y2a[:, q] - y1a[:, q]),
            )
            for q in range(4)
        ],
        axis=1,
    )
    # precision: "exact" reproduces the canvas path's f32 bilinear to the
    # ulp (12 MXU passes); "fast" runs plain bf16 passes — tap weights
    # round to 8 mantissa bits, i.e. the same accuracy class as the 5-bit
    # fixed-point interpolation cv2 <5 used for warpAffine on uint8 (the
    # reference's own augmentation path), at 6x less MXU work. Pixels
    # differ from exact by at most a few units; boxes are unaffected.
    prec = {
        "exact": jax.lax.Precision.HIGHEST,
        "fast": jax.lax.Precision.DEFAULT,
    }[precision]
    img = imgs.astype(jnp.float32) - FILL
    if precision == "fast":
        # bf16 OPERAND STORAGE for the same bf16 MXU passes: a DEFAULT-
        # precision TPU dot already rounds its f32 operands to bf16 at the
        # multiplier, so storing img/taps/t in bf16 feeds the MXU identical
        # numbers while halving the warp's inter-stage HBM traffic
        # (~0.5 GB/step @416 b=128 of f32 operand/intermediate bytes,
        # ROOFLINE.md). img - FILL is integer-valued in [-369, 396] after
        # mixup-free u8 content (exact in bf16 up to 512); t is rounded to
        # bf16 here exactly where the y-pass multiplier would round it
        # anyway. The y-pass accumulates into f32 (preferred_element_type)
        # so the final rint sees the full-precision sum — on TPU this is
        # numerically the same fast path, minus the traffic. (On CPU,
        # where DEFAULT runs full f32, bf16 storage is the accuracy-class
        # change the "fast" contract already documents.)
        img = img.astype(jnp.bfloat16)
        Ax = Ax.astype(jnp.bfloat16)
        Ay = Ay.astype(jnp.bfloat16)
    if planar:  # (G, 4, 3, S, S): w-pass then h-pass, same tap order
        t = jnp.einsum("gqchw,gqxw->gqchx", img, Ax, precision=prec)
        out = jnp.einsum("gqyh,gqchx->gcyx", Ay, t, precision=prec,
                         preferred_element_type=jnp.float32)
    else:  # (G, 4, S, S, 3)
        t = jnp.einsum("gqhwc,gqxw->gqhxc", img, Ax, precision=prec)
        out = jnp.einsum("gqyh,gqhxc->gyxc", Ay, t, precision=prec,
                         preferred_element_type=jnp.float32)
    out_imgs = jnp.rint(out + FILL)
    if out_dtype is not None:
        # the rint makes every pixel an integer in ~[0, 256] — exactly
        # representable in bfloat16, so a bf16 stage boundary here is
        # LOSSLESS and halves the warp-out/HSV-in/HSV-out/normalize-in
        # HBM traffic (~0.5 GB/step @416 b=128, ROOFLINE.md). Downstream
        # HSV re-quantizes from any float dtype; the final /255 normalize
        # computes in f32 either way (to_batch), so results are
        # bit-identical to the f32 boundary.
        out_imgs = out_imgs.astype(out_dtype)

    proc, new_mask = _affine_boxes(mb, mm, values, M, target_size)
    out_sizes = jnp.full((G, 2), target_size, jnp.int32)
    return DeviceSample(out_imgs, out_sizes, proc, ml, new_mask)


def flip_boxes(boxes: jnp.ndarray, do: jnp.ndarray, width: int) -> jnp.ndarray:
    """Box half of `flip_batch` (for use with mosaic_affine_batch flip_do)."""
    wm1 = width - 1.0
    fb = jnp.stack(
        [
            wm1 - boxes[..., 2],
            boxes[..., 1],
            wm1 - boxes[..., 0],
            boxes[..., 3],
        ],
        axis=-1,
    )
    return jnp.where(do[:, None, None], fb, boxes)


# ---------------------------------------------------------------------------
# HSV / flip / mixup
# ---------------------------------------------------------------------------

def hsv_gains(
    key: jax.Array, batch: int, hue: float, saturation: float, value: float
) -> jnp.ndarray:
    """The (B, 3) HSV jitter gain draw (ref default.py:357): U(-1,1)*amp+1.

    Shared by hsv_batch and the Pallas kernel path (ops/pallas_hsv.py) so
    both consume the RNG stream identically."""
    return (
        jax.random.uniform(key, (batch, 3), minval=-1.0, maxval=1.0)
        * jnp.asarray([hue, saturation, value])
        + 1.0
    )


def hsv_batch(
    images: jnp.ndarray,
    key: jax.Array,
    hue: float = 0.015,
    saturation: float = 0.7,
    value: float = 0.4,
    r: Optional[jnp.ndarray] = None,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """uint8-LUT-exact HSV jitter (ref default.py:354-383 via cv2 8U paths).

    Replicates the host oracle (host_augment.augment_hsv) bit-for-bit up to
    LUT-entry float rounding:
      1. cv2 BGR2HSV 8U is *integer* fixed-point (hsv_shift=12) with tables
         sdiv[v]=round(1044480/v), hdiv[d]=round(122880/d). Neither quotient
         ever lands on an exact .5 for 1<=i<=255 (2088960=2^10*3*5*17*2^2...
         has no odd-quotient divisor <=255; likewise 245760), so
         floor((2a+i)/(2i)) integer division reproduces cvRound's tables
         exactly — no per-pixel table gathers needed.
      2. the jitter LUTs hue'=(x*r0)%180, sat'=clip(x*r1), val'=clip(x*r2)
         truncate to uint8 (host builds them in f64; device applies the same
         formula in f32 — mismatch only when x*r is within f32 ulp of an
         integer boundary, measured <1e-4 of pixels).
      3. cv2 5.x HSV2BGR 8U is a bit-exact fixed-point kernel that floors;
         mirrored here with f32 sector math + floor. Residual: where the
         true channel value lands exactly on an integer, cv2's fixed-point
         representation sits one ulp off and floors differently — measured
         ~2% of pixels, always |diff| == 1 (tests/test_device_augment.py
         asserts >=95% bit-exact, max diff 1).

    The host passes RGB arrays through cv2's BGR<->HSV routines (as the
    reference does), i.e. channel 2 plays "r"; mirrored here.

    r: optional (B, 3) gain array (tests inject the host's draw); default
    drawn from `key` as U(-1,1)*[hue,saturation,value]+1.

    channel_axis: -1 (NHWC, default) or 1 (planar NCHW — the HBM-corpus
    fast path); pure elementwise math either way, bit-identical results.
    """
    assert channel_axis in (-1, 1)
    B = images.shape[0]
    if r is None:
        if hue == 0.0 and saturation == 0.0 and value == 0.0:
            return images  # host oracle early-returns too (ref :359-364)
        r = hsv_gains(key, B, hue, saturation, value)
    def exact_floordiv(num, den):
        """floor(num/den) for int32 arrays without integer division.

        The TPU vector unit has no integer divider; XLA's `//` lowering
        measured ~3.7 ms over the HSV planes at b=128/416px. An f32
        reciprocal estimate + one exact-remainder correction is exact here:
        num <= 2,089,215 is exactly representable in f32, the correctly-
        rounded f32 quotient is within 0.125 of the true value (so floor is
        off by at most 1), and q*den <= 2^31 keeps the remainder exact."""
        q = jnp.floor(
            num.astype(jnp.float32) / den.astype(jnp.float32)
        ).astype(jnp.int32)
        r = num - q * den
        return q + jnp.where(r >= den, 1, 0) - jnp.where(r < 0, 1, 0)

    img = jnp.clip(jnp.round(images), 0, 255).astype(jnp.int32)
    # cv2 BGR2HSV on an RGB array: channel order (b,g,r) = (ch0,ch1,ch2)
    if channel_axis == 1:
        bch, gch, rch = img[:, 0], img[:, 1], img[:, 2]
    else:
        bch, gch, rch = img[..., 0], img[..., 1], img[..., 2]

    v = jnp.maximum(jnp.maximum(bch, gch), rch)
    vmin = jnp.minimum(jnp.minimum(bch, gch), rch)
    diff = v - vmin

    # integer fixed-point tables, computed arithmetically (see docstring)
    sdiv_v = jnp.where(
        v > 0, exact_floordiv(2 * 1044480 + v, jnp.maximum(2 * v, 1)), 0
    )
    hdiv_d = jnp.where(
        diff > 0, exact_floordiv(2 * 122880 + diff, jnp.maximum(2 * diff, 1)), 0
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
    r0 = r[:, None, None, 0]
    r1 = r[:, None, None, 1]
    r2 = r[:, None, None, 2]
    # (x % 180) with x = h*r0: for x in [0, 540) two conditional subtracts
    # are exactly fmod (the subtractions are exact in f32 for x >= 90),
    # without the VPU division chain. h <= 180 and the hue gain
    # r0 = 1 +- hue stays far below 3 for any sane config (ref default
    # hue=0.015; cv2 semantics assume small jitter).
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
    # h' <= 179 -> hf < 5.97, so sector is already in [0, 5]; the clamp
    # replaces a `% 6` whose integer-modulo lowering is slow on the VPU
    sector = jnp.minimum(sector.astype(jnp.int32), 5)
    tab0 = vf
    tab1 = vf * (1.0 - sf)
    tab2 = vf * (1.0 - sf * ff)
    tab3 = vf * (1.0 - sf * (1.0 - ff))
    # sector tables (b,g,r) per sector, standard HSV wheel (== cv2's
    # sector_data; verified bit-exact vs cv2 in tests/test_device_augment.py).
    # Expressed as nested elementwise selects — a stack+one_hot formulation
    # materializes three (B,H,W,6) f32 tensors (~0.5 GB each at b=128/416px,
    # ~6 ms of pure HBM traffic); the selects fuse into one loop fusion.
    w = jnp.where
    b_out = w(sector < 2, tab1, w(sector == 2, tab3, w(sector < 5, tab0, tab2)))
    g_out = w(sector == 0, tab3, w(sector < 3, tab0, w(sector == 3, tab2, tab1)))
    r_out = w(sector == 1, tab2,
              w((sector == 2) | (sector == 3), tab1,
                w(sector == 4, tab3, tab0)))
    # back to (b,g,r)=(0,1,2), in the caller's channel layout
    out = jnp.stack([b_out, g_out, r_out], axis=channel_axis)
    return jnp.clip(jnp.floor(out * 255.0), 0, 255).astype(images.dtype)


def flip_batch(sample: DeviceSample, key: jax.Array, prob: float = 0.5) -> DeviceSample:
    """Per-image random horizontal flip (ref default.py:386-397)."""
    B, _, W, _ = sample.images.shape
    do = jax.random.uniform(key, (B,)) < prob
    flipped = jnp.flip(sample.images, axis=2)
    images = jnp.where(do[:, None, None, None], flipped, sample.images)
    wm1 = (W - 1.0)
    fb = jnp.stack(
        [
            wm1 - sample.boxes[..., 2],
            sample.boxes[..., 1],
            wm1 - sample.boxes[..., 0],
            sample.boxes[..., 3],
        ],
        axis=-1,
    )
    boxes = jnp.where(do[:, None, None], fb, sample.boxes)
    return sample._replace(images=images, boxes=boxes)


def mixup_batch(
    s1: DeviceSample, s2: DeviceSample, key: jax.Array
) -> DeviceSample:
    """beta(32,32) blend + concat targets (ref default.py:400-408)."""
    B = s1.images.shape[0]
    r = jax.random.beta(key, 32.0, 32.0, (B, 1, 1, 1))
    images = s1.images * r + s2.images * (1.0 - r)
    return DeviceSample(
        images=images,
        sizes=s1.sizes,
        boxes=jnp.concatenate([s1.boxes, s2.boxes], axis=1),
        labels=jnp.concatenate([s1.labels, s2.labels], axis=1),
        mask=jnp.concatenate([s1.mask, s2.mask], axis=1),
    )
