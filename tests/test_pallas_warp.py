"""Pallas fused-warp kernel (ops/pallas_warp.py) vs the einsum paths.

The kernel runs the separable mosaic+affine warp's two passes in one VMEM
pass (y-blend then x-matmul, accumulated over quadrants). It is a
fast-precision implementation: bf16 multiplier operands, f32 accumulation —
the same numerics class as mosaic_affine_batch(precision="fast"), but with
the 4-tap bilinear sum reassociated (y-then-x instead of x-then-y). Pixels
may therefore differ from BOTH reference paths by a couple of post-rint
units; boxes/labels/masks ride the identical non-warp code and must match
exactly.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.ops import pallas_warp
from object_detection_cib_tpu.ops.augment import (
    DeviceSample,
    mosaic_affine_batch,
    sample_affine_values_batch,
)


def _sample(B=8, S=64, T=5, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (B, 3, S, S), np.uint8)
    sizes = np.stack(
        [rng.integers(S // 2, S + 1, (B,)), rng.integers(S // 2, S + 1, (B,))],
        axis=-1,
    ).astype(np.int32)
    boxes = np.zeros((B, T, 4), np.float32)
    labels = rng.integers(0, 3, (B, T)).astype(np.int32)
    mask = np.zeros((B, T), bool)
    for b in range(B):
        for t in range(rng.integers(1, T)):
            x, y = rng.uniform(0, S - 12, 2)
            w, h = rng.uniform(4, 10, 2)
            boxes[b, t] = [x, y, x + w, y + h]
            mask[b, t] = True
    return DeviceSample(
        jnp.asarray(imgs), jnp.asarray(sizes), jnp.asarray(boxes),
        jnp.asarray(labels), jnp.asarray(mask),
    )


def _run(sample, key, values, S, flip_do, **kw):
    return mosaic_affine_batch(
        sample, key, values, S, flip_do=flip_do, planar=True, **kw
    )


@pytest.mark.parametrize("flip", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_einsum_fast_path(seed, flip):
    S = 64
    sample = _sample(B=8, S=S, seed=seed)
    key = jax.random.PRNGKey(seed)
    kv, ka, kf = jax.random.split(key, 3)
    values = sample_affine_values_batch(
        ka, 2, degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
        perspective=0.0,
    )
    flip_do = (
        (jax.random.uniform(kf, (2,)) < 0.5) if flip else None
    )
    ref = _run(sample, kv, values, S, flip_do, precision="fast")
    out = _run(
        sample, kv, values, S, flip_do, precision="fast",
        warp_pallas=True, pallas_interpret=True,
    )
    # identical non-warp code: boxes/labels/mask/sizes exact
    np.testing.assert_array_equal(np.asarray(out.boxes), np.asarray(ref.boxes))
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    np.testing.assert_array_equal(
        np.asarray(out.labels), np.asarray(ref.labels)
    )
    # warp numerics: same fast class, reassociated sum -> post-rint
    # differences of at most a couple units on a minority of pixels
    # (measured: max 1.0, 93% bit-match — the fast-vs-exact gap itself is
    # max 1.0, 92% bit-match on the same inputs)
    a = np.asarray(out.images, np.float32)
    b = np.asarray(ref.images, np.float32)
    assert a.shape == b.shape == (2, 3, S, S)
    diff = np.abs(a - b)
    assert diff.max() <= 2.0, diff.max()
    assert (diff == 0).mean() > 0.85, (diff == 0).mean()


def test_kernel_close_to_exact_path():
    S = 64
    sample = _sample(B=8, S=S, seed=7)
    key = jax.random.PRNGKey(7)
    kv, ka = jax.random.split(key)
    values = sample_affine_values_batch(
        ka, 2, degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
        perspective=0.0,
    )
    exact = _run(sample, kv, values, S, None, precision="exact")
    out = _run(
        sample, kv, values, S, None, precision="fast",
        warp_pallas=True, pallas_interpret=True,
    )
    diff = np.abs(
        np.asarray(out.images, np.float32) - np.asarray(exact.images, np.float32)
    )
    # the documented fast-vs-exact contract: a few units from bf16 taps
    assert diff.max() <= 4.0, diff.max()


def test_supports_gating():
    assert pallas_warp.supports((128, 3, 416, 416), True, "fast")
    assert not pallas_warp.supports((128, 3, 416, 416), True, "exact")
    assert not pallas_warp.supports((128, 3, 416, 416), False, "fast")
    assert not pallas_warp.supports((128, 3, 640, 640), True, "fast")  # VMEM
    assert not pallas_warp.supports((128, 3, 412, 412), True, "fast")  # %8


def test_kernel_out_dtype_boundary():
    S = 64
    sample = _sample(B=8, S=S, seed=3)
    key = jax.random.PRNGKey(3)
    kv, ka = jax.random.split(key)
    values = sample_affine_values_batch(
        ka, 2, degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
        perspective=0.0,
    )
    out = _run(
        sample, kv, values, S, None, precision="fast",
        warp_pallas=True, pallas_interpret=True, out_dtype=jnp.bfloat16,
    )
    assert out.images.dtype == jnp.bfloat16
    v = np.asarray(out.images, np.float32)
    assert ((v >= 0) & (v <= 255) & (v == np.rint(v))).all()


def test_kernel_skips_dead_quadrant_blocks_exactly():
    """Direct kernel test for the r4 contribution-skip: taps crafted so
    some (group, row-block, quadrant) grid steps are fully dead (every tap
    weight zero), including one row block dead for ALL quadrants (pure
    fill). The skip must be invisible: a dead quadrant contributed exact
    zeros in the dense formulation, so the output must equal the dense
    reference computed with the kernel's own dtype chain."""
    rng = np.random.default_rng(11)
    G, S = 2, 208  # yb=104 -> nyb=2: exercises multi-row-block + remap
    yb = pallas_warp._pick_yb(S)
    nyb = S // yb
    assert nyb == 2
    fill = 114.0
    imgs = jnp.asarray(rng.integers(0, 256, (G, 4, 3, S, S), np.uint8))
    ax = jnp.asarray(rng.standard_normal((G, 4, S, S)), jnp.float32)
    j0 = jnp.asarray(rng.integers(0, S - 1, (G, 4, S)), jnp.int32)
    w0 = rng.random((G, 4, S), dtype=np.float32)
    w1 = rng.random((G, 4, S), dtype=np.float32)
    # group 0: row block 0 dead for every quadrant (pure fill rows);
    # block 1 alive only for quadrant 2.
    w0[0, :, :yb] = 0.0
    w1[0, :, :yb] = 0.0
    w0[0, [0, 1, 3], yb:] = 0.0
    w1[0, [0, 1, 3], yb:] = 0.0
    # group 1: quadrant 1 dead everywhere; block 0 additionally loses q3.
    w0[1, 1] = 0.0
    w1[1, 1] = 0.0
    w0[1, 3, :yb] = 0.0
    w1[1, 3, :yb] = 0.0
    w0 = jnp.asarray(w0)
    w1 = jnp.asarray(w1)

    out = pallas_warp.warp_quadrants(
        imgs, ax, j0, w0, w1, fill, out_dtype=jnp.float32, interpret=True
    )

    # dense reference with the kernel's exact dtype chain (bf16 operands,
    # f32 accumulation, bf16 stage boundary, y-pass then x-pass)
    hh = np.arange(S)[None, :]
    wy = (
        np.where(hh == np.asarray(j0)[..., None], np.asarray(w0)[..., None], 0)
        + np.where(
            hh == np.asarray(j0)[..., None] + 1, np.asarray(w1)[..., None], 0
        )
    )  # (G, 4, S out, S src)
    wy_b = jnp.asarray(wy).astype(jnp.bfloat16)
    img_b = (imgs.astype(jnp.float32) - fill).astype(jnp.bfloat16)
    ybl = jnp.einsum(
        "gqos,gqcsw->gqcow", wy_b, img_b,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    # accumulate quadrants sequentially, matching the kernel's q-order
    # (f32 addition is order-sensitive; the kernel does ((q0+q1)+q2)+q3)
    acc = jnp.zeros((G, 3, S, S), jnp.float32)
    for q in range(4):
        acc = acc + jnp.einsum(
            "gcow,gxw->gcox", ybl[:, q], ax[:, q].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    ref = jnp.rint(acc + fill)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # and the pure-fill block really is fill
    assert (np.asarray(out)[0, :, :yb] == fill).all()


@pytest.mark.slow
def test_kernel_skip_lowers_on_hardware():
    """ADVICE r4: the scalar-prefetch-driven dynamic block index maps are
    covered in interpret mode above; this exercises their actual Mosaic
    lowering on a TPU. Runs in a subprocess (conftest pins the suite's
    backend to CPU); skips when no TPU is attached. Hardware vs interpret
    may reassociate the f32 tap sums, so the post-rint contract is
    off-by-at-most-one."""
    import subprocess
    import sys

    src = r"""
import numpy as np, jax, jax.numpy as jnp
if jax.devices()[0].platform != "tpu":
    print("NO_TPU"); raise SystemExit(0)
from object_detection_cib_tpu.ops import pallas_warp
rng = np.random.default_rng(11)
G, S = 2, 208
yb = pallas_warp._pick_yb(S)
imgs = jnp.asarray(rng.integers(0, 256, (G, 4, 3, S, S), np.uint8))
ax = jnp.asarray(rng.standard_normal((G, 4, S, S)), jnp.float32)
j0 = jnp.asarray(rng.integers(0, S - 1, (G, 4, S)), jnp.int32)
w0 = rng.random((G, 4, S), dtype=np.float32)
w1 = rng.random((G, 4, S), dtype=np.float32)
w0[0, :, :yb] = 0.0; w1[0, :, :yb] = 0.0       # pure-fill row block
w0[0, [0, 1, 3], yb:] = 0.0; w1[0, [0, 1, 3], yb:] = 0.0
w0[1, 1] = 0.0; w1[1, 1] = 0.0                  # quadrant dead everywhere
w0, w1 = jnp.asarray(w0), jnp.asarray(w1)
hw = pallas_warp.warp_quadrants(imgs, ax, j0, w0, w1, 114.0,
                                out_dtype=jnp.float32, interpret=False)
it = pallas_warp.warp_quadrants(imgs, ax, j0, w0, w1, 114.0,
                                out_dtype=jnp.float32, interpret=True)
d = np.abs(np.asarray(hw) - np.asarray(it))
assert d.max() <= 1.0, d.max()
assert (np.asarray(hw)[0, :, :yb] == 114.0).all()
print("HW_OK", float(d.max()))
"""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = (
        str(Path(__file__).resolve().parents[1])
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    r = subprocess.run(
        [sys.executable, "-c", src], capture_output=True, text=True,
        env=env, timeout=1200,
    )
    if "NO_TPU" in r.stdout:
        pytest.skip("no TPU attached")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "HW_OK" in r.stdout
