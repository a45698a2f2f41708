"""Pallas HSV kernel == ops.augment.hsv_batch.

The kernel (ops/pallas_hsv.py) replaces the XLA lowering of the planar HSV
block in the production fused-epoch program. On real TPU hardware the two
are BITWISE equal (measured mismatch 0.0 over a full 128x416x416 batch,
runs/r4; tools/r4_tpu_plan.sh sanity re-asserts it every lease). Under CPU
interpret mode the kernel's ops and XLA's fused ops may contract
multiply-adds differently (FMA), so pixels whose pre-floor value sits
within an ulp of an integer can differ by 1 — the CPU assertion allows
|diff| <= 1 on < 0.2% of pixels, exactly the tolerance class of the
device-vs-cv2 HSV tests (tests/test_device_augment.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.ops import pallas_hsv
from object_detection_cib_tpu.ops.augment import hsv_batch, hsv_gains


def assert_hsv_close(got, want):
    got, want = np.asarray(got), np.asarray(want)
    if jax.devices()[0].platform == "tpu":
        np.testing.assert_array_equal(got, want)
        return
    diff = np.abs(got - want)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.002, (diff > 0).mean()


@pytest.mark.parametrize("shape", [(8, 3, 64, 128), (4, 3, 32, 416)])
def test_pallas_hsv_matches_xla(shape):
    rng = np.random.default_rng(0)
    # warp-output-like floats: integral values 0..255 (post-rint), f32
    imgs = jnp.asarray(
        rng.integers(0, 256, shape, np.int32).astype(np.float32)
    )
    r = hsv_gains(jax.random.PRNGKey(7), shape[0], 0.015, 0.7, 0.4)
    want = hsv_batch(imgs, None, r=r, channel_axis=1)
    got = pallas_hsv.hsv_planar(imgs, r, interpret=True)
    assert_hsv_close(got, want)


def test_pallas_hsv_non_integral_and_extreme_gains():
    # non-integral inputs (mosaic fill edges can be x.5 pre-round) and the
    # gain extremes the production draw can reach
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 3, 32, 128)).astype(np.float32))
    r = jnp.asarray(
        [[0.985, 0.3, 0.6], [1.015, 1.7, 1.4], [1.0, 1.0, 1.0],
         [0.99, 1.69, 0.61]],
        jnp.float32,
    )
    want = hsv_batch(imgs, None, r=r, channel_axis=1)
    got = pallas_hsv.hsv_planar(imgs, r, interpret=True)
    assert_hsv_close(got, want)


def test_hue_wrap_matches_fmod():
    # the fmod-free hue wrap (two conditional subtracts) must equal
    # jnp.mod bitwise over the full reachable domain h*r0 in [0, 540)
    x = jnp.arange(0.0, 540.0, 0.03125, dtype=jnp.float32)
    fast = jnp.where(x >= 360.0, x - 360.0, x)
    fast = jnp.where(fast >= 180.0, fast - 180.0, fast)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(x % 180.0))


def test_pipeline_gate_draws_same_stream():
    # the pipeline's pallas branch draws gains via hsv_gains(k, B, ...);
    # hsv_batch with the same key must consume the RNG identically
    key = jax.random.PRNGKey(3)
    imgs = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (2, 3, 16, 128)),
        jnp.float32,
    )
    r = hsv_gains(key, 2, 0.015, 0.7, 0.4)
    via_batch = hsv_batch(imgs, key, 0.015, 0.7, 0.4, channel_axis=1)
    via_gains = hsv_batch(imgs, None, r=r, channel_axis=1)
    np.testing.assert_array_equal(np.asarray(via_batch), np.asarray(via_gains))
