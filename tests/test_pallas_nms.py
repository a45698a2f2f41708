"""Pallas NMS kernel parity vs the XLA Jacobi implementation (interpret
mode on CPU; the real kernel runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.core.nms import _greedy_nms_mask, non_max_suppression
from object_detection_cib_tpu.ops.pallas_nms import pallas_greedy_nms_mask

K = 256  # one tile


def _random_boxes(n_real, seed=0):
    rng = np.random.default_rng(seed)
    boxes = np.zeros((K, 4), np.float32)
    xy = rng.uniform(0, 200, (n_real, 2))
    wh = rng.uniform(10, 80, (n_real, 2))
    boxes[:n_real] = np.concatenate([xy, xy + wh], -1)
    live = np.zeros(K, bool)
    live[:n_real] = True
    # descending-score order is implicit in index order
    return jnp.asarray(boxes), jnp.asarray(live)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_real", [5, 60, 200])
def test_kernel_matches_xla(seed, n_real):
    boxes, live = _random_boxes(n_real, seed)
    want = _greedy_nms_mask(boxes, live, 0.45)
    got = pallas_greedy_nms_mask(boxes, live, 0.45, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_chain_case():
    # A kills B, B kills C, A doesn't kill C -> greedy keeps {A, C}
    boxes = np.zeros((K, 4), np.float32)
    boxes[0] = [0, 0, 10, 10]
    boxes[1] = [4, 0, 14, 10]  # IoU(A,B) ~ 0.43... widen overlap
    boxes[1] = [3, 0, 13, 10]  # IoU(A,B) = 7/13 ≈ 0.54
    boxes[2] = [6, 0, 16, 10]  # IoU(B,C) = 7/13; IoU(A,C) = 4/16 = 0.25
    live = np.zeros(K, bool)
    live[:3] = True
    got = pallas_greedy_nms_mask(
        jnp.asarray(boxes), jnp.asarray(live), 0.45, interpret=True
    )
    want = _greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(live), 0.45)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.asarray(got)[:3].tolist() == [True, False, True]


def test_batched_vmap():
    b0, l0 = _random_boxes(50, 3)
    b1, l1 = _random_boxes(120, 4)
    boxes = jnp.stack([b0, b1])
    live = jnp.stack([l0, l1])
    got = pallas_greedy_nms_mask(boxes, live, 0.5, interpret=True)
    want = jax.vmap(_greedy_nms_mask, in_axes=(0, 0, None))(boxes, live, 0.5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_end_to_end_impl_switch():
    rng = np.random.default_rng(0)
    det = jnp.asarray(rng.random((2, 512, 15), np.float32) * 0.8)
    a = non_max_suppression(det, 0.25, 0.45, max_nms=256, impl="xla")
    b = non_max_suppression(det, 0.25, 0.45, max_nms=256, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.classes), np.asarray(b.classes))


def test_kernel_k2048_production_capacity():
    """K=2048 (the production max_nms) fits the tiled-VMEM formulation."""
    rng = np.random.default_rng(5)
    K2 = 2048
    n_real = 900
    boxes = np.zeros((K2, 4), np.float32)
    xy = rng.uniform(0, 400, (n_real, 2))
    wh = rng.uniform(10, 90, (n_real, 2))
    boxes[:n_real] = np.concatenate([xy, xy + wh], -1)
    live = np.zeros(K2, bool)
    live[:n_real] = True
    want = _greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(live), 0.5)
    got = pallas_greedy_nms_mask(
        jnp.asarray(boxes), jnp.asarray(live), 0.5, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
