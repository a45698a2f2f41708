"""Planar (channel-first) HBM-corpus path == the NHWC flow, bit for bit.

The planar layout exists purely for TPU memory-layout reasons (the gathered
corpus block feeds the separable-warp matmuls with no relayout; see
ROOFLINE.md + ops/pallas_gather.gather_rows_planar). The math is identical:
same tap matrices, same contraction order, same RNG stream — so every test
here asserts exact equality, not tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.data.device_pipeline import (
    DeviceDataPipeline,
    build_device_augment_fn,
)
from object_detection_cib_tpu.data.host_augment import AugParams
from object_detection_cib_tpu.ops import pallas_gather
from object_detection_cib_tpu.ops.augment import (
    DeviceSample,
    hsv_batch,
    mosaic_affine_batch,
    sample_affine_values_batch,
)
from object_detection_cib_tpu.data.synthetic import build_fake_manifest


def _sample(B=8, S=64, T=5, seed=0, planar=False):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (B, S, S, 3), np.uint8)
    if planar:
        imgs = np.ascontiguousarray(np.transpose(imgs, (0, 3, 1, 2)))
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


def test_gather_rows_planar_matches_indexing():
    rng = np.random.default_rng(3)
    corpus = jnp.asarray(rng.integers(0, 256, (7, 3, 16, 128), np.uint8))
    idx = jnp.asarray([4, 0, 6, 4], jnp.int32)
    out = pallas_gather.gather_rows_planar(corpus, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(corpus[idx]))


@pytest.mark.parametrize("flip", [False, True])
def test_mosaic_affine_planar_matches_nhwc(flip):
    S = 64
    k = jax.random.PRNGKey(7)
    k_m, k_a, k_f = jax.random.split(k, 3)
    v = sample_affine_values_batch(k_a, 2, translate=0.1, scale=0.5)
    do = (jax.random.uniform(k_f, (2,)) < 0.5) if flip else None
    a = mosaic_affine_batch(_sample(), k_m, v, S, flip_do=do)
    b = mosaic_affine_batch(
        _sample(planar=True), k_m, v, S, flip_do=do, planar=True
    )
    np.testing.assert_array_equal(
        np.asarray(a.images), np.transpose(np.asarray(b.images), (0, 2, 3, 1))
    )
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))


def test_hsv_planar_matches_nhwc():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (4, 32, 32, 3), np.uint8).astype(np.float32)
    k = jax.random.PRNGKey(1)
    a = hsv_batch(jnp.asarray(img), k)
    b = hsv_batch(
        jnp.asarray(np.transpose(img, (0, 3, 1, 2))), k, channel_axis=1
    )
    np.testing.assert_array_equal(
        np.asarray(a), np.transpose(np.asarray(b), (0, 2, 3, 1))
    )


def _pipe(layout, mixup=0.0, seed=4):
    info = build_fake_manifest(num_images=48, num_classes=3, seed=2)
    return DeviceDataPipeline(
        info,
        target_size=64,
        batch_size=8,
        aug_params=AugParams(),
        max_targets=40,
        mixup_prob=mixup,
        seed=seed,
        fake_mode=True,
        device_cache=True,
        corpus_layout=layout,
    )


@pytest.mark.slow
@pytest.mark.parametrize("mixup", [0.0, 0.5])
def test_pipeline_planar_matches_flat(mixup):
    """Full device pipeline: the planar corpus layout yields the identical
    batch stream (images/boxes/labels/masks) as the flat layout."""
    a = _pipe("flat", mixup)
    b = _pipe("planar", mixup)
    assert b.planar and not a.planar
    for ba, bb, _ in zip(a, b, range(3)):
        for la, lb in zip(jax.tree.leaves(ba), jax.tree.leaves(bb)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_fused_epoch_planar_matches_flat():
    """The fused-epoch scan consumes the planar corpus identically."""
    from object_detection_cib_tpu.train.steps import Batch

    def fake_step(state, batch: Batch):
        s = sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(batch)
        )
        return state + s, s

    outs = []
    for layout in ("flat", "planar"):
        p = _pipe(layout, seed=9)
        fn = p.build_fused_epoch_fn(fake_step)
        xs = p.epoch_host_arrays()
        st, (ms, ovf) = fn(jnp.zeros(()), p.device_arrays, xs)
        outs.append((np.asarray(st), np.asarray(ms)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
