"""Shared sample/batch fixtures (parity: kod/test_utils/detection_sample.py:
13-56 — get_test_sample / get_batch). The reference pulls one real cached
coco128 sample; here fixtures come from the fake manifest + fake-mode
reader, so tests never need an image corpus."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from object_detection_cib_tpu.data.cache import DatasetInfo
from object_detection_cib_tpu.data.host_augment import ValidationSampleAugmentor
from object_detection_cib_tpu.data.pipeline import DetectionDataset, collate_fixed
from object_detection_cib_tpu.data.reader import AugmentedSample, SampleReader
from object_detection_cib_tpu.data.synthetic import build_fake_manifest


def _dataset(image_size: int, num_classes: int, n: int, seed: int) -> DetectionDataset:
    info = build_fake_manifest(
        num_classes=num_classes, num_images=n, image_size=image_size, seed=seed
    )
    reader = SampleReader(image_size, info.classes, fake_mode=True)
    return DetectionDataset(info, reader, ValidationSampleAugmentor())


def get_test_sample(
    image_size: int = 416, num_classes: int = 10, seed: int = 0
) -> AugmentedSample:
    """One letterboxed sample with targets (get_test_sample analog)."""
    return _dataset(image_size, num_classes, 4, seed)[0]


def get_test_batch(
    batch_size: int = 2,
    image_size: int = 416,
    num_classes: int = 10,
    max_targets: int = 40,
    seed: int = 0,
):
    """A fixed-shape train Batch (get_batch analog)."""
    ds = _dataset(image_size, num_classes, max(batch_size, 4), seed)
    samples = [ds[i] for i in range(batch_size)]
    batch, _ = collate_fixed(samples, max_targets)
    return batch
