"""Tests for the native-decode + device-augment production pipeline."""

import numpy as np
import pytest

from object_detection_cib_tpu.data import native_loader
from object_detection_cib_tpu.data.host_augment import AugParams
from object_detection_cib_tpu.data.synthetic import (
    build_fake_manifest,
    build_synthetic_dataset,
)
from object_detection_cib_tpu.data.device_pipeline import DeviceDataPipeline

S = 64


def _pipeline(info, **kw):
    return DeviceDataPipeline(
        info,
        target_size=S,
        batch_size=4,
        aug_params=AugParams(),
        max_targets=40,
        seed=0,
        **kw,
    )


def test_fake_mode_pipeline_shapes():
    info = build_fake_manifest(num_images=16, num_classes=4, seed=0)
    pipe = _pipeline(info, fake_mode=True)
    batches = list(iter(pipe))
    assert len(batches) == 4
    b = batches[0]
    assert b.images.shape == (4, S, S, 3)
    assert b.boxes.shape == (4, 40, 4)
    assert float(b.images.max()) <= 1.0
    assert np.isfinite(np.asarray(b.images)).all()


@pytest.mark.skipif(not native_loader.available(), reason="native lib missing")
def test_real_jpeg_pipeline(tmp_path):
    info = build_synthetic_dataset(
        tmp_path, name="syntest", num_images=8, image_size=96, seed=0
    )
    pipe = _pipeline(info, root_dir=tmp_path)
    batches = list(iter(pipe))
    assert len(batches) == 2
    b = batches[0]
    assert b.images.shape == (4, S, S, 3)
    # some targets should survive augmentation in most batches
    total_valid = sum(int(np.asarray(x.mask).sum()) for x in batches)
    assert total_valid > 0


@pytest.mark.skipif(not native_loader.available(), reason="native lib missing")
def test_mixup_pipeline(tmp_path):
    info = build_synthetic_dataset(
        tmp_path, name="syntest2", num_images=8, image_size=96, seed=1
    )
    pipe = _pipeline(info, root_dir=tmp_path, mixup_prob=1.0)
    b = next(iter(pipe))
    assert b.boxes.shape == (4, 40, 4)


@pytest.mark.skipif(not native_loader.available(), reason="native lib missing")
def test_native_matches_reader_geometry(tmp_path):
    """Native resize+pad produces the same content size math as the
    Python reader (data/reader.py longest_max_size)."""
    info = build_synthetic_dataset(
        tmp_path, name="syntest3", num_images=2, image_size=100, seed=2
    )
    p = tmp_path / info.samples[0].image_path
    canvas, h, w = native_loader.decode_resize_pad(p.read_bytes(), S)
    assert (h, w) == (S, S)  # square source
    assert canvas.shape == (S, S, 3)


def test_device_cache_mode_matches_shapes():
    info = build_fake_manifest(num_images=16, num_classes=4, seed=0)
    pipe = DeviceDataPipeline(
        info,
        target_size=S,
        batch_size=4,
        aug_params=AugParams(),
        max_targets=40,
        seed=0,
        fake_mode=True,
        device_cache=True,
    )
    batches = list(iter(pipe))
    assert len(batches) == 4
    b = batches[0]
    assert b.images.shape == (4, S, S, 3)
    assert np.isfinite(np.asarray(b.images, np.float32)).all()


def test_device_cache_mixup():
    info = build_fake_manifest(num_images=16, num_classes=4, seed=0)
    pipe = DeviceDataPipeline(
        info,
        target_size=S,
        batch_size=4,
        aug_params=AugParams(),
        max_targets=40,
        seed=0,
        fake_mode=True,
        device_cache=True,
        mixup_prob=1.0,
    )
    b = next(iter(pipe))
    assert b.boxes.shape == (4, 40, 4)


def test_native_corrupt_jpeg_accounting():
    from object_detection_cib_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native lib missing")
    good = None
    import io
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(buf, "JPEG")
    good = buf.getvalue()
    bad = b"not a jpeg at all"
    canv, sizes, fails = native_loader.pack_batch([good, bad, good], 64)
    assert fails == 1
    assert tuple(sizes[1]) == (0, 0)  # failed slot zeroed
    assert sizes[0][0] > 0
