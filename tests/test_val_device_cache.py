"""HBM-resident validation == per-batch feeding of the same canvases.

The device-val mode must be a pure transport change: identical letterbox
geometry, identical normalize, identical eval math — so its mAP equals
evaluating the SAME cached canvases through the per-batch device_put path
exactly. GT parity with the host reader is covered separately (the native
loader's geometry test + the letterbox parity test in
tests/test_device_pipeline.py).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.config import compose
from object_detection_cib_tpu.data.synthetic import build_fake_manifest
from object_detection_cib_tpu.data.val_cache import ValDeviceCache
from object_detection_cib_tpu.eval.coco_map import (
    MeanAveragePrecisionEvaluator,
)
from object_detection_cib_tpu.train.trainer import Trainer

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def _trainer(tmp_path, *extra):
    cfg = compose(
        CONFIG_DIR,
        overrides=[
            "experiment=yv5n",
            "dataset_name=fake",
            "data.fake_mode=True",
            "data.batch_size=8",
            "data.target_image_size=64",
            "data.max_targets=40",
            "data.num_workers=2",
            "data.pipeline=device",
            "data.device_cache=True",
            "model.net.widen_factor=0.25",
            "model.net.deepen_factor=0.34",
            f"paths.output_dir={tmp_path}/out",
            f"callbacks.model_checkpoint.dirpath={tmp_path}/ck",
            "logger=csv",
            f"logger.csv.save_dir={tmp_path}/csv",
            "trainer.max_epochs=1",
            "seed=5",
            *extra,
        ],
    )
    return Trainer(cfg)


def test_val_cache_letterbox_and_gt():
    """Canvas content is centered; GT boxes carry the same scale+shift."""
    info = build_fake_manifest(num_images=6, num_classes=3, seed=0)
    cache = ValDeviceCache(
        info, np.arange(6), target_size=64, max_targets=16, fake_mode=True
    )
    assert cache.canvases.shape == (6, 64, 64, 3)
    for j in range(6):
        meta = info.samples[j].image_metadata
        scale = 64 / max(meta.height, meta.width)
        h = min(max(int(round(meta.height * scale)), 1), 64)
        w = min(max(int(round(meta.width * scale)), 1), 64)
        top, left = (64 - h) // 2, (64 - w) // 2
        # fill outside the centered content window
        if top > 0:
            assert (cache.canvases[j, :top] == 114).all()
        # GT inside canvas bounds and consistent with the shift
        gb = cache.gt_boxes[j][cache.gt_mask[j]]
        if len(gb):
            assert gb[:, 0].min() >= left - 1e-3
            assert gb[:, 1].min() >= top - 1e-3
            assert gb[:, 2].max() <= left + w + 1e-3
            assert gb[:, 3].max() <= top + h + 1e-3


def test_device_val_matches_per_batch_feed(tmp_path):
    """validate() over the HBM corpus == per-batch device_put of the SAME
    canvases through the same eval step: identical metrics."""
    t = _trainer(tmp_path)
    m_dev = t.validate()
    cache, nb, ds, block_fn, repl = t._val_dev

    # reference: feed the cached canvases per batch through eval_step
    ev = MeanAveragePrecisionEvaluator(
        len(t.classes), class_names=t.classes
    )
    n = len(cache)
    B = t.batch_size
    for b0 in range(0, n, B):
        rows = min(B, n - b0)
        imgs = cache.canvases[b0 : b0 + rows].astype(np.float32) / 255.0
        if rows < B:
            imgs = np.concatenate(
                [imgs, np.zeros((B - rows,) + imgs.shape[1:], np.float32)]
            )
        res = t.eval_step(
            t.state.params, t.state.batch_stats, jnp.asarray(imgs)
        )
        trimmed = jax.tree.map(lambda x: np.asarray(x)[:rows], res)
        sl = slice(b0, b0 + rows)
        ev.add_batch(
            trimmed, cache.gt_boxes[sl], cache.gt_labels[sl],
            cache.gt_mask[sl],
        )
    m_ref = ev.results_dict()
    assert set(m_dev) == set(m_ref)
    for k in m_ref:
        assert m_dev[k] == pytest.approx(m_ref[k], abs=1e-9), k


def test_device_val_off_switch(tmp_path):
    """val_device_cache=False falls back to the host per-batch path."""
    t = _trainer(tmp_path, "data.val_device_cache=False")
    m = t.validate()
    assert getattr(t, "_val_dev", None) is None
    assert "map" in m
