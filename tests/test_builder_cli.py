"""Builder + CLI tests: COCO JSON ingest, zipf subsetting, analysis,
sampler inspection."""

import json
from pathlib import Path

import numpy as np
import pytest

from object_detection_cib_tpu.data.builder import (
    do_analysis,
    load_coco_json,
    make_zipf_subset,
)
from object_detection_cib_tpu.data.cache import deserialize_cached_dataset


def _write_coco_json(path: Path, n_classes=15, n_images=120, seed=0):
    rng = np.random.default_rng(seed)
    cats = [{"id": i + 1, "name": f"cat{i}"} for i in range(n_classes)]
    images, anns = [], []
    aid = 1
    # class popularity ~ geometric so a clear top-10 exists
    pop = np.asarray([0.5**i for i in range(n_classes)])
    pop /= pop.sum()
    for i in range(n_images):
        images.append(
            {"id": i + 1, "file_name": f"im{i}.jpg", "width": 100, "height": 80}
        )
        for _ in range(int(rng.integers(1, 6))):
            c = int(rng.choice(n_classes, p=pop)) + 1
            x, y = rng.uniform(0, 60, 2)
            w, h = rng.uniform(5, 30, 2)
            anns.append(
                {
                    "id": aid,
                    "image_id": i + 1,
                    "category_id": c,
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "iscrowd": 0,
                    "area": float(w * h),
                }
            )
            aid += 1
    path.write_text(
        json.dumps({"images": images, "annotations": anns, "categories": cats})
    )
    return path


def test_load_coco_json(tmp_path):
    j = _write_coco_json(tmp_path / "instances_val.json")
    info = load_coco_json(j, images_root="val")
    assert len(info.samples) == 120
    assert len(info.classes) == 15
    s = info.samples[0]
    assert s.image_path.startswith("val/")
    bb = s.targets[0].bounding_box
    assert bb.x_max > bb.x_min and bb.y_max > bb.y_min


def test_make_zipf_subset(tmp_path):
    j = _write_coco_json(tmp_path / "instances_train.json")
    info = load_coco_json(j)
    zipf = make_zipf_subset(info, num_classes=5, max_detections_per_image=10)
    assert len(zipf.classes) == 5
    counts = zipf.get_instance_count()
    # long-tailed: head class clearly dominates the tail class
    vals = [counts[c] for c in zipf.classes]
    assert vals[0] >= vals[-1]
    assert len(zipf.samples) > 0
    # no sample exceeds the detections cap
    assert all(len(s.targets) < 10 for s in zipf.samples)


def test_gen_cache_cli(tmp_path):
    from object_detection_cib_tpu.cli.data import main

    j = _write_coco_json(tmp_path / "instances_train.json")
    main(
        [
            "gen-cache",
            "--annotations", str(j),
            "--split", "train",
            "--name", "mycoco",
            "--cache-dir", str(tmp_path / "cache"),
        ]
    )
    info = deserialize_cached_dataset("mycoco", "train", tmp_path / "cache")
    assert len(info.samples) == 120


def test_make_coco_zipf_cli(tmp_path):
    from object_detection_cib_tpu.cli.data import main

    j = _write_coco_json(tmp_path / "instances_train.json")
    main(
        [
            "make-coco-zipf",
            "--annotations", str(j),
            "--split", "train",
            "--num-classes", "5",
            "--cache-dir", str(tmp_path / "cache"),
        ]
    )
    info = deserialize_cached_dataset("coco-zipf", "train", tmp_path / "cache")
    assert len(info.classes) == 5


def test_do_analysis(tmp_path):
    j = _write_coco_json(tmp_path / "instances_train.json")
    info = load_coco_json(j)
    stats = do_analysis(info, tmp_path / "analysis")
    assert stats["num_samples"] == 120
    assert (tmp_path / "analysis" / f"{info.name}-analysis.json").exists()


def test_inspect_sampler(tmp_path):
    from object_detection_cib_tpu.cli.inspect_sampler import inspect_sampler

    j = _write_coco_json(tmp_path / "instances_train.json")
    info = load_coco_json(j)
    per_epoch = inspect_sampler(info, "class_aware", 2, tmp_path / "out")
    assert set(per_epoch) == {0, 1}
    assert (tmp_path / "out" / "class_aware_stats.json").exists()
    assert (tmp_path / "out" / "class_aware_hist.png").exists()


def test_multirun_sweep_dims():
    from object_detection_cib_tpu.cli.train import _sweep_dims

    fixed, dims = _sweep_dims([
        "experiment=yv5n", "data.mixup_prob=0.0,0.3", "seed=1,2",
        "tags=[a,b]", "print_config=False",
    ])
    assert ("data.mixup_prob", ["0.0", "0.3"]) in dims
    assert ("seed", ["1", "2"]) in dims
    assert "tags=[a,b]" in fixed and "experiment=yv5n" in fixed
    assert len(dims) == 2
