"""Config engine tests: composition, overlays, CLI overrides, instantiate —
exercising the real configs/ tree with the reference's CLI spellings."""

import re
from functools import partial
from pathlib import Path

import pytest

from object_detection_cib_tpu.config import compose, instantiate

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def test_base_compose():
    cfg = compose(CONFIG_DIR)
    assert cfg["dataset_name"] == "voc-toy"
    assert cfg["seed"] == 2023
    assert cfg["data"]["batch_size"] == 64
    assert cfg["data"]["target_image_size"] == 416
    assert cfg["model"]["net"]["num_anchors_per_cell"] == 3
    assert cfg["model"]["optimizer"]["lr0"] == 0.01
    assert cfg["model"]["scheduler"]["name"] == "linear"
    assert cfg["model"]["anchor_info"]["ll"]["stride"] == 8
    assert cfg["model"]["anchor_info"]["hl"]["boxes_wh"][2] == [373, 326]
    assert cfg["trainer"]["max_epochs"] == 300
    # nested defaults: augmentor params landed under the data package
    assert (
        cfg["data"]["train_data_augmentor"]["aug_params"]["flip_lr_prob"] == 0.5
    )


def test_experiment_overlay_yv5s():
    cfg = compose(CONFIG_DIR, overrides=["experiment=yv5s"])
    assert cfg["model"]["net"]["widen_factor"] == 0.50
    assert cfg["model"]["net"]["deepen_factor"] == 0.33


def test_experiment_overlay_no_mosaic():
    cfg = compose(CONFIG_DIR, overrides=["experiment=yv5s_no_mosaic"])
    assert cfg["data"]["use_mosaic"] is False
    assert cfg["model"]["net"]["widen_factor"] == 0.50


def test_experiment_no_aug_params():
    cfg = compose(CONFIG_DIR, overrides=["experiment=yv5s_no_aug"])
    ap = cfg["data"]["train_data_augmentor"]["aug_params"]
    assert ap["flip_lr_prob"] == 0.0
    assert ap["affine_params"]["translate"] == 0.0


def test_imbalance_preset():
    cfg = compose(
        CONFIG_DIR, overrides=["experiment=imbalance/class_aware/default"]
    )
    assert cfg["model"]["net"]["widen_factor"] == 0.50
    assert (
        cfg["data"]["sampler"]["_target_"]
        == "object_detection_cib_tpu.data.samplers.ClassAwareSampler"
    )


def test_value_overrides():
    cfg = compose(
        CONFIG_DIR,
        overrides=[
            "experiment=yv5s",
            "data.mixup_prob=0.3",
            "use_loss_weights=True",
            "dataset_name=coco-zipf",
            "trainer.max_epochs=5",
        ],
    )
    assert cfg["data"]["mixup_prob"] == 0.3
    assert cfg["use_loss_weights"] is True
    assert cfg["dataset_name"] == "coco-zipf"
    assert cfg["trainer"]["max_epochs"] == 5


def test_group_override_from_cli():
    cfg = compose(CONFIG_DIR, overrides=["trainer=mesh_sim"])
    assert cfg["trainer"]["num_devices"] == 8
    assert cfg["trainer"]["platform"] == "cpu"


def test_debug_preset():
    cfg = compose(CONFIG_DIR, overrides=["debug=fdr"])
    assert cfg["trainer"]["fast_dev_run"] is True
    assert cfg["trainer"]["platform"] == "cpu"
    assert cfg["task_name"] == "debug"


def test_interpolation():
    # default run dirs are timestamped (ref hydra/default.yaml:9-13);
    # hydra=static restores the fixed-dir spelling
    cfg = compose(CONFIG_DIR)
    dirpath = cfg["callbacks"]["model_checkpoint"]["dirpath"]
    assert re.fullmatch(
        r"runs/train/runs/\d{4}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2}/checkpoints",
        dirpath,
    ), dirpath
    cfg = compose(CONFIG_DIR, overrides=["hydra=static"])
    assert cfg["callbacks"]["model_checkpoint"]["dirpath"] == (
        "runs/train/checkpoints"
    )


def test_instantiate_sampler_partial():
    cfg = compose(
        CONFIG_DIR, overrides=["experiment=imbalance/repeat_factor/default"]
    )
    obj = instantiate(cfg["data"]["sampler"])
    assert isinstance(obj, partial)
    from object_detection_cib_tpu.data.samplers import RepeatFactorSampler

    assert obj.func is RepeatFactorSampler


def test_instantiate_augmentor():
    cfg = compose(CONFIG_DIR)
    aug = instantiate(cfg["data"]["train_data_augmentor"])
    from object_detection_cib_tpu.data.host_augment import TrainSampleAugmentor

    assert isinstance(aug, TrainSampleAugmentor)
    assert aug.aug_params.hsv_params.saturation == 0.7


def test_add_and_delete_overrides():
    cfg = compose(CONFIG_DIR, overrides=["+extra.thing=5", "~tags"])
    assert cfg["extra"]["thing"] == 5
    assert "tags" not in cfg


def test_assigners_group():
    # (ref kod/configs/assigners/yv5.yaml — own selectable group)
    cfg = compose(CONFIG_DIR, overrides=["assigners=yv5"])
    assert cfg["assigners"]["threshold"] == 4.0
    cfg = compose(CONFIG_DIR, overrides=["assigners.threshold=3.5"])
    assert cfg["assigners"]["threshold"] == 3.5


def test_extras_group():
    cfg = compose(CONFIG_DIR)
    assert cfg["extras"]["enforce_tags"] is True
    assert cfg["extras"]["print_config"] is True


def test_callbacks_split_options():
    # individually selectable callback options (ref callbacks/*.yaml)
    cfg = compose(CONFIG_DIR, overrides=["callbacks=model_checkpoint"])
    assert set(cfg["callbacks"]) == {"model_checkpoint"}
    cfg = compose(CONFIG_DIR, overrides=["callbacks=none"])
    assert cfg["callbacks"]["model_checkpoint"] is None
    cfg = compose(CONFIG_DIR, overrides=["callbacks=sampler_debug"])
    assert cfg["callbacks"]["sampler_debug"] is True
    cfg = compose(CONFIG_DIR)  # default composes the option files
    assert cfg["callbacks"]["model_summary"]["max_depth"] == 3
    assert cfg["callbacks"]["rich_progress_bar"] is True


def test_albu_augmentations_group():
    # (ref kod/configs/data/augmentations/albu/default.yaml spelling)
    cfg = compose(CONFIG_DIR, overrides=["data/augmentations=albu/default"])
    spec = cfg["data"]["train_data_augmentor"]
    assert spec["_target_"].endswith("augmentor.TrainSampleAugmentor")
    aug = instantiate(spec)
    from object_detection_cib_tpu.data.augmentor import (
        TrainSampleAugmentor as AlbuAugmentor,
    )

    assert isinstance(aug, AlbuAugmentor)
    assert len(aug.augmentations) == 6
