"""End-to-end training/eval through the config + CLI surface.

The fake-mode fast-dev-run is the analog of the reference's
`debug=fdr data.sample_reader.fake_mode=True` workflow (SURVEY.md §4) —
the whole loop runs without an image corpus.
"""

from pathlib import Path

import numpy as np
import pytest

# jit-compile heavy on the 1-CPU CI host: run in the slow tier
# (`pytest -m slow`); the default tier stays under 5 minutes.
pytestmark = pytest.mark.slow

from object_detection_cib_tpu.config import compose
from object_detection_cib_tpu.train.trainer import Trainer, train

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def _cfg(tmp_path, *extra):
    return compose(
        CONFIG_DIR,
        overrides=[
            "debug=fdr",
            "experiment=yv5n",
            "dataset_name=fake",
            "data.fake_mode=True",
            "data.batch_size=4",
            "data.target_image_size=64",
            "data.max_targets=40",
            "data.num_workers=2",
            "data.enable_ram_cache=False",
            f"paths.output_dir={tmp_path}/run",
            f"callbacks.model_checkpoint.dirpath={tmp_path}/run/checkpoints",
            "logger=csv",
            f"logger.csv.save_dir={tmp_path}/run/csv",
            "trainer.log_every_n_steps=1",
            *extra,
        ],
    )


def test_fast_dev_run(tmp_path):
    cfg = _cfg(tmp_path)
    metrics = train(cfg)
    assert "map" in metrics
    assert 0.0 <= metrics["map"] <= 1.0
    # per-class AP50 keys present (parity with reference logging)
    assert any(k.startswith("map50_class_") for k in metrics)
    # checkpoints written
    assert (tmp_path / "run/checkpoints/last").exists()


def test_eval_from_checkpoint(tmp_path):
    cfg = _cfg(tmp_path)
    train(cfg)
    eval_cfg = _cfg(
        tmp_path,
        "train=False",
        "test=True",
        f"ckpt_path={tmp_path}/run/checkpoints/last",
    )
    metrics = train(eval_cfg)
    assert "map" in metrics


def test_checkpoint_every_n_epochs(tmp_path, monkeypatch):
    """ModelCheckpoint(every_n_epochs) parity: end-of-epoch save_last runs
    on the configured cadence, and the end-of-fit state is always saved."""
    from object_detection_cib_tpu.train.checkpoint import CheckpointManager

    calls = []
    orig = CheckpointManager.save_last
    monkeypatch.setattr(
        CheckpointManager,
        "save_last",
        lambda self, state: (calls.append(1), orig(self, state))[1],
    )
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
            "data.enable_ram_cache=False",
            f"paths.output_dir={tmp_path}/run",
            f"callbacks.model_checkpoint.dirpath={tmp_path}/run/checkpoints",
            "callbacks.model_checkpoint.every_n_epochs=2",
            "logger=csv",
            f"logger.csv.save_dir={tmp_path}/run/csv",
            "trainer.max_epochs=3",
            "trainer.check_val_every_n_epoch=3",
            "model.net.widen_factor=0.25",
        ],
    )
    train(cfg)
    # epoch 1 hits the cadence; epochs 0/2 skip; end-of-fit tops it up
    assert len(calls) == 2
    assert (tmp_path / "run/checkpoints/last").exists()


def test_loss_weights_and_sampler(tmp_path):
    cfg = _cfg(
        tmp_path,
        "use_loss_weights=True",
        "experiment=imbalance/class_aware/default",
        "model.net.widen_factor=0.25",  # keep it tiny
    )
    metrics = train(cfg)
    assert "map" in metrics


def test_mixup_path(tmp_path):
    cfg = _cfg(tmp_path, "data.mixup_prob=1.0")
    metrics = train(cfg)
    assert "map" in metrics


def test_device_pipeline_through_trainer(tmp_path):
    cfg = _cfg(tmp_path, "data.pipeline=device")
    metrics = train(cfg)
    assert "map" in metrics


def test_predict_path(tmp_path):
    cfg = _cfg(tmp_path, "train=False", "+predict=True")
    train(cfg)
    import json

    preds = json.loads((tmp_path / "run/predictions.json").read_text())
    assert isinstance(preds, list) and len(preds) > 0
    assert set(preds[0]) == {"boxes", "scores", "classes"}


def test_fused_dispatch_ahead_equivalence(tmp_path):
    """Dispatch-ahead pipelining (epoch k+1's fused scan enqueued before
    epoch k's metric fetch) is pure reordering of the same programs on the
    same inputs: final params and metrics are bitwise identical to the
    non-pipelined fused loop. Covers the donation hazard — boundaries that
    read state (val/ckpt/end-of-fit) must suppress the pre-dispatch."""
    import jax

    def run(sub, ahead):
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
                f"data.fused_dispatch_ahead={ahead}",
                f"paths.output_dir={tmp_path}/{sub}",
                f"callbacks.model_checkpoint.dirpath={tmp_path}/{sub}/ck",
                "callbacks.model_checkpoint.every_n_epochs=2",
                "logger=csv",
                f"logger.csv.save_dir={tmp_path}/{sub}/csv",
                "trainer.max_epochs=4",
                "trainer.check_val_every_n_epoch=4",
                "model.net.widen_factor=0.25",
                "seed=11",
            ],
        )
        t = Trainer(cfg)
        metrics = t.fit()
        return t, metrics

    t_a, m_a = run("ahead", True)
    t_b, m_b = run("plain", False)
    for la, lb in zip(
        jax.tree.leaves(t_a.state.params), jax.tree.leaves(t_b.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert m_a.keys() == m_b.keys()
    np.testing.assert_allclose(m_a["map"], m_b["map"], rtol=1e-7)


def test_trainer_exposes_components(tmp_path):
    t = Trainer(_cfg(tmp_path))
    assert t.net.num_classes == len(t.classes)
    assert t.optimizer.nw >= 100
    assert t.mesh.devices.size >= 1


def test_optimized_metric_retrieval(tmp_path):
    # sweep support (parity: kod/lightning/hydra_utils/misc.py:108-128 +
    # tasks/trainer.py:163-168): cli returns the optimized metric value
    from object_detection_cib_tpu.cli import train as cli_train
    from object_detection_cib_tpu.train.trainer import get_metric_value

    assert get_metric_value({"map": 0.5}, None) is None
    assert get_metric_value({"map": 0.5}, "map") == 0.5
    with pytest.raises(KeyError):
        get_metric_value({"map": 0.5}, "val/acc")

    value = cli_train.main(
        [
            "debug=fdr",
            "experiment=yv5n",
            "dataset_name=fake",
            "data.fake_mode=True",
            "data.batch_size=4",
            "data.target_image_size=64",
            "data.max_targets=40",
            "data.num_workers=2",
            "data.enable_ram_cache=False",
            f"paths.output_dir={tmp_path}/run",
            f"callbacks.model_checkpoint.dirpath={tmp_path}/run/checkpoints",
            "logger=csv",
            f"logger.csv.save_dir={tmp_path}/run/csv",
            "print_config=False",
            "+optimized_metric=map",
        ]
    )
    assert isinstance(value, float) and 0.0 <= value <= 1.0


def test_multirun_sweep(tmp_path):
    """`-m` sweep: cartesian jobs, per-job output dirs, summary with the
    best job by optimized_metric (parity: hydra basic launcher + sweeps,
    kod/lightning/hydra_utils/misc.py:108-128)."""
    import json

    from object_detection_cib_tpu.cli.train import main

    results = main([
        "-m",
        "debug=fdr",
        "experiment=yv5n",
        "dataset_name=fake",
        "data.fake_mode=True",
        "data.batch_size=4",
        "data.target_image_size=64",
        "data.max_targets=40",
        "data.num_workers=1",
        "seed=1,2",
        "optimized_metric=map50",
        f"paths.output_dir={tmp_path}/run",
        f"callbacks.model_checkpoint.dirpath={tmp_path}/ckpt",
        "logger=csv",
        f"logger.csv.save_dir={tmp_path}/csv",
        "print_config=False",
    ])
    assert len(results) == 2
    assert all("error" not in r for r in results)
    assert all(isinstance(r["metric"], float) for r in results)
    summary = json.loads(
        (tmp_path / "run" / "multirun" / "summary.json").read_text()
    )
    assert [r["job"] for r in summary] == [0, 1]
    assert (tmp_path / "run" / "multirun" / "0").exists()
    assert (tmp_path / "run" / "multirun" / "1").exists()
