"""Logger backends: CSV header evolution, W&B offline run dir, MLflow
FileStore layout (parity: kod/configs/logger/{csv,wandb,mlflow}.yaml).

W&B/MLflow must be REAL without the client packages: wandb writes its
run-dir history format, MLflow writes the documented FileStore tree —
no credentials, no network, no no-op fallback."""

import json

from object_detection_cib_tpu.utils.loggers import (
    CSVLogger,
    MLflowLogger,
    NoOpLogger,
    WandbLogger,
    build_loggers,
)


def test_csv_header_evolution(tmp_path):
    lg = CSVLogger(tmp_path)
    lg.log({"loss": 1.0}, step=0)
    lg.log({"loss": 0.5, "map": 0.1}, step=1)  # new column appears
    rows = (tmp_path / "metrics.csv").read_text().strip().splitlines()
    assert rows[0].split(",")[0] == "step"
    assert "map" in rows[0]
    assert len(rows) == 3


def test_wandb_offline_run_dir(tmp_path):
    lg = WandbLogger(tmp_path, project="proj", name="t1", tags=["a"])
    lg.log({"loss": 0.25, "map": 0.5}, step=3)
    lg.log({"loss": 0.125}, step=4)
    lg.finalize()
    d = tmp_path / "wandb" / "offline-run-t1" / "files"
    meta = json.loads((d / "wandb-metadata.json").read_text())
    assert meta["project"] == "proj" and meta["tags"] == ["a"]
    hist = [
        json.loads(x)
        for x in (d / "wandb-history.jsonl").read_text().splitlines()
    ]
    assert hist[0] == {"_step": 3, "loss": 0.25, "map": 0.5}
    assert hist[1]["_step"] == 4


def test_mlflow_filestore_layout(tmp_path):
    uri = f"file:{tmp_path}/mlruns"
    lg = MLflowLogger(uri, experiment_name="exp-a", run_name="r1")
    lg.log({"loss": 2.0}, step=0)
    lg.log({"loss": 1.0}, step=1)
    lg.finalize()

    root = tmp_path / "mlruns"
    (exp_dir,) = [d for d in root.iterdir() if d.name.isdigit()]
    assert "name: exp-a" in (exp_dir / "meta.yaml").read_text()
    (run_dir,) = [d for d in exp_dir.iterdir() if d.is_dir()]
    meta = (run_dir / "meta.yaml").read_text()
    assert f"experiment_id: '{exp_dir.name}'" in meta
    assert "status: 3" in meta and "end_time: null" not in meta
    lines = (run_dir / "metrics" / "loss").read_text().strip().splitlines()
    ts0, v0, s0 = lines[0].split()
    assert float(v0) == 2.0 and s0 == "0"
    assert lines[1].split()[2] == "1"
    assert (run_dir / "tags" / "mlflow.runName").read_text() == "r1"

    # a second run in the same experiment reuses the experiment id
    lg2 = MLflowLogger(uri, experiment_name="exp-a", run_name="r2")
    lg2.finalize()
    assert len([d for d in root.iterdir() if d.name.isdigit()]) == 1
    assert len([d for d in exp_dir.iterdir() if d.is_dir()]) == 2


def test_build_loggers_real_not_noop(tmp_path, recwarn):
    cfg = {
        "csv": {"save_dir": str(tmp_path / "csv")},
        "wandb": {"save_dir": str(tmp_path), "project": "p"},
        "mlflow": {
            "tracking_uri": f"file:{tmp_path}/mlruns",
            "experiment_name": "e",
        },
    }
    out = build_loggers(cfg)
    assert len(out) == 3
    assert not any(isinstance(lg, NoOpLogger) for lg in out)
    for lg in out:
        lg.log({"x": 1.0}, step=0)
        getattr(lg, "finalize", lambda: None)()
