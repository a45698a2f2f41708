"""Training CLI (parity: kod/cli/hydra_train.py).

Usage mirrors the reference README spellings:
  python -m object_detection_cib_tpu.cli.train experiment=yv5s \
      dataset_name=coco-zipf data.mixup_prob=0.3 use_loss_weights=True
  python -m object_detection_cib_tpu.cli.train train=False test=True \
      ckpt_path=runs/train/checkpoints/best
"""

from __future__ import annotations

import sys
from pathlib import Path

from object_detection_cib_tpu.config import compose
from object_detection_cib_tpu.parallel.distributed import (
    is_main_process,
    maybe_initialize_from_env,
)
from object_detection_cib_tpu.train.trainer import (
    _select_platform,
    get_metric_value,
    train,
)

DEFAULT_CONFIG_DIR = Path(__file__).resolve().parents[2] / "configs"


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = DEFAULT_CONFIG_DIR
    if argv and argv[0].startswith("--config-dir="):
        config_dir = Path(argv.pop(0).split("=", 1)[1])
    # join a multi-host pod before any jax.devices() call if the coordinator
    # env vars are set (parity: kod/configs/trainer/ddp.yaml via Lightning)
    maybe_initialize_from_env()
    cfg = compose(config_dir, "train", argv)
    # select the jax platform BEFORE any backend touch (is_main_process()
    # below initializes a backend; with trainer.platform=cpu the run must
    # never try the TPU plugin — whose init blocks in a connect-retry loop
    # when the device service is unreachable)
    _select_platform(cfg.get("trainer") or {})
    # extras (parity: kod/configs/extras/default.yaml + hydra_utils/misc.py
    # extras(): warnings filter, tag enforcement, config-tree print)
    extras = cfg.get("extras") or {}
    if extras.get("ignore_warnings"):
        import warnings

        warnings.filterwarnings("ignore")
    if extras.get("enforce_tags") and not cfg.get("tags"):
        raise ValueError(
            "extras.enforce_tags=True but no tags provided — pass "
            "'tags=[...]' (ref hydra_utils/rich.py enforce_tags)"
        )
    print_cfg = extras.get("print_config", cfg.get("print_config", True))
    if print_cfg and is_main_process():
        # startup config tree (parity: kod/lightning/hydra_utils/rich.py)
        import yaml

        print("── config " + "─" * 50)
        print(yaml.safe_dump(cfg, default_flow_style=False, sort_keys=False))
        print("─" * 60, flush=True)
    # task wrapper: log exceptions to the run dir before re-raising
    # (parity: kod/lightning/hydra_utils/misc.py:53-105)
    try:
        metrics = train(cfg)
        # hydra-sweep support: return the optimized metric when requested
        # (parity: kod/lightning/tasks/trainer.py:163-168)
        opt_name = cfg.get("optimized_metric")
        if opt_name:
            value = get_metric_value(metrics, opt_name)
            if is_main_process():
                print(f"optimized_metric {opt_name}={value}", flush=True)
            return value
        return metrics
    except Exception:
        import traceback

        if is_main_process():
            out_dir = Path(cfg.get("paths", {}).get("output_dir", "."))
            out_dir.mkdir(parents=True, exist_ok=True)
            (out_dir / "error.log").write_text(traceback.format_exc())
        raise


if __name__ == "__main__":
    main()
