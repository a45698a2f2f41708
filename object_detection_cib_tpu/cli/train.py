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


def _sweep_dims(argv):
    """Split overrides into fixed ones and comma-list sweep dimensions
    (hydra -m semantics: `a=1,2 b=x,y` -> 4 jobs; bracketed values like
    `tags=[a,b]` are single values, not sweeps)."""
    fixed, dims = [], []
    for a in argv:
        if "=" in a and not a.startswith("-"):
            k, v = a.split("=", 1)
            if "," in v and not v.lstrip().startswith(("[", "{")):
                dims.append((k, v.split(",")))
                continue
        fixed.append(a)
    return fixed, dims


def multirun(config_dir, fixed, dims):
    """Sequential sweep launcher (parity: hydra's basic launcher under
    `-m`, kod README sweep spellings + optimized_metric collection,
    kod/lightning/hydra_utils/misc.py:108-128).

    Jobs are the cartesian product of the sweep dimensions; job i runs
    with output_dir <base>/multirun/<i>, and a summary table + (when
    optimized_metric is set) the best job are printed and written to
    <base>/multirun/summary.json."""
    import itertools
    import json as _json

    base_cfg = compose(config_dir, "train", fixed + [f"{k}={vs[0]}" for k, vs in dims])
    base_out = base_cfg.get("paths", {}).get("output_dir", "runs/train")
    jobs = list(itertools.product(*[[(k, v) for v in vs] for k, vs in dims]))
    results = []
    for i, combo in enumerate(jobs):
        ov = [f"{k}={v}" for k, v in combo]
        label = ",".join(ov)
        if is_main_process():
            print(f"── multirun job {i}/{len(jobs) - 1}: {label}", flush=True)
        cfg = compose(
            config_dir, "train",
            fixed + ov + [f"paths.output_dir={base_out}/multirun/{i}"],
        )
        try:
            r = run_job(cfg)
            value = r if not isinstance(r, dict) else None
            results.append({"job": i, "overrides": ov, "metric": value,
                            "metrics": r if isinstance(r, dict) else None})
        except Exception as e:  # one failing point must not kill the sweep
            if is_main_process():
                print(f"multirun job {i} FAILED: {e!r}", flush=True)
            results.append({"job": i, "overrides": ov, "error": repr(e)[:300]})
    if is_main_process():
        out = Path(base_out) / "multirun"
        out.mkdir(parents=True, exist_ok=True)
        (out / "summary.json").write_text(_json.dumps(results, indent=2))
        print("── multirun summary")
        for r in results:
            tail = (
                f"metric={r['metric']}" if r.get("metric") is not None
                else (f"ERROR {r['error']}" if "error" in r else "done")
            )
            print(f"  job {r['job']}: {','.join(r['overrides'])}  {tail}")
        scored = [r for r in results if r.get("metric") is not None]
        if scored:
            best = max(scored, key=lambda r: r["metric"])
            print(
                f"  best: job {best['job']} "
                f"({','.join(best['overrides'])}) = {best['metric']}"
            )
    return results


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = DEFAULT_CONFIG_DIR
    if argv and argv[0].startswith("--config-dir="):
        config_dir = Path(argv.pop(0).split("=", 1)[1])
    # join a multi-host pod before any jax.devices() call if the coordinator
    # env vars are set (parity: kod/configs/trainer/ddp.yaml via Lightning)
    maybe_initialize_from_env()
    if "-m" in argv or "--multirun" in argv:
        argv = [a for a in argv if a not in ("-m", "--multirun")]
        fixed, dims = _sweep_dims(argv)
        if dims:
            return multirun(config_dir, fixed, dims)
    cfg = compose(config_dir, "train", argv)
    return run_job(cfg)


def run_job(cfg):
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
