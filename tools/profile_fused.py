"""Profile the fused (gather -> augment -> train) epoch program on TPU.

The sustained production loop runs each epoch as ONE XLA program
(`DeviceDataPipeline.build_fused_epoch_fn`); its measured per-step cost
exceeds pure-step + standalone-augment, so this tool traces the real scan
body and prints the same per-op bytes-accessed table as
tools/profile_step.py to locate the difference (layout copies at stage
boundaries, lost input-layout preferences, scan overhead).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_fused.py
           [--img 416 --batch 128 --corpus 1024 --steps 6 --pipelined]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_step import (  # noqa: E402
    PEAK_HBM_GBPS,
    PEAK_TFLOPS_BF16,
    categorize,
    parse_xplane,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=416)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--corpus", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--size", default="s")
    ap.add_argument("--pipelined", action="store_true")
    ap.add_argument("--out", default="/tmp/jaxprof_fused")
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()

    from object_detection_cib_tpu.core.types import FeatureShape, default_anchors
    from object_detection_cib_tpu.data.device_pipeline import DeviceDataPipeline
    from object_detection_cib_tpu.data.host_augment import AugParams
    from object_detection_cib_tpu.data.synthetic import build_fake_manifest
    from object_detection_cib_tpu.models.yolov5 import build_network
    from object_detection_cib_tpu.train.optim import OptimizerConfig, SmartSGD
    from object_detection_cib_tpu.train.steps import (
        create_train_state,
        make_train_step,
    )

    info = build_fake_manifest(
        num_images=args.corpus, num_classes=10, seed=0
    )
    pipe = DeviceDataPipeline(
        info,
        target_size=args.img,
        batch_size=args.batch,
        aug_params=AugParams(),
        max_targets=120,
        seed=0,
        fake_mode=True,
        device_cache=True,
    )
    shape = FeatureShape(args.img, args.img)
    # s2d stem: the production default (configs/nn/networks/yv5.yaml)
    net = build_network(
        10, args.size, dtype=jnp.bfloat16, stem_space_to_depth=True
    )
    opt = SmartSGD(OptimizerConfig(max_epochs=300), steps_per_epoch=100)
    state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    step = make_train_step(net, default_anchors(), shape, opt)

    fn = pipe.build_fused_epoch_fn(step, pipelined=args.pipelined)
    trunc = lambda xs: jax.tree.map(lambda a: a[: args.steps], xs)
    xs = trunc(pipe.epoch_host_arrays())
    state, (ms, _) = fn(state, pipe.device_arrays, xs)  # compile + warm
    _ = np.asarray(ms.total)

    xs2 = trunc(pipe.epoch_host_arrays())
    os.system(f"rm -rf {args.out}")
    jax.profiler.start_trace(args.out)
    state, (ms, _) = fn(state, pipe.device_arrays, xs2)
    _ = np.asarray(ms.total)
    jax.profiler.stop_trace()

    ops, total = parse_xplane(args.out)
    S = args.steps
    per_step = total / S
    tot_gb = sum(oi.bytes * oi.n for oi in ops) / S / 1e9
    tot_tflop = sum(oi.flops * oi.n for oi in ops) / S / 1e12
    print(
        f"\n=== fused {'pipelined ' if args.pipelined else ''}epoch: "
        f"{per_step:.2f} ms/step ({args.batch / per_step * 1000:.0f} img/s)"
        f" | cost-model traffic {tot_gb:.2f} GB/step"
        f" -> {tot_gb / per_step * 1000:.0f} GB/s avg"
        f" ({100 * tot_gb / per_step * 1000 / PEAK_HBM_GBPS:.0f}% of peak)"
        f" | {tot_tflop:.2f} TFLOP/step -> "
        f"{tot_tflop / per_step * 1000:.1f} TFLOP/s"
        f" ({100 * tot_tflop / per_step * 1000 / PEAK_TFLOPS_BF16:.0f}% MFU)"
        " ===\n"
    )

    rows = sorted(ops, key=lambda oi: -oi.ms)
    print(
        f"{'ms/step':>8} {'%':>5} {'n':>4} {'GB/step':>8} {'GB/s':>6} "
        f"{'GFLOP':>7} {'category':<18} op"
    )
    for oi in rows[: args.top]:
        msr = oi.ms / S
        gb = oi.bytes * oi.n / S / 1e9
        gbps = gb / msr * 1000 if msr > 0 else 0
        print(
            f"{msr:8.3f} {100 * oi.ms / total:5.1f} {oi.n // S:4d} {gb:8.3f} "
            f"{gbps:6.0f} {oi.flops * oi.n / S / 1e9:7.1f} "
            f"{oi.category[:18]:<18} {oi.name[:110]}"
        )

    cats = collections.defaultdict(lambda: [0.0, 0.0])
    for oi in ops:
        c = categorize(oi)
        cats[c][0] += oi.ms
        cats[c][1] += oi.bytes * oi.n
    print("\n-- rollup --")
    for k, (msr, by) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        ms_s = msr / S
        gb = by / S / 1e9
        print(
            f"{ms_s:9.3f} ms/step {100 * msr / total:5.1f}%  "
            f"{gb:8.2f} GB/step  "
            f"{gb / ms_s * 1000 if ms_s else 0:6.0f} GB/s  {k}"
        )


if __name__ == "__main__":
    main()
