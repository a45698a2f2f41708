"""Profile the jitted train step on the real TPU and print a per-op breakdown.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_step.py [--img 640]
Parses the xplane protobuf directly (tensorboard_plugin_profile's converter
is broken against this protobuf build); needs
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(img, batch, size="s", fwd_only=False, nc=10):
    import jax.numpy as jnp

    from object_detection_cib_tpu.core.types import FeatureShape, default_anchors
    from object_detection_cib_tpu.models.yolov5 import build_network
    from object_detection_cib_tpu.train.optim import OptimizerConfig, SmartSGD
    from object_detection_cib_tpu.train.steps import (
        create_train_state,
        make_train_step,
    )

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_fake_batch

    shape = FeatureShape(img, img)
    net = build_network(nc, size, dtype=jnp.bfloat16)
    opt = SmartSGD(OptimizerConfig(max_epochs=300), steps_per_epoch=100)
    state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    step = jax.jit(make_train_step(net, default_anchors(), shape, opt), donate_argnums=(0,))
    b = make_fake_batch(batch, img, 60, nc)
    return state, step, b


def parse_xplane(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert pbs, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(pbs)[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.defaultdict(float)
            cnt = collections.Counter()
            total = 0.0
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ms
                agg[name] += dur
                cnt[name] += 1
                total += dur
            return agg, cnt, total
    raise RuntimeError("XLA Ops line not found in any device plane")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", default="s")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/jaxprof")
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()

    state, step, b = build(args.img, args.batch, args.size)
    for _ in range(3):
        state, m = step(state, b)
    _ = np.asarray(jax.tree.leaves(state.params)[0])

    os.system(f"rm -rf {args.out}")
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, m = step(state, b)
    _ = np.asarray(jax.tree.leaves(state.params)[0])
    jax.profiler.stop_trace()

    agg, cnt, total = parse_xplane(args.out)
    per_step = total / args.steps
    print(f"\n=== total device time: {total:.2f} ms over {args.steps} steps "
          f"-> {per_step:.2f} ms/step = {args.batch/per_step*1000:.0f} img/s ===\n")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>4}  op")
    for name, ms in rows[: args.top]:
        print(f"{ms/args.steps:9.3f}  {100*ms/total:5.1f}  {cnt[name]:4d}  {name[:140]}")

    # category rollup
    cats = collections.defaultdict(float)
    for name, ms in agg.items():
        ln = name.lower()
        if "convolution" in ln or "conv" in ln:
            cats["conv(+fused)"] += ms
        elif "fusion" in ln:
            cats["fusion(other)"] += ms
        elif "copy" in ln or "transpose" in ln or "bitcast" in ln:
            cats["layout/copy"] += ms
        elif "reduce" in ln or "all-reduce" in ln:
            cats["reduce"] += ms
        else:
            cats["other"] += ms
    print("\n-- rollup --")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{v/args.steps:9.3f} ms/step  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
