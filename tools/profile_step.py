"""Profile the jitted train step on the real TPU: per-op time, HBM bytes,
flops, and a reconciled roofline table.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_step.py [--img 640]
Parses the xplane protobuf directly (tensorboard_plugin_profile's converter
is broken against this protobuf build); needs
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python.

Per-op ``bytes_accessed``/``flops`` live on the XLA-Ops line's *event
metadata* stats (XLA's HLO cost analysis: minimal operand+output traffic,
no cache-reuse modeling); event occurrences carry only timing. The
``memory_access_breakdown`` stat is a serialized OpMetrics.MemoryAccessed
list ({operation_type, memory_space, bytes}) decoded by hand because this
TF build ships no op_metrics_pb2.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_HBM_GBPS = 819.0  # v5e; overridden by the plane stat when present
PEAK_TFLOPS_BF16 = 197.0


def build(img, batch, size="s", nc=10, remat=None, s2d=False,
          auto_layout=False):
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

    from object_detection_cib_tpu.train.steps import Batch

    shape = FeatureShape(img, img)
    net = build_network(nc, size, dtype=jnp.bfloat16, stem_space_to_depth=s2d)
    opt = SmartSGD(OptimizerConfig(max_epochs=300), steps_per_epoch=100)
    state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    in_sh = None
    if auto_layout:
        from jax.experimental.layout import Format, Layout

        in_sh = (None, Batch(Format(Layout.AUTO), None, None, None))
    step = jax.jit(
        make_train_step(net, default_anchors(), shape, opt, remat_policy=remat),
        donate_argnums=(0,),
        **({"in_shardings": in_sh} if in_sh is not None else {}),
    )
    b = make_fake_batch(batch, img, 60, nc)
    if auto_layout:
        compiled = step.lower(state, b).compile()
        fmt = compiled.input_formats[0][1].images
        b = b._replace(images=jax.device_put(b.images, fmt))
        step = compiled
    return state, step, b


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        byte = buf[i]
        i += 1
        x |= (byte & 0x7F) << s
        if not byte & 0x80:
            return x, i
        s += 7


def parse_mem_breakdown(buf):
    """Decode repeated OpMetrics.MemoryAccessed{1:op_type,2:space,3:bytes}."""
    out = []
    i = 0
    while i < len(buf):
        tag, i = _varint(buf, i)
        if tag != 0x0A:  # field 1, wire type 2
            break
        ln, i = _varint(buf, i)
        sub = buf[i : i + ln]
        i += ln
        j = 0
        d = {}
        while j < len(sub):
            t, j = _varint(sub, j)
            v, j = _varint(sub, j)
            d[t >> 3] = v
        out.append(
            {"op": d.get(1, 0), "space": d.get(2, 0), "bytes": d.get(3, 0)}
        )
    return out


def _statval(st):
    w = st.WhichOneof("value")
    return getattr(st, w) if w else None


class OpInfo:
    __slots__ = ("name", "ms", "n", "bytes", "flops", "category", "source",
                 "shape", "mem", "dedup")

    def __init__(self, name):
        self.name = name
        self.ms = 0.0
        self.n = 0
        self.bytes = 0
        self.flops = 0
        self.category = ""
        self.source = ""
        self.shape = ""
        self.mem = []
        self.dedup = None


def parse_xplane(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert pbs, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(pbs)[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        sm = {k: v.name for k, v in plane.stat_metadata.items()}
        # event metadata: cost-analysis stats per distinct op
        meta = {}
        for mid, emd in plane.event_metadata.items():
            oi = OpInfo(emd.name)
            for st in emd.stats:
                k = sm.get(st.metadata_id, "")
                v = _statval(st)
                if k == "bytes_accessed":
                    oi.bytes = int(v)
                elif k == "flops":
                    oi.flops = int(v)
                elif k == "hlo_category":
                    oi.category = v
                elif k == "source":
                    oi.source = v
                elif k == "shape_with_layout":
                    oi.shape = v
                elif k == "deduplicated_name":
                    oi.dedup = v
                elif k == "memory_access_breakdown":
                    oi.mem = parse_mem_breakdown(v)
            meta[mid] = oi
        # deduplicated ops carry their stats on the canonical op only
        by_name = {oi.name.split(" = ")[0].lstrip("%"): oi for oi in meta.values()}
        for oi in meta.values():
            if oi.dedup and oi.bytes == 0:
                src = by_name.get(oi.dedup)
                if src is not None:
                    oi.bytes, oi.flops, oi.mem = src.bytes, src.flops, src.mem
                    oi.category = oi.category or src.category
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            total = 0.0
            for ev in line.events:
                oi = meta.get(ev.metadata_id)
                if oi is None:
                    continue
                dur = ev.duration_ps / 1e9  # ms
                oi.ms += dur
                oi.n += 1
                total += dur
            ops = [oi for oi in meta.values() if oi.n > 0]
            return ops, total
    raise RuntimeError("XLA Ops line not found in any device plane")


def categorize(oi):
    n = oi.name.lower()
    cat = oi.category.lower()
    if "convolution" in cat or "convolution" in n:
        return "conv(+fused)"
    if "copy" in n or "transpose" in cat or "bitcast" in n or "copy" in cat:
        return "layout/copy"
    if "reduce" in cat or "reduce" in n:
        return "reduce/BN-stat"
    if "fusion" in cat or "fusion" in n:
        return "elementwise-fusion"
    if "custom-call" in n or "custom" in cat:
        return "custom-call"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", default="s")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/jaxprof")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--remat", default=None, choices=["conv_out", "nothing"])
    ap.add_argument("--s2d", action="store_true")
    ap.add_argument("--auto-layout", action="store_true")
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse an existing trace dir, skip the TPU run")
    ap.add_argument("--json-out", default=None,
                    help="also write the per-op table as JSON")
    args = ap.parse_args()

    if not args.parse_only:
        state, step, b = build(args.img, args.batch, args.size,
                               remat=args.remat, s2d=args.s2d,
                               auto_layout=args.auto_layout)
        for _ in range(3):
            state, m = step(state, b)
        _ = np.asarray(jax.tree.leaves(state.params)[0])

        os.system(f"rm -rf {args.out}")
        jax.profiler.start_trace(args.out)
        for _ in range(args.steps):
            state, m = step(state, b)
        _ = np.asarray(jax.tree.leaves(state.params)[0])
        jax.profiler.stop_trace()

    ops, total = parse_xplane(args.out)
    S = args.steps
    per_step = total / S
    tot_gb = sum(oi.bytes * oi.n for oi in ops) / S / 1e9
    tot_tflop = sum(oi.flops * oi.n for oi in ops) / S / 1e12
    print(f"\n=== {per_step:.2f} ms/step ({args.batch / per_step * 1000:.0f} img/s)"
          f" | cost-model traffic {tot_gb:.2f} GB/step"
          f" -> {tot_gb / per_step * 1000:.0f} GB/s avg ({100 * tot_gb / per_step * 1000 / PEAK_HBM_GBPS:.0f}% of {PEAK_HBM_GBPS:.0f} GB/s peak)"
          f" | {tot_tflop:.2f} TFLOP/step -> {tot_tflop / per_step * 1000:.1f} TFLOP/s"
          f" ({100 * tot_tflop / per_step * 1000 / PEAK_TFLOPS_BF16:.0f}% MFU) ===\n")

    rows = sorted(ops, key=lambda oi: -oi.ms)
    print(f"{'ms/step':>8} {'%':>5} {'n':>4} {'GB/step':>8} {'GB/s':>6} {'%bw':>4} "
          f"{'GFLOP':>7} {'category':<18} op")
    for oi in rows[: args.top]:
        ms = oi.ms / S
        gb = oi.bytes * oi.n / S / 1e9
        gbps = gb / ms * 1000 if ms > 0 else 0
        gflop = oi.flops * oi.n / S / 1e9
        print(f"{ms:8.3f} {100 * oi.ms / total:5.1f} {oi.n // S:4d} {gb:8.3f} "
              f"{gbps:6.0f} {100 * gbps / PEAK_HBM_GBPS:4.0f} {gflop:7.1f} "
              f"{oi.category[:18]:<18} {oi.name[:110]}")

    cats = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    for oi in ops:
        c = categorize(oi)
        cats[c][0] += oi.ms
        cats[c][1] += oi.bytes * oi.n
        cats[c][2] += oi.flops * oi.n
    print("\n-- rollup (time | cost-model bytes | achieved GB/s | flops) --")
    for k, (ms, by, fl) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        ms_s = ms / S
        gb = by / S / 1e9
        print(f"{ms_s:9.3f} ms/step {100 * ms / total:5.1f}%  {gb:8.2f} GB/step  "
              f"{gb / ms_s * 1000 if ms_s else 0:6.0f} GB/s  "
              f"{fl / S / 1e9:9.1f} GFLOP  {k}")

    if args.json_out:
        out = [
            {
                "name": oi.name.split(" = ")[0], "ms": oi.ms / S,
                "n": oi.n // S, "bytes": oi.bytes * oi.n // S,
                "flops": oi.flops * oi.n // S, "category": oi.category,
                "source": oi.source, "shape": oi.shape,
                "mem": oi.mem,
            }
            for oi in rows
        ]
        with open(args.json_out, "w") as f:
            json.dump({"ms_per_step": per_step, "gb_per_step": tot_gb,
                       "tflop_per_step": tot_tflop, "ops": out}, f)
        print(f"\nwrote {args.json_out}")


if __name__ == "__main__":
    main()
