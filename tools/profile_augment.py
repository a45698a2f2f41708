"""Profile the HBM-resident gather+augment program on the real TPU.

Mirrors DeviceDataPipeline._build_device_cache's gather_and_augment at the
sustained-bench shapes (S=416, B=128, N=5000 corpus): corpus gather ->
mosaic -> affine -> HSV -> flip -> Batch. Prints the same per-op
bytes-accessed table as tools/profile_step.py.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_augment.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_step import PEAK_HBM_GBPS, parse_xplane  # noqa: E402


def build(S, B, N, T, mixup=0.0, precision="fast", layout="planar",
          warp_pallas=False):
    from object_detection_cib_tpu.data.device_pipeline import (
        DeviceSample,
        _make_row_gather,
        build_device_augment_fn,
    )
    from object_detection_cib_tpu.data.host_augment import AugParams

    from jax.experimental.layout import Format, Layout

    planar = layout == "planar"
    # same gating as DeviceDataPipeline: Pallas HSV on single-process TPU
    hsv_pallas = planar and jax.devices()[0].platform == "tpu"
    core = build_device_augment_fn(S, AugParams(), mixup, 120, True,
                                   warp_precision=precision, planar=planar,
                                   hsv_pallas=hsv_pallas,
                                   warp_pallas=warp_pallas)
    rng = np.random.default_rng(0)
    corpus = rng.integers(0, 256, (N, S, S, 3), dtype=np.uint8)
    ds_sizes = jax.device_put(np.full((N, 2), S, np.int32))
    prep, gather = _make_row_gather(corpus.shape, planar=planar)
    from object_detection_cib_tpu.data.device_pipeline import (
        device_put_row_major,
    )

    ds_imgs = device_put_row_major(prep(corpus))
    ds_tb = jax.device_put(rng.uniform(0, S, (N, T, 4)).astype(np.float32))
    ds_tl = jax.device_put(np.zeros((N, T), np.int32))
    ds_tm = jax.device_put(np.ones((N, T), bool))

    @jax.jit
    def gather_and_augment(ds_imgs, ds_sizes, ds_tb, ds_tl, ds_tm, idx, key):
        p = DeviceSample(gather(ds_imgs, idx), ds_sizes[idx], ds_tb[idx],
                         ds_tl[idx], ds_tm[idx])
        return core(p, key)

    idx = jnp.asarray(rng.integers(0, N, (4 * B,)), jnp.int32)
    args = (ds_imgs, ds_sizes, ds_tb, ds_tl, ds_tm, idx,
            jax.random.PRNGKey(0))
    return gather_and_augment, args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=416)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--corpus", type=int, default=5000)
    ap.add_argument("--targets", type=int, default=30)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="/tmp/jaxprof_aug")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--precision", default="fast", choices=["fast", "exact"])
    ap.add_argument("--layout", default="planar", choices=["planar", "flat"])
    ap.add_argument("--warp-pallas", action="store_true",
                    help="fused Pallas warp kernel instead of the einsums")
    args = ap.parse_args()

    if not args.parse_only:
        fn, fargs = build(args.img, args.batch, args.corpus, args.targets,
                          precision=args.precision, layout=args.layout,
                          warp_pallas=args.warp_pallas)
        for _ in range(3):
            out, ovf = fn(*fargs)
        jax.block_until_ready(out.images)
        t0 = time.perf_counter()
        for _ in range(10):
            out, ovf = fn(*fargs)
        jax.block_until_ready(out.images)
        wall = (time.perf_counter() - t0) / 10
        print(f"wall: {wall * 1e3:.2f} ms/call ({args.batch / wall:.0f} img/s)")

        os.system(f"rm -rf {args.out}")
        jax.profiler.start_trace(args.out)
        for _ in range(args.steps):
            out, ovf = fn(*fargs)
        jax.block_until_ready(out.images)
        jax.profiler.stop_trace()

    ops, total = parse_xplane(args.out)
    S = args.steps
    per = total / S
    tot_gb = sum(oi.bytes * oi.n for oi in ops) / S / 1e9
    print(f"\n=== {per:.2f} ms/call | cost-model traffic {tot_gb:.2f} GB "
          f"-> {tot_gb / per * 1000:.0f} GB/s avg "
          f"({100 * tot_gb / per * 1000 / PEAK_HBM_GBPS:.0f}% of peak) ===\n")
    rows = sorted(ops, key=lambda oi: -oi.ms)
    print(f"{'ms':>8} {'%':>5} {'n':>4} {'GB':>8} {'GB/s':>6} {'category':<16} op")
    for oi in rows[: args.top]:
        ms = oi.ms / S
        gb = oi.bytes * oi.n / S / 1e9
        gbps = gb / ms * 1000 if ms > 0 else 0
        print(f"{ms:8.3f} {100 * oi.ms / total:5.1f} {oi.n // S:4d} {gb:8.3f} "
              f"{gbps:6.0f} {oi.category[:16]:<16} {oi.name[:110]}")


if __name__ == "__main__":
    main()
