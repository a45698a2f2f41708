"""Measure the "bf16 batch-stat accumulation" byte lever (ROOFLINE.md).

Flips models.layers.BN_FORCE_F32_STATS so BN batch statistics accumulate in
the compute dtype (bf16) instead of f32, then reports (a) the compiled
step's cost-model bytes_accessed delta vs the f32-stats baseline and (b) the
measured train img/s @640 b=128. Hypothesis going in: the stat reductions'
HBM traffic is the bf16 activation READS (identical either way); the f32 vs
bf16 choice only changes register-resident accumulators — expect ~0 delta.
Run on TPU:  python tools/measure_bn_stats_dtype.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)

from object_detection_cib_tpu.models import layers


def run(force_f32: bool, img=640, batch=128, steps=12):
    layers.BN_FORCE_F32_STATS = force_f32
    import bench

    ips, _, _ = bench.bench_train(
        img=img, batch=batch, steps=steps, want_flops=True, s2d=True,
        auto_layout=True,
    )
    # compiled bytes_accessed for the same step
    import jax.numpy as jnp
    from object_detection_cib_tpu.core.types import FeatureShape, default_anchors
    from object_detection_cib_tpu.models.yolov5 import build_network
    from object_detection_cib_tpu.train.optim import OptimizerConfig, SmartSGD
    from object_detection_cib_tpu.train.steps import create_train_state, make_train_step

    shape = FeatureShape(img, img)
    net = build_network(10, "s", dtype=jnp.bfloat16, stem_space_to_depth=True)
    opt = SmartSGD(OptimizerConfig(max_epochs=300), steps_per_epoch=100)
    state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    b = bench.make_fake_batch(batch, img, 60, 10)
    compiled = jax.jit(
        make_train_step(net, default_anchors(), shape, opt), donate_argnums=(0,)
    ).lower(state, b).compile()
    ba = compiled.cost_analysis().get("bytes accessed", None)
    return ips, ba


if __name__ == "__main__":
    ips_f32, ba_f32 = run(True)
    ips_bf16, ba_bf16 = run(False)
    gb = lambda x: None if x is None else round(x / 1e9, 3)
    print(
        {
            "f32_stats": {"ips": round(ips_f32, 1), "bytes_GB": gb(ba_f32)},
            "bf16_stats": {"ips": round(ips_bf16, 1), "bytes_GB": gb(ba_bf16)},
            "delta_ips_pct": round((ips_bf16 / ips_f32 - 1) * 100, 2),
        }
    )
