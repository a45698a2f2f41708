"""Root-cause the m-variant input-layout fallback (VERDICT r4 #3).

BENCH_r04: m @640 b=96 ran at 20.1% MFU vs l's 44.3% — bench_train's
auto-layout path silently fell back to the default input layout for m's
shapes. This probes each stage of that path per size:

  1. compile the train step under AUTO input layouts; print the layout XLA
     chose for the image batch,
  2. try `jax.device_put(images, fmt)` — does the remote platform honor it?
  3. try the jitted-identity relayout (`out_shardings=fmt`),
  4. measure img/s with (a) whatever landed and (b) the plain-jit default,
     plus each compiled step's cost-model bytes_accessed.

Run on TPU:  python tools/diag_m_layout.py [sizes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)

import jax.numpy as jnp
import numpy as np

import bench
from object_detection_cib_tpu.core.types import FeatureShape, default_anchors
from object_detection_cib_tpu.models.yolov5 import build_network
from object_detection_cib_tpu.train.optim import OptimizerConfig, SmartSGD
from object_detection_cib_tpu.train.steps import (
    Batch,
    create_train_state,
    make_train_step,
)


def probe(size, batch, img=640, steps=10):
    from jax.experimental.layout import Format, Layout

    print(f"===== size={size} batch={batch} img={img}")
    shape = FeatureShape(img, img)
    net = build_network(10, size, dtype=jnp.bfloat16, stem_space_to_depth=True)
    opt = SmartSGD(OptimizerConfig(max_epochs=300), steps_per_epoch=100)
    state = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    step_fn = make_train_step(net, default_anchors(), shape, opt)
    b = bench.make_fake_batch(batch, img, 60, 10)

    in_sh = (None, Batch(Format(Layout.AUTO), None, None, None))
    step = jax.jit(step_fn, donate_argnums=(0,), in_shardings=in_sh)
    try:
        compiled = step.lower(state, b).compile()
    except Exception as e:
        print(f"  AUTO compile FAILED: {e!r}")
        return
    fmt = compiled.input_formats[0][1].images
    print(f"  XLA-preferred images layout: {fmt.layout}")

    imgs_dp = jax.device_put(b.images, fmt)
    got_dp = getattr(imgs_dp, "format", None)
    print(f"  device_put landed: {got_dp.layout if got_dp else None} "
          f"honored={got_dp is not None and got_dp.layout == fmt.layout}")

    try:
        imgs_id = jax.jit(lambda x: x, out_shardings=fmt)(b.images)
        got_id = getattr(imgs_id, "format", None)
        print(f"  jitted-identity landed: "
              f"{got_id.layout if got_id else None} "
              f"honored={got_id is not None and got_id.layout == fmt.layout}")
    except Exception as e:
        got_id, imgs_id = None, None
        print(f"  jitted-identity FAILED: {e!r}")

    flops = float(compiled.cost_analysis().get("flops", 0.0))
    peak = bench.PEAK_TFLOPS_BF16 * 1e12

    def run(step_c, batch_c, state0, label):
        st = state0
        for _ in range(3):
            st, m = step_c(st, batch_c)
        _ = np.asarray(jax.tree.leaves(st.params)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            st, m = step_c(st, batch_c)
        _ = np.asarray(jax.tree.leaves(st.params)[0])
        dt = (time.perf_counter() - t0) / steps
        ips = batch / dt
        print(f"  {label}: {ips:.1f} img/s  mfu={flops / dt / peak:.3f}")
        return ips

    landed = None
    for cand, got in ((imgs_id, got_id), (imgs_dp, got_dp)):
        if cand is not None and got is not None and got.layout == fmt.layout:
            landed = cand
            break
    if landed is not None:
        state1 = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
        run(compiled, b._replace(images=landed), state1, "pre-laid (AUTO)")
    else:
        print("  no way to land the preferred layout on this platform")
    state2 = create_train_state(net, jax.random.PRNGKey(0), shape, opt)
    plain = jax.jit(step_fn, donate_argnums=(0,))
    ca = plain.lower(state2, b).compile().cost_analysis()
    print(f"  plain-jit bytes_accessed={ca.get('bytes accessed', 0.0):.3e}")
    run(plain, b, state2, "plain jit (default layout)")


if __name__ == "__main__":
    sizes = sys.argv[1:] or ["s", "m", "l"]
    batches = {"n": 128, "s": 128, "m": 96, "l": 128}
    for sz in sizes:
        probe(sz, batches[sz])
