#!/bin/bash
# Round-4 TPU measurement plan — run top to bottom as soon as the lease is
# live. Each step logs to runs/r4/<step>.log and is individually skippable
# (STEPS="bench sustained" ./tools/r4_tpu_plan.sh).
#
# Order matters: bench first (the driver-visible number), then the planar
# relayout measurement, then the long-compile extras.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p runs/r4

STEPS=${STEPS:-"sanity bench planar sustained mfu remat"}
log() { echo "=== [$1] $(date +%H:%M:%S)"; }

for step in $STEPS; do
  case $step in
  sanity)
    log sanity
    # quick device touch + planar gather kernel correctness on real TPU
    timeout 600 python - >runs/r4/sanity.log 2>&1 <<'EOF'
import jax, jax.numpy as jnp, numpy as np
print(jax.devices())
from object_detection_cib_tpu.ops import pallas_gather
rng = np.random.default_rng(0)
corpus = jax.device_put(rng.integers(0, 256, (64, 3, 416, 416), np.uint8))
idx = jnp.asarray(rng.integers(0, 64, (32,)), jnp.int32)
out = np.asarray(pallas_gather.gather_rows_planar(corpus, idx))
np.testing.assert_array_equal(out, np.asarray(corpus)[np.asarray(idx)])
print("planar gather OK on", jax.devices()[0].platform)
EOF
    tail -2 runs/r4/sanity.log
    ;;
  bench)
    log bench
    timeout 1800 python bench.py >runs/r4/bench.log 2>&1
    tail -1 runs/r4/bench.log
    ;;
  planar)
    log planar
    # augment-program profile with the planar corpus: the 4.7 ms
    # copy.130/reshape.19/copy.132 chain should be gone (ROOFLINE.md)
    timeout 1800 python tools/profile_augment.py >runs/r4/planar_augment.log 2>&1
    tail -5 runs/r4/planar_augment.log
    ;;
  sustained)
    log sustained
    # steady-state production loop @416 on the 5k corpus; target >=1,900
    timeout 3600 bash tools/bench_sustained.sh >runs/r4/sustained.log 2>&1
    grep -E "img/s|epoch" runs/r4/sustained.log | tail -8
    ;;
  mfu)
    log mfu
    # l-variant at a realistic batch (b=128): VERDICT r3 #5 (>=45% or the
    # measured ceiling). Long cold compile through the remote tunnel; the
    # persistent cache makes the driver's later run warm.
    timeout 3000 python bench.py --size l --img 640 --batch 128 --steps 12 \
      --skip-nms --skip-416 >runs/r4/mfu_l128.log 2>&1
    tail -2 runs/r4/mfu_l128.log
    ;;
  remat)
    log remat
    # conv_out_bn_stats @640: the measured img/s delta decides whether the
    # policy lands as a 640px default (ROOFLINE per-lever table)
    timeout 1800 python bench.py --remat conv_out_bn_stats --skip-nms \
      --skip-416 --skip-sizes >runs/r4/remat_bnstats.log 2>&1
    tail -2 runs/r4/remat_bnstats.log
    ;;
  esac
done
