#!/bin/bash
# Seed-sensitivity for the reproduced headline ordering (ACCURACY.md §2:
# mixup.3 > baseline > no_mosaic on the 600-image hard corpus, seed 2023).
# Runs the same triplet at extra seeds so the ordering gets error bars
# (VERDICT r3 #8). Results: runs/orderings_seeds/<preset>_s<seed>/csv.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

EPOCHS=${EPOCHS:-300}
SEEDS=${SEEDS:-"2024 2025"}
# +data.warp_pallas=False pins the einsum warp so these seed repeats use
# the identical implementation as the recorded seed-2023 triplet (the
# Pallas fused-warp kernel is fast-precision-equivalent, not bit-equal)
COMMON="dataset_name=synthetic-zipf-hard +data.synthetic_images=600
  +data.synthetic_val_images=300 data.batch_size=64 data.pipeline=device
  +data.device_cache=True data.enable_ram_cache=True +data.warp_pallas=False
  trainer.max_epochs=$EPOCHS trainer.check_val_every_n_epoch=25
  hydra=static print_config=False"

run() {
  name=$1; shift
  local log=runs/orderings_seeds/$name.log
  if [ -s "runs/orderings_seeds/$name/csv/metrics.csv" ]; then
    echo "=== $name: done already, skipping"
    return
  fi
  echo "=== $name: $* $(date +%H:%M:%S)"
  mkdir -p runs/orderings_seeds
  rm -rf "runs/orderings_seeds/$name"
  timeout 5400 python -m object_detection_cib_tpu.cli.train $COMMON \
    paths.output_dir=runs/orderings_seeds/$name "$@" >"$log" 2>&1
  local rc=$?
  grep -E "^\[epoch" "$log" | tail -2
  [ $rc -ne 0 ] && { echo "=== $name FAILED rc=$rc"; tail -10 "$log"; }
}

for seed in $SEEDS; do
  run "baseline_s$seed"  experiment=yv5s seed=$seed
  run "mixup03_s$seed"   experiment=yv5s data.mixup_prob=0.3 seed=$seed
  run "no_mosaic_s$seed" experiment=yv5s_no_mosaic seed=$seed
done
echo "=== collect:"
for d in runs/orderings_seeds/*/csv/metrics.csv; do
  echo "$d: $(tail -1 "$d")"
done
