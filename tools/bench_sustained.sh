#!/usr/bin/env bash
# Sustained production-loop throughput at realistic corpus scale
# (VERDICT r2 #3): 5,000-image synthetic corpus @416, b=128 -> 39
# steps/epoch, device-augmentation pipeline, HBM-resident cache, async
# checkpoints. Reports per-epoch img/s from the trainer's own accounting;
# steady-state = epochs after the first (compile + cache build).
#
# Usage: PYTHONPATH=/root/repo:$PYTHONPATH bash tools/bench_sustained.sh [epochs]
set -u
EPOCHS=${1:-8}
OUT=runs/sustained_$(date +%s)
mkdir -p "$OUT"
timeout 3000 python -m object_detection_cib_tpu.cli.train \
  experiment=yv5s dataset_name=synthetic-zipf \
  +data.synthetic_images=5000 +data.synthetic_val_images=256 \
  data.batch_size=128 data.pipeline=device data.device_cache=True \
  data.enable_ram_cache=True \
  trainer.max_epochs=$EPOCHS trainer.check_val_every_n_epoch=100 \
  hydra=static print_config=False seed=2023 \
  paths.output_dir="$OUT" >"$OUT/log.txt" 2>&1
rc=$?
echo "rc=$rc out=$OUT"
grep -E "^\[epoch" "$OUT/log.txt"
grep -E "ips=" "$OUT/log.txt" | tail -20
if [ $rc -ne 0 ]; then tail -25 "$OUT/log.txt"; fi
