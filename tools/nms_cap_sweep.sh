#!/bin/bash
# VERDICT #2: measure the mAP impact of the static pre-NMS candidate cap
# (reference: ragged max_nms=30000, kod/core/nms.py:24-26) on a trained
# checkpoint, at max_nms in {2048, 8192, 30720}. Writes one JSON per cap to
# runs/nms_cap/<cap>.json via the CLI eval path.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
CKPT=${1:-runs/orderings/baseline/checkpoints/best}
for CAP in 2048 8192 30720; do
  echo "=== max_nms=$CAP $(date +%H:%M:%S)"
  timeout 3600 python -m object_detection_cib_tpu.cli.train \
    experiment=yv5s dataset_name=synthetic-zipf +data.synthetic_images=600 \
    data.batch_size=64 data.pipeline=device +data.device_cache=True \
    data.enable_ram_cache=True hydra=static print_config=False seed=2023 \
    train=False test=True ckpt_path=$CKPT \
    model.val_nms_max_candidates=$CAP \
    paths.output_dir=runs/nms_cap/$CAP 2>&1 | tail -25 > runs/nms_cap_$CAP.txt
  echo "=== done rc=$?"
done
