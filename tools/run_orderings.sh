#!/bin/bash
# Reproduce the reference README's experiment ORDERINGS on the synthetic
# long-tailed corpus (ACCURACY.md capstone recipe): 9 presets, one seed,
# yolov5s @416, 60 epochs, production device pipeline with HBM-resident
# dataset. Results land in runs/orderings/<name>/csv/metrics.csv.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

COMMON="dataset_name=synthetic-zipf +data.synthetic_images=600
  data.batch_size=64 data.pipeline=device +data.device_cache=True
  data.enable_ram_cache=True trainer.max_epochs=60
  trainer.check_val_every_n_epoch=10 hydra=static print_config=False
  seed=2023"

run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)"
  timeout 5400 python -m object_detection_cib_tpu.cli.train $COMMON \
    paths.output_dir=runs/orderings/$name "$@" 2>&1 | tail -3
  echo "=== $name done rc=$? $(date +%H:%M:%S)"
}

run baseline     experiment=yv5s
run no_mosaic    experiment=yv5s_no_mosaic
run mixup01      experiment=yv5s data.mixup_prob=0.1
run mixup02      experiment=yv5s data.mixup_prob=0.2
run mixup03      experiment=yv5s data.mixup_prob=0.3
run class_aware  experiment=imbalance/class_aware/default
run rf_mean      experiment=imbalance/repeat_factor/default
run rf_max       experiment=imbalance/repeat_factor/default data.sampler.reduction=max
run loss_weights experiment=yv5s use_loss_weights=True
echo "ALL DONE $(date +%H:%M:%S)"
