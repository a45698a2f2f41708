#!/bin/bash
# Reproduce the reference README's experiment ORDERINGS (README.md:64-290)
# on the hard synthetic long-tailed corpus: 9 presets, one seed, yolov5s
# @416, production device pipeline with HBM-resident dataset.
#
# Corpus: synthetic-zipf-hard (data/synthetic.py) — color carries no class
# signal, textured clutter, and scale-shifted splits (train = large objects,
# val = full scale range) so the multi-scale augmentations (mosaic/mixup)
# matter the way they do on COCO-scale data. The easy corpus saturates
# (mosaic on/off both ~0.70 mAP) and cannot express the orderings.
#
# Results land in runs/orderings/<name>/csv/metrics.csv; collect with
# tools/collect_orderings.py.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

EPOCHS=${EPOCHS:-150}
COMMON="dataset_name=synthetic-zipf-hard +data.synthetic_images=240
  +data.synthetic_val_images=200 data.batch_size=64 data.pipeline=device
  +data.device_cache=True data.enable_ram_cache=True
  trainer.max_epochs=$EPOCHS trainer.check_val_every_n_epoch=25
  hydra=static print_config=False seed=2023"

run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)"
  local log=runs/orderings/$name.log
  mkdir -p runs/orderings
  timeout 5400 python -m object_detection_cib_tpu.cli.train $COMMON \
    paths.output_dir=runs/orderings/$name "$@" >"$log" 2>&1
  local rc=$?
  grep -E "^\[epoch" "$log" | tail -2
  if [ $rc -ne 0 ]; then
    echo "=== $name FAILED rc=$rc $(date +%H:%M:%S); last output:"
    tail -15 "$log"
  else
    echo "=== $name done rc=0 $(date +%H:%M:%S)"
  fi
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
