"""object_detection_cib_tpu — TPU-native object-detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``craston/object_detection_cib`` ("kod"): YOLOv5 (nano/small) training and
evaluation on long-tailed datasets with class-imbalance mitigations
(class-aware / repeat-factor sampling, per-class loss reweighing,
mosaic/mixup/affine augmentation).

Layering (bottom-up), mirroring the reference's capability map
(see SURVEY.md) but organized TPU-first:

- ``core``      pure-jnp box math, IoU family, fixed-shape label assignment,
                device-side batched NMS (all jittable, static shapes)
- ``models``    flax.linen CSPDarknet / SPPF / PAFPN / YOLOv5 heads (NHWC)
- ``ops``       on-device preprocessing: letterbox, mosaic, affine, HSV,
                flip, mixup (jit/Pallas kernels over uint8 batches)
- ``data``      host-side dataset manifest, decode workers, samplers,
                fixed-capacity batching, async device feed
- ``train``     train/eval steps (jit/pjit), smart-SGD optimizer groups,
                schedules + warmup, checkpointing, metrics
- ``eval``      decode + NMS + COCO-style mAP (avg over IoU .3/.5/.75/.9)
- ``parallel``  mesh construction and sharding rules (DP over ICI)
- ``config``    YAML config-tree composition + CLI overrides (hydra-style
                surface: ``experiment=yv5s data.mixup_prob=0.3``)
"""

__version__ = "0.1.0"
