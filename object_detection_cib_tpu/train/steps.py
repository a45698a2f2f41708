"""Jitted train / eval steps over a device mesh.

Capability parity: kod/lightning/experiments/yv5_baseline/exp.py —
  * training_step (exp.py:104-138): forward -> assign -> loss ->
    total = batch_size * (box + cls + obj)
  * validation_step (exp.py:140-154): forward(eval) -> decode -> NMS
    (conf 0.001 / iou 0.6, exp.py:45-46)
  * configure_optimizers + on_before_optimizer_step warmup (exp.py:156-185)

TPU-first: one compiled function per step type. The batch is sharded over
the mesh's ``data`` axis; parameters/optimizer state are replicated. XLA
inserts the gradient all-reduce (psum over ICI) and computes BatchNorm
statistics over the global batch (sync-BN semantics). The step counter lives
on device so warmup hyperparams are traced, not host-updated.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from object_detection_cib_tpu.core.assigner import (
    Assignment,
    assign_targets,
    compact_level_assignment,
)
from object_detection_cib_tpu.core.nms import NMSResult, non_max_suppression
from object_detection_cib_tpu.core.types import FeatureShape, LevelAnchors
from object_detection_cib_tpu.eval.decode import decode_predictions
from object_detection_cib_tpu.train.loss import LossParams, yolov5_loss
from object_detection_cib_tpu.train.optim import SmartSGD, SmartSGDState


class Batch(NamedTuple):
    """Fixed-shape detection batch (the collate contract).

    The reference keeps ragged per-image targets through collate
    (kod/lightning/data_module.py:82-87); here targets are padded to a static
    capacity T with a validity mask — the fixed-shape contract the assigner
    and loss consume.
    """

    images: jnp.ndarray  # (B, H, W, 3) float32 in [0, 1]
    boxes: jnp.ndarray  # (B, T, 4) xyxy pixels
    labels: jnp.ndarray  # (B, T) int32
    mask: jnp.ndarray  # (B, T) bool


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: SmartSGDState
    step: jnp.ndarray  # () int32


class StepMetrics(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    obj: jnp.ndarray
    cls: jnp.ndarray
    lr: jnp.ndarray
    # valid assignment slots dropped by loss-table compaction (0 = exact;
    # see compact_level_assignment). Monitored per epoch by the trainer.
    # Plain-int default: a jnp array here would init the backend at import.
    assign_drop: Any = 0


def create_train_state(net, rng, image_shape: FeatureShape, optimizer: SmartSGD):
    # jit the init: eager init dispatches every conv separately (very slow
    # through a remote-device tunnel); jitted it is one compiled program
    init_fn = jax.jit(lambda r, x: net.init(r, x, train=False))
    variables = init_fn(
        rng, jnp.zeros((1, image_shape.height, image_shape.width, 3))
    )
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    net,
    anchors: LevelAnchors,
    image_shape: FeatureShape,
    optimizer: SmartSGD,
    loss_params: LossParams = LossParams(),
    class_weights: Optional[jnp.ndarray] = None,
    assign_threshold: float = 4.0,
    head_sharding=None,
    assign_offset_capacity: int = 3,
    remat_policy: Optional[str] = None,
    assign_compact_slots: Optional[int] = 128,
):
    """Build the un-jitted train step; wrap with jit_train_step for a mesh.

    head_sharding: optional NamedSharding applied to the head output maps
    before the loss. Under spatial (model-axis) sharding this gathers the
    small prediction maps to data-only sharding — the loss's index gathers'
    backward is a scatter-add, which GSPMD mishandles on spatially-sharded
    operands (empirically wrong grads), and the maps are tiny anyway.

    remat_policy: None (save everything, XLA default) | "conv_out" (save
    only tagged conv outputs; BN+SiLU recompute fuses into backward —
    trades recompute FLOPs for HBM activation traffic, the profiled wall
    at 640px, see ROOFLINE.md) | "conv_out_bn_stats" (also save the tiny
    per-channel BN batch stats, so the backward recompute is just the
    normalize+SiLU elementwise chain) | "nothing" (full recompute).
    """
    remat_policies = {
        "conv_out": jax.checkpoint_policies.save_only_these_names("conv_out"),
        # conv_out + the per-channel BN batch stats: fixes why plain
        # conv_out measured negative (recomputing BN stats re-reads every
        # conv output in backward; the stats themselves are tiny)
        "conv_out_bn_stats": jax.checkpoint_policies.save_only_these_names(
            "conv_out", "bn_stats"
        ),
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }
    if remat_policy is not None and remat_policy not in remat_policies:
        raise ValueError(
            f"unknown remat_policy {remat_policy!r}: expected one of "
            f"{sorted(remat_policies)} or None"
        )

    def train_step(state: TrainState, batch: Batch):
        def forward(params, images):
            return net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )

        if remat_policy:
            forward = jax.checkpoint(
                forward, policy=remat_policies[remat_policy]
            )

        def loss_fn(params):
            out, mutated = forward(params, batch.images)
            if head_sharding is not None:
                out = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, head_sharding)
                    if hasattr(x, "ndim") and x.ndim == 4
                    else x,
                    out,
                )
            assignment = assign_targets(
                batch.boxes,
                batch.labels,
                batch.mask,
                image_shape,
                anchors,
                assign_threshold,
                assign_offset_capacity,
            )
            assign_drop = jnp.zeros((), jnp.int32)
            if assign_compact_slots:
                # shrink the ~2%-occupied K=B*T*A*3 table before the loss's
                # row-gather: its scatter-add backward serializes on the
                # scalar core at ~3 GB/s (see compact_level_assignment)
                cap = assign_compact_slots * batch.images.shape[0]
                for lv in assignment.levels():
                    n_valid = lv.valid.sum().astype(jnp.int32)
                    assign_drop = assign_drop + jnp.maximum(
                        n_valid - min(cap, int(lv.valid.shape[0])), 0
                    )
                assignment = Assignment(
                    *(
                        compact_level_assignment(lv, cap)
                        for lv in assignment.levels()
                    )
                )
            lres = yolov5_loss(
                out, assignment, image_shape, loss_params, class_weights
            )
            # total = batch_size * (box + cls + obj)  (ref exp.py:126-130)
            total = batch.images.shape[0] * lres.total
            return total, (lres, mutated["batch_stats"], assign_drop)

        (total, (lres, new_bs, assign_drop)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_params, new_opt = optimizer.update(
            grads, state.opt_state, state.params, state.step
        )
        _, lr_other, _ = optimizer.hyperparams(state.step)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        metrics = StepMetrics(
            total=total,
            box=lres.localization,
            obj=lres.objectness,
            cls=lres.classification,
            lr=lr_other,
            assign_drop=assign_drop,
        )
        return new_state, metrics

    return train_step


def make_eval_step(
    net,
    anchors: LevelAnchors,
    conf_thres: float = 0.001,  # ref exp.py:45
    iou_thres: float = 0.6,  # ref exp.py:46
    max_det: int = 300,
    max_nms: int = 2048,
):
    def eval_step(params, batch_stats, images) -> NMSResult:
        out = net.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        det = decode_predictions(out, anchors)
        return non_max_suppression(
            det,
            conf_thres=conf_thres,
            iou_thres=iou_thres,
            max_det=max_det,
            max_nms=max_nms,
        )

    return eval_step


def jit_train_step(train_step, mesh: Mesh, spatial: bool = False):
    """Compile the step for a mesh: batch sharded on `data`, state replicated.

    spatial=True additionally shards the image HEIGHT over the `model` axis
    (the detector analog of sequence parallelism): XLA GSPMD inserts the
    conv halo exchanges automatically; the loss's global gathers become
    collective-permutes. Use for resolutions too large for one chip.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    img_sh = (
        NamedSharding(mesh, P("data", "model")) if spatial else data
    )
    jitted = jax.jit(
        train_step,
        in_shardings=(repl, Batch(img_sh, data, data, data)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    if not spatial:
        return jitted

    # Spatial (height) sharding rides GSPMD's automatic conv halo exchange,
    # which is only well-behaved when every pyramid level keeps >=2 rows per
    # `model` shard (a 6x6/2 stem + stride-32 deepest level: a shard owning a
    # single row of the stride-32 map needs its entire receptive field from
    # neighbours, and GSPMD's halo rewrite silently produces wrong gradients
    # there — measured, see STATUS.md known limitation 3). Check statically
    # at dispatch: image height H must satisfy H/32 divisible by the model
    # axis with quotient >= 2, i.e. H >= 64*model and H % (32*model) == 0.
    m = mesh.shape["model"]

    def checked(state, batch):
        h = batch.images.shape[1]
        rows32 = h // 32
        if h % (32 * m) != 0 or rows32 // m < 2:
            raise ValueError(
                f"spatial sharding: image height {h} over model axis of size "
                f"{m} leaves the stride-32 pyramid level with "
                f"{rows32 / m:.2f} rows per shard; need an integer >= 2 "
                f"(H % (32*model) == 0 and H >= {64 * m}). Use a smaller "
                f"model axis or a larger resolution."
            )
        return jitted(state, batch)

    return checked


def jit_eval_step(eval_step, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        eval_step,
        in_shardings=(repl, repl, data),
        out_shardings=data,
    )
