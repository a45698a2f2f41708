"""Smart-SGD optimizer: 3 param groups, epoch schedules, per-step warmup.

Capability parity:
  * param groups — kod/nn/optim/smart.py:20-60: ``bias`` (any param named
    bias, incl. BN bias -> no decay, warmup from 0.1), ``norm`` (BN scale ->
    no decay), ``decay`` (conv/linear kernels -> weight_decay 5e-4)
  * SGD semantics — torch.optim.SGD(momentum=0.937, nesterov=True) with
    coupled weight decay (g += wd * w before the momentum buffer)
  * epoch-indexed schedules — kod/nn/optim/schedulers.py:13-24
    (linear / cosine one-cycle / cosine-annealing / step)
  * warmup — kod/.../warmup.py:39-58 + exp.py:164-185: for the first
    nw = max(round(steps_per_epoch*3), 100) steps, linear interp of each
    group's lr (bias from 0.1, others from 0) to lr0*sch(epoch), and of
    momentum from 0.8 to 0.937.

TPU-first: hyperparameters (lr per group, momentum) are *traced* functions
of the step counter, so one compiled train_step serves the whole run — no
per-step host-side optimizer mutation as in the reference.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# epoch-indexed schedule factors (multiply lr0): ref schedulers.py:13-24
# --------------------------------------------------------------------------

def sch_linear(epoch, max_epochs: int, lrf: float):
    return (1.0 - epoch / max_epochs) * (1.0 - lrf) + lrf


def sch_cosine(epoch, max_epochs: int, lrf: float):
    return 1.0 + 0.5 * (lrf - 1.0) * (1.0 - jnp.cos(epoch / max_epochs * math.pi))


def sch_cosine_annealing(epoch, max_epochs: int, lrf: float):
    return ((1.0 + jnp.cos(epoch * math.pi / max_epochs)) / 2.0) * (1.0 - lrf) + lrf


def sch_step(epoch, step_size: int = 100, gamma: float = 0.5):
    return gamma ** jnp.floor(epoch / step_size)


def make_schedule(name: str, max_epochs: int, lrf: float = 0.01, **kw) -> Callable:
    if name == "linear":
        return lambda e: sch_linear(e, max_epochs, lrf)
    if name == "cosine":
        return lambda e: sch_cosine(e, max_epochs, lrf)
    if name == "cosine_annealing":
        return lambda e: sch_cosine_annealing(e, max_epochs, lrf)
    if name == "step":
        return lambda e: sch_step(e, **kw)
    raise ValueError(f"unknown schedule {name!r}")


# --------------------------------------------------------------------------
# param grouping
# --------------------------------------------------------------------------

GROUP_BIAS, GROUP_NORM, GROUP_DECAY = 0, 1, 2


def group_params(params: Any) -> Any:
    """Label each param leaf with its optimizer group.

    flax naming: BatchNorm has 'scale'/'bias'; Conv has 'kernel'/'bias'.
    Reference rule (smart.py:30-40): name == 'bias' -> bias group;
    norm-layer weight (BN scale) -> norm group; everything else -> decay.
    """

    def label(path, _leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        last = names[-1]
        if last == "bias" or last.endswith("_bias"):
            return GROUP_BIAS
        if last == "scale":
            return GROUP_NORM
        return GROUP_DECAY

    return jax.tree_util.tree_map_with_path(label, params)


class WarmupParams(NamedTuple):
    """ref configs/model/yv5.yaml optimizer_warmup_updater block."""

    warmup_epochs: float = 3.0
    warmup_bias_lr: float = 0.1
    warmup_momentum: float = 0.8


class OptimizerConfig(NamedTuple):
    lr0: float = 0.01  # ref configs/nn/optimizers/smart_sgd.yaml
    momentum: float = 0.937
    nesterov: bool = True
    weight_decay: float = 5e-4
    schedule: str = "linear"
    lrf: float = 0.01
    max_epochs: int = 300
    warmup: Optional[WarmupParams] = WarmupParams()


class SmartSGDState(NamedTuple):
    momentum_buf: Any  # pytree like params


def _interp(x, x1, y0, y1):
    """np.interp(x, [0, x1], [y0, y1]) with clamping (ref warmup.py:39-58)."""
    t = jnp.clip(x / jnp.maximum(x1, 1), 0.0, 1.0)
    return y0 + t * (y1 - y0)


class SmartSGD:
    """Jittable SGD with grouped lr/decay and warmup-aware hyperparams.

    Usage:
      opt = SmartSGD(config, steps_per_epoch)
      state = opt.init(params)
      new_params, new_state = opt.update(grads, state, params, step)
    """

    def __init__(self, config: OptimizerConfig, steps_per_epoch: int):
        self.config = config
        self.steps_per_epoch = max(int(steps_per_epoch), 1)
        self.sch_fn = make_schedule(config.schedule, config.max_epochs, config.lrf)
        if config.warmup is not None:
            # nw = max(round(num_batches * warmup_epochs), 100)  (ref exp.py:167-173)
            self.nw = max(round(self.steps_per_epoch * config.warmup.warmup_epochs), 100)
        else:
            self.nw = 0

    def init(self, params: Any) -> SmartSGDState:
        return SmartSGDState(
            momentum_buf=jax.tree.map(jnp.zeros_like, params)
        )

    def hyperparams(self, step: jnp.ndarray):
        """Traced (lr_bias, lr_other, momentum) at a global step."""
        cfg = self.config
        epoch = jnp.floor_divide(step, self.steps_per_epoch)
        lr_sched = cfg.lr0 * self.sch_fn(epoch.astype(jnp.float32))
        if cfg.warmup is None or self.nw == 0:
            return lr_sched, lr_sched, jnp.asarray(cfg.momentum, jnp.float32)
        w = cfg.warmup
        in_warmup = step <= self.nw  # ref exp.py:175-176 (applies while <= nw)
        lr_bias = jnp.where(
            in_warmup, _interp(step, self.nw, w.warmup_bias_lr, lr_sched), lr_sched
        )
        lr_other = jnp.where(
            in_warmup, _interp(step, self.nw, 0.0, lr_sched), lr_sched
        )
        mom = jnp.where(
            in_warmup,
            _interp(step, self.nw, w.warmup_momentum, cfg.momentum),
            cfg.momentum,
        ).astype(jnp.float32)
        return lr_bias, lr_other, mom

    def update(self, grads: Any, state: SmartSGDState, params: Any, step):
        """Apply SGD. The per-group math runs on a single flattened buffer
        per group (3 large fused elementwise ops) instead of one tiny op per
        parameter — profiling showed ~280 small per-leaf updates serializing
        on memory-space copies and dominating the non-conv step time."""
        cfg = self.config
        lr_bias, lr_other, mom = self.hyperparams(step)
        groups = group_params(params)

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_b = treedef.flatten_up_to(state.momentum_buf)
        flat_groups = treedef.flatten_up_to(groups)

        def upd_flat(g, p, buf, group):
            if group == GROUP_DECAY and cfg.weight_decay:
                g = g + cfg.weight_decay * p  # torch coupled decay
            new_buf = mom * buf + g
            d = g + mom * new_buf if cfg.nesterov else new_buf
            lr = lr_bias if group == GROUP_BIAS else lr_other
            return p - lr * d, new_buf

        new_p: list = [None] * len(flat_p)
        new_b: list = [None] * len(flat_p)
        for grp in (GROUP_BIAS, GROUP_NORM, GROUP_DECAY):
            idxs = [i for i, gg in enumerate(flat_groups) if gg == grp]
            if not idxs:
                continue
            sizes = [flat_p[i].size for i in idxs]
            shapes = [flat_p[i].shape for i in idxs]
            pc = jnp.concatenate([flat_p[i].ravel() for i in idxs])
            gc = jnp.concatenate(
                [flat_g[i].ravel().astype(jnp.float32) for i in idxs]
            )
            bc = jnp.concatenate([flat_b[i].ravel() for i in idxs])
            # run the group update on a LANE-ALIGNED 2-D view, fenced from
            # reshape motion: left as f32[N], XLA's fusion re-factorized the
            # buffer to fit some downstream kernel reshape — for yolov5m
            # (N=20,870,784 = 36234*576) it picked f32[36234,1,192,3],
            # whose minor dim wastes 125/128 of every (8,128) tile, and the
            # whole-model update ran at 16 GB/s, ~90 ms of a 351 ms step
            # (runs/r5/bn_stats_and_layout.log; s/l have odd param counts
            # that dodge the re-factorization, which is why only m sank to
            # 20% MFU in BENCH_r04). The (rows, 128) view is always
            # tile-perfect; barriers keep the factorization ours.
            n = pc.size
            pad = -n % 128
            if pad:
                pc = jnp.pad(pc, (0, pad))
                gc = jnp.pad(gc, (0, pad))
                bc = jnp.pad(bc, (0, pad))
            # fence the INPUTS only: the barrier pins the update's operand
            # shapes to the aligned 2-D view (un-fenced, XLA re-factorizes
            # the computation to a tile-hostile shape and the update runs
            # at 16 GB/s — measured 276 vs 325 img/s on yolov5m); leaving
            # the OUTPUTS un-fenced lets the result alias the params
            # buffer in place (an output barrier blocked the aliasing and
            # tipped m @640 b=96 over HBM under the bench's AUTO-layout
            # double-compile)
            pc, gc, bc = jax.lax.optimization_barrier(
                (pc.reshape(-1, 128), gc.reshape(-1, 128),
                 bc.reshape(-1, 128))
            )
            npc, nbc = upd_flat(gc, pc, bc, grp)
            npc = npc.reshape(-1)[:n]
            nbc = nbc.reshape(-1)[:n]
            off = 0
            for i, size, shape in zip(idxs, sizes, shapes):
                new_p[i] = jax.lax.dynamic_slice_in_dim(npc, off, size).reshape(shape)
                new_b[i] = jax.lax.dynamic_slice_in_dim(nbc, off, size).reshape(shape)
                off += size
        return (
            jax.tree.unflatten(treedef, new_p),
            SmartSGDState(momentum_buf=jax.tree.unflatten(treedef, new_b)),
        )
