"""YOLOv5 network: CSPDarknet backbone + SPPF + PAFPN neck + anchor heads.

Capability parity (topology + hyperparameters, re-designed flax/NHWC):
  * stage table & BN params    — kod/nn/networks/yolov5.py:24-31
  * backbone (stem 6x6/s2, 4 stages of Conv3x3/s2 + CSP [+SPPF])
                               — kod/nn/backbones/yolov5.py:85-131
  * width/depth scaling        — kod/nn/utils.py:7-22
  * PAFPN neck                 — kod/nn/necks/yolov5_pafpn.py:16-202
  * heads with YOLOv5 prior-bias init — kod/nn/heads/yolov5.py:12-178
  * size variants n/s          — kod/configs/experiment/yv5{n,s}.yaml

Heads emit (B, H, W, A, p) — NHWC-native, no transposes on the hot path
(the reference uses (B, A, H, W, p)); the loss/decode index accordingly.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from object_detection_cib_tpu.models.layers import (
    ConvBnAct,
    CSPLayer,
    SpaceToDepthStem,
    SPPFBottleneck,
    conv_kernel_init,
    torch_bias_init,
    upsample_nearest_2x,
)


def make_divisible(x: float, widen_factor: float = 1.0, divisor: int = 8) -> int:
    """ceil(x*widen/divisor)*divisor (ref kod/nn/utils.py:7-13)."""
    return math.ceil(x * widen_factor / divisor) * divisor


def make_round(x: float, deepen_factor: float = 1.0) -> int:
    """round(x*deepen), min 1 when x>1 (ref kod/nn/utils.py:16-22)."""
    return int(max(round(x * deepen_factor), 1) if x > 1 else x)


class StageConfig(NamedTuple):
    in_channels: int
    out_channels: int
    num_blocks: int
    add_identity: bool
    use_spp: bool


# P5 stage table (ref kod/nn/networks/yolov5.py:26-31)
P5_STAGES: Tuple[StageConfig, ...] = (
    StageConfig(64, 128, 3, True, False),
    StageConfig(128, 256, 6, True, False),
    StageConfig(256, 512, 9, True, False),
    StageConfig(512, 1024, 3, False, True),
)


class DetectionHeadResult(NamedTuple):
    """One level's predictions, kept FLAT for TPU efficiency.

    raw: (B, H, W, A*(5+nc)) — channel blocks [box(A*4) | obj(A) | cls(A*nc)].
    Emitting a single fused tensor instead of three (box/obj/cls) avoids
    3x lane padding (e.g. 12/3/30 channels each pad to 128 lanes) and the
    (A*p)->(A,p) relayout reshape on the hot path; consumers slice/reshape
    at gather sites where tensors are small.
    """

    raw: jnp.ndarray
    num_anchors: int
    num_classes: int

    @property
    def box(self) -> jnp.ndarray:
        """(B, H, W, A, 4) logical view (test/debug convenience)."""
        A = self.num_anchors
        b, h, w, _ = self.raw.shape
        return self.raw[..., : A * 4].reshape(b, h, w, A, 4)

    @property
    def obj(self) -> jnp.ndarray:
        """(B, H, W, A, 1) logical view."""
        A = self.num_anchors
        b, h, w, _ = self.raw.shape
        return self.raw[..., A * 4 : A * 5].reshape(b, h, w, A, 1)

    @property
    def cls(self) -> jnp.ndarray:
        """(B, H, W, A, nc) logical view."""
        A, nc = self.num_anchors, self.num_classes
        b, h, w, _ = self.raw.shape
        return self.raw[..., A * 5 :].reshape(b, h, w, A, nc)

    @classmethod
    def from_parts(cls_, box, obj, cls):
        """Assemble from (B,H,W,A,p) parts (test/interop convenience)."""
        b, h, w, A, nc = cls.shape
        raw = jnp.concatenate(
            [
                box.reshape(b, h, w, A * 4),
                obj.reshape(b, h, w, A),
                cls.reshape(b, h, w, A * nc),
            ],
            axis=-1,
        )
        return cls_(raw=raw, num_anchors=A, num_classes=nc)


class Yolov5NetworkResult(NamedTuple):
    ll: DetectionHeadResult  # stride 8
    ml: DetectionHeadResult  # stride 16
    hl: DetectionHeadResult  # stride 32

    def levels(self) -> Tuple[DetectionHeadResult, ...]:
        return (self.ll, self.ml, self.hl)


class Yolov5Backbone(nn.Module):
    """CSPDarknet (ref kod/nn/backbones/yolov5.py:85-131)."""

    stages: Sequence[StageConfig] = P5_STAGES
    deepen_factor: float = 1.0
    widen_factor: float = 1.0
    spp_kernel_sizes: int = 5
    # Exact 3x3-on-space-to-depth rewrite of the stem. Measured neutral on
    # v5e (XLA's conv canonicalization already performs the equivalent
    # transform internally); kept as an option + equivalence tests.
    stem_space_to_depth: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        md = partial(make_divisible, widen_factor=self.widen_factor)
        common = dict(axis_name=self.axis_name, dtype=self.dtype)

        # stem: 6x6 stride 2 pad 2 (ref backbones/yolov5.py:102-110) —
        # executed as a 3x3 conv on space-to-depth input when enabled
        # (identical function & params; see SpaceToDepthStem)
        if self.stem_space_to_depth and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = SpaceToDepthStem(
                md(self.stages[0].in_channels), name="stem", **common
            )(x, train)
        else:
            x = ConvBnAct(
                md(self.stages[0].in_channels), 6, 2, padding=2, name="stem",
                **common,
            )(x, train)

        outs = []
        for idx, cfg in enumerate(self.stages):
            name = f"stage{idx + 1}"
            x = ConvBnAct(
                md(cfg.out_channels), 3, 2, name=f"{name}_conv", **common
            )(x, train)
            x = CSPLayer(
                md(cfg.out_channels),
                num_blocks=make_round(cfg.num_blocks, self.deepen_factor),
                add_identity=cfg.add_identity,
                name=f"{name}_csp",
                **common,
            )(x, train)
            if cfg.use_spp:
                x = SPPFBottleneck(
                    md(cfg.out_channels),
                    kernel_sizes=self.spp_kernel_sizes,
                    name=f"{name}_sppf",
                    **common,
                )(x, train)
            outs.append(x)
        return outs  # 4 stage outputs; network uses the last 3


class Yolov5PAFPN(nn.Module):
    """PANet feature pyramid over P3/P4/P5 (ref kod/nn/necks/yolov5_pafpn.py).

    Topology: 1x1 reduce on topmost; top-down nearest-2x upsample + concat +
    CSP(no identity) with an extra 1x1 lateral reduce after the P4 merge;
    bottom-up 3x3/s2 downsample + concat + CSP.
    """

    in_channels_list: Sequence[int] = (256, 512, 1024)
    num_blocks: int = 3
    deepen_factor: float = 1.0
    widen_factor: float = 1.0
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        assert len(feats) == len(self.in_channels_list)
        md = partial(make_divisible, widen_factor=self.widen_factor)
        nb = make_round(self.num_blocks, self.deepen_factor)
        common = dict(axis_name=self.axis_name, dtype=self.dtype)
        csp = partial(CSPLayer, num_blocks=nb, add_identity=False, **common)

        chs = list(self.in_channels_list)
        n = len(chs)

        # reduce: 1x1 only on the topmost level (ref yolov5_pafpn.py:56-75)
        reduce_outs = list(feats)
        reduce_outs[-1] = ConvBnAct(md(chs[-2]), 1, name="reduce_top", **common)(
            feats[-1], train
        )

        # top-down (ref yolov5_pafpn.py:177-191)
        inner = [reduce_outs[-1]]  # [..., P5_reduced]
        for idx in range(n - 1, 0, -1):
            up = upsample_nearest_2x(inner[0])
            cat = jnp.concatenate([up, reduce_outs[idx - 1]], axis=-1)
            y = csp(md(chs[idx - 1]), name=f"top_down_csp{idx}")(cat, train)
            if idx != 1:
                # extra 1x1 lateral reduce (ref make_top_down_layer idx!=1)
                y = ConvBnAct(md(chs[idx - 2]), 1, name=f"top_down_reduce{idx}", **common)(
                    y, train
                )
            inner.insert(0, y)

        # bottom-up (ref yolov5_pafpn.py:193-200)
        outs = [inner[0]]
        for idx in range(n - 1):
            down = ConvBnAct(md(chs[idx]), 3, 2, name=f"downsample{idx}", **common)(
                outs[-1], train
            )
            cat = jnp.concatenate([down, inner[idx + 1]], axis=-1)
            outs.append(csp(md(chs[idx + 1]), name=f"bottom_up_csp{idx}")(cat, train))

        return tuple(outs)


def _head_bias_init(num_anchors: int, per_anchor: int, prior_add: float, fan_in: int):
    """torch default bias init + per-anchor prior offset (ref heads/yolov5.py:66,114)."""

    def init(key, shape, dtype=jnp.float32):
        base = torch_bias_init(key, shape, dtype, fan_in)
        return base + prior_add

    return init


class Yolov5Head(nn.Module):
    """Three sibling 1x1 convs: box(4A), obj(A), cls(nc*A) (ref heads/yolov5.py:139-178).

    Output reshaped (B, H, W, A, p). Bias init:
      cls += log(0.6/(nc-0.99999))   (yv5 init, ref heads/yolov5.py:66)
      obj += log(8/(640/stride)^2)   (ref heads/yolov5.py:114)
      alt RetinaNet-style: -log((1-p)/p) when use_yv5_init=False
    """

    num_anchors_per_cell: int
    num_classes: int
    stride: int
    prior_probability: float = 0.01
    use_yv5_init: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> DetectionHeadResult:
        A, nc = self.num_anchors_per_cell, self.num_classes
        fan_in = x.shape[-1]
        retina = -math.log((1 - self.prior_probability) / self.prior_probability)
        cls_add = (
            math.log(0.6 / (nc - 0.99999)) if self.use_yv5_init else retina
        )
        obj_add = (
            math.log(8.0 / (640.0 / self.stride) ** 2)
            if self.use_yv5_init
            else retina
        )

        # Three logical 1x1 convs (separate params, matching the reference's
        # sibling box/obj/cls heads) executed as ONE conv on concatenated
        # kernels — identical math, one lane-padded output tensor instead of
        # three (TPU pads the channel dim to 128 lanes).
        def head_params(feats, bias_add, name):
            k = self.param(
                f"{name}_kernel",
                conv_kernel_init,
                (1, 1, fan_in, feats),
                jnp.float32,
            )
            b = self.param(
                f"{name}_bias",
                _head_bias_init(A, feats // A, bias_add, fan_in),
                (feats,),
                jnp.float32,
            )
            return k, b

        kb, bb = head_params(A * 4, 0.0, "box")
        ko, bo = head_params(A * 1, obj_add, "obj")
        kc, bc = head_params(A * nc, cls_add, "cls")
        kernel = jnp.concatenate([kb, ko, kc], axis=-1)
        bias = jnp.concatenate([bb, bo, bc])
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
            x = x.astype(self.dtype)
        raw = (
            jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bias
        )
        return DetectionHeadResult(raw=raw, num_anchors=A, num_classes=nc)


class Yolov5Network(nn.Module):
    """Full detector (ref kod/nn/networks/yolov5.py:40-108).

    Size variants via deepen/widen factors:
      n: 0.33/0.25, s: 0.33/0.50 (ref configs/experiment/yv5{n,s}.yaml),
      m: 0.67/0.75, l: 1.0/1.0 (upstream YOLOv5 convention).
    """

    num_classes: int
    num_anchors_per_cell: int = 3
    widen_factor: float = 1.0
    deepen_factor: float = 1.0
    stem_space_to_depth: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None  # bf16 recommended on TPU

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Yolov5NetworkResult:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        backbone = Yolov5Backbone(
            stages=P5_STAGES,
            deepen_factor=self.deepen_factor,
            widen_factor=self.widen_factor,
            stem_space_to_depth=self.stem_space_to_depth,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="backbone",
        )
        # stage1 output discarded (ref networks/yolov5.py:90-93)
        _, c3, c4, c5 = backbone(x, train)

        neck = Yolov5PAFPN(
            in_channels_list=(
                P5_STAGES[1].out_channels,
                P5_STAGES[2].out_channels,
                P5_STAGES[3].out_channels,
            ),
            deepen_factor=self.deepen_factor,
            widen_factor=self.widen_factor,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="neck",
        )
        p3, p4, p5 = neck([c3, c4, c5], train)

        head = partial(
            Yolov5Head,
            num_anchors_per_cell=self.num_anchors_per_cell,
            num_classes=self.num_classes,
            dtype=self.dtype,
        )
        return Yolov5NetworkResult(
            ll=head(stride=8, name="ll_head")(p3),
            ml=head(stride=16, name="ml_head")(p4),
            hl=head(stride=32, name="hl_head")(p5),
        )


SIZE_VARIANTS = {
    "n": dict(deepen_factor=0.33, widen_factor=0.25),
    "s": dict(deepen_factor=0.33, widen_factor=0.50),
    "m": dict(deepen_factor=0.67, widen_factor=0.75),
    "l": dict(deepen_factor=1.0, widen_factor=1.0),
}


def build_network(
    num_classes: int,
    size: str = "s",
    num_anchors_per_cell: int = 3,
    axis_name: Optional[str] = None,
    dtype: Optional[jnp.dtype] = None,
    stem_space_to_depth: bool = False,
) -> Yolov5Network:
    return Yolov5Network(
        num_classes=num_classes,
        num_anchors_per_cell=num_anchors_per_cell,
        axis_name=axis_name,
        dtype=dtype,
        stem_space_to_depth=stem_space_to_depth,
        **SIZE_VARIANTS[size],
    )
