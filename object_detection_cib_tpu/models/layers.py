"""Building-block layers: ConvBnAct, CSP blocks, SPPF. flax.linen, NHWC.

Capability parity (hyperparameters, graph topology, init distributions):
  * ConvBnAct     — torchvision Conv2dNormActivation as used across kod/nn/
                    (conv bias=False + BN(eps=1e-3, momentum=0.03) + SiLU)
  * CSPBlock/CSPLayer — kod/nn/layers/csp.py:16-111 (inner expand fixed 1.0)
  * SPPFBottleneck    — kod/nn/layers/sppf.py (0.5x reduce, 3 chained 5x5
                    maxpools, concat(4), 1x1 out; list-of-kernels SPP variant)

TPU-first notes: NHWC layout throughout (XLA's preferred conv layout),
BatchNorm given an optional ``axis_name`` so cross-replica stats (the
sync_batchnorm analog) come from a mesh axis when training under shard_map;
under plain pjit over a sharded batch, XLA's global reductions already give
synced statistics.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == uniform with
# bound sqrt(1/fan_in) == variance_scaling(1/3, fan_in, uniform).
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# Measurement-only knob (ROOFLINE.md byte-lever table): when False, BN batch
# statistics accumulate in the compute dtype (bf16) instead of f32.
# Production default stays True — torch BN parity computes stats in f32.
# Flipped only by tools/measure_bn_stats_dtype.py to measure the
# "bf16 batch-stat accumulation" lever's img/s delta on hardware.
BN_FORCE_F32_STATS = True


def torch_bias_init(key, shape, dtype, fan_in: int):
    """torch Conv2d default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    import jax

    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TaggedBatchNorm(nn.BatchNorm):
    """nn.BatchNorm with the batch statistics tagged for remat policies.

    Identical math and variable tree to flax's BatchNorm (this overrides
    ``__call__`` with the upstream body plus two ``checkpoint_name`` no-op
    tags on the freshly computed mean/var). Purpose: the "conv_out" remat
    policy recomputes the BN statistics in the backward pass — an extra
    full read of every conv output — which is exactly why it measured
    negative at 640px (ROOFLINE.md). Policy "conv_out_bn_stats"
    additionally saves these tiny per-channel stats, keeping the backward
    recompute to the cheap normalize+SiLU elementwise chain.
    """

    @nn.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        from flax.linen import normalization as fnorm

        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average,
        )
        feature_axes = fnorm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes
        )
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stats_dtype = (
            jnp.float32 if self.force_float32_reductions else self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, stats_dtype), feature_shape,
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, stats_dtype), feature_shape,
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            mean, var = fnorm._compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=(
                    self.axis_name if not self.is_initializing() else None
                ),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions,
            )
            # no-op tags; saved by remat_policy="conv_out_bn_stats"
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")

            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )

        return fnorm._normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )


class ConvBnAct(nn.Module):
    """Conv (no bias) + BatchNorm + SiLU — Conv2dNormActivation equivalent."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None  # None -> (k-1)//2, torchvision default
    bn_eps: float = 1e-3  # ref networks/yolov5.py:24
    bn_momentum: float = 0.03  # torch convention; flax decay = 1 - this
    axis_name: Optional[str] = None  # cross-replica BN stats axis
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 for MXU)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        pad = (k - 1) // 2 if self.padding is None else self.padding
        x = nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        # no-op tag; under train-step remat_policy="conv_out" only these
        # conv outputs are saved for backward — BN normalize + SiLU are
        # recomputed fused into the backward kernels (HBM-traffic trade)
        x = checkpoint_name(x, "conv_out")
        x = TaggedBatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.bn_momentum,
            epsilon=self.bn_eps,
            axis_name=self.axis_name,
            dtype=self.dtype,
            force_float32_reductions=BN_FORCE_F32_STATS,
            name="bn",
        )(x)
        return nn.silu(x)


class SpaceToDepthStem(nn.Module):
    """The YOLOv5 stem (6x6 stride-2 pad-2 conv) re-expressed exactly as a
    3x3 stride-1 conv on 2x2 space-to-depth input — a mathematically
    identical function of the SAME (6,6,3,C) parameter.

    Why: a 3-input-channel conv leaves the 128-lane MXU almost idle and its
    weight-gradient at 640x640 was the single most expensive op in the
    profiled train step. With 12 input channels on a 4x smaller spatial
    extent the same FLOPs map far better onto the hardware.

    Derivation: y[p,q] = sum_{u,v} W[u,v] x[2p+u-2, 2q+v-2]; write
    u = 2a_y + b_y + 2 (a in {-1,0,1}, b in {0,1}) and define
    z[P,Q, b_y*6 + b_x*3 + c] = x[2P+b_y, 2Q+b_x, c]; then y is the 3x3
    pad-1 conv of z with W'[a_y+1, a_x+1, (b_y,b_x,c)] = W[2a_y+b_y+2, ...].

    Parameter tree matches ConvBnAct's stem exactly
    (stem/conv/kernel (6,6,3,C) + stem/bn/...), so checkpoints are
    interchangeable with the direct-conv stem.
    """

    features: int
    bn_eps: float = 1e-3
    bn_momentum: float = 0.03
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    class _Conv(nn.Module):
        features: int
        dtype: Optional[jnp.dtype] = None

        @nn.compact
        def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
            C = self.features
            kernel = self.param(
                "kernel", conv_kernel_init, (6, 6, 3, C), jnp.float32
            )
            # W' rearrangement: (u,v,c,C) -> (3,2,3,2,3,C) -> (i,j,by,bx,c,C)
            kp = kernel.reshape(3, 2, 3, 2, 3, C).transpose(0, 2, 1, 3, 4, 5)
            kp = kp.reshape(3, 3, 12, C)
            b, h, w, _ = x.shape
            z = x.reshape(b, h // 2, 2, w // 2, 2, 3)
            z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12)
            # match flax nn.Conv semantics: dtype=None promotes operands
            # to a common dtype (so a bf16 feed into an f32 net computes
            # in f32 instead of raising a conv dtype TypeError)
            z, kp = nn.dtypes.promote_dtype(z, kp, dtype=self.dtype)
            return jax.lax.conv_general_dilated(
                z,
                kp,
                window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self._Conv(self.features, dtype=self.dtype, name="conv")(x)
        x = checkpoint_name(x, "conv_out")
        x = TaggedBatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.bn_momentum,
            epsilon=self.bn_eps,
            axis_name=self.axis_name,
            dtype=self.dtype,
            force_float32_reductions=BN_FORCE_F32_STATS,
            name="bn",
        )(x)
        return nn.silu(x)


class CSPBlock(nn.Module):
    """1x1 -> 3x3 with optional residual (ref csp.py:16-58)."""

    features: int
    expand_ratio: float = 0.5
    add_identity: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expand_ratio)
        out = ConvBnAct(
            hidden, 1, axis_name=self.axis_name, dtype=self.dtype, name="conv1"
        )(x, train)
        out = ConvBnAct(
            self.features, 3, axis_name=self.axis_name, dtype=self.dtype, name="conv2"
        )(out, train)
        if self.add_identity and x.shape[-1] == self.features:
            return out + x
        return out


class CSPLayer(nn.Module):
    """Cross-stage-partial layer (ref csp.py:66-111).

    short/main 1x1 branches, N CSPBlocks (inner expand_ratio fixed to 1.0,
    ref csp.py:95) on main, concat, 1x1 out.
    """

    features: int
    num_blocks: int = 1
    expand_ratio: float = 0.5
    add_identity: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = int(self.features * self.expand_ratio)
        cba = lambda f, k, name: ConvBnAct(
            f, k, axis_name=self.axis_name, dtype=self.dtype, name=name
        )
        x_short = cba(mid, 1, "short_conv")(x, train)
        x_main = cba(mid, 1, "main_conv")(x, train)
        for i in range(self.num_blocks):
            x_main = CSPBlock(
                mid,
                expand_ratio=1.0,
                add_identity=self.add_identity,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"block{i}",
            )(x_main, train)
        x_cat = jnp.concatenate([x_main, x_short], axis=-1)
        return cba(self.features, 1, "last_conv")(x_cat, train)


def _maxpool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """stride-1 maxpool with 'same' padding k//2 (torch MaxPool2d parity).

    Implemented as a max over k*k shifted views instead of reduce_window:
    the reduce_window gradient (select_and_scatter) produces incorrect
    results under GSPMD spatial sharding (verified empirically), while the
    elementwise-max chain gradient shards cleanly. SPPF runs on the tiniest
    feature map, so the extra reads are negligible.
    """
    pad = k // 2
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else -(2**30)
    xp = jnp.pad(
        x,
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
        constant_values=neg,
    )
    h, w = x.shape[1], x.shape[2]
    out = None
    for dy in range(k):
        for dx in range(k):
            v = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (xp.shape[0], dy + h, dx + w, xp.shape[3]),
            )
            out = v if out is None else jnp.maximum(out, v)
    return out


class SPPFBottleneck(nn.Module):
    """Spatial pyramid pooling - fast (ref sppf.py:14-85).

    int kernel_sizes -> SPPF: 3 chained k-pools, concat(x,y1,y2,y3);
    sequence -> SPP: parallel pools, concat(x, pools...).
    """

    features: int
    kernel_sizes: Union[int, Sequence[int]] = 5
    use_conv_first: bool = True
    mid_channels_scale: float = 0.5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.use_conv_first:
            mid = int(x.shape[-1] * self.mid_channels_scale)
            x = ConvBnAct(
                mid, 1, axis_name=self.axis_name, dtype=self.dtype, name="conv1"
            )(x, train)
        if isinstance(self.kernel_sizes, int):
            k = self.kernel_sizes
            y1 = _maxpool_same(x, k)
            y2 = _maxpool_same(y1, k)
            y3 = _maxpool_same(y2, k)
            x = jnp.concatenate([x, y1, y2, y3], axis=-1)
        else:
            pools = [_maxpool_same(x, k) for k in self.kernel_sizes]
            x = jnp.concatenate([x] + pools, axis=-1)
        return ConvBnAct(
            self.features, 1, axis_name=self.axis_name, dtype=self.dtype, name="conv2"
        )(x, train)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2, mode='nearest') parity, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
