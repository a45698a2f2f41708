"""Production input pipeline: native C++ decode -> on-device augmentation.

This is the TPU hot path (BASELINE.json north star): the host stage is one
native call per batch (JPEG decode + bilinear resize + pack, std::thread,
GIL-free — native/loader.cpp), and mosaic/affine/HSV/flip/mixup run under
jit on device (ops/augment.py), overlapping with training via a prefetch
thread. The host-side numpy pipeline (data/pipeline.py) remains the parity
path; both implement the same semantics as the reference's cv2 stack
(kod/data/mosaic.py, kod/data/augmentations/default.py).

Pipeline per train batch of size B (mosaic needs 4 source images per
sample, mixup a further 4 — ref detection.py:112-145):
  1. sampler draws B primary indices; 3B co-samples from
     `sampler_indices` weighted by `image_repeat_factors`
  2. native pack: (4B, S, S, 3) uint8 canvases + content sizes
  3. device (one jit): mosaic -> affine(border=-S/2) -> HSV -> flip
     [-> second mosaic + mixup] -> normalized Batch
"""

from __future__ import annotations

import queue
import random as pyrandom
import threading
from collections import deque as _deque
from functools import partial
from pathlib import Path
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_cib_tpu.data import native_loader
from object_detection_cib_tpu.data.cache import DatasetInfo
from object_detection_cib_tpu.data.host_augment import AugParams
from object_detection_cib_tpu.ops.augment import (
    DeviceSample,
    affine_batch,
    flip_batch,
    flip_boxes,
    hsv_batch,
    hsv_gains,
    mixup_batch,
    mosaic4_batch,
    mosaic_affine_batch,
    sample_affine_values_batch,
)
from object_detection_cib_tpu.ops import pallas_warp
from object_detection_cib_tpu.train.steps import Batch
from object_detection_cib_tpu.utils.fs import get_root_dir


def device_put_row_major(a):
    """device_put pinned to the row-major (descending major-to-minor) layout.

    On the remote TPU platform a plain `jax.device_put` of the planar u8
    corpus lands in a batch-minor layout ({0,3,2,1}); every consumer
    program then relayouts the WHOLE corpus to {3,2,1,0} before the row
    gather — a measured 14.2 ms / 5.2 GB copy at the 5k@416 corpus
    (runs/r4/planar_augment.log %copy.177). Pinning the layout at
    placement time makes the committed layout the compiled parameter
    layout, so there is nothing to copy."""
    a = np.asarray(a)
    # The explicit Format commits the array to device 0 — only legal on a
    # single-device (TPU) backend. On a multi-device mesh the fused scan
    # constrains the batch over the mesh, and a committed single-device
    # operand is an error; leave the array uncommitted there and let
    # GSPMD place it (the row-major trick only pays on the single-chip
    # Pallas-gather path anyway).
    if jax.device_count() == 1 and jax.devices()[0].platform == "tpu":
        try:
            from jax.experimental.layout import Format, Layout

            # jax 0.9 requires a concrete sharding alongside a Layout
            fmt = Format(
                Layout(major_to_minor=tuple(range(a.ndim))),
                jax.sharding.SingleDeviceSharding(jax.devices()[0]),
            )
            out = jax.device_put(a, fmt)
            # the remote platform can silently ignore device_put layouts
            # (see bench.py) — verify it landed, else fall through
            if out.format.layout.major_to_minor == tuple(range(a.ndim)):
                return out
        except Exception:
            pass
    return jax.device_put(a)


def _make_row_gather(corpus_shape, planar: bool = False):
    """Corpus row gather: (prep, gather) pair.

    prep transforms the host corpus array before device_put; gather(ds, idx)
    -> gathered rows. On TPU the gather is a Pallas DMA kernel (XLA's
    mini-gather scans/re-lays-out the whole corpus per call — ~20 ms at 5k
    images; the kernel DMAs only the requested rows, 0.81 ms measured).

    planar=False (legacy "flat" layout): the corpus is pre-flattened to a
    tile-aligned (N, 8, D/8) byte stream and the gathered block is reshaped
    back to NHWC image form. That reshape is a real relayout (the NHWC
    C=3-minor tiled layout differs from the packed stream) — fenced with
    optimization_barrier so it stays standalone instead of fusing into a
    serialized mega-transpose (measured 50 ms when fused with the mosaic
    group split), but still a measured 4.7 ms/128-batch copy chain @416.

    planar=True: the corpus is stored channel-first (N, 3, S, S) and the
    kernel gathers whole (S, S) planes in the array's native tiled layout —
    the exact operand form the separable-warp matmuls consume, so nothing
    downstream relayouts (ROOFLINE.md relayout-chain lever)."""
    from object_detection_cib_tpu.ops import pallas_gather

    row_shape = tuple(corpus_shape[1:])
    # explicit tpu check: a GPU backend must take the plain-gather fallback,
    # not the pltpu PrefetchScalarGridSpec path (which only traces on TPU).
    # Multi-process SPMD also takes the plain gather: GSPMD knows how to
    # partition a gather-by-indices along the sharded index dim, but a
    # pallas_call is an opaque custom call it cannot partition.
    on_tpu = (
        jax.devices()[0].platform == "tpu" and jax.process_count() == 1
    )
    if planar:

        def prep_p(c):  # (N, S, S, 3) uint8 -> (N, 3, S, S)
            return np.ascontiguousarray(np.transpose(c, (0, 3, 1, 2)))

        if on_tpu:
            return prep_p, pallas_gather.gather_rows_planar
        return prep_p, (lambda ds, idx: ds[idx])
    if on_tpu and pallas_gather.supports(corpus_shape):

        def prep(c):
            return np.ascontiguousarray(c).reshape(c.shape[0], 8, -1)

        def gather(ds, idx):
            out = pallas_gather.gather_rows_flat(ds, idx)
            out = jax.lax.optimization_barrier(out)
            img = out.reshape((idx.shape[0],) + row_shape)
            return jax.lax.optimization_barrier(img)

        return prep, gather
    return (lambda c: c), (lambda ds, idx: ds[idx])


def make_sharded_corpus_gather(mesh, axis: str = "data"):
    """Gather-by-global-index from a corpus SHARDED along its row axis.

    The HBM-resident fused-epoch corpus replicates per device by default,
    which caps it at one device's HBM (STATUS r4 limitation 5). Sharding
    rows over the `data` mesh axis removes that ceiling; the price is an
    exchange, because an epoch plan draws ARBITRARY global rows for every
    batch shard (the plan must stay global so sharded and replicated
    placements train bitwise-identically).

    SPMD formulation (shard_map; GSPMD cannot partition a gather along the
    operand's sharded dim without all-gathering the operand):
      * every device receives the full (replicated, tiny) index vector,
        masks the indices it owns (exactly one owner per index), and
        gathers those rows locally — absent rows contribute zeros;
      * one tiled psum_scatter over `axis` then both sums the one-hot
        contributions and deals each device exactly its batch shard. The
        exchange moves one batch per step over ICI — the same bytes a
        host feed would move over PCIe, but device-to-device.

    Returns gather(ds, idx): ds (N, ...) sharded P(axis) on dim 0 with N
    divisible by the axis size, idx (B,) global row ids with B divisible
    by the axis size -> (B, ...) sharded P(axis) on dim 0. Bool leaves are
    exchanged as uint8 (collectives have no pred lowering) and restored.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax spelling
        from jax.experimental.shard_map import shard_map

    n = int(mesh.shape[axis])

    def gather(ds, idx):
        N = ds.shape[0]
        assert N % n == 0, (N, n)
        assert idx.shape[0] % n == 0, (
            f"group size {idx.shape[0]} must divide over the data axis "
            f"({n}) for the sharded-corpus exchange"
        )
        shard_len = N // n
        is_bool = ds.dtype == jnp.bool_

        def local(ds_sh, idx_rep):
            r = jax.lax.axis_index(axis)
            loc = idx_rep.astype(jnp.int32) - r * shard_len
            own = (loc >= 0) & (loc < shard_len)
            part = ds_sh[jnp.clip(loc, 0, shard_len - 1)]
            if is_bool:
                part = part.astype(jnp.uint8)
            part = jnp.where(
                own.reshape((-1,) + (1,) * (part.ndim - 1)),
                part,
                jnp.zeros((), part.dtype),
            )
            return jax.lax.psum_scatter(
                part, axis, scatter_dimension=0, tiled=True
            )

        out = shard_map(
            local, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis),
        )(ds, idx)
        return out != 0 if is_bool else out

    return gather


def build_device_augment_fn(
    target_size: int,
    aug: AugParams,
    mixup_prob: float = 0.0,
    max_targets: int = 120,
    use_mosaic: bool = True,
    warp_precision: str = "exact",
    planar: bool = False,
    hsv_pallas: bool = False,
    warp_pallas: bool = False,
    feed_dtype=jnp.bfloat16,
):
    """One jitted function: (DeviceSample 4B[, 4B]) + key -> train Batch.

    use_mosaic=False (the no_mosaic recipe, ref detection.py:74-76) skips
    the 4-way mosaic: each source image is center-letterboxed to S (host
    SampleReader letterbox parity) and the affine runs with border (0, 0).

    planar=True: sample images arrive channel-first (B, 3, S, S) — the
    HBM-corpus gather's native block form — and flow planar through the
    fused mosaic-warp + HSV, transposed to NHWC only in the final
    normalize. Requires the fused path (mosaic + axis-aligned warp);
    bit-identical results (tests/test_planar_corpus.py).
    """
    ap = aug.affine_params
    border = (-target_size // 2, -target_size // 2) if use_mosaic else (0, 0)
    # production recipe (ref default.py:31-35): no rotation/shear/perspective
    # -> the warp is separable and runs on the MXU (ops/augment.py)
    axis_aligned = (
        ap.degrees == 0.0 and ap.shear == 0.0 and ap.perspective == 0.0
    )
    assert not planar or (use_mosaic and axis_aligned), (
        "planar corpus layout requires the fused mosaic + axis-aligned path"
    )

    def letterbox_center(sample: DeviceSample) -> DeviceSample:
        # native loader packs content top-left; host letterbox centers it
        top = (target_size - sample.sizes[:, 0]) // 2
        left = (target_size - sample.sizes[:, 1]) // 2
        images = jax.vmap(lambda im, t, l: jnp.roll(im, (t, l), (0, 1)))(
            sample.images, top, left
        )
        shift = jnp.stack([left, top, left, top], -1).astype(jnp.float32)
        return sample._replace(
            images=images,
            boxes=sample.boxes + shift[:, None, :],
            sizes=jnp.full_like(sample.sizes, target_size),
        )

    def augment_group(sample: DeviceSample, key) -> DeviceSample:
        k_m, k_a, k_h, k_f = jax.random.split(key, 4)
        if use_mosaic and axis_aligned:
            # fused canvas-free mosaic+warp (+folded flip): same RNG stream
            # and same results as the composed path below (equivalence-
            # tested); ~27 ms/128-batch less canvas HBM traffic @416
            hp = aug.hsv_params
            values = sample_affine_values_batch(
                k_a,
                sample.images.shape[0] // 4,
                degrees=ap.degrees,
                translate=ap.translate,
                scale=ap.scale,
                shear=ap.shear,
                perspective=ap.perspective,
            )
            do = None
            if aug.flip_lr_prob > 0:
                do = (
                    jax.random.uniform(k_f, (sample.images.shape[0] // 4,))
                    < aug.flip_lr_prob
                )
            s = mosaic_affine_batch(
                sample, k_m, values, target_size, flip_do=do,
                precision=warp_precision, planar=planar,
                # integer-valued output -> bf16 boundary is lossless and
                # halves the warp->HSV->normalize inter-stage HBM traffic
                out_dtype=jnp.bfloat16,
                warp_pallas=warp_pallas,
            )
            if hp.should_aug():
                if planar and hsv_pallas:
                    # one Pallas kernel for the whole HSV block: kills the
                    # per-plane orientation-flip copies XLA inserts between
                    # its HSV fusions (~2.4 ms/step measured, see
                    # ops/pallas_hsv.py). Same RNG draw, bit-identical.
                    from object_detection_cib_tpu.ops import pallas_hsv

                    r = hsv_gains(
                        k_h, s.images.shape[0], hp.hue, hp.saturation,
                        hp.value,
                    )
                    s = s._replace(images=pallas_hsv.hsv_planar(s.images, r))
                else:
                    s = s._replace(
                        images=hsv_batch(
                            s.images, k_h, hp.hue, hp.saturation, hp.value,
                            channel_axis=1 if planar else -1,
                        )
                    )
            if do is not None:
                s = s._replace(boxes=flip_boxes(s.boxes, do, target_size))
            return s
        # mosaic placement + letterbox roll are exact in uint8 and 4x
        # cheaper on HBM; the f32 cast fuses into the warp's matmul read
        s = mosaic4_batch(sample, k_m, target_size) if use_mosaic else (
            letterbox_center(sample)
        )
        if s.images.dtype != jnp.float32:
            s = s._replace(images=s.images.astype(jnp.float32))
        values = sample_affine_values_batch(
            k_a,
            s.images.shape[0],
            degrees=ap.degrees,
            translate=ap.translate,
            scale=ap.scale,
            shear=ap.shear,
            perspective=ap.perspective,
        )
        s = affine_batch(
            s, values, target_size, border=border, axis_aligned=axis_aligned
        )
        hp = aug.hsv_params
        if hp.should_aug():
            s = s._replace(
                images=hsv_batch(s.images, k_h, hp.hue, hp.saturation, hp.value)
            )
        if aug.flip_lr_prob > 0:
            s = flip_batch(s, k_f, aug.flip_lr_prob)
        return s

    def to_batch(s: DeviceSample):
        """-> (Batch, int32 count of valid targets dropped by capacity)."""
        T = s.boxes.shape[1]
        if T > max_targets:
            # keep valid slots first, then truncate to capacity
            order = jnp.argsort(~s.mask, axis=1, stable=True)[:, :max_targets]
            boxes = jnp.take_along_axis(s.boxes, order[..., None], axis=1)
            labels = jnp.take_along_axis(s.labels, order, axis=1)
            mask = jnp.take_along_axis(s.mask, order, axis=1)
            overflow = s.mask.sum() - mask.sum()
        else:
            pad = max_targets - T
            boxes = jnp.pad(s.boxes, ((0, 0), (0, pad), (0, 0)))
            labels = jnp.pad(s.labels, ((0, 0), (0, pad)))
            mask = jnp.pad(s.mask, ((0, 0), (0, pad)))
            overflow = jnp.zeros((), jnp.int32)
        images = s.images
        if planar:  # back to NHWC for the network; fuses with the normalize
            images = jnp.transpose(images, (0, 2, 3, 1))
        batch = Batch(
            # feed dtype follows the net dtype (trainer wires bf16 for bf16
            # nets — halves the feed traffic and avoids an on-device
            # convert+relayout; f32 nets get a full-precision feed). The
            # divide runs in f32 regardless of the incoming stage dtype
            # (f32, or the fused path's integer-valued bf16) so the result
            # is bitwise identical across boundary dtypes.
            images=(images.astype(jnp.float32) / 255.0).astype(feed_dtype),
            boxes=boxes,
            labels=jnp.where(mask, labels, 0),
            mask=mask,
        )
        return batch, overflow.astype(jnp.int32)

    if mixup_prob > 0.0:
        assert use_mosaic, "Mixup requires mosaic (ref detection.py:58-59)"

        @jax.jit
        def fn(primary: DeviceSample, secondary: DeviceSample, key):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            a = augment_group(primary, k1)
            b = augment_group(secondary, k2)
            mixed = mixup_batch(a, b, k3)
            do = jax.random.uniform(k4, (a.images.shape[0],)) < mixup_prob
            T = a.boxes.shape[1]
            images = jnp.where(do[:, None, None, None], mixed.images, a.images)
            boxes = jnp.where(
                do[:, None, None], mixed.boxes, jnp.pad(a.boxes, ((0, 0), (0, T), (0, 0)))
            )
            labels = jnp.where(do[:, None], mixed.labels, jnp.pad(a.labels, ((0, 0), (0, T))))
            mask = jnp.where(do[:, None], mixed.mask, jnp.pad(a.mask, ((0, 0), (0, T))))
            return to_batch(DeviceSample(images, a.sizes, boxes, labels, mask))

        return fn

    @jax.jit
    def fn(primary: DeviceSample, key):
        return to_batch(augment_group(primary, key))

    return fn


class DeviceDataPipeline:
    """Prefetching train-batch producer over the native+device path."""

    def __init__(
        self,
        dataset_info: DatasetInfo,
        target_size: int,
        batch_size: int,
        aug_params: AugParams,
        max_targets: int = 120,
        mixup_prob: float = 0.0,
        use_mosaic: bool = True,
        warp_precision: str = "fast",
        warp_pallas="auto",
        sampler=None,
        seed: int = 0,
        root_dir: Optional[Path] = None,
        fake_mode: bool = False,
        prefetch: int = 2,
        device_put_fn=None,
        enable_ram_cache: bool = False,
        device_cache: bool = False,
        fused_global_mesh=None,
        corpus_layout: str = "planar",
        feed_dtype=jnp.bfloat16,
        corpus_sharding: str = "replicated",
        corpus_mesh=None,
    ):
        assert native_loader.available(), "native loader not built"
        self.info = dataset_info
        self.S = target_size
        self.B = batch_size
        self.max_targets = max_targets
        self.mixup_prob = mixup_prob
        self.use_mosaic = use_mosaic
        self.sampler = sampler
        self.root_dir = Path(root_dir) if root_dir else get_root_dir()
        self.fake_mode = fake_mode
        self.prefetch = prefetch
        self.device_put_fn = device_put_fn
        self.key = jax.random.PRNGKey(seed)
        self.pyrng = pyrandom.Random(seed)
        self.label_to_index = {c: i for i, c in enumerate(dataset_info.classes)}
        # planar HBM corpus (channel-first planes, see _make_row_gather):
        # only meaningful in device_cache mode on the fused mosaic+axis-
        # aligned path; anything else quietly uses the NHWC flow (the host
        # stage ships NHWC canvases)
        ap = aug_params.affine_params
        self.planar = (
            corpus_layout == "planar"
            and device_cache
            and use_mosaic
            and ap.degrees == 0.0
            and ap.shear == 0.0
            and ap.perspective == 0.0
        )
        # Pallas HSV kernel: same gating as the Pallas corpus gather —
        # single-process TPU only (opaque to GSPMD), planar path only
        self.hsv_pallas = (
            self.planar
            and jax.devices()[0].platform == "tpu"
            and jax.process_count() == 1
        )
        # Pallas fused-warp kernel (ops/pallas_warp.py): replaces the dense
        # separable-tap einsums in the fast-precision planar path; same
        # single-process TPU gating + the kernel's own shape/VMEM limits.
        # warp_pallas: "auto" (on when supported) | True | False — False
        # pins the einsum path (e.g. to reproduce runs recorded before the
        # kernel existed implementation-for-implementation).
        self.warp_pallas = (
            self.hsv_pallas
            and warp_precision == "fast"
            and str(warp_pallas).lower() != "false"
            and pallas_warp.supports(
                (batch_size, 3, target_size, target_size), True, warp_precision
            )
        )
        # HBM corpus placement: replicated (default; capped at one
        # device's HBM) | sharded (rows dealt over the mesh's data axis,
        # gathered by global index with a psum_scatter exchange — same
        # training stream bitwise, no per-device replication ceiling)
        self.corpus_mesh = corpus_mesh if corpus_mesh is not None else (
            fused_global_mesh
        )
        self.corpus_sharded = (
            corpus_sharding == "sharded"
            and device_cache
            and self.corpus_mesh is not None
            and int(self.corpus_mesh.shape.get("data", 1)) > 1
        )
        if corpus_sharding == "sharded" and device_cache and not self.corpus_sharded:
            import warnings

            warnings.warn(
                "corpus_sharding=sharded needs a mesh with data-axis > 1; "
                "falling back to replicated placement"
            )
        if self.corpus_sharded:
            # Pallas kernels are opaque to GSPMD; the sharded path uses
            # the shard_map masked gather + partitionable XLA augment ops
            self.hsv_pallas = False
            self.warp_pallas = False
        self.feed_dtype = feed_dtype
        self.augment_fn = build_device_augment_fn(
            target_size, aug_params, mixup_prob, max_targets, use_mosaic,
            warp_precision=warp_precision, planar=self.planar,
            hsv_pallas=self.hsv_pallas, warp_pallas=self.warp_pallas,
            feed_dtype=feed_dtype,
        )
        self.image_repeat_factors = getattr(sampler, "image_repeat_factors", None)
        # capacity-overflow accounting: device scalars accumulated async per
        # batch, fetched in one stacked transfer when overflow_total is read
        self._overflow_done = 0
        self._overflow_pending: list = []
        # sampler-debug support: every epoch plan actually drawn is queued
        # here (FIFO — the dispatch-ahead fused loop draws epoch k+1's plan
        # before epoch k's stats dump), so the trainer can count instances
        # for the exact epoch it trained without re-drawing the sampler
        # (ref counts batch labels, kod/lightning/callbacks/sampler_debug.py:45-61)
        self.consumed_plan_log: "_deque" = _deque(maxlen=8)
        # per-source-image target capacity before mosaic merge
        self.src_T = max(
            max((len(s.targets) for s in dataset_info.samples), default=1), 1
        )
        # decoded-canvas RAM cache (ref enable_ram_cache, detection.py:66-76):
        # one decode per image total instead of per epoch
        self.enable_ram_cache = enable_ram_cache
        self._canvas_cache: dict = {}
        # HBM-resident dataset: decode everything once, keep (N, S, S, 3)
        # uint8 on device, and gather mosaic groups on device — per-step
        # host->device traffic drops to indices+targets. The natural mode
        # when the resized corpus fits in HBM (e.g. coco-zipf @416 ≈ 3GB).
        self.device_cache = device_cache
        # multi-host fused-epoch mode: the HBM corpus is placed as a GLOBAL
        # replicated array over `fused_global_mesh` and epoch_host_arrays()
        # returns global per-step index/key arrays, so the whole fused epoch
        # scan runs SPMD across processes (SURVEY §5.8: per-host identical
        # plan under global-mesh SPMD). Single-process runs ignore this.
        self.fused_global_mesh = fused_global_mesh
        self._fused_global = (
            fused_global_mesh is not None and jax.process_count() > 1
        )
        self._ds_images = None
        self._ds_sizes = None
        self._gather_augment = None
        self._gather_augment_raw = None
        if device_cache:
            self._build_device_cache()

    def __len__(self) -> int:
        return len(self.info.samples) // self.B

    @property
    def overflow_total(self) -> int:
        """Total valid targets dropped by max_targets so far (one fetch)."""
        if self._overflow_pending:
            pending, self._overflow_pending = self._overflow_pending, []
            self._overflow_done += int(np.asarray(jnp.stack(pending)).sum())
        return self._overflow_done

    # -------------------- HBM-resident dataset mode --------------------
    def _build_device_cache(self):
        n = len(self.info.samples)
        canvases = np.full((n, self.S, self.S, 3), 114, np.uint8)
        sizes = np.zeros((n, 2), np.int32)
        if self.fake_mode:
            rng = np.random.default_rng(0)
            for i, s in enumerate(self.info.samples):
                meta = s.image_metadata
                scale = self.S / max(meta.height, meta.width)
                h = min(max(int(round(meta.height * scale)), 1), self.S)
                w = min(max(int(round(meta.width * scale)), 1), self.S)
                canvases[i, :h, :w] = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                sizes[i] = (h, w)
        else:
            bufs = [
                (self.root_dir / s.image_path).read_bytes()
                for s in self.info.samples
            ]
            canvases, sizes, fails = native_loader.pack_batch(bufs, self.S)
            if fails:
                raise ValueError(f"{fails} JPEG decode failures in dataset")
        prep, self._gather = _make_row_gather(
            canvases.shape, planar=self.planar
        )
        pad_rows = 0
        if self.corpus_sharded:
            # rows dealt over the data axis; every corpus leaf pads to a
            # multiple of the axis size (pad rows are never indexed — the
            # epoch plan draws ids < n). Each host materializes only the
            # shards it addresses, so host RAM scales down with the mesh
            # too (make_array_from_callback pulls per-shard slices).
            from jax.sharding import NamedSharding, PartitionSpec as P

            nshard = int(self.corpus_mesh.shape["data"])
            pad_rows = -n % nshard
            rows_sh = NamedSharding(self.corpus_mesh, P("data"))

            def dput(a):
                a = np.asarray(a)
                if pad_rows:
                    a = np.concatenate(
                        [a, np.zeros((pad_rows,) + a.shape[1:], a.dtype)]
                    )
                return jax.make_array_from_callback(
                    a.shape, rows_sh, lambda i: a[i]
                )

            self._gather = make_sharded_corpus_gather(self.corpus_mesh)
        elif self._fused_global:
            # global replicated placement: every host decodes the identical
            # full corpus (dataset_info is the same on all hosts), so each
            # host's full copy IS the local shard of a replicated array
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.fused_global_mesh, P())

            def dput(a):
                a = np.asarray(a)
                return jax.make_array_from_callback(
                    a.shape, repl, lambda i: a[i]
                )
        else:
            dput = device_put_row_major
        self._ds_images = dput(prep(canvases))
        self._ds_sizes = dput(sizes)
        # dense per-image target arrays, precomputed once: per-step group
        # assembly becomes one numpy fancy-index instead of a Python loop
        # over indices x targets (measured ~1s/step of host time on a
        # 1-core box at group size 256)
        tb = np.zeros((n, self.src_T, 4), np.float32)
        tl = np.zeros((n, self.src_T), np.int32)
        tm = np.zeros((n, self.src_T), bool)
        for i in range(n):
            tb[i], tl[i], tm[i] = self._targets_arrays(i)
        self._t_boxes, self._t_labels, self._t_mask = tb, tl, tm
        # targets live in HBM too (a few MB): per-step host->device traffic
        # shrinks to the index array + key — the per-image target rows are
        # gathered on device. (The tunnel in this environment moves ~12 MB/s;
        # shipping dense per-group target arrays was ~20 ms/step.)
        self._ds_tb = dput(tb)
        self._ds_tl = dput(tl)
        self._ds_tm = dput(tm)

        core = self.augment_fn  # DeviceSample(-pair) + key -> Batch
        gather = self._gather

        if self.corpus_sharded:
            # every corpus leaf goes through the masked psum_scatter
            # gather — plain ds[idx] on a row-sharded array would make
            # GSPMD all-gather the operand
            def pick(ds_imgs, ds_sizes, ds_tb, ds_tl, ds_tm, idx):
                return DeviceSample(
                    gather(ds_imgs, idx), gather(ds_sizes, idx),
                    gather(ds_tb, idx), gather(ds_tl, idx),
                    gather(ds_tm, idx),
                )
        else:
            def pick(ds_imgs, ds_sizes, ds_tb, ds_tl, ds_tm, idx):
                return DeviceSample(
                    gather(ds_imgs, idx), ds_sizes[idx], ds_tb[idx],
                    ds_tl[idx], ds_tm[idx],
                )

        if self.mixup_prob > 0.0:

            def gather_and_augment(ds_imgs, ds_sizes, ds_tb, ds_tl, ds_tm,
                                   idx, idx2, key):
                p = pick(ds_imgs, ds_sizes, ds_tb, ds_tl, ds_tm, idx)
                s = pick(ds_imgs, ds_sizes, ds_tb, ds_tl, ds_tm, idx2)
                return core(p, s, key)

        else:

            def gather_and_augment(ds_imgs, ds_sizes, ds_tb, ds_tl, ds_tm,
                                   idx, key):
                p = pick(ds_imgs, ds_sizes, ds_tb, ds_tl, ds_tm, idx)
                return core(p, key)

        self._gather_augment_raw = gather_and_augment
        # per-host jitted version for the iterator path; in multi-host fused
        # mode the corpus arrays are global (non-addressable shards exist),
        # so only the fused SPMD program may consume them
        self._gather_augment = (
            None if self._fused_global else jax.jit(gather_and_augment)
        )

    def _group_targets(self, indices):
        idx = np.asarray(indices, np.int64)
        return (
            jnp.asarray(self._t_boxes[idx]),
            jnp.asarray(self._t_labels[idx]),
            jnp.asarray(self._t_mask[idx]),
        )

    # -------------------------- host stage --------------------------
    def _targets_arrays(self, idx):
        """Per-image target arrays in resized-content coordinates.

        Boxes use the UNIFORM scale S/max(h, w) — the host reader's exact
        math (data/reader.py longest_max_size scales bboxes by the single
        factor, albumentations LongestMaxSize semantics), not the per-axis
        rounded content ratios (which deviate by up to half a pixel)."""
        s = self.info.samples[idx]
        boxes = np.zeros((self.src_T, 4), np.float32)
        labels = np.zeros((self.src_T,), np.int32)
        mask = np.zeros((self.src_T,), bool)
        k = 0
        meta = s.image_metadata
        sc = self.S / max(meta.height, meta.width)
        for t in s.targets:
            bb = t.bounding_box
            if bb.x_max <= bb.x_min or bb.y_max <= bb.y_min or k >= self.src_T:
                continue
            boxes[k] = [bb.x_min * sc, bb.y_min * sc, bb.x_max * sc, bb.y_max * sc]
            labels[k] = self.label_to_index[t.class_name]
            mask[k] = True
            k += 1
        return boxes, labels, mask

    def _load_group(self, indices) -> DeviceSample:
        n = len(indices)
        if self.fake_mode:
            canvases = np.full((n, self.S, self.S, 3), 114, np.uint8)
            sizes = np.zeros((n, 2), np.int32)
            rng = np.random.default_rng(abs(hash(tuple(indices))) % (2**31))
            for i, idx in enumerate(indices):
                meta = self.info.samples[idx].image_metadata
                scale = self.S / max(meta.height, meta.width)
                h = min(max(int(round(meta.height * scale)), 1), self.S)
                w = min(max(int(round(meta.width * scale)), 1), self.S)
                canvases[i, :h, :w] = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                sizes[i] = (h, w)
        else:
            missing = [
                i for i in dict.fromkeys(indices) if i not in self._canvas_cache
            ] if self.enable_ram_cache else None
            if self.enable_ram_cache:
                if missing:
                    bufs = [
                        (self.root_dir / self.info.samples[i].image_path).read_bytes()
                        for i in missing
                    ]
                    cv, sz, fails = native_loader.pack_batch(bufs, self.S)
                    if fails:
                        raise ValueError(f"{fails} JPEG decode failures")
                    for j, i in enumerate(missing):
                        self._canvas_cache[i] = (cv[j], sz[j])
                canvases = np.stack([self._canvas_cache[i][0] for i in indices])
                sizes = np.stack([self._canvas_cache[i][1] for i in indices])
            else:
                bufs = [
                    (self.root_dir / self.info.samples[idx].image_path).read_bytes()
                    for idx in indices
                ]
                canvases, sizes, fails = native_loader.pack_batch(bufs, self.S)
                if fails:
                    raise ValueError(f"{fails} JPEG decode failures in batch")

        boxes = np.zeros((n, self.src_T, 4), np.float32)
        labels = np.zeros((n, self.src_T), np.int32)
        mask = np.zeros((n, self.src_T), bool)
        for i, idx in enumerate(indices):
            boxes[i], labels[i], mask[i] = self._targets_arrays(idx)
        # ship uint8: 4x less host->device traffic; cast to f32 on device
        # inside the augment fn
        return DeviceSample(
            jnp.asarray(canvases),
            jnp.asarray(sizes),
            jnp.asarray(boxes),
            jnp.asarray(labels),
            jnp.asarray(mask),
        )

    # -------------------------- epoch iterator --------------------------
    def _epoch_plan(self, B=None, shard_for_host=True):
        """One epoch's sampling, exactly as the `__iter__` producer draws it:
        (per-step group index lists, per-step mixup co-sample lists, per-step
        RNG keys). Advances sampler/pyrng/key state identically, so the
        fused-epoch path and the iterator path produce the same stream.

        B: per-step primary count (default self.B). The multi-host fused
        path draws ONE GLOBAL plan per epoch (B = nproc*self.B,
        shard_for_host=False) — every host draws it identically from the
        identically-seeded sampler/pyrng/key state, so a 2-process run's
        stream equals a single-process run's at the same global batch."""
        B = self.B if B is None else B
        if self.sampler is not None:
            epoch_idx = np.asarray(self.sampler.epoch_indices())
        else:
            epoch_idx = np.random.default_rng(
                self.pyrng.randrange(2**31)
            ).permutation(len(self.info.samples))
        # multi-host: each process feeds its interleaved shard of the global
        # epoch stream (DistributedSampler analog; parallel/distributed.py)
        import jax as _jax

        sharded_host = shard_for_host and _jax.process_count() > 1
        if sharded_host:
            from object_detection_cib_tpu.data.samplers import shard_indices

            epoch_idx = shard_indices(
                epoch_idx, _jax.process_index(), _jax.process_count()
            )
        epoch_idx = np.asarray(epoch_idx, np.int64)
        n_batches = len(epoch_idx) // B
        n_prim = n_batches * B
        # Vectorized sampling: the per-image random.choices + shuffle loop
        # cost ~0.4 s/epoch on a 1-core host (~10 ms/step of the fused-loop
        # budget at 39 steps/epoch). One numpy draw per epoch is the same
        # distribution (with-replacement, weight-proportional) and ~50x
        # cheaper; both the iterator and the fused path share this plan, so
        # their streams stay identical.
        # per-host decorrelation (non-fused multi-host only): every process
        # advances the SAME pyrng/key state (epochs stay in sync), but its
        # derived draw stream is mixed with the process index — otherwise
        # all hosts would apply the identical co-sample sequence and
        # augment randoms to their different primaries (correlated
        # augmentation across the pod). The fused-global path draws one
        # global plan instead (shard_for_host=False), keeping the stream
        # bitwise equal to a single-process run.
        seed = self.pyrng.randrange(2**31)
        rng = np.random.default_rng(
            (seed, _jax.process_index()) if sharded_host else seed
        )
        pool = getattr(self.sampler, "sampler_indices", None)
        pool = np.asarray(
            pool if pool is not None else np.arange(len(self.info.samples)),
            np.int64,
        )
        p = None
        if self.image_repeat_factors is not None:
            p = np.asarray(self.image_repeat_factors, np.float64)
            p = p / p.sum()

        def draw(k):
            if k == 0:
                return np.zeros((0,), np.int64)
            return pool[rng.choice(len(pool), size=k, p=p)]

        if self.use_mosaic:
            # per primary: [primary, co1, co2, co3] shuffled within the quad
            quads = np.concatenate(
                [
                    epoch_idx[:n_prim, None],
                    draw(3 * n_prim).reshape(n_prim, 3),
                ],
                axis=1,
            )
            quads = rng.permuted(quads, axis=1)
            groups = quads.reshape(n_batches, 4 * B)
        else:
            groups = epoch_idx[:n_prim].reshape(n_batches, B)
        if self.mixup_prob > 0.0:
            secs = draw(4 * n_prim).reshape(n_batches, 4 * B)
        else:
            secs = np.zeros((n_batches, 0), np.int64)
        # one split for the whole epoch, fetched to host ONCE: the keys are
        # sliced per step below, and a device-resident ks would turn every
        # slice into a tunnel dispatch (~40 RTTs/epoch measured ~1.2 s on
        # the remote device — the fused loop's old host bottleneck). The
        # threefry split is deterministic, so the stream is bitwise
        # unchanged; jax.random.* accepts the raw uint32 key rows.
        ks = np.asarray(jax.random.split(self.key, n_batches + 1))
        self.key = ks[0]
        if sharded_host:
            # distinct per-host augment keys (same self.key advance)
            ks = np.asarray(
                jax.vmap(
                    lambda k: jax.random.fold_in(k, _jax.process_index())
                )(jnp.asarray(ks))
            )
        # every image index fed to the augment program this epoch, PER STEP
        # (rows), so the trainer can trim to the steps actually consumed
        # under fdr/limit_train_batches (mosaic co-samples included; mixup
        # co-mosaics counted regardless of the per-image blend coin, which
        # is decided on device)
        self.consumed_plan_log.append(
            np.concatenate([groups, secs], axis=1) if secs.size else groups
        )
        return groups, secs, ks[1:]

    def __iter__(self) -> Iterator[Batch]:
        groups, secs, keys = self._epoch_plan()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def producer():
            try:
                for group, sec, k in zip(groups, secs, keys):
                    if self._gather_augment is not None:
                        # HBM-resident mode: ship only indices
                        ds = (self._ds_images, self._ds_sizes, self._ds_tb,
                              self._ds_tl, self._ds_tm)
                        idx = jnp.asarray(group, jnp.int32)
                        if self.mixup_prob > 0.0:
                            idx2 = jnp.asarray(sec, jnp.int32)
                            batch, ovf = self._gather_augment(
                                *ds, idx, idx2, k
                            )
                        else:
                            batch, ovf = self._gather_augment(*ds, idx, k)
                    elif self.planar or self.device_cache:
                        # planar: host canvases are NHWC and the planar
                        # augment fn only consumes gathered corpus planes.
                        # fused-global (device_cache with _gather_augment
                        # None): falling through to per-batch host JPEG
                        # decode would silently ignore the HBM corpus —
                        # iterate via the fused epoch fn instead.
                        raise RuntimeError(
                            "this device-cache mode has no host-feed "
                            "iterator path; consume the fused epoch fn "
                            "(build_fused_epoch_fn) or disable "
                            "device_cache/planar"
                        )
                    elif self.mixup_prob > 0.0:
                        primary = self._load_group(group)
                        secondary = self._load_group(sec)
                        batch, ovf = self.augment_fn(primary, secondary, k)
                    else:
                        primary = self._load_group(group)
                        batch, ovf = self.augment_fn(primary, k)
                    self._overflow_pending.append(ovf)
                    if self.device_put_fn is not None:
                        batch = self.device_put_fn(batch)
                    q.put(batch)
            except Exception as e:
                q.put(e)
            finally:
                q.put(None)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item

    # ---------------------- fused-epoch (scan) mode ----------------------
    @property
    def device_arrays(self):
        """HBM-resident dataset tuple consumed by the fused epoch fn."""
        return (self._ds_images, self._ds_sizes, self._ds_tb, self._ds_tl,
                self._ds_tm)

    def epoch_host_arrays(self):
        """One epoch's sampling as stacked per-step arrays for the fused
        scan: (idx[, idx2], keys), each with leading dim = steps (targets
        are HBM-resident and gathered on device). Draws through
        `_epoch_plan`, so the stream (and the sampler/pyrng/key state
        advance) is identical to iterating the pipeline.

        Multi-host fused mode: the plan is GLOBAL (drawn identically on
        every host at batch nproc*B) and returned as global jax arrays —
        index columns sharded over the mesh's data axis, per-step keys
        replicated — so the fused scan runs one SPMD program whose random
        draws (global-shaped, replicated keys) are bitwise those of a
        single-process run at the same global batch."""
        if self._fused_global:
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            groups, secs, keys = self._epoch_plan(
                B=self.B * _jax.process_count(), shard_for_host=False
            )

            def mk(a, spec):
                a = np.asarray(a)
                sh = NamedSharding(self.fused_global_mesh, spec)
                return jax.make_array_from_callback(
                    a.shape, sh, lambda i: a[i]
                )

            xs = (mk(np.asarray(groups, np.int32), P(None, "data")),)
            if self.mixup_prob > 0.0:
                xs = xs + (mk(np.asarray(secs, np.int32), P(None, "data")),)
            return xs + (mk(np.asarray(keys), P()),)
        groups, secs, keys = self._epoch_plan()
        xs = (jnp.asarray(np.asarray(groups, np.int32)),)
        if self.mixup_prob > 0.0:
            xs = xs + (jnp.asarray(np.asarray(secs, np.int32)),)
        return xs + (jnp.asarray(keys),)

    def build_fused_epoch_fn(self, train_step, batch_sharding=None,
                             pipelined: bool = False,
                             stack_metrics: bool = False):
        """One XLA program per epoch: lax.scan over steps of
        (corpus row-gather -> device augment -> train step).

        Collapses the per-step augment/train program-switch and all host
        dispatch into a single device program per epoch — on a single-core
        TPU the two separate programs serialize anyway, and each dispatch
        rides the remote-tunnel RTT. train_step is the UN-jitted step
        (make_train_step output); the pipeline must be in device_cache mode.

        Returns jitted `epoch_fn(state, device_arrays, xs) ->
        (state', (stacked StepMetrics, stacked overflow))`.

        With stack_metrics=True the metrics are instead returned as ONE
        f32[n_leaves+1, steps] matrix (StepMetrics leaves in tree order,
        overflow last) stacked *inside* the program. This matters for the
        trainer's dispatch-ahead pipelining: fetching the matrix is a pure
        device->host copy with no follow-up device program, so it does not
        queue behind the next epoch's already-dispatched scan.
        """
        assert self._gather_augment_raw is not None, (
            "fused mode needs device_cache"
        )
        ga = self._gather_augment_raw

        def make_batch(ds, x):
            gx, key = x[:-1], x[-1]
            batch, ovf = ga(*ds, *gx, key)
            if batch_sharding is not None:
                batch = jax.tree.map(
                    lambda a: jax.lax.with_sharding_constraint(
                        a, batch_sharding
                    ),
                    batch,
                )
            return batch, ovf

        if not pipelined:

            def epoch_fn(state, ds, xs):
                def body(st, x):
                    batch, ovf = make_batch(ds, x)
                    st, m = train_step(st, batch)
                    return st, (m, ovf)

                return jax.lax.scan(body, state, xs)

        else:
            # software-pipelined: iteration i trains on batch i-1 while
            # building batch i — the two are independent inside one scan
            # body, so XLA's latency-hiding scheduler can overlap the
            # augment's MXU warp and DMA with the train step's
            # bandwidth-bound fusions (a single TPU core executes two
            # *separate* programs strictly in sequence).
            def epoch_fn(state, ds, xs):
                x0 = jax.tree.map(lambda a: a[0], xs)
                rest = jax.tree.map(lambda a: a[1:], xs)
                batch0, ovf0 = make_batch(ds, x0)

                def body(carry, x):
                    st, batch, ovf = carry
                    nb, novf = make_batch(ds, x)
                    st, m = train_step(st, batch)
                    return (st, nb, novf), (m, ovf)

                (st, last_b, last_ovf), (ms, ovfs) = jax.lax.scan(
                    body, (state, batch0, ovf0), rest
                )
                st, m_last = train_step(st, last_b)
                ms = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b[None]]), ms, m_last
                )
                ovfs = jnp.concatenate([ovfs, last_ovf[None]])
                return st, (ms, ovfs)

        if stack_metrics:
            inner = epoch_fn

            def epoch_fn(state, ds, xs):  # noqa: F811
                st, (ms, ovfs) = inner(state, ds, xs)
                flat = jnp.stack(
                    [l.astype(jnp.float32) for l in jax.tree.leaves(ms)]
                    + [ovfs.astype(jnp.float32)]
                )
                return st, flat

        return jax.jit(epoch_fn, donate_argnums=(0,))
