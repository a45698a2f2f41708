"""Dataset orchestration + fixed-shape batching + async device feed.

Capability parity: kod/data/detection.py:40-156 (mosaic co-sampling, RAM
cache, mixup as a second mosaic) and kod/lightning/data_module.py:24-174
(loaders, collate). Differences, TPU-first:

  * collate pads targets to a static capacity T and emits a `Batch` pytree
    (the reference keeps ragged tuples — impossible under jit)
  * the loader is a thread-pool prefetcher with device-put double buffering
    (replacing torch DataLoader worker processes; decode/augment release the
    GIL inside PIL/cv2)
  * sampler coupling is explicit (`sampler.epoch_indices()`), with the same
    duck-typed mosaic co-sampling contract: extra mosaic indices are drawn
    from `sampler_indices` weighted by `image_repeat_factors`
    (ref detection.py:112-123)
"""

from __future__ import annotations

import queue
import random as pyrandom
import threading
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np

from object_detection_cib_tpu.data.cache import DatasetInfo
from object_detection_cib_tpu.data.host_augment import mixup, mosaic4
from object_detection_cib_tpu.data.reader import AugmentedSample, SampleReader


class DetectionDataset:
    """Map-style dataset: reader + mosaic + augmentor (+mixup) per item."""

    def __init__(
        self,
        dataset_info: DatasetInfo,
        sample_reader: SampleReader,
        sample_augmentor: Callable,
        enable_ram_cache: bool = False,
        use_mosaic: bool = False,
        mosaic_target_size: Optional[int] = None,
        mixup_prob: float = 0.0,
        sampler=None,
        seed: int = 0,
    ):
        if mixup_prob > 0.0:
            assert use_mosaic, "Mixup requires mosaic (ref detection.py:58-59)"
        self.dataset_info = dataset_info
        self.sample_reader = sample_reader
        self.sample_augmentor = sample_augmentor
        self.use_mosaic = use_mosaic
        self.mosaic_target_size = mosaic_target_size
        self.mixup_prob = mixup_prob
        self.sampler = sampler
        self.rng = np.random.default_rng(seed)
        self.pyrng = pyrandom.Random(seed)

        self._cache: List[Optional[AugmentedSample]] = [None] * len(
            dataset_info.samples
        )
        self.enable_ram_cache = enable_ram_cache
        if enable_ram_cache:
            # pre-resized, letterboxed only when mosaic won't run
            # (ref detection.py:66-76)
            for i, s in enumerate(dataset_info.samples):
                self._cache[i] = self.sample_reader(s, not use_mosaic)

        self.image_repeat_factors = getattr(sampler, "image_repeat_factors", None)

    def __len__(self) -> int:
        return len(self.dataset_info.samples)

    @property
    def num_classes(self) -> int:
        return len(self.dataset_info.classes)

    def _read(self, i: int) -> AugmentedSample:
        if self.enable_ram_cache and self._cache[i] is not None:
            return self._cache[i]
        return self.sample_reader(self.dataset_info.samples[i], not self.use_mosaic)

    def _co_indices(self, k: int) -> List[int]:
        pool = getattr(self.sampler, "sampler_indices", None)
        if pool is None:
            pool = range(len(self.dataset_info.samples))
        return self.pyrng.choices(pool, k=k, weights=self.image_repeat_factors)

    def __getitem__(self, idx: int) -> AugmentedSample:
        if not self.use_mosaic:
            return self.sample_augmentor(self._read(idx))

        indices = [idx] + self._co_indices(3)
        self.pyrng.shuffle(indices)
        sample, border = mosaic4(
            [self._read(i) for i in indices], self.mosaic_target_size, self.rng
        )
        sample = self.sample_augmentor(sample, border)

        if self.pyrng.random() < self.mixup_prob:
            # second mosaic, blended in (ref detection.py:134-145)
            s2, border2 = mosaic4(
                [self._read(i) for i in self._co_indices(4)],
                self.mosaic_target_size,
                self.rng,
            )
            s2 = self.sample_augmentor(s2, border2)
            sample = mixup(sample, s2, self.rng)
        return sample


def collate_fixed(
    samples: Sequence[AugmentedSample], max_targets: int
):
    """Stack images and pad targets to capacity; returns a train.steps.Batch.

    Overflowing targets beyond `max_targets` are dropped (counted by the
    caller via the returned overflow count).
    """
    import jax.numpy as jnp

    from object_detection_cib_tpu.train.steps import Batch

    B = len(samples)
    h, w = samples[0].image.shape[:2]
    images = np.zeros((B, h, w, 3), np.float32)
    boxes = np.zeros((B, max_targets, 4), np.float32)
    labels = np.zeros((B, max_targets), np.int32)
    mask = np.zeros((B, max_targets), bool)
    overflow = 0
    for i, s in enumerate(samples):
        images[i] = s.image.astype(np.float32) / 255.0
        n = min(len(s.bboxes), max_targets)
        overflow += max(0, len(s.bboxes) - max_targets)
        if n:
            boxes[i, :n] = s.bboxes[:n]
            labels[i, :n] = s.labels[:n]
            mask[i, :n] = True
    batch = Batch(
        images=jnp.asarray(images),
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray(labels),
        mask=jnp.asarray(mask),
    )
    return batch, overflow


class Prefetcher:
    """Threaded batch producer with bounded queue (double buffering)."""

    def __init__(
        self,
        dataset: DetectionDataset,
        batch_size: int,
        max_targets: int,
        sampler=None,
        num_threads: int = 8,
        prefetch: int = 2,
        drop_last: bool = True,
        device_put_fn: Optional[Callable] = None,
        shard_for_host: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_targets = max_targets
        self.sampler = sampler
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.device_put_fn = device_put_fn
        # multi-host training: every rank draws the identical epoch stream
        # (identically-seeded sampler) and takes its interleaved shard
        # (DistributedSampler analog) — WITHOUT this, all ranks feed the
        # same primaries and the global batch duplicates every image
        # world_size times. Validation passes pre-sharded FixedSamplers
        # and must not double-shard.
        self.shard_for_host = shard_for_host
        self.overflow_total = 0
        # sampler-debug support: primary indices of each epoch actually
        # consumed, FIFO (mosaic co-samples are drawn inside the dataset's
        # __getitem__ and are not recorded here)
        from collections import deque

        self.consumed_plan_log: deque = deque(maxlen=8)

    def _epoch_indices(self) -> np.ndarray:
        if self.sampler is not None:
            idx = np.asarray(self.sampler.epoch_indices())
        else:
            idx = np.arange(len(self.dataset))
        if self.shard_for_host:
            import jax

            if jax.process_count() > 1:
                from object_detection_cib_tpu.data.samplers import (
                    shard_indices,
                )

                idx = shard_indices(
                    idx, jax.process_index(), jax.process_count()
                )
        return idx

    def __len__(self) -> int:
        # samplers define the epoch length (repeat-factor/class-aware epochs
        # differ from the dataset size; per-host val shards are subsets)
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.shard_for_host:
            import jax

            nproc = jax.process_count()
            if nproc > 1:  # interleaved-shard size for this rank
                p = jax.process_index()
                n = n // nproc + (1 if p < n % nproc else 0)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        indices = self._epoch_indices()
        n_batches = len(indices) // self.batch_size
        if not self.drop_last and len(indices) % self.batch_size:
            n_batches += 1
        # per-step rows so the trainer can trim to batches actually
        # consumed (drop_last=False's final partial batch is not logged)
        full = len(indices) // self.batch_size
        self.consumed_plan_log.append(
            np.asarray(indices[: full * self.batch_size]).reshape(
                full, self.batch_size
            )
        )

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_threads) as pool:
                    for bi in range(n_batches):
                        if stop.is_set():
                            return
                        chunk = indices[
                            bi * self.batch_size : (bi + 1) * self.batch_size
                        ]
                        samples = list(pool.map(self.dataset.__getitem__, chunk))
                        batch, ovf = collate_fixed(samples, self.max_targets)
                        self.overflow_total += ovf
                        if self.device_put_fn is not None:
                            batch = self.device_put_fn(batch)
                        q.put(batch)
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
