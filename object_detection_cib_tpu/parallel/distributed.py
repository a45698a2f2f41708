"""Multi-host initialization + per-host batch sharding helpers.

Capability parity: the reference's distributed story is Lightning DDP
strategy strings (kod/configs/trainer/ddp.yaml) — torch.distributed/NCCL
underneath. TPU-native: `jax.distributed.initialize()` joins a pod slice
(ICI within a slice, DCN across slices); pjit over the global mesh handles
gradient reduction. Data loading stays host-local: each host feeds its own
shard of the global batch (see data/samplers.py shard_indices, replacing
DistributedSampler).
"""

from __future__ import annotations

import functools
import os

import jax


def initialize_multihost(
    coordinator_address=None, num_processes=None, process_id=None
) -> bool:
    """Join a multi-host run. No-op (returns False) in single-process mode."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (ValueError, RuntimeError):
        return False


def maybe_initialize_from_env() -> bool:
    """Join a pod if the standard coordinator env vars are present.

    Mirrors how torch.distributed picks up MASTER_ADDR/RANK/WORLD_SIZE for
    the reference's `trainer=ddp` preset; here the spellings are JAX's
    (also honored natively by `jax.distributed.initialize()` on TPU pods):
    KOD_COORDINATOR_ADDRESS / KOD_NUM_PROCESSES / KOD_PROCESS_ID.
    """
    addr = os.environ.get("KOD_COORDINATOR_ADDRESS")
    if not addr:
        return False
    return initialize_multihost(
        coordinator_address=addr,
        num_processes=int(os.environ["KOD_NUM_PROCESSES"]),
        process_id=int(os.environ["KOD_PROCESS_ID"]),
    )


def is_main_process() -> bool:
    """True on process 0 (the rank-zero guard for logs/artifacts)."""
    return jax.process_index() == 0


def rank_zero_only(fn):
    """Run `fn` only on process 0 (parity: kod/lightning/logger.py:10-32).

    Returns None on other processes.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None

    return wrapped


@rank_zero_only
def rank_zero_print(*args, **kwargs):
    kwargs.setdefault("flush", True)
    print(*args, **kwargs)


def allgather_bytes(data: bytes) -> list:
    """All-gather an arbitrary byte string from every process.

    The cross-host reduction primitive behind multi-host validation
    (reference: Lightning's `log_dict(sync_dist=True)`,
    kod/lightning/callbacks/pycoco_map_eval.py:139-142). Two-phase because
    `process_allgather` needs identical shapes on every process: gather
    lengths first, then the zero-padded payloads. Single-process: identity.
    """
    import numpy as np

    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils

    lens = multihost_utils.process_allgather(
        np.asarray([len(data)], np.int32)
    ).reshape(-1)
    maxlen = int(lens.max())
    buf = np.zeros(max(maxlen, 1), np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    return [bytes(gathered[i, : int(lens[i])].tobytes()) for i in range(len(lens))]


def host_info():
    """(process_index, process_count, local_device_count)."""
    return jax.process_index(), jax.process_count(), jax.local_device_count()


def per_host_batch_size(global_batch_size: int) -> int:
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} hosts"
    )
    return global_batch_size // n
