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


def host_info():
    """(process_index, process_count, local_device_count)."""
    return jax.process_index(), jax.process_count(), jax.local_device_count()


def per_host_batch_size(global_batch_size: int) -> int:
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} hosts"
    )
    return global_batch_size // n
