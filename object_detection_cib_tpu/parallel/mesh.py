"""Device mesh construction and sharding rules.

Capability parity: the reference's entire distributed story is Lightning DDP
(kod/configs/trainer/ddp.yaml: 2xGPU, NCCL, sync_batchnorm) plus a CPU
`ddp_spawn` simulator (ddp_sim.yaml). The TPU-native equivalent (SURVEY.md
§5.8) is SPMD over a jax mesh:

  * a ``data`` axis carries data parallelism — the gradient all-reduce is an
    XLA psum over ICI inserted automatically by jit/pjit given shardings
  * BatchNorm statistics under pjit reduce over the *global* (sharded) batch,
    i.e. sync_batchnorm semantics come for free
  * a ``model`` axis is reserved for intra-image spatial sharding of huge
    inputs (the detector analog of sequence parallelism; size 1 for parity
    workloads)

Multi-host pods: call jax.distributed.initialize() before make_mesh (the
`jax.distributed` analog of torch.distributed init).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devs = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devs) // num_model
    assert num_data * num_model <= len(devs), (
        f"mesh {num_data}x{num_model} needs more than {len(devs)} devices"
    )
    grid = np.asarray(devs[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh):
    """Place every leaf of a batch pytree with its leading dim on `data`.

    Single-process: a plain sharded device_put. Multi-process (pods): each
    process holds only its per-host rows (data/samplers.py shard_indices
    feeds disjoint index blocks), so the global array is assembled from
    process-local data — the jax analog of DistributedSampler + DDP's
    implicit global batch.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
