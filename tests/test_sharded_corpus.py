"""Sharded HBM corpus (VERDICT r4 #6 / SURVEY §5.8 per-host sharded data).

The fused-epoch corpus replicates per device by default, capping it at one
device's HBM. corpus_sharding=sharded deals rows over the mesh's data axis
and gathers by GLOBAL index through a masked psum_scatter exchange — the
training stream must be bitwise identical to the replicated placement,
while no device holds more than its 1/n row shard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.data.device_pipeline import (
    DeviceDataPipeline,
    make_sharded_corpus_gather,
)
from object_detection_cib_tpu.data.host_augment import AugParams
from object_detection_cib_tpu.data.synthetic import build_fake_manifest
from object_detection_cib_tpu.parallel.mesh import make_mesh

S = 64


def _mesh8():
    assert jax.device_count() == 8, "conftest provides 8 CPU devices"
    return make_mesh()


def test_masked_gather_matches_plain():
    mesh = _mesh8()
    gather = make_sharded_corpus_gather(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    for arr in (
        rng.integers(0, 256, (24, 3, 16, 16), np.uint8),
        rng.standard_normal((24, 5, 4)).astype(np.float32),
        rng.integers(0, 2, (24, 7)).astype(bool),
    ):
        ds = jax.device_put(arr, NamedSharding(mesh, P("data")))
        idx = jnp.asarray(rng.integers(0, 24, (16,)), jnp.int32)
        out = jax.jit(gather)(ds, idx)
        np.testing.assert_array_equal(np.asarray(out), arr[np.asarray(idx)])
        # output is dealt over the data axis, 1/8 rows per device
        assert len(out.sharding.device_set) == 8
        # and no device holds more than its corpus shard
        assert max(
            s.data.shape[0] for s in ds.addressable_shards
        ) == 24 // 8


def _pipe(info, sharding, mesh, **kw):
    return DeviceDataPipeline(
        info,
        target_size=S,
        batch_size=16,
        aug_params=AugParams(),
        max_targets=40,
        seed=0,
        fake_mode=True,
        device_cache=True,
        corpus_sharding=sharding,
        corpus_mesh=mesh,
        **kw,
    )


@pytest.mark.parametrize("mixup", [0.0, 1.0])
def test_sharded_corpus_bitwise_matches_replicated(mixup):
    """Same seed, same plan: every batch from the sharded placement equals
    the replicated one bitwise; corpus shards are 1/8 per device."""
    mesh = _mesh8()
    # 37 samples: exercises the pad-to-multiple-of-8 row padding too
    info = build_fake_manifest(num_images=37, num_classes=4, seed=0)
    p_rep = _pipe(info, "replicated", None, mixup_prob=mixup)
    p_sh = _pipe(info, "sharded", mesh, mixup_prob=mixup)
    assert p_sh.corpus_sharded and not p_rep.corpus_sharded
    # padded to 40 rows, 5 per device shard
    assert p_sh._ds_images.shape[0] == 40
    assert max(
        s.data.shape[0] for s in p_sh._ds_images.addressable_shards
    ) == 5

    for b_r, b_s in zip(iter(p_rep), iter(p_sh)):
        np.testing.assert_array_equal(
            np.asarray(b_r.images, np.float32),
            np.asarray(b_s.images, np.float32),
        )
        np.testing.assert_array_equal(
            np.asarray(b_r.boxes), np.asarray(b_s.boxes)
        )
        np.testing.assert_array_equal(
            np.asarray(b_r.labels), np.asarray(b_s.labels)
        )
        np.testing.assert_array_equal(
            np.asarray(b_r.mask), np.asarray(b_s.mask)
        )


def test_sharded_corpus_fused_epoch_runs():
    """The fused-epoch scan compiles and runs over the sharded corpus with
    the batch constrained over the mesh (the production multi-chip path)."""
    from object_detection_cib_tpu.parallel.mesh import batch_sharding

    mesh = _mesh8()
    info = build_fake_manifest(num_images=32, num_classes=4, seed=0)
    pipe = _pipe(info, "sharded", mesh)

    calls = []

    def fake_step(state, batch):
        calls.append(1)
        return state, jnp.float32(batch.images.sum())

    fn = pipe.build_fused_epoch_fn(fake_step, batch_sharding(mesh))
    xs = pipe.epoch_host_arrays()
    state0 = jnp.zeros((4,))
    st, (ms, ovf) = fn(state0, pipe.device_arrays, xs)
    assert ms.shape == (2,)  # 32 imgs / B=16 -> 2 steps
    assert np.isfinite(np.asarray(ms)).all()
