"""Pallas corpus row-gather parity vs jnp take (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from object_detection_cib_tpu.ops.pallas_gather import gather_rows, supports


def test_supports_tile_alignment():
    assert supports((100, 32, 32, 3))  # 3072 % 1024 == 0
    assert supports((100, 416, 416, 3))
    assert not supports((100, 17, 3))


def test_gather_rows_matches_take():
    rng = np.random.default_rng(0)
    corpus = rng.integers(0, 256, (40, 32, 32, 3), dtype=np.uint8)
    idx = rng.integers(0, 40, (16,)).astype(np.int32)
    got = gather_rows(jnp.asarray(corpus), jnp.asarray(idx), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), corpus[idx])


def test_gather_rows_repeated_indices():
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(10, 8, 128)).astype(np.float32)
    idx = np.asarray([3, 3, 0, 9, 3], np.int32)
    got = gather_rows(jnp.asarray(corpus), jnp.asarray(idx), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), corpus[idx])
