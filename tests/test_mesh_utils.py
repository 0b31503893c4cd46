"""Mesh/sharding utility unit tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_chinese_ocr_samples_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated, shard_batch,
)


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(model=2, devices=jax.devices()[:8])  # data inferred
    assert mesh.shape["data"] == 4


def test_make_mesh_rejects_bad_factorization():
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2, devices=jax.devices()[:8])


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    batch = {"images": np.zeros((8, 4, 4, 1), np.float32),
             "widths": np.zeros((8,), np.int32)}
    dev = shard_batch(mesh, batch)
    for v in dev.values():
        assert v.sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(dev["images"]),
                                  batch["images"])


def test_replicated_sharding():
    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    x = jax.device_put(jnp.ones((3, 3)), replicated(mesh))
    assert x.sharding.is_fully_replicated


def test_batch_sharding_spec():
    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    s = batch_sharding(mesh)
    assert s.spec == jax.sharding.PartitionSpec("data")
