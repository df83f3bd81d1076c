"""Multi-host wrappers — single-process degradations (the only
configuration available here; the collectives themselves are pinned by
tests/test_parallel.py)."""

import jax
import numpy as np

from ggad_tpu.parallel.multihost import host_local_batch, make_hybrid_mesh


def test_hybrid_mesh_single_process_shape():
    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("hosts", "nodes")
    assert dict(mesh.shape)["hosts"] == 1
    assert dict(mesh.shape)["nodes"] == len(jax.devices())


def test_host_local_batch_roundtrip():
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, axis_names=("batch",))
    ids = np.arange(32, dtype=np.int32).reshape(32)
    arr = host_local_batch(mesh, ids, axis="batch")
    assert arr.shape == (32,)
    np.testing.assert_array_equal(np.asarray(arr), ids)


def test_host_local_batch_2d():
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, axis_names=("batch",))
    ids = np.arange(24, dtype=np.int32).reshape(8, 3)
    arr = host_local_batch(mesh, ids, axis="batch")
    assert arr.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(arr), ids)
