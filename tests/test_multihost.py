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


def test_two_process_distributed_real():
    """REAL multi-process run: two subprocesses, localhost coordinator,
    4 virtual CPU devices each (8 global). Exercises jax.distributed
    initialize, the hybrid-mesh multi-process branch, host_local_batch
    with per-process shards, a DP gradient step, and a halo-style
    ppermute+psum round (see tests/multihost_worker.py)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {i}" in out, out[-4000:]
