"""Worker program for the REAL two-process multihost test.

Launched twice (process_id 0/1) by ``tests/test_multihost.py`` with a
localhost coordinator; each process owns 4 virtual CPU devices (8
global). Exercises the NON-degenerate branches of
``ggad_tpu.parallel.multihost``:

  * ``initialize`` with an explicit coordinator (jax.distributed);
  * ``make_hybrid_mesh`` → [hosts=2, nodes=4] via
    ``create_hybrid_device_mesh`` (the multi-process branch);
  * ``host_local_batch`` — each process contributes its own half of a
    globally batch-sharded array;
  * one DP GRADIENT step over the global batch (each host computes on
    its local shard; the jitted mean-loss gradient must equal the
    full-batch oracle on every process — the semantics contract
    ``MiniBatchTrainer(mesh=...)`` relies on);
  * one halo-style collective round on the hybrid mesh (ppermute ring
    over the DCN axis + psum over the ICI axis inside shard_map — the
    collective pair ``parallel/spmm_shard.py`` issues per exchange).

Prints ``MULTIHOST_OK <process_id>`` on success; any assertion fails
the exit code.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    coord = sys.argv[3]

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ggad_tpu.parallel.multihost import (
        host_local_batch,
        initialize,
        make_hybrid_mesh,
    )

    initialize(coordinator_address=coord, num_processes=n_proc,
               process_id=proc_id)
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert len(jax.devices()) == 4 * n_proc

    hybrid = make_hybrid_mesh()
    assert hybrid.axis_names == ("hosts", "nodes")
    assert dict(hybrid.shape) == {"hosts": n_proc, "nodes": 4}, \
        hybrid.shape

    # ---- host_local_batch: each process passes ITS half ---------------
    per_host = 8    # global 16: divisible by the 8-device batch axis
    local_ids = np.arange(per_host, dtype=np.int32) + 100 * proc_id
    batch_mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("batch",))
    ids = host_local_batch(batch_mesh, local_ids, axis="batch")
    assert ids.shape == (per_host * n_proc,)
    total = int(jax.jit(jnp.sum, out_shardings=NamedSharding(
        batch_mesh, P()))(ids))
    expect = sum(int(np.sum(np.arange(per_host) + 100 * p))
                 for p in range(n_proc))
    assert total == expect, (total, expect)

    # ---- one DP gradient step over the globally sharded batch ---------
    rng = np.random.default_rng(0)            # same draw on every process
    w0 = jnp.asarray(rng.standard_normal(5), jnp.float32)
    xs_full = rng.standard_normal((8 * n_proc, 5)).astype(np.float32)
    ys_full = rng.standard_normal(8 * n_proc).astype(np.float32)
    shard = NamedSharding(batch_mesh, P("batch"))
    lo, hi = proc_id * 8, (proc_id + 1) * 8
    xs = jax.make_array_from_process_local_data(shard, xs_full[lo:hi],
                                                xs_full.shape)
    ys = jax.make_array_from_process_local_data(
        shard, ys_full[lo:hi], ys_full.shape)

    def loss(w, xs, ys):
        return jnp.mean((xs @ w - ys) ** 2)

    g = jax.jit(jax.grad(loss), out_shardings=NamedSharding(
        batch_mesh, P()))(w0, xs, ys)
    g_local = np.asarray(jax.device_get(g))
    resid = xs_full @ np.asarray(w0) - ys_full
    g_ref = 2.0 * xs_full.T @ resid / len(ys_full)
    np.testing.assert_allclose(g_local, g_ref, rtol=1e-5, atol=1e-5)

    # ---- halo-style collective round on the hybrid mesh ---------------
    from jax.experimental.shard_map import shard_map

    n_dev = 4 * n_proc
    x_full = np.arange(n_dev * 3, dtype=np.float32).reshape(n_dev, 3)
    hshard = NamedSharding(hybrid, P(("hosts", "nodes")))
    x = jax.make_array_from_process_local_data(
        hshard, x_full[proc_id * 4:(proc_id + 1) * 4], x_full.shape)

    ring = [(i, (i + 1) % n_proc) for i in range(n_proc)]

    def round_fn(blk):            # per-device block [1, 3]
        nxt = jax.lax.ppermute(blk, "hosts", perm=ring)
        return jax.lax.psum(blk + nxt, "nodes")

    out = jax.jit(shard_map(round_fn, mesh=hybrid,
                            in_specs=P(("hosts", "nodes")),
                            out_specs=P("hosts")))(x)
    got = np.asarray(jax.device_get(jax.jit(
        lambda a: a, out_shardings=NamedSharding(hybrid, P()))(out)))
    blocks = x_full.reshape(n_proc, 4, 3)
    expect_h = np.stack([
        (blocks[h] + blocks[(h - 1) % n_proc]).sum(axis=0)
        for h in range(n_proc)])
    np.testing.assert_allclose(got, expect_h, rtol=1e-6)

    print(f"MULTIHOST_OK {proc_id}", flush=True)


if __name__ == "__main__":
    main()
