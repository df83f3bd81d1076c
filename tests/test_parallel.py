"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ggad_tpu.datasets.synthetic import synthetic_gad
from ggad_tpu.graph import from_scipy
from ggad_tpu.ops.sddmm import node_affinity
from ggad_tpu.ops.spmm import spmm
from ggad_tpu.parallel.mesh import make_mesh
from ggad_tpu.parallel.spmm_shard import (
    affinity_sharded,
    pad_nodes,
    partition_edges,
    place_partition,
    spmm_sharded,
)


def random_graph(n=100, density=0.08, seed=0):
    mat = sp.random(n, n, density=density,
                    random_state=np.random.RandomState(seed), format="csr",
                    dtype=np.float32)
    mat = ((mat + mat.T) > 0).astype(np.float32)
    return sp.csr_matrix(mat)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8, axis_names=("nodes",))


def test_partition_covers_all_edges(mesh):
    mat = random_graph(100)
    g = from_scipy(mat)
    part = partition_edges(g, 8)
    assert float(np.asarray(part.val).sum()) == pytest.approx(
        float(mat.sum()))


@pytest.mark.parametrize("n", [96, 100, 257])
def test_spmm_sharded_matches_single_device(mesh, n, rng):
    mat = random_graph(n)
    g = from_scipy(mat)
    part = place_partition(partition_edges(g, 8), mesh)
    x = rng.normal(size=(n, 24)).astype(np.float32)
    xp = pad_nodes(jnp.asarray(x), part)

    out = np.asarray(spmm_sharded(part, xp, mesh))[:n]
    expect = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_spmm_sharded_grad(mesh, rng):
    mat = random_graph(64)
    g = from_scipy(mat)
    part = place_partition(partition_edges(g, 8), mesh)
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))

    def f_sharded(x):
        return jnp.sum(spmm_sharded(part, pad_nodes(x, part), mesh) ** 2)

    def f_single(x):
        return jnp.sum(spmm(g, x) ** 2)

    g_sh = np.asarray(jax.grad(f_sharded)(x))
    g_si = np.asarray(jax.grad(f_single)(x))
    np.testing.assert_allclose(g_sh, g_si, rtol=1e-4, atol=1e-4)


def test_affinity_sharded_matches_single_device(mesh, rng):
    from ggad_tpu.graph import add_self_loops

    mat = random_graph(120)
    raw = add_self_loops(from_scipy(mat))
    part = place_partition(partition_edges(raw, 8), mesh)
    emb = rng.normal(size=(120, 16)).astype(np.float32)

    got = np.asarray(affinity_sharded(
        part, pad_nodes(jnp.asarray(emb), part), mesh))[:120]
    expect = np.asarray(node_affinity(raw, jnp.asarray(emb)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_gspmd_sharded_training_step(mesh):
    """The GSPMD full-batch GGAD step runs and is device-count invariant."""
    from ggad_tpu.parallel.full_batch import sharded_train_step

    ds = synthetic_gad(n_nodes=256, avg_degree=8, feat_dim=16, seed=0)
    loss8 = sharded_train_step(make_mesh(8), ds, n_h=32, n_steps=2)
    loss2 = sharded_train_step(make_mesh(2), ds, n_h=32, n_steps=2)
    assert np.isfinite(loss8)
    assert loss8 == pytest.approx(loss2, rel=1e-4)


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dp_minibatch_step(mesh):
    import scipy.sparse as sp

    from ggad_tpu.parallel.minibatch_dp import run_dp_minibatch_demo

    ds = synthetic_gad(n_nodes=300, avg_degree=8, feat_dim=12, seed=1)
    adj = ds.adj + sp.eye(ds.n_nodes, format="csr", dtype=np.float32)
    rng = np.random.default_rng(0)
    batch = rng.integers(0, ds.n_nodes, 32 + 16)
    loss8 = run_dp_minibatch_demo(mesh, adj, ds.features, batch, n_anom=16)
    loss1 = run_dp_minibatch_demo(make_mesh(1), adj, ds.features, batch,
                                  n_anom=16)
    assert np.isfinite(loss8)
    assert loss8 == pytest.approx(loss1, rel=1e-4)


def test_fullbatch_trainer_with_mesh(mesh):
    from ggad_tpu.train.full_batch import FullBatchTrainer

    ds = synthetic_gad(n_nodes=200, avg_degree=8, feat_dim=12, seed=2)
    kw = dict(num_epoch=4, embedding_dim=16, noise_std=0.0,
              eval_every=4, log_every=4)
    r1 = FullBatchTrainer(ds, **kw).train()
    r8 = FullBatchTrainer(ds, mesh=8, **kw).train()
    assert np.isfinite(r8.final_auc)
    assert r8.final_auc == pytest.approx(r1.final_auc, abs=1e-5)


def test_entry_compiles_single_device():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
