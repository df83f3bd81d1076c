"""ELL padded-table SpMM tests (the sparse-regime TPU path).

Covers: structure round-trip, overflow-spill hubs, SpMM/affinity value and
gradient parity against the XLA segment oracle, and end-to-end GGAD
forward equality over an ELLGraph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ggad_tpu.graph import add_self_loops, from_scipy, to_scipy
from ggad_tpu.ops.ell_spmm import (
    ELLGraph,
    as_ell_graph,
    ell_affinity_colsum,
    ell_from_coo,
    ell_spmm,
)
from ggad_tpu.ops.sddmm import l2_normalize_rows, node_affinity
from ggad_tpu.ops.spmm import spmm


def random_graph(n=200, density=0.03, seed=0):
    return sp.random(n, n, density=density,
                     random_state=np.random.RandomState(seed),
                     format="csr", dtype=np.float32)


def hub_graph(n=150, seed=1):
    """A sparse graph plus one hub row with degree ≫ K (forces overflow)."""
    mat = random_graph(n, density=0.02, seed=seed).tolil()
    mat[0, :] = 1.0  # hub: degree n
    return sp.csr_matrix(mat, dtype=np.float32)


def test_ell_structure_roundtrip(rng):
    mat = random_graph(160, seed=2)
    e = as_ell_graph(from_scipy(mat))
    t = e.tables.fwd
    dense = np.zeros((160, 160), np.float32)
    # tables are slot-major [K, N] (contiguous per-sweep index vectors)
    idx, val = np.asarray(t.idx), np.asarray(t.val)
    for r in range(160):
        for s in range(t.k):
            dense[r, idx[s, r]] += val[s, r]
    ovr, ovc, ovv = (np.asarray(t.ov_row), np.asarray(t.ov_col),
                     np.asarray(t.ov_val))
    np.add.at(dense, (ovr, ovc), ovv)
    np.testing.assert_allclose(dense, mat.toarray(), rtol=1e-6, atol=1e-7)


def test_ell_spmm_matches_dense(rng):
    for mat in (random_graph(200, seed=3), hub_graph(150)):
        n = mat.shape[0]
        e = as_ell_graph(from_scipy(mat))
        if mat.getnnz(axis=1).max() > e.tables.fwd.k:
            assert e.tables.fwd.n_overflow > 0  # hub actually spills
        x = jnp.asarray(rng.normal(size=(n, 48)).astype(np.float32))
        out = np.asarray(ell_spmm(e.tables, x))
        np.testing.assert_allclose(out, mat.toarray() @ np.asarray(x),
                                   rtol=1e-4, atol=1e-4)


def test_ell_spmm_grad_matches_dense(rng):
    mat = hub_graph(120, seed=4)
    e = as_ell_graph(from_scipy(mat))
    x = jnp.asarray(rng.normal(size=(120, 24)).astype(np.float32))
    grad = jax.grad(lambda x: jnp.sum(ell_spmm(e.tables, x) ** 2))(x)
    a = mat.toarray()
    expect = 2 * a.T @ (a @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), expect, rtol=1e-3,
                               atol=1e-3)


def test_spmm_dispatch_on_ell_graph(rng):
    mat = random_graph(100, seed=5)
    g = from_scipy(mat)
    e = as_ell_graph(g)
    x = jnp.asarray(rng.normal(size=(100, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(spmm(e, x)),
                               np.asarray(spmm(g, x, impl="xla")),
                               rtol=1e-4, atol=1e-4)
    # forcing xla on an ELLGraph uses the delegated COO arrays
    np.testing.assert_allclose(np.asarray(spmm(e, x, impl="xla")),
                               np.asarray(spmm(g, x, impl="xla")),
                               rtol=1e-6, atol=1e-6)


def test_ell_affinity_matches_xla(rng):
    mat = hub_graph(140, seed=6)
    sym = ((mat + mat.T) > 0).astype(np.float32)
    g = add_self_loops(from_scipy(sp.csr_matrix(sym)))
    e = as_ell_graph(g)
    emb = jnp.asarray(rng.normal(size=(140, 20)).astype(np.float32))

    # raw colsum vs dense oracle
    en = l2_normalize_rows(emb)
    num = np.asarray(ell_affinity_colsum(e.tables, en))
    a = to_scipy(g).toarray()
    earr = np.asarray(en)
    np.testing.assert_allclose(num, (a * (earr @ earr.T)).sum(0),
                               rtol=1e-4, atol=1e-4)

    # dispatch + gradient equality with the segment path
    np.testing.assert_allclose(np.asarray(node_affinity(e, emb)),
                               np.asarray(node_affinity(g, emb)),
                               rtol=1e-4, atol=1e-4)
    g_e = jax.grad(lambda m: jnp.sum(node_affinity(e, m) ** 2))(emb)
    g_x = jax.grad(lambda m: jnp.sum(node_affinity(g, m) ** 2))(emb)
    np.testing.assert_allclose(np.asarray(g_e), np.asarray(g_x),
                               rtol=1e-3, atol=1e-4)


def test_ggad_model_with_ell_adjacency(rng):
    """Full GGAD forward over an ELLGraph equals the XLA path."""
    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.models.ggad import GGAD
    from ggad_tpu.ops.normalize import normalize_adj_reference

    ds = synthetic_gad(n_nodes=120, avg_degree=6, feat_dim=8, seed=2)
    adj, _ = normalize_adj_reference(from_scipy(ds.adj))
    eadj = as_ell_graph(adj)
    x = jnp.asarray(ds.features)
    si = jnp.asarray(ds.abnormal_label_idx, jnp.int32)
    ni = jnp.asarray(ds.normal_label_idx, jnp.int32)
    model = GGAD(n_h=16, noise_std=0.0)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        adj, x, si, ni, train=True)
    out_x = model.apply(params, adj, x, si, ni, train=True,
                        rngs={"noise": jax.random.PRNGKey(2)})
    out_e = model.apply(params, eadj, x, si, ni, train=True,
                        rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(out_x.emb),
                               np.asarray(out_e.emb), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_x.logits),
                               np.asarray(out_e.logits), rtol=1e-4,
                               atol=1e-4)


def test_trainer_ell_impl_trajectory(rng):
    """FullBatchTrainer(spmm_impl='ell') reproduces the XLA trajectory."""
    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.train.full_batch import FullBatchTrainer

    ds = synthetic_gad(n_nodes=150, avg_degree=5, feat_dim=12, seed=7)
    res = {}
    for impl in ("xla", "ell"):
        tr = FullBatchTrainer(ds, num_epoch=5, embedding_dim=16,
                              eval_every=5, log_every=5, spmm_impl=impl,
                              seed=0)
        res[impl] = tr.train()
    np.testing.assert_allclose(res["ell"].final_auc, res["xla"].final_auc,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        [h["loss"] for h in res["ell"].history if "loss" in h],
        [h["loss"] for h in res["xla"].history if "loss" in h],
        rtol=1e-3, atol=1e-4)


def test_ell_value_maps_reproduce_tables(rng):
    """ell_remap_values over the edge-order value vector reproduces
    ell_from_coo's value planes exactly — incl. overflow (hub graph)."""
    from ggad_tpu.ops.ell_spmm import ell_remap_values, ell_value_maps

    for mat in (random_graph(200, seed=4), hub_graph(150, seed=5)):
        g = from_scipy(mat)
        e = as_ell_graph(g)
        row = np.asarray(g.row)[: g.n_edges]
        col = np.asarray(g.col)[: g.n_edges]
        fmap = ell_value_maps(row, col, g.n_nodes, e.tables.fwd.k)
        bmap = ell_value_maps(row, col, g.n_nodes, e.tables.bwd.k,
                              transpose=True)
        # fresh random values on the SAME structure
        v = np.zeros(g.e_pad, np.float32)
        v[: g.n_edges] = rng.normal(size=g.n_edges).astype(np.float32)
        fv, fov = ell_remap_values(fmap, jnp.asarray(v))
        bv, bov = ell_remap_values(bmap, jnp.asarray(v))
        oracle_f = ell_from_coo(row, col, v[: g.n_edges], g.n_nodes,
                                k=e.tables.fwd.k)
        oracle_b = ell_from_coo(col, row, v[: g.n_edges], g.n_nodes,
                                k=e.tables.bwd.k)
        np.testing.assert_array_equal(np.asarray(fv),
                                      np.asarray(oracle_f.val))
        np.testing.assert_array_equal(np.asarray(fov),
                                      np.asarray(oracle_f.ov_val))
        np.testing.assert_array_equal(np.asarray(bv),
                                      np.asarray(oracle_b.val))
        np.testing.assert_array_equal(np.asarray(bov),
                                      np.asarray(oracle_b.ov_val))
        # and the remapped planes drive an exact SpMM
        import dataclasses
        from ggad_tpu.ops.ell_spmm import ELLPair
        pair = ELLPair(
            fwd=dataclasses.replace(e.tables.fwd, val=fv, ov_val=fov),
            bwd=dataclasses.replace(e.tables.bwd, val=bv, ov_val=bov),
            n_nodes=g.n_nodes)
        x = jnp.asarray(rng.normal(size=(g.n_nodes, 24)).astype(np.float32))
        got = np.asarray(ell_spmm(pair, x))
        from ggad_tpu.ops.spmm import spmm_coo
        expect = np.asarray(spmm_coo(g.row, g.col, jnp.asarray(v), x,
                                     g.n_nodes))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_ell_subset_affinity_matches_edge_subset(rng):
    """The rect-ELL subset colsum (value AND gradient) must equal both
    the full node_affinity at the subset ids and the edge-parallel
    AffinitySubset path it replaces (round-5 sparse-regime margin)."""
    from ggad_tpu.ops.ell_spmm import ell_affinity_subset
    from ggad_tpu.ops.sddmm import affinity_subset, node_affinity_at

    mat = hub_graph(170, seed=5)
    g = add_self_loops(from_scipy(mat))
    n = g.n_nodes
    r = np.random.default_rng(7)
    idx = np.unique(r.integers(0, n, 40))
    idx = np.concatenate([idx, idx[:5]])  # repeated ids (seeds ⊂ normals)
    emb = jnp.asarray(r.standard_normal((n, 9)), jnp.float32)

    sub_edge = affinity_subset(g, idx)
    sub_ell = ell_affinity_subset(g, idx)
    full = node_affinity(g, emb)[jnp.asarray(idx)]
    a_edge = node_affinity_at(sub_edge, emb)
    a_ell = node_affinity_at(sub_ell, emb)
    np.testing.assert_allclose(np.asarray(a_ell), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_ell), np.asarray(a_edge),
                               rtol=1e-5, atol=1e-5)

    def loss_of(path):
        def f(e):
            a = node_affinity_at(path, e)
            return jnp.sum(jnp.sin(a * 3.0))
        return f

    g_edge = jax.grad(loss_of(sub_edge))(emb)
    g_ell = jax.grad(loss_of(sub_ell))(emb)
    np.testing.assert_allclose(np.asarray(g_ell), np.asarray(g_edge),
                               rtol=2e-4, atol=2e-5)


def test_ell_subset_affinity_bf16_tables_close(rng):
    """bf16 rect tables stay within bf16 tolerance of the f32 path."""
    from ggad_tpu.ops.ell_spmm import ell_affinity_subset
    from ggad_tpu.ops.sddmm import node_affinity_at

    mat = random_graph(150, density=0.04, seed=9)
    g = add_self_loops(from_scipy(mat))
    r = np.random.default_rng(3)
    idx = np.unique(r.integers(0, g.n_nodes, 30))
    emb = jnp.asarray(r.standard_normal((g.n_nodes, 12)), jnp.float32)
    a32 = node_affinity_at(ell_affinity_subset(g, idx), emb)
    a16 = node_affinity_at(
        ell_affinity_subset(g, idx, dtype="bfloat16"), emb)
    np.testing.assert_allclose(np.asarray(a16), np.asarray(a32),
                               rtol=2e-2, atol=2e-2)


def test_overflow_spmm_chunked_matches_unchunked(rng, monkeypatch):
    """The chunked overflow path (forced by a tiny element cap) must
    equal the single-gather path — it exists because [E_ov, d]
    materialization OOMs at TAM-amazon spill density (round 5)."""
    import ggad_tpu.ops.ell_spmm as E

    r = np.random.default_rng(11)
    e, n, d = 1000, 64, 7
    row = np.sort(r.integers(0, n, e)).astype(np.int32)
    col = r.integers(0, n, e).astype(np.int32)
    val = r.standard_normal(e).astype(np.float32)
    x = jnp.asarray(r.standard_normal((n, d)), jnp.float32)
    full = E._overflow_spmm(jnp.asarray(row), jnp.asarray(col),
                            jnp.asarray(val), x, n)
    monkeypatch.setattr(E, "_OV_CHUNK_ELEMS", 256)
    chunked = E._overflow_spmm(jnp.asarray(row), jnp.asarray(col),
                               jnp.asarray(val), x, n)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
