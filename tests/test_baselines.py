"""Baseline zoo tests: op oracles + smoke training for each model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ggad_tpu.datasets.synthetic import synthetic_gad
from ggad_tpu.graph import add_self_loops, from_scipy, to_scipy
from ggad_tpu.ops.dense_blocks import (
    blockwise_pair_reduce,
    sigmoid_structure_row_error,
)


@pytest.fixture(scope="module")
def small_ds():
    return synthetic_gad(n_nodes=300, avg_degree=8, feat_dim=16,
                         anomaly_rate=0.08, seed=7)


def test_blockwise_pair_reduce_matches_dense(rng):
    emb = jnp.asarray(rng.normal(size=(100, 9)).astype(np.float32))
    got = np.asarray(blockwise_pair_reduce(
        emb, lambda s: jnp.square(jax.nn.sigmoid(s)), block=32))
    e = np.asarray(emb)
    dense = 1 / (1 + np.exp(-(e @ e.T)))
    np.testing.assert_allclose(got, (dense ** 2).sum(1), rtol=1e-4,
                               atol=1e-4)


def test_structure_row_error_matches_dense(rng):
    mat = sp.random(80, 80, density=0.1,
                    random_state=np.random.RandomState(0), format="csr",
                    dtype=np.float32)
    g = from_scipy(mat)
    emb = jnp.asarray(rng.normal(size=(80, 8)).astype(np.float32))
    got = np.asarray(sigmoid_structure_row_error(g, emb, block=32))
    e = np.asarray(emb)
    s_ = 1 / (1 + np.exp(-(e @ e.T)))
    expect = np.sqrt(((mat.toarray() - s_) ** 2).sum(1))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_gat_layer_matches_dense_attention(rng):
    """GATLayer must equal the dense single-head GAT formula."""
    from ggad_tpu.nn.layers import GATLayer

    mat = sp.random(40, 40, density=0.15,
                    random_state=np.random.RandomState(1), format="csr",
                    dtype=np.float32)
    mat.data[:] = 1.0
    mat = mat.tolil()
    mat.setdiag(0)
    mat = mat.tocsr()
    mat.eliminate_zeros()
    g = add_self_loops(from_scipy(mat))
    x = jnp.asarray(rng.normal(size=(40, 6)).astype(np.float32))
    layer = GATLayer(5)
    params = layer.init(jax.random.PRNGKey(0), g, x)
    out = np.asarray(layer.apply(params, g, x))

    w = np.asarray(params["params"]["kernel"])
    a_src = np.asarray(params["params"]["att_src"])[0]
    a_dst = np.asarray(params["params"]["att_dst"])[0]
    b = np.asarray(params["params"]["bias"])
    h = np.asarray(x) @ w
    adj_d = to_scipy(g).toarray() > 0
    n = 40
    expect = np.zeros_like(out)
    for i in range(n):
        srcs = np.flatnonzero(adj_d[:, i])
        logits = np.array([
            max(0.2 * v, v) if (v := h[j] @ a_src + h[i] @ a_dst) < 0
            else v for j in srcs])
        att = np.exp(logits - logits.max())
        att = att / att.sum()
        expect[i] = (att[:, None] * h[srcs]).sum(0) + b
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["dominant", "anomalydae"])
def test_reconstruction_baselines_smoke(small_ds, name):
    from ggad_tpu.train.baselines import run_reconstruction

    res = run_reconstruction(name, small_ds, num_epoch=6,
                             embedding_dim=32, eval_every=3)
    assert np.isfinite(res.auc) and np.isfinite(res.ap)
    assert len(res.history) >= 2
    # loss decreased
    assert res.history[-1]["loss"] < res.history[0]["loss"]


def test_ocgnn_smoke(small_ds):
    from ggad_tpu.train.baselines import run_ocgnn

    res = run_ocgnn(small_ds, num_epoch=6, embedding_dim=32, eval_every=3)
    assert np.isfinite(res.auc)
    assert res.history[-1]["loss"] < res.history[0]["loss"]


def test_aegis_smoke(small_ds):
    from ggad_tpu.train.baselines import run_aegis

    res = run_aegis(small_ds, num_epoch=6, recon_num_epoch=3,
                    embedding_dim=32, eval_every=3)
    assert np.isfinite(res.auc)


def test_gaan_smoke(small_ds):
    from ggad_tpu.train.baselines import run_gaan

    res = run_gaan(small_ds, num_epoch=6, eval_every=3)
    assert np.isfinite(res.auc)
    # adversarial losses are not monotone; just require sane values
    assert all(np.isfinite(h["loss"]) for h in res.history)


class TestTAM:
    def test_edge_distance_matches_loops(self, rng, small_ds):
        from ggad_tpu.models.tam import edge_feature_distance

        g = add_self_loops(from_scipy(small_ds.adj))
        x = jnp.asarray(small_ds.features)
        dis = np.asarray(edge_feature_distance(g, x))
        r = np.asarray(g.row)[: g.n_edges]
        c = np.asarray(g.col)[: g.n_edges]
        f = small_ds.features
        expect = np.sqrt(((f[r] - f[c]) ** 2).sum(1))
        np.testing.assert_allclose(dis[: g.n_edges], expect, rtol=1e-4,
                                   atol=1e-4)

    def test_nsgt_cut_properties(self, small_ds):
        from ggad_tpu.models.tam import (
            edge_feature_distance,
            nsgt_cut,
            transpose_permutation,
        )

        g = add_self_loops(from_scipy(small_ds.adj))
        x = jnp.asarray(small_ds.features)
        dis = edge_feature_distance(g, x)
        t_perm = jnp.asarray(transpose_permutation(g))
        new_val = np.asarray(
            nsgt_cut(g.val, dis, g, t_perm, jax.random.PRNGKey(0)))
        old_val = np.asarray(g.val)
        # only removals, no additions
        assert np.all((new_val == 0) | (new_val == old_val))
        assert new_val.sum() < old_val.sum()
        # symmetry preserved (union)
        tp = np.asarray(t_perm)
        np.testing.assert_array_equal(new_val, new_val[tp])
        # self-loops survive (distance 0)
        r = np.asarray(g.row)[: g.n_edges]
        c = np.asarray(g.col)[: g.n_edges]
        self_loops = np.flatnonzero(r == c)
        assert np.all(new_val[self_loops] != 0)

    @pytest.mark.slow
    def test_tam_end_to_end(self, small_ds):
        from ggad_tpu.train.baselines import run_tam_baseline

        res = run_tam_baseline(small_ds, n_h=32, cutting=3, n_tree=1,
                               num_epoch=40, lr=1e-4, eval_every=1)
        assert np.isfinite(res.auc)
        assert res.auc > 0.45  # sanity: not anti-correlated
        # per-round history (one AUROC per ensemble round + final)
        rounds = [h for h in res.history if "round" in h]
        assert [h["round"] for h in rounds] == [1, 2, 3]
        assert all(np.isfinite(h["auc"]) for h in res.history)

    def test_tam_impl_equality(self, small_ds):
        """The block-diag MXU ensemble (impl='bcsr', interpret mode on
        CPU) reproduces the shared-ELL path member for member."""
        from ggad_tpu.graph import add_self_loops, from_scipy
        from ggad_tpu.models.tam import run_tam

        g = from_scipy(small_ds.adj)
        raw = add_self_loops(g)
        kw = dict(n_h=12, cutting=2, n_tree=1, num_epoch=6, lr=1e-4,
                  seed=0)
        ell = run_tam(g, raw, small_ds.features,
                      small_ds.normal_label_idx, impl="ell", **kw)
        bcsr = run_tam(g, raw, small_ds.features,
                       small_ds.normal_label_idx, impl="bcsr", **kw)
        np.testing.assert_allclose(bcsr.scores, ell.scores,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(bcsr.per_round_scores,
                                   ell.per_round_scores,
                                   rtol=1e-4, atol=1e-5)

    def test_tam_bcsr_failure_falls_back_to_ell(self, small_ds,
                                                monkeypatch):
        """A block-diag compile failure (amazon-density programs can
        exceed the remote AOT compile helper, round-5 zoo) reroutes to
        the shared-ELL ensemble instead of dying."""
        import ggad_tpu.models.tam as tam_mod
        from ggad_tpu.models.tam import run_tam

        def boom(*a, **k):
            raise RuntimeError("HTTP 500: tpu_compile_helper")

        monkeypatch.setattr(tam_mod, "_train_ensemble_bcsr", boom)
        g = from_scipy(small_ds.adj)
        raw = add_self_loops(g)
        kw = dict(n_h=12, cutting=2, n_tree=1, num_epoch=4, lr=1e-4,
                  seed=0)
        res = run_tam(g, raw, small_ds.features,
                      small_ds.normal_label_idx, impl="bcsr", **kw)
        ell = run_tam(g, raw, small_ds.features,
                      small_ds.normal_label_idx, impl="ell", **kw)
        np.testing.assert_allclose(res.scores, ell.scores,
                                   rtol=1e-5, atol=1e-6)

    def test_tam_member_chunk_invariant(self, small_ds):
        """Full-ensemble vmap (shared-structure ELL) must reproduce the
        sequential member_chunk=1 trajectories (the reference trains
        members sequentially, tam.py:173-201)."""
        from ggad_tpu.graph import add_self_loops, from_scipy
        from ggad_tpu.models.tam import run_tam

        g = from_scipy(small_ds.adj)
        raw = add_self_loops(g)
        kw = dict(n_h=16, cutting=3, n_tree=1, num_epoch=10, lr=1e-4,
                  seed=0)
        full = run_tam(g, raw, small_ds.features,
                       small_ds.normal_label_idx, **kw)
        seq = run_tam(g, raw, small_ds.features,
                      small_ds.normal_label_idx, member_chunk=1, **kw)
        np.testing.assert_allclose(full.scores, seq.scores,
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["dominant-minibatch",
                                  "anomalydae-minibatch",
                                  "aegis-minibatch"])
def test_minibatch_recon_baselines_smoke(name):
    from ggad_tpu.datasets.splits import minibatch_split
    from ggad_tpu.train.baselines import run_minibatch_recon

    ds = synthetic_gad(n_nodes=500, avg_degree=8, feat_dim=12,
                       anomaly_rate=0.08, seed=9)
    adj = ds.adj + sp.eye(ds.n_nodes, format="csr", dtype=np.float32)
    idx_train, idx_valid, idx_test, labels, _ = minibatch_split(
        ds.ano_labels, seed=0)
    res = run_minibatch_recon(name, adj, ds.features, labels, idx_train,
                              idx_valid, idx_test, emb_dim=16,
                              batch_size=32, num_batches=8, num_epochs=3)
    assert np.isfinite(res["test_auc"]), res
