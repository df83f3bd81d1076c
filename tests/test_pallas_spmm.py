"""BCSR Pallas SpMM tests (interpret mode on the CPU test platform;
the same kernel compiles to Mosaic on TPU — see bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ggad_tpu.graph import from_scipy
from ggad_tpu.ops.pallas_spmm import (
    BCSRGraph,
    as_bcsr_graph,
    bcsr_from_coo,
    bcsr_spmm,
)
from ggad_tpu.ops.spmm import spmm


def random_graph(n=200, density=0.05, seed=0):
    return sp.random(n, n, density=density,
                     random_state=np.random.RandomState(seed),
                     format="csr", dtype=np.float32)


def test_bcsr_structure(rng):
    mat = random_graph(300)
    g = from_scipy(mat)
    b = as_bcsr_graph(g)
    rows = np.asarray(b.tiles.fwd.tile_rows)
    assert np.all(np.diff(rows) >= 0)  # sorted by tile-row
    assert b.tiles.fwd.n_rows % 128 == 0
    # values reassemble to the original matrix (tile shape from store)
    tr, tc = b.tiles.fwd.values.shape[-2:]
    dense = np.zeros((b.tiles.fwd.n_rows, b.tiles.fwd.n_cols), np.float32)
    vals = np.asarray(b.tiles.fwd.values)
    cols = np.asarray(b.tiles.fwd.tile_cols)
    for t in range(b.tiles.fwd.n_tiles):
        r, c = rows[t] * tr, cols[t] * tc
        dense[r:r + tr, c:c + tc] = vals[t]
    np.testing.assert_allclose(dense[:300, :300], mat.toarray(), rtol=1e-6)


def test_bcsr_tall_tiles_match(rng):
    """Tall tile stores (tile_rows > 128) give identical SpMM values and
    gradients; the square SDDMM colsum works on them too."""
    import pytest

    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.ops.pallas_sddmm import bcsr_sddmm_colsum
    from ggad_tpu.ops.sddmm import l2_normalize_rows, node_affinity

    mat = random_graph(300, density=0.08, seed=4)
    mat = ((mat + mat.T) > 0).astype(np.float32)
    raw = add_self_loops(from_scipy(sp.csr_matrix(mat)))
    x = jnp.asarray(rng.normal(size=(300, 48)).astype(np.float32))
    expect = np.asarray(spmm(raw, x, impl="xla"))
    for tr in (256, 512):
        b = as_bcsr_graph(raw, tile_rows=tr)
        assert b.tiles.fwd.values.shape[-2] == tr
        out = np.asarray(bcsr_spmm(b.tiles, x))
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

        def f_tiles(h, b=b):
            return jnp.sum(bcsr_spmm(b.tiles, h) ** 2)

        def f_xla(h):
            return jnp.sum(spmm(raw, h, impl="xla") ** 2)

        g_t = np.asarray(jax.grad(f_tiles)(x))
        g_x = np.asarray(jax.grad(f_xla)(x))
        np.testing.assert_allclose(g_t, g_x, rtol=1e-4, atol=1e-4)

        num = np.asarray(bcsr_sddmm_colsum(b.tiles, l2_normalize_rows(x)))
        den = np.asarray(raw.in_degrees())
        aff = num * np.where(den != 0, 1.0 / den, 0.0)
        aff_ref = np.asarray(node_affinity(raw, x))
        np.testing.assert_allclose(aff, aff_ref, rtol=1e-4, atol=1e-5)


def test_pick_tile_rows_density_aware():
    """Tall tiles only when the store stays compact: dense-ish block
    graphs pick the tallest candidate (1024, round-4 study: fastest on
    both photo and amazon regimes), row-scattered ultra-sparse graphs
    stay at 128."""
    from ggad_tpu.ops.pallas_spmm import pick_tile_rows

    rng = np.random.default_rng(0)
    n = 2048
    # dense community block: every 128-tile in a column stripe occupied
    row = rng.integers(0, n, 40000)
    col = rng.integers(0, n, 40000)
    assert pick_tile_rows(row, col, n) == 1024
    # one edge per tile-row, distinct columns → tall tiles pure waste
    row2 = np.arange(0, n, 128)
    col2 = (np.arange(len(row2)) * 128) % n
    assert pick_tile_rows(row2, col2, n) == 128


def test_bcsr_spmm_matches_dense(rng):
    mat = random_graph(200)
    g = from_scipy(mat)
    b = as_bcsr_graph(g)
    x = jnp.asarray(rng.normal(size=(200, 64)).astype(np.float32))
    out = np.asarray(bcsr_spmm(b.tiles, x))
    np.testing.assert_allclose(out, mat.toarray() @ np.asarray(x),
                               rtol=1e-4, atol=1e-4)


def test_bcsr_spmm_grad_matches_dense(rng):
    mat = random_graph(150, density=0.1)
    g = from_scipy(mat)
    b = as_bcsr_graph(g)
    x = jnp.asarray(rng.normal(size=(150, 32)).astype(np.float32))

    grad = jax.grad(lambda x: jnp.sum(bcsr_spmm(b.tiles, x) ** 2))(x)
    a = mat.toarray()
    expect = 2 * a.T @ (a @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), expect, rtol=1e-3,
                               atol=1e-3)


def test_spmm_dispatch_on_bcsr_graph(rng):
    mat = random_graph(100)
    g = from_scipy(mat)
    b = as_bcsr_graph(g)
    x = jnp.asarray(rng.normal(size=(100, 16)).astype(np.float32))
    out_b = np.asarray(spmm(b, x))
    out_x = np.asarray(spmm(g, x, impl="xla"))
    np.testing.assert_allclose(out_b, out_x, rtol=1e-4, atol=1e-4)


def test_nonsquare_feature_dims(rng):
    """d not a multiple of 128 must pad/unpad transparently."""
    mat = random_graph(130)
    b = as_bcsr_graph(from_scipy(mat))
    for d in (1, 17, 300):
        x = jnp.asarray(rng.normal(size=(130, d)).astype(np.float32))
        out = np.asarray(bcsr_spmm(b.tiles, x))
        np.testing.assert_allclose(out, mat.toarray() @ np.asarray(x),
                                   rtol=1e-4, atol=1e-4)


def test_ggad_model_with_bcsr_adjacency(rng):
    """Full GGAD forward over a BCSRGraph equals the XLA path."""
    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.models.ggad import GGAD
    from ggad_tpu.ops.normalize import normalize_adj_reference

    ds = synthetic_gad(n_nodes=120, avg_degree=6, feat_dim=8, seed=2)
    adj, raw = normalize_adj_reference(from_scipy(ds.adj))
    badj = as_bcsr_graph(adj)
    x = jnp.asarray(ds.features)
    si = jnp.asarray(ds.abnormal_label_idx, jnp.int32)
    ni = jnp.asarray(ds.normal_label_idx, jnp.int32)
    model = GGAD(n_h=16, noise_std=0.0)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        adj, x, si, ni, train=True)
    out_x = model.apply(params, adj, x, si, ni, train=True,
                        rngs={"noise": jax.random.PRNGKey(2)})
    out_b = model.apply(params, badj, x, si, ni, train=True,
                        rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(out_x.emb),
                               np.asarray(out_b.emb), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_x.logits),
                               np.asarray(out_b.logits), rtol=1e-4,
                               atol=1e-4)


def test_bcsr_sddmm_colsum_matches_xla(rng):
    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.ops.pallas_sddmm import bcsr_sddmm_colsum
    from ggad_tpu.ops.sddmm import l2_normalize_rows, node_affinity

    mat = random_graph(150, density=0.08, seed=3)
    mat = ((mat + mat.T) > 0).astype(np.float32)
    g = add_self_loops(from_scipy(sp.csr_matrix(mat)))
    b = as_bcsr_graph(g)
    emb = jnp.asarray(rng.normal(size=(150, 20)).astype(np.float32))
    emb_n = l2_normalize_rows(emb)

    num = np.asarray(bcsr_sddmm_colsum(b.tiles, emb_n))
    e = np.asarray(emb_n)
    from ggad_tpu.graph import to_scipy
    a = to_scipy(g).toarray()
    expect = (a * (e @ e.T)).sum(0)
    np.testing.assert_allclose(num, expect, rtol=1e-4, atol=1e-4)

    # full affinity dispatch equality + gradient equality
    aff_b = np.asarray(node_affinity(b, emb))
    aff_x = np.asarray(node_affinity(g, emb))
    np.testing.assert_allclose(aff_b, aff_x, rtol=1e-4, atol=1e-4)

    def loss_b(e):
        return jnp.sum(node_affinity(b, e) ** 2)

    def loss_x(e):
        return jnp.sum(node_affinity(g, e) ** 2)

    g_b = np.asarray(jax.grad(loss_b)(emb))
    g_x = np.asarray(jax.grad(loss_x)(emb))
    np.testing.assert_allclose(g_b, g_x, rtol=1e-3, atol=1e-4)


def test_bcsr_bf16_mode_close(rng):
    """bf16 tile mode: same math at reduced precision (loose tolerance)."""
    mat = random_graph(200, density=0.08, seed=5)
    g = from_scipy(mat)
    b16 = as_bcsr_graph(g, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(200, 64)).astype(np.float32))
    out = np.asarray(bcsr_spmm(b16.tiles, x))
    expect = mat.toarray() @ np.asarray(x)
    scale = np.abs(expect).max()
    assert np.abs(out - expect).max() < 0.05 * scale
    # grads still flow
    grad = jax.grad(lambda x: jnp.sum(bcsr_spmm(b16.tiles, x) ** 2))(x)
    a = mat.toarray()
    eg = 2 * a.T @ (a @ np.asarray(x))
    assert np.abs(np.asarray(grad) - eg).max() < 0.05 * np.abs(eg).max()


def test_tile_affinity_subset_matches_full(rng):
    """Rect-tile column-subset affinity == full node_affinity at the
    requested nodes, values AND gradients (interpret mode)."""
    import jax

    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.ops.sddmm import (
        node_affinity,
        node_affinity_at,
        tile_affinity_subset,
    )

    mat = random_graph(260, seed=9)
    raw = add_self_loops(from_scipy(mat))
    idx = np.concatenate([np.arange(40), np.arange(10)])  # with repeats
    sub = tile_affinity_subset(raw, idx)
    emb = jnp.asarray(rng.normal(size=(260, 48)).astype(np.float32))

    full = np.asarray(node_affinity(raw, emb))[idx]
    at = np.asarray(node_affinity_at(sub, emb))
    np.testing.assert_allclose(at, full, rtol=1e-4, atol=1e-5)

    g_at = jax.grad(lambda e: jnp.sum(
        jnp.sin(node_affinity_at(sub, e))))(emb)
    g_full = jax.grad(lambda e: jnp.sum(
        jnp.sin(node_affinity(raw, e)[jnp.asarray(idx)])))(emb)
    np.testing.assert_allclose(np.asarray(g_at), np.asarray(g_full),
                               rtol=1e-3, atol=1e-5)
