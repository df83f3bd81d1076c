import numpy as np
import scipy.sparse as sp

from ggad_tpu.graph import add_self_loops, from_coo, from_scipy, to_scipy


def random_csr(rng, n=50, density=0.1):
    mat = sp.random(n, n, density=density, random_state=np.random.RandomState(0),
                    format="csr", dtype=np.float32)
    return mat


def test_roundtrip_scipy(rng):
    mat = random_csr(rng)
    g = from_scipy(mat)
    back = to_scipy(g)
    assert np.allclose(mat.toarray(), back.toarray())
    assert g.n_edges == mat.nnz
    assert g.row.dtype == np.int32


def test_padding_and_sorting(rng):
    row = np.array([3, 1, 1, 0])
    col = np.array([0, 2, 1, 3])
    val = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    g = from_coo(row, col, val, 5)
    r = np.asarray(g.row)[: g.n_edges]
    assert np.all(np.diff(r) >= 0)
    # padding edges contribute zero
    assert np.asarray(g.val)[g.n_edges:].sum() == 0


def test_degrees(rng):
    mat = random_csr(rng)
    g = from_scipy(mat)
    np.testing.assert_allclose(
        np.asarray(g.out_degrees()), np.asarray(mat.sum(1)).ravel(),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g.in_degrees()), np.asarray(mat.sum(0)).ravel(),
        rtol=1e-6)


def test_add_self_loops(rng):
    mat = random_csr(rng)
    g = from_scipy(mat)
    g2 = add_self_loops(g)
    expect = (mat + sp.eye(mat.shape[0])).toarray()
    np.testing.assert_allclose(to_scipy(g2).toarray(), expect, rtol=1e-6)


def test_indptr(rng):
    mat = random_csr(rng)
    g = from_scipy(mat)
    csr = mat.tocsr()
    np.testing.assert_array_equal(np.asarray(g.indptr), csr.indptr)
