"""Native C++ graph-construction library parity tests.

Each native primitive is checked against a scipy/numpy oracle; if the
toolchain is unavailable the numpy fallbacks are exercised instead.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from ggad_tpu import native


@pytest.fixture
def coo(rng):
    r = rng.integers(0, 200, 2000).astype(np.int32)
    c = rng.integers(0, 200, 2000).astype(np.int32)
    v = rng.random(2000).astype(np.float32)
    return r, c, v


def test_sort_coo(coo):
    r, c, v = coo
    rs, cs, vs = native.sort_coo(r, c, v)
    key = rs.astype(np.int64) * 200 + cs
    assert np.all(np.diff(key) >= 0)
    # same multiset of edges
    order = np.lexsort((c, r))
    np.testing.assert_array_equal(rs, r[order])
    np.testing.assert_array_equal(cs, c[order])
    np.testing.assert_allclose(vs, v[order])


def test_symmetrize_matches_scipy_union(coo):
    r, c, v = coo
    # dedup input first so scipy and native agree on dup semantics
    key = r.astype(np.int64) * 200 + c
    _, first = np.unique(key, return_index=True)
    r, c, v = r[first], c[first], v[first]

    sr, sc, sv = native.symmetrize(r, c, v)
    a = sp.coo_matrix((v, (r, c)), shape=(200, 200)).tocsr()
    expect = a.maximum(a.T).tocoo()
    got = sp.coo_matrix((sv, (sr, sc)), shape=(200, 200))
    np.testing.assert_allclose(got.toarray(), expect.toarray(), rtol=1e-6)


def test_build_indptr(coo):
    r, c, v = coo
    rs, cs, vs = native.sort_coo(r, c, v)
    indptr = native.build_indptr(rs, 200)
    expect = np.zeros(201, np.int64)
    expect[1:] = np.cumsum(np.bincount(rs, minlength=200))
    np.testing.assert_array_equal(indptr, expect)


def test_sym_normalize(coo):
    r, c, v = coo
    nv = native.sym_normalize_vals(r, c, v, 200)
    deg = np.zeros(200)
    np.add.at(deg, r, v)
    dinv = np.where(deg > 0, deg ** -0.5, 0)
    np.testing.assert_allclose(nv, v * dinv[r] * dinv[c], rtol=1e-5)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_bcsr_build_matches_python(coo):
    r, c, v = coo
    rs, cs, vs = native.sort_coo(r, c, v)
    n_pad_tiles = 2  # 200 nodes → 256 padded → 2 tile cols
    tr, tc, vals = native.bcsr_build(rs, cs, vs, n_pad_tiles)
    dense = np.zeros((256, 256), np.float32)
    np.add.at(dense, (rs, cs), vs)
    rebuilt = np.zeros_like(dense)
    for t in range(len(tr)):
        rebuilt[tr[t] * 128:(tr[t] + 1) * 128,
                tc[t] * 128:(tc[t] + 1) * 128] = vals[t]
    np.testing.assert_allclose(rebuilt, dense, rtol=1e-5)


def test_host_sampler_valid(coo):
    r, c, v = coo
    rs, cs, _ = native.sort_coo(r, c, v)
    indptr = native.build_indptr(rs, 200).astype(np.int32)
    query = np.arange(50, dtype=np.int32)
    neigh, mask = native.sample_neighbors_host(query, indptr, cs, 8,
                                               seed=1)
    dense = np.zeros((200, 200), bool)
    dense[rs, cs] = True
    for i, q in enumerate(query):
        for k in range(8):
            if mask[i, k] > 0:
                assert dense[q, neigh[i, k]]
            else:
                assert neigh[i, k] == q
