"""RWR subgraph sampler + pick_step (capability parity for reference
dead code — utils.py:151-172, src/utils.py:133-137)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ggad_tpu.sampler.neighbor import NeighborTable
from ggad_tpu.sampler.rwr import pick_step, rwr_subgraphs, rwr_traces


def _grid_graph(n_side=8):
    """Connected 2-D grid (deterministic neighborhood structure)."""
    n = n_side * n_side
    rows, cols = [], []
    for i in range(n_side):
        for j in range(n_side):
            u = i * n_side + j
            for di, dj in ((0, 1), (1, 0)):
                if i + di < n_side and j + dj < n_side:
                    v = (i + di) * n_side + (j + dj)
                    rows += [u, v]
                    cols += [v, u]
    return sp.csr_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(n, n))


def test_rwr_traces_stay_in_neighborhoods():
    mat = _grid_graph()
    table = NeighborTable.from_scipy(mat)
    seeds = jnp.asarray([0, 27, 63], jnp.int32)
    trace = rwr_traces(table, seeds, walk_len=20, restart_prob=0.3,
                       rng=jax.random.PRNGKey(0))
    assert trace.shape == (3, 20)
    # every transition is either an edge or a restart to the seed
    indptr, indices = mat.indptr, mat.indices
    t = np.asarray(trace)
    cur = np.asarray(seeds)
    for step in range(20):
        for k in range(3):
            nbrs = set(indices[indptr[cur[k]]:indptr[cur[k] + 1]])
            assert t[k, step] in nbrs or t[k, step] == int(seeds[k])
        cur = t[:, step]


def test_rwr_subgraphs_shapes_and_uniqueness():
    mat = _grid_graph()
    table = NeighborTable.from_scipy(mat)
    seeds = jnp.arange(10, dtype=jnp.int32)
    nodes, mask = rwr_subgraphs(table, seeds, subgraph_size=8,
                                restart_prob=0.4,
                                rng=jax.random.PRNGKey(1))
    assert nodes.shape == (10, 8) and mask.shape == (10, 8)
    nodes, mask = np.asarray(nodes), np.asarray(mask)
    for i in range(10):
        assert nodes[i, 0] == i and mask[i, 0] == 1.0   # seed in slot 0
        live = nodes[i][mask[i] > 0]
        assert len(np.unique(live)) == len(live)        # no duplicates
        assert len(live) >= 2                           # walked somewhere


def test_rwr_zero_degree_seed():
    mat = sp.csr_matrix((5, 5), dtype=np.float32)      # no edges at all
    table = NeighborTable.from_scipy(mat)
    nodes, mask = rwr_subgraphs(table, jnp.asarray([3], jnp.int32),
                                subgraph_size=4,
                                rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(nodes)[0], [3, 3, 3, 3])
    np.testing.assert_array_equal(np.asarray(mask)[0], [1, 0, 0, 0])


def test_pick_step_weights():
    """Sampling frequencies follow degree/lf weights (reference
    src/utils.py:133-137 semantics)."""
    idx = jnp.asarray([0, 1, 2, 3], jnp.int32)
    y = jnp.asarray([0, 0, 1, 0], jnp.int32)
    deg = jnp.asarray([1.0, 10.0, 10.0, 1.0])
    out = np.asarray(pick_step(idx, y, deg, 4000, jax.random.PRNGKey(0)))
    counts = np.bincount(out, minlength=4).astype(float)
    # expected unnormalized: deg/lf with lf = (1-4)*y + 4 -> [4,4,1,4]
    w = np.array([1 / 4, 10 / 4, 10 / 1, 1 / 4])
    w = w / w.sum()
    np.testing.assert_allclose(counts / counts.sum(), w, atol=0.03)
