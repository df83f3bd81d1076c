"""Multilevel graph partitioner tests (datasets/partition.py)."""

import numpy as np
import scipy.sparse as sp

from ggad_tpu.datasets.partition import (
    cut_fraction,
    lp_partition,
    multilevel_partition,
    partition_order,
    reorder_lp,
)
from ggad_tpu.datasets.synthetic import synthetic_gad


def _community_ds(intra=0.98, n_comm=16):
    return synthetic_gad(name="part_test", n_nodes=4000, avg_degree=20,
                         feat_dim=8, n_communities=n_comm,
                         intra_frac=intra, anomaly_rate=0.05, seed=0,
                         seed_frac=0.15)


def test_multilevel_partition_balance_and_cut():
    ds = _community_ds()
    block = -(-4000 // 8)
    part = multilevel_partition(ds.adj, 8, exact_block=block)
    sizes = np.bincount(part, minlength=8)
    assert sizes.max() == block            # exact fixed blocks
    assert sizes.min() >= 4000 - 7 * block
    # near the information floor: ~2% random cross edges + anomalies;
    # a random partition would cut ~7/8 of edges
    assert cut_fraction(ds.adj, part) < 0.12


def test_multilevel_beats_flat_lp_on_community_graph():
    ds = _community_ds()
    ml = multilevel_partition(ds.adj, 8)
    flat = lp_partition(ds.adj, 8)
    assert cut_fraction(ds.adj, ml) <= cut_fraction(ds.adj, flat) + 0.01


def test_partition_order_contiguity():
    part = np.array([2, 0, 1, 0, 2, 1], np.int32)
    perm = partition_order(part)
    np.testing.assert_array_equal(part[perm], np.sort(part))


def test_reorder_lp_preserves_graph():
    ds = _community_ds(intra=0.9, n_comm=8)
    ds2 = reorder_lp(ds, 4)
    # permutation: same edge count, same degree multiset, same labels
    assert ds2.adj.nnz == ds.adj.nnz
    np.testing.assert_array_equal(
        np.sort(np.diff(ds2.adj.indptr)), np.sort(np.diff(ds.adj.indptr)))
    assert ds2.ano_labels.sum() == ds.ano_labels.sum()
    # and the labeled sets still point at normal/relabeled nodes
    assert np.all(ds2.ano_labels[ds2.normal_label_idx] == 0)
    # the reorder shrinks (or keeps) the cross-block edge fraction
    def cross(adj, d):
        coo = adj.tocoo()
        r = -(-adj.shape[0] // d)
        return ((coo.row // r) != (coo.col // r)).mean()
    assert cross(ds2.adj, 4) <= cross(ds.adj, 4)


def test_hem_match_is_a_matching():
    from ggad_tpu import native

    ds = _community_ds(intra=0.9, n_comm=8)
    a = ds.adj.tocsr()
    partner = native.hem_match(a.indptr, a.indices, a.data)
    n = a.shape[0]
    assert partner.shape == (n,)
    # involution: partner[partner[i]] == i
    np.testing.assert_array_equal(partner[partner], np.arange(n))
    # a healthy fraction of nodes actually matched
    assert (partner != np.arange(n)).mean() > 0.5
