"""Sampled-vs-exact 2-hop affinity bias study (SURVEY §7.4.5).

The reference's train-mode 2-hop expansion is the exact neighbor-set
union (``src/graphsage.py:331-358``); the production minibatch path
bounds it with K1×K2 fanout sampling (plus the sqrt(deg)·mean
normalization deviation documented in ``ggad_tpu/models/sage.py``).
This script quantifies what that costs:

  1. FROZEN-WEIGHTS bias: identical parameters, identical batches —
     per-batch affinity-margin loss (and total loss) under the exact
     masks (``ggad_tpu.models.sage_exact``) vs the sampled model at a
     fanout sweep, several sampling seeds each.
  2. END-METRIC: train both to completion on the same split/batch
     sequence and compare final test AUROC/AP per fanout.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/twohop_bias_study.py [--nodes 2000] [--epochs 8]

Writes a markdown table + JSON to stdout; results recorded in
docs/TWOHOP_BIAS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def map_params(p_exact):
    """Exact-path params → MiniBatchGGAD flax tree (transposes only)."""
    import jax.numpy as jnp

    return {"params": {
        "w_enc": jnp.asarray(p_exact["w_enc"].T),
        "w_score": jnp.asarray(p_exact["w_score"].T),
        "fc_gen": {"kernel": jnp.asarray(p_exact["fc"].T)},
    }}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2000)
    ap.add_argument("--degree", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n_batches", type=int, default=40)
    ap.add_argument("--sample_seeds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from ggad_tpu.datasets.splits import minibatch_split
    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.models.sage import MiniBatchGGAD, minibatch_ggad_losses
    from ggad_tpu.models.sage_exact import (
        build_exact_batch,
        exact_losses,
        init_exact_params,
    )
    from ggad_tpu.ops.normalize import row_normalize_smoothed
    from ggad_tpu.sampler.neighbor import NeighborTable
    from ggad_tpu.train.minibatch import MiniBatchTrainer

    ds = synthetic_gad(n_nodes=args.nodes, avg_degree=args.degree,
                       feat_dim=17, n_communities=4, anomaly_rate=0.08,
                       feature_noise=0.25, seed=2)
    feats_np = row_normalize_smoothed(ds.features)
    feats = jnp.asarray(feats_np)
    idx_train, idx_valid, idx_test, labels, idx_anom = minibatch_split(
        ds.ano_labels, seed=0, pseudo_anomaly_frac=0.05)
    # exact path: reference adjacency semantics — symmetrized, NO self
    # loops in the table (self enters at the 1-hop union only)
    a = sp.csr_matrix(ds.adj)
    adj_nosl = ((a + a.T) > 0).astype(np.float32).tocsr()
    # sampled path: NeighborTable over adj WITH self loops (its
    # documented convention)
    adj_sl = (adj_nosl + sp.eye(ds.n_nodes, format="csr",
                                dtype=np.float32)).tocsr()
    table = NeighborTable.from_scipy(adj_sl)

    # fixed batch sequence (150 train + 50 seeds, reference composition)
    host = np.random.default_rng(0)
    train_pool = np.asarray([i for i in idx_train if labels[i] == 0])
    batches = []
    for _ in range(args.n_batches):
        tr = host.choice(train_pool, 150, replace=False)
        an = host.choice(idx_anom, min(50, len(idx_anom)),
                         replace=len(idx_anom) < 50)
        nodes = np.concatenate([tr, an])
        batches.append((nodes, labels[nodes].astype(np.float32)))

    p0 = init_exact_params(jax.random.PRNGKey(7), feats.shape[1], 64)
    indptr, indices = adj_nosl.indptr, adj_nosl.indices
    u_pad = e_pad = 0
    for nodes, _ in batches:
        ns = [set(indices[indptr[n]: indptr[n + 1]].tolist()) | {int(n)}
              for n in nodes]
        uniq = set().union(*ns)
        exp = set().union(*[set(
            indices[indptr[n]: indptr[n + 1]].tolist()) for n in uniq])
        u_pad = max(u_pad, len(uniq))
        e_pad = max(e_pad, len(exp))
    u_pad = -(-u_pad // 64) * 64
    e_pad = -(-e_pad // 64) * 64

    exact_vals = []
    for nodes, lab in batches:
        b = build_exact_batch(indptr, indices, nodes, lab, u_pad, e_pad)
        total, (cls_, con, rec) = exact_losses(p0, feats, b)
        exact_vals.append((float(total), float(con)))

    fanouts = [(4, 3), (8, 4), (16, 8), (32, 16), (64, 32)]
    rows = []
    for f1, f2 in fanouts:
        model = MiniBatchGGAD(emb_dim=64, fanout1=f1, fanout2=f2)
        mp = map_params(p0)

        n_anom_static = min(50, len(idx_anom))

        @jax.jit
        def loss_of(params, batch_ids, key):
            out = model.apply(params, feats, table, batch_ids,
                              n_anom_static, rngs={"sample": key})
            ls = minibatch_ggad_losses(out, n_anom_static)
            return ls.total, ls.constraint

        dt, dc = [], []
        for s in range(args.sample_seeds):
            key = jax.random.PRNGKey(100 + s)
            for (nodes, lab), (et, ec) in zip(batches, exact_vals):
                key, sub = jax.random.split(key)
                t, c = loss_of(mp, jnp.asarray(nodes, jnp.int32), sub)
                dt.append(float(t) - et)
                dc.append(float(c) - ec)
        rows.append({
            "fanout": f"{f1}x{f2}",
            "d_constraint_mean": float(np.mean(dc)),
            "d_constraint_mad": float(np.mean(np.abs(dc))),
            "d_total_mean": float(np.mean(dt)),
            "d_total_mad": float(np.mean(np.abs(dt))),
        })

    # ---- end-metric: sampled trainer per fanout vs its own limit ----
    metric_rows = []
    for f1, f2 in fanouts:
        tr = MiniBatchTrainer(
            adj=adj_sl, features=ds.features, labels=labels,
            idx_train=idx_train, idx_anomaly=idx_anom,
            idx_valid=idx_valid, idx_test=idx_test, emb_dim=64,
            fanout1=f1, fanout2=f2, num_batches=args.n_batches,
            num_epochs=args.epochs, valid_epochs=2, seed=0)
        res = tr.train()
        metric_rows.append({"fanout": f"{f1}x{f2}",
                            "test_auc": res.test_metrics["auc"],
                            "test_ap": res.test_metrics["ap"]})

    print("\n## Frozen-weights affinity bias (exact − sampled, "
          f"{args.n_batches} batches × {args.sample_seeds} seeds)\n")
    print("| fanout | Δconstraint mean | Δconstraint MAD | Δtotal MAD |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['fanout']} | {r['d_constraint_mean']:+.4f} "
              f"| {r['d_constraint_mad']:.4f} | {r['d_total_mad']:.4f} |")
    print("\n## End-metric (sampled trainer, "
          f"{args.epochs} epochs)\n")
    print("| fanout | test AUROC | test AP |")
    print("|---|---|---|")
    for r in metric_rows:
        print(f"| {r['fanout']} | {r['test_auc']:.4f} "
              f"| {r['test_ap']:.4f} |")
    print("\n" + json.dumps({"bias": rows, "metrics": metric_rows}))


if __name__ == "__main__":
    main()
