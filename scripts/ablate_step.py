"""Component ablation of the GGAD training step on one chip.

Times each compute component in isolation with the dispatch overhead
amortized away (K-deep lax.scan inside one jit; per-iteration time =
(T(2K) − T(K)) / K, same estimator as bench.py), so the numbers add up
against the full-step measurement and identify the next kernel target.

Usage: python scripts/ablate_step.py [--spmm_dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed_scan(fn, init, k, *ops, n_windows=3):
    """Median per-iteration seconds of `carry = fn(carry, *ops)` via
    paired K/2K scans. ``ops`` (graphs/tiles/features) enter as jit
    ARGUMENTS — closed-over tile stores ship with the remote-compile
    payload (HTTP 413 at 1024-tall photo tiles)."""
    import jax

    def make(steps):
        def run(c, *ops):
            return jax.lax.scan(lambda c, _: (fn(c, *ops), None), c,
                                None, length=steps)[0]
        return jax.jit(run)

    run_k, run_2k = make(k), make(2 * k)
    c = run_k(init, *ops)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    c = run_2k(c, *ops)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    est = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        c1 = run_k(init, *ops)
        jax.block_until_ready(jax.tree.leaves(c1)[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        c2 = run_2k(init, *ops)
        jax.block_until_ready(jax.tree.leaves(c2)[0])
        t2 = time.perf_counter() - t0
        est.append(max((t2 - t1) / k, 1e-9))
    return statistics.median(est)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spmm_dtype", default="bfloat16")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--graph", default="photo",
                    choices=["photo", "amazon", "elliptic"],
                    help="graph regime (amazon: dense BCSR; elliptic: "
                         "sparse → ELL auto-route)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.ops.normalize import normalize_adj_reference
    from ggad_tpu.ops.sddmm import l2_normalize_rows, node_affinity
    from ggad_tpu.ops.spmm import spmm
    from ggad_tpu.train.full_batch import FullBatchTrainer, maybe_bcsr

    if args.graph == "photo":
        ds = synthetic_gad(name="ablate", n_nodes=7535, avg_degree=31,
                           feat_dim=745, n_communities=8,
                           anomaly_rate=0.09, seed=0, seed_frac=0.15)
    else:
        from ggad_tpu.datasets.synthetic import synthetic_like
        ds = synthetic_like(
            {"amazon": "Amazon", "elliptic": "elliptic"}[args.graph],
            seed=0)
    adj_g, raw_g = normalize_adj_reference(from_scipy(ds.adj))
    # 'auto' routes exactly like the trainer (elliptic → ELL tables)
    adj = maybe_bcsr(adj_g, "auto", dtype=args.spmm_dtype)
    raw = maybe_bcsr(raw_g, "auto", dtype=args.spmm_dtype)
    print(json.dumps({"graph": args.graph, "n": int(ds.n_nodes),
                      "e": int(ds.n_edges),
                      "adj_repr": type(adj).__name__}), flush=True)
    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(ds.n_nodes, 300)).astype(np.float32))

    rows = {}

    # SpMM forward (kernel)
    rows["spmm_fwd"] = timed_scan(
        lambda c, a: spmm(a, c) * 1e-3 + c * 0.5, h, args.k, adj)
    # SpMM forward+backward
    g_spmm = jax.grad(lambda c, a: jnp.sum(spmm(a, c) ** 2) * 1e-6)
    rows["spmm_fwd_bwd"] = timed_scan(
        lambda c, a: g_spmm(c, a) * 1e-3 + c * 0.5, h, args.k, adj)
    # affinity forward
    rows["affinity_fwd"] = timed_scan(
        lambda c, r: c * 0.5 + jnp.mean(node_affinity(r, c)) * 1e-3,
        h, args.k, raw)
    # affinity forward+backward
    g_aff = jax.grad(lambda c, r: jnp.sum(node_affinity(r, c)) * 1e-6)
    rows["affinity_fwd_bwd"] = timed_scan(
        lambda c, r: g_aff(c, r) * 1e-3 + c * 0.5, h, args.k, raw)
    # row normalize alone (elementwise + reduction)
    rows["l2_normalize"] = timed_scan(
        lambda c: l2_normalize_rows(c) * 0.5 + c * 0.5, h, args.k)

    # subset affinity (the production margin path) fwd+bwd — route like
    # the trainer: rect ELL tables on the ELL regime, edge-parallel
    # otherwise (the BCSR tile variant is covered by full_step)
    from ggad_tpu.ops.ell_spmm import ELLGraph, ell_affinity_subset
    from ggad_tpu.ops.sddmm import affinity_subset, node_affinity_at
    labeled = np.concatenate(
        [ds.normal_label_idx, ds.abnormal_label_idx])
    if isinstance(raw, ELLGraph):
        sub = ell_affinity_subset(raw_g, labeled, dtype=args.spmm_dtype)
    else:
        sub = affinity_subset(raw_g, labeled)
    g_sub = jax.grad(
        lambda c, sb: jnp.sum(node_affinity_at(sb, c)) * 1e-6)
    rows["affinity_subset_fwd_bwd"] = timed_scan(
        lambda c, sb: g_sub(c, sb) * 1e-3 + c * 0.5, h, args.k, sub)

    # full training step for reference
    tr = FullBatchTrainer(ds, num_epoch=1, noise_mean=0.02,
                          noise_std=0.01, embedding_dim=300,
                          spmm_dtype=args.spmm_dtype)
    rng = jax.random.PRNGKey(0)
    params, opt_state = tr.init(rng)

    def full(carry, adj_t, raw_t, feats, seed_adj_t, aff_sub_t, ax_t):
        params, opt_state, key = carry
        key, sk = jax.random.split(key)
        params, opt_state, _ = tr._train_step_impl(
            params, opt_state, sk, adj_t, raw_t, feats,
            tr.seed_idx, tr.normal_idx, seed_adj_t, aff_sub_t, ax_t)
        return params, opt_state, key

    rows["full_step"] = timed_scan(full, (params, opt_state, rng),
                                   args.k, tr.adj, tr.raw_adj,
                                   tr.features, tr.seed_adj, tr.aff_sub,
                                   tr.ax)

    out = {k: round(v * 1e3, 3) for k, v in rows.items()}
    out["backend"] = jax.default_backend()
    out["spmm_dtype"] = args.spmm_dtype
    print(json.dumps(out))


if __name__ == "__main__":
    main()
