"""DGraph-scale mini-batch GGAD run (synthetic when dgraphfin.npz absent).

Demonstrates the sampled-neighborhood pipeline at millions of nodes /
tens of millions of edges on one chip: device-resident CSR neighbor
table, jitted sample+aggregate+loss+Adam step, reference batch
composition (150 train + 50 seed slots, ``src/model_handler.py:330-348``).

Usage: python scripts/run_dgraph.py [--scale 0.3] [--epochs 3]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import scipy.sparse as sp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.3,
                    help="fraction of DGraph's 3.7M nodes")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--num_batches", type=int, default=150)
    ap.add_argument("--data_dir", type=str, default=None,
                    help="directory holding dgraphfin.npz")
    ap.add_argument("--require_real", action="store_true",
                    help="refuse the synthetic fallback (error when "
                         "dgraphfin.npz is absent)")
    ap.add_argument("--partition", type=int, default=0,
                    help="also time the multilevel partitioner into this "
                         "many parts (the D-chip edge-partition prep)")
    ap.add_argument("--out", type=str, default=None,
                    help="append the result JSON line to this file")
    args = ap.parse_args()

    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.datasets.splits import minibatch_split
    from ggad_tpu.train.minibatch import MiniBatchTrainer

    t0 = time.time()
    ds = load_dataset("dgraphfin", data_dir=args.data_dir,
                      synthetic_scale=args.scale, seed=0,
                      allow_synthetic=not args.require_real)
    print(f"dataset: {ds.name} {ds.n_nodes}N {ds.n_edges}E {ds.feat_dim}F "
          f"({time.time() - t0:.1f}s to build)", flush=True)

    t0 = time.time()
    adj = ds.adj + sp.eye(ds.n_nodes, format="csr", dtype=np.float32)
    idx_train, idx_valid, idx_test, labels, idx_anom = minibatch_split(
        ds.ano_labels, seed=72, contamination_frac=0.2)
    print(f"split: train {len(idx_train)} valid {len(idx_valid)} "
          f"test {len(idx_test)} seeds {len(idx_anom)} "
          f"({time.time() - t0:.1f}s)", flush=True)

    part_s = None
    if args.partition > 1:
        from ggad_tpu.datasets.partition import multilevel_partition

        t0 = time.time()
        labels_p = multilevel_partition(ds.adj, args.partition)
        part_s = time.time() - t0
        sizes = np.bincount(labels_p, minlength=args.partition)
        print(f"partition into {args.partition}: {part_s:.1f}s, "
              f"sizes {sizes.min()}–{sizes.max()}", flush=True)

    tr = MiniBatchTrainer(
        adj=adj, features=ds.features, labels=labels,
        idx_train=idx_train, idx_anomaly=idx_anom,
        idx_valid=idx_valid, idx_test=idx_test,
        emb_dim=64, num_epochs=args.epochs,
        num_batches=args.num_batches, valid_epochs=max(args.epochs - 1, 1),
        eval_batch=2048)

    t0 = time.time()
    res = tr.train(verbose=True)
    steps = args.epochs * args.num_batches

    import jax
    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {"hbm_in_use_GB": round(
                   stats.get("bytes_in_use", 0) / 2**30, 2),
               "hbm_peak_GB": round(
                   stats.get("peak_bytes_in_use", 0) / 2**30, 2)}
    except Exception:
        pass

    out = {
        "nodes": ds.n_nodes, "edges": ds.n_edges,
        "scale": args.scale,
        "steps": steps,
        "steps_per_s": round(steps / res.wall_time_s, 2),
        "train_steps_per_s": round(
            steps / max(res.train_time_s, 1e-9), 2),
        "train_time_s": round(res.train_time_s, 1),
        "best_val_auc": round(res.best_val_auc, 4),
        "test_auc": round(res.test_metrics["auc"], 4),
        "test_ap": round(res.test_metrics["ap"], 4),
        "wall_s": round(res.wall_time_s, 1),
        **mem,
    }
    if part_s is not None:
        out["partition_s"] = round(part_s, 1)
        out["partition_parts"] = args.partition
    print(json.dumps(out))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
