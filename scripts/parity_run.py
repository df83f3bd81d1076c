"""One-command real-dataset quality-parity harness.

The six GAD benchmarks are external downloads (absent from this
environment); the day the files appear, parity is:

    python scripts/parity_run.py --all [--data_dir ./dataset]

For each dataset this runs the PINNED reference settings (registry
presets: lr, epochs, perturbation, seed fraction — reference
``run.py:38-66``, ``utils.py:137-140``) on the real data, records
AUROC/AP, appends a results table to BASELINE.md, and prints the exact
reference command whose numbers are the parity oracle (reference
``run.py:236-240``, ``src/model_handler.py:404-413``).

REFUSES synthetic fallback: a missing file is an error, never a silently
bogus "parity" number (``load_dataset(allow_synthetic=False)``).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FULL_BATCH = ["photo", "reddit", "elliptic", "t_finance", "Amazon"]

REFERENCE_RECIPES = {
    **{name: f"cd /root/reference && python run.py --dataset {name}"
       for name in FULL_BATCH},
    "dgraphfin": "cd /root/reference/src && python main.py "
                 "--config dgraph.yml",
}


def run_full_batch(name: str, args) -> dict:
    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.datasets.registry import preset_for
    from ggad_tpu.train.full_batch import FullBatchTrainer

    preset = preset_for(name)
    aucs, aps = [], []
    t0 = time.time()
    for seed in range(args.seeds):
        ds = load_dataset(name, data_dir=args.data_dir, seed=seed,
                          allow_synthetic=False)
        tr = FullBatchTrainer(
            ds, seed=seed,
            num_epoch=args.num_epoch or preset.num_epoch,
            lr=preset.lr, embedding_dim=300,
            eval_every=max((args.num_epoch or preset.num_epoch) // 4, 1),
            spmm_impl=args.spmm_impl, spmm_dtype=args.spmm_dtype,
            scan_steps=args.scan_steps)
        res = tr.train(verbose=args.verbose)
        aucs.append(res.final_auc)
        aps.append(res.final_ap)
    import numpy as np
    return {
        "dataset": name, "model": "ggad", "path": "full-batch",
        "seeds": args.seeds,
        "auc_mean": float(np.mean(aucs)),
        "auc_std": float(np.std(aucs, ddof=1)) if args.seeds > 1 else 0.0,
        "ap_mean": float(np.mean(aps)),
        "ap_std": float(np.std(aps, ddof=1)) if args.seeds > 1 else 0.0,
        "epochs": args.num_epoch or preset.num_epoch,
        "wall_s": round(time.time() - t0, 1),
    }


def run_dgraph(args) -> dict:
    import numpy as np
    import scipy.sparse as sp

    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.datasets.splits import minibatch_split_for
    from ggad_tpu.train.minibatch import MiniBatchTrainer

    t0 = time.time()
    ds = load_dataset("dgraphfin", data_dir=args.data_dir, seed=0,
                      allow_synthetic=False)
    adj = ds.adj + sp.eye(ds.n_nodes, format="csr", dtype=np.float32)
    idx_train, idx_valid, idx_test, labels, idx_anom = minibatch_split_for(
        "dgraphfin", ds.ano_labels, seed=72)
    # reference src/dgraph.yml: emb 64, lr 1e-3, wd 0.007, 1500 epochs,
    # valid every 5 (args.dgraph_epochs shortens for smoke runs)
    tr = MiniBatchTrainer(
        adj=adj, features=ds.features, labels=labels,
        idx_train=idx_train, idx_anomaly=idx_anom,
        idx_valid=idx_valid, idx_test=idx_test,
        emb_dim=64, lr=1e-3, weight_decay=0.007,
        num_epochs=args.dgraph_epochs, valid_epochs=5, seed=72)
    res = tr.train(verbose=args.verbose)
    out = {"dataset": "dgraphfin", "model": "ggad", "path": "minibatch",
           "seeds": 1, "epochs": args.dgraph_epochs,
           "auc_mean": res.test_metrics["auc"],
           "auc_std": 0.0,
           "ap_mean": res.test_metrics["ap"], "ap_std": 0.0,
           "wall_s": round(time.time() - t0, 1)}
    return out


def append_baseline_md(rows: list[dict]) -> None:
    stamp = datetime.date.today().isoformat()
    lines = [
        "",
        f"## Real-dataset parity run ({stamp}, scripts/parity_run.py)",
        "",
        "| dataset | path | seeds | AUROC | AP | epochs | wall s | "
        "reference oracle command |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        auc = f"{r['auc_mean']:.4f}"
        ap = f"{r['ap_mean']:.4f}"
        if r["seeds"] > 1:
            auc += f" ± {r['auc_std']:.4f}"
            ap += f" ± {r['ap_std']:.4f}"
        lines.append(
            f"| {r['dataset']} | {r['path']} | {r['seeds']} | {auc} | "
            f"{ap} | {r['epochs']} | {r['wall_s']} | "
            f"`{REFERENCE_RECIPES[r['dataset']]}` |")
    path = os.path.join(os.path.dirname(__file__), "..", "BASELINE.md")
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended {len(rows)} rows to BASELINE.md")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="run every dataset with a real file on disk; "
                         "error if none")
    ap.add_argument("--dataset", type=str, default=None)
    ap.add_argument("--data_dir", type=str, default=None)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--num_epoch", type=int, default=None,
                    help="override the preset budget (smoke runs)")
    ap.add_argument("--dgraph_epochs", type=int, default=1500)
    ap.add_argument("--spmm_impl", type=str, default="auto")
    ap.add_argument("--spmm_dtype", type=str, default="float32")
    ap.add_argument("--scan_steps", type=int, default=25)
    ap.add_argument("--no_append", action="store_true",
                    help="print results only, don't touch BASELINE.md")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    targets = ([args.dataset] if args.dataset
               else FULL_BATCH + ["dgraphfin"] if args.all else None)
    if not targets:
        raise SystemExit("pass --dataset NAME or --all")

    rows = []
    for name in targets:
        try:
            if name == "dgraphfin":
                row = run_dgraph(args)
            else:
                row = run_full_batch(name, args)
        except FileNotFoundError as e:
            print(f"[skip] {name}: {e}", file=sys.stderr)
            continue
        print(json.dumps(row))
        print(f"  reference oracle: {REFERENCE_RECIPES[name]}")
        rows.append(row)

    if not rows:
        raise SystemExit(
            "no real dataset files found — parity_run refuses to run on "
            "synthetic fallback (see BASELINE.md TODO for downloads)")
    if not args.no_append:
        append_baseline_md(rows)
    print(json.dumps({"parity_rows": len(rows)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
