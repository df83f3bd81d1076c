"""Train GGAD on all benchmark-shaped synthetic datasets; write RESULTS.md.

The reference's six real datasets are external downloads not present in
this environment (BASELINE.md), so quality numbers here are on seeded
synthetic graphs with the same shape profile (nodes/edges/features/
anomaly-rate) and the reference's per-dataset training budgets. When the
real ``.mat`` files are placed under ``./dataset``, the same script runs
them instead (the loader prefers disk data).

Usage: python scripts/run_results.py [--quick]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def run_baseline_zoo(quick: bool) -> list:
    """All six adapted baselines on photo/reddit-shaped graphs with the
    reference's budgets (reduced for --quick)."""
    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.train.baselines import (
        run_aegis,
        run_gaan,
        run_ocgnn,
        run_reconstruction,
        run_tam_baseline,
    )

    # full benchmark coverage (round-5: elliptic/Amazon/t_finance rows)
    datasets = [("photo", 1.0), ("reddit", 1.0), ("elliptic", 1.0),
                ("Amazon", 1.0), ("t_finance", 0.25)]
    epochs = 20 if quick else 100
    tam_epochs = 40 if quick else 500
    rows = []
    for name, scale in datasets:
        if quick:
            scale = min(scale, 0.2)
        ds = load_dataset(name, synthetic_scale=scale, seed=0)
        print(f"=== baselines on {ds.name} ===", flush=True)
        runs = {
            "dominant": lambda: run_reconstruction(
                "dominant", ds, num_epoch=epochs),
            "anomalydae": lambda: run_reconstruction(
                "anomalydae", ds, num_epoch=epochs),
            "ocgnn": lambda: run_ocgnn(ds, num_epoch=epochs),
            "aegis": lambda: run_aegis(ds, num_epoch=epochs),
            "aegis (faithful)": lambda: run_aegis(
                ds, num_epoch=epochs, faithful=True),
            "gaan": lambda: run_gaan(ds, num_epoch=epochs),
            # n_h 128 on big-N OR dense-E graphs: the 300-wide
            # block-diagonal Mosaic kernel exceeds the remote AOT
            # compile helper at amazon/t_finance density (HTTP 500);
            # at that density even the 8-member vmapped ELL program
            # does — sequential members (member_chunk=1) compile
            "tam (TAM split)": lambda: run_tam_baseline(
                ds, num_epoch=tam_epochs,
                cutting=3 if quick else 8,
                n_h=128 if (ds.n_nodes > 20000
                            or ds.n_edges > 1_000_000) else 300,
                **({"member_chunk": 1, "impl": "ell"}
                   if ds.n_edges > 1_000_000 else {})),
        }
        for model, fn in runs.items():
            t0 = time.time()
            try:
                res = fn()
            except Exception as e:   # noqa: BLE001 — tunnel HTTP 500s
                print(f"[zoo] {name}/{model} FAILED: {e!r:.200}",
                      flush=True)
                rows.append({"dataset": name, "model": model,
                             "auroc": float("nan"), "ap": float("nan"),
                             "wall_s": round(time.time() - t0, 1)})
                continue
            rec = {"dataset": name, "model": model,
                   "auroc": round(res.auc, 4), "ap": round(res.ap, 4),
                   "wall_s": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            rows.append(rec)
    return rows


def run_minibatch_row(quick: bool) -> dict:
    """DGraph-scale quality row: the production MiniBatchTrainer on a
    dgraph-shaped synthetic (round-5 RESULTS coverage item)."""
    import numpy as np
    import scipy.sparse as sp

    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.datasets.splits import minibatch_split
    from ggad_tpu.train.minibatch import MiniBatchTrainer

    scale = 0.005 if quick else 0.02   # 0.02 × 3.7M ≈ 74K nodes
    ds = load_dataset("dgraphfin", synthetic_scale=scale, seed=0)
    adj = ds.adj + sp.eye(ds.n_nodes, format="csr", dtype=np.float32)
    idx_train, idx_valid, idx_test, labels, idx_anom = minibatch_split(
        ds.ano_labels, seed=0)
    t0 = time.time()
    tr = MiniBatchTrainer(
        adj=adj, features=ds.features, labels=labels,
        idx_train=idx_train, idx_anomaly=idx_anom,
        idx_valid=idx_valid, idx_test=idx_test,
        num_epochs=5 if quick else 30, valid_epochs=5)
    res = tr.train(verbose=True)
    return {"dataset": f"dgraphfin ({scale}x)", "model": "ggad-minibatch",
            "graph": f"{ds.n_nodes}N/{ds.n_edges}E/{ds.feat_dim}F",
            "auroc": round(res.test_metrics["auc"], 4),
            "ap": round(res.test_metrics["ap"], 4),
            "best_val_auc": round(res.best_val_auc, 4),
            "wall_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced epochs / scales for smoke runs")
    ap.add_argument("--baselines", action="store_true",
                    help="also run the six-baseline zoo table")
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--ggad-from", default=None,
                    help="JSON file of precomputed GGAD rows (resume a "
                         "run whose zoo section failed)")
    args = ap.parse_args()

    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.datasets.registry import preset_for
    from ggad_tpu.train.full_batch import FullBatchTrainer

    # (name, synthetic_scale, epoch_override)
    runs = [
        ("photo", 1.0, None),
        ("reddit", 1.0, None),
        ("elliptic", 1.0, None),
        ("Amazon", 1.0, None),
        ("t_finance", 0.25, 200),   # full-scale t_finance BCSR exceeds the
                                    # single-chip tile budget; scaled run
    ]
    if args.quick:
        runs = [(n, min(s, 0.2), 20) for n, s, _ in runs]

    results = []
    if args.ggad_from:
        results = json.load(open(args.ggad_from))
        runs = []
    for name, scale, epochs in runs:
        preset = preset_for(name)
        ds = load_dataset(name, synthetic_scale=scale, seed=0)
        print(f"=== {ds.name}: {ds.n_nodes}N {ds.n_edges}E "
              f"{ds.feat_dim}F ===", flush=True)
        t0 = time.time()
        # 3 training seeds: quality on synthetic realizations is
        # seed-dominated (photo spans 0.45-0.57 across seeds while the
        # executed-oracle legs pin implementation parity to ~0.004
        # AUROC) — report mean ± spread
        aucs, aps, walls = [], [], []
        for tseed in range(1 if args.quick else 3):
            tr = FullBatchTrainer(
                ds, num_epoch=epochs, eval_every=50, log_every=50,
                scan_steps=25, seed=tseed)
            res = tr.train(verbose=(tseed == 0))
            aucs.append(res.final_auc)
            aps.append(res.final_ap)
            walls.append(res.wall_time_s)
        import numpy as _np

        rec = {
            "dataset": name,
            "graph": f"{ds.n_nodes}N/{ds.n_edges}E/{ds.feat_dim}F",
            "scale": scale,
            "epochs": epochs or preset.num_epoch,
            "auroc": round(float(_np.mean(aucs)), 4),
            "auroc_spread": round(float(_np.max(aucs) - _np.min(aucs)), 4),
            "ap": round(float(_np.mean(aps)), 4),
            "wall_s": round(time.time() - t0, 1),
            "train_wall_s": round(float(_np.mean(walls)), 1),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    with open(args.out, "w") as f:
        f.write("# GGAD results (benchmark-shaped synthetic graphs)\n\n")
        f.write("Per-dataset presets from the reference "
                "(`run.py:38-66`): lr 1e-3, epochs photo 100 / "
                "elliptic 150 / reddit 300 / t_finance 500 / Amazon 800, "
                "noise N(0.02, 0.01) for photo+reddit.\n\n")
        f.write("AUROC is the mean over 3 training seeds (± max-min "
                "spread): synthetic-realization quality is "
                "seed-dominated; implementation parity is pinned by "
                "the executed-oracle legs (ORACLE.json, ~0.004 AUROC "
                "at photo shape/budget).\n\n")
        f.write("| dataset | graph | epochs | AUROC (±spread) | AP | "
                "train wall (s) |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['dataset']} | {r['graph']} | {r['epochs']} | "
                    f"{r['auroc']} (±{r['auroc_spread']}) | {r['ap']} | "
                    f"{r['train_wall_s']} |\n")
        if args.baselines:
            zoo = run_baseline_zoo(args.quick)
            f.write("\n## Baseline zoo (same synthetic graphs)\n\n")
            f.write("TAM uses its own reference split protocol (80% "
                    "labeled normals + 15% real-anomaly contamination, "
                    "`utils_tam.py:159-178`); 'aegis (faithful)' "
                    "reproduces the reference driver's effective "
                    "behavior, bugs included (`model_AEGIS.py:240`).\n\n")
            f.write("| dataset | model | AUROC | AP | wall (s) |\n")
            f.write("|---|---|---|---|---|\n")
            for r in zoo:
                f.write(f"| {r['dataset']} | {r['model']} | {r['auroc']} "
                        f"| {r['ap']} | {r['wall_s']} |\n")
            results.extend(zoo)
            mb = run_minibatch_row(args.quick)
            f.write("\n## Mini-batch (DGraph-shaped)\n\n")
            f.write("Production `MiniBatchTrainer` (sampled 2-hop, "
                    "150+50 batches, best-val-AUC checkpoint). "
                    "NOTE: on the SYNTHETIC dgraph-shaped graph the "
                    "anomaly signal is weakly feature-aligned at 17 dims "
                    "- val AUROC peaks near init and declines as the "
                    "(contaminated, pseudo-relabeled) train loss falls, "
                    "so this row is a data-realism floor, not an "
                    "implementation number; implementation parity is "
                    "pinned by the executed src/main.py oracle leg "
                    "(ORACLE.json, per-batch loss parity).\n\n")
            f.write("| dataset | graph | test AUROC | test AP | "
                    "best val AUC | wall (s) |\n")
            f.write("|---|---|---|---|---|---|\n")
            f.write(f"| {mb['dataset']} | {mb['graph']} | {mb['auroc']} "
                    f"| {mb['ap']} | {mb['best_val_auc']} | "
                    f"{mb['wall_s']} |\n")
            results.append(mb)
    with open("results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out} + results.json")


if __name__ == "__main__":
    main()
