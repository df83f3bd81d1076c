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

    datasets = ["photo", "reddit"]
    epochs = 20 if quick else 100
    tam_epochs = 40 if quick else 500
    scale = 0.2 if quick else 1.0
    rows = []
    for name in datasets:
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
            "tam (TAM split)": lambda: run_tam_baseline(
                ds, num_epoch=tam_epochs,
                cutting=3 if quick else 8),
        }
        for model, fn in runs.items():
            t0 = time.time()
            res = fn()
            rec = {"dataset": name, "model": model,
                   "auroc": round(res.auc, 4), "ap": round(res.ap, 4),
                   "wall_s": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            rows.append(rec)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced epochs / scales for smoke runs")
    ap.add_argument("--baselines", action="store_true",
                    help="also run the six-baseline zoo table")
    ap.add_argument("--out", default="RESULTS.md")
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
    for name, scale, epochs in runs:
        preset = preset_for(name)
        ds = load_dataset(name, synthetic_scale=scale, seed=0)
        print(f"=== {ds.name}: {ds.n_nodes}N {ds.n_edges}E "
              f"{ds.feat_dim}F ===", flush=True)
        t0 = time.time()
        tr = FullBatchTrainer(
            ds, num_epoch=epochs, eval_every=50, log_every=50,
            scan_steps=25)
        res = tr.train(verbose=True)
        rec = {
            "dataset": name,
            "graph": f"{ds.n_nodes}N/{ds.n_edges}E/{ds.feat_dim}F",
            "scale": scale,
            "epochs": epochs or preset.num_epoch,
            "auroc": round(res.final_auc, 4),
            "ap": round(res.final_ap, 4),
            "wall_s": round(time.time() - t0, 1),
            "train_wall_s": round(res.wall_time_s, 1),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    with open(args.out, "w") as f:
        f.write("# GGAD results (benchmark-shaped synthetic graphs)\n\n")
        f.write("Per-dataset presets from the reference "
                "(`run.py:38-66`): lr 1e-3, epochs photo 100 / "
                "elliptic 150 / reddit 300 / t_finance 500 / Amazon 800, "
                "noise N(0.02, 0.01) for photo+reddit.\n\n")
        f.write("| dataset | graph | epochs | AUROC | AP | train wall (s) |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['dataset']} | {r['graph']} | {r['epochs']} | "
                    f"{r['auroc']} | {r['ap']} | {r['train_wall_s']} |\n")
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
    with open("results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out} + results.json")


if __name__ == "__main__":
    main()
