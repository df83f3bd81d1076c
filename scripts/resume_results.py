"""Resume a partially-failed run_results.py run.

Parses the GGAD + zoo tables already in RESULTS.md, re-runs only the
zoo rows that recorded NaN (rows that crashed before the round-5
chip-OOM / ELL-overflow fixes landed), runs the missing minibatch
section, and rewrites RESULTS.md + results.json in the same format as
scripts/run_results.py.

Usage: python scripts/resume_results.py [--quick]
"""

import argparse
import json
import math
import re
import sys
import time

sys.path.insert(0, ".")


def parse_results_md(path="RESULTS.md"):
    """Return (ggad_rows, zoo_rows, mb_row) parsed from the tables."""
    text = open(path).read()
    ggad, zoo = [], []
    mb = None
    section = None
    for line in text.splitlines():
        if line.startswith("| dataset | graph | epochs"):
            section = "ggad"
            continue
        if line.startswith("| dataset | model |"):
            section = "zoo"
            continue
        if line.startswith("| dataset | graph | test AUROC"):
            section = "mb"
            continue
        if not line.startswith("|") or line.startswith("|---"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if section == "mb" and len(cells) == 6:
            mb = {"dataset": cells[0], "graph": cells[1],
                  "model": "ggad-minibatch",
                  "auroc": float(cells[2]), "ap": float(cells[3]),
                  "best_val_auc": float(cells[4]),
                  "wall_s": float(cells[5])}
        elif section == "ggad" and len(cells) == 6:
            m = re.match(r"([\d.]+|nan) \(±([\d.]+|nan)\)", cells[3])
            ggad.append({
                "dataset": cells[0], "graph": cells[1],
                "epochs": int(cells[2]),
                "auroc": float(m.group(1)), "auroc_spread": float(m.group(2)),
                "ap": float(cells[4]), "train_wall_s": float(cells[5]),
            })
        elif section == "zoo" and len(cells) == 5:
            zoo.append({
                "dataset": cells[0], "model": cells[1],
                "auroc": float(cells[2]), "ap": float(cells[3]),
                "wall_s": float(cells[4]),
            })
    return ggad, zoo, mb


def rerun_zoo_row(name, model, quick):
    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.train.baselines import (
        run_aegis, run_gaan, run_ocgnn, run_reconstruction,
        run_tam_baseline,
    )

    scale = {"t_finance": 0.25}.get(name, 1.0)
    if quick:
        scale = min(scale, 0.2)
    epochs = 20 if quick else 100
    tam_epochs = 40 if quick else 500
    ds = load_dataset(name, synthetic_scale=scale, seed=0)
    fns = {
        "dominant": lambda: run_reconstruction("dominant", ds,
                                               num_epoch=epochs),
        "anomalydae": lambda: run_reconstruction("anomalydae", ds,
                                                 num_epoch=epochs),
        "ocgnn": lambda: run_ocgnn(ds, num_epoch=epochs),
        "aegis": lambda: run_aegis(ds, num_epoch=epochs),
        "aegis (faithful)": lambda: run_aegis(ds, num_epoch=epochs,
                                              faithful=True),
        "gaan": lambda: run_gaan(ds, num_epoch=epochs),
        # dense-E graphs: n_h=128 AND sequential members — the 8-member
        # vmapped program (either impl) exceeds the remote AOT compile
        # helper at amazon/t_finance density (round-5 zoo, HTTP 500)
        "tam (TAM split)": lambda: run_tam_baseline(
            ds, num_epoch=tam_epochs, cutting=3 if quick else 8,
            n_h=128 if (ds.n_nodes > 20000
                        or ds.n_edges > 1_000_000) else 300,
            **({"member_chunk": 1, "impl": "ell"}
               if ds.n_edges > 1_000_000 else {})),
    }
    t0 = time.time()
    try:
        res = fns[model]()
        rec = {"dataset": name, "model": model,
               "auroc": round(res.auc, 4), "ap": round(res.ap, 4),
               "wall_s": round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001 — tunnel HTTP 500s
        print(f"[zoo] {name}/{model} FAILED: {e!r:.300}", flush=True)
        rec = {"dataset": name, "model": model, "auroc": float("nan"),
               "ap": float("nan"), "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def write_outputs(ggad, zoo, mb, out="RESULTS.md"):
    with open(out, "w") as f:
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
        for r in ggad:
            f.write(f"| {r['dataset']} | {r['graph']} | {r['epochs']} | "
                    f"{r['auroc']} (±{r['auroc_spread']}) | {r['ap']} | "
                    f"{r['train_wall_s']} |\n")
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
        if mb is not None:
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
    rows = list(ggad) + list(zoo) + ([mb] if mb else [])
    with open("results.json", "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out} + results.json", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-minibatch", action="store_true")
    args = ap.parse_args()

    ggad, zoo, mb = parse_results_md()
    print(f"parsed {len(ggad)} GGAD rows, {len(zoo)} zoo rows, "
          f"mb={'yes' if mb else 'no'}; "
          f"{sum(1 for r in zoo if math.isnan(r['auroc']))} NaN",
          flush=True)
    for i, r in enumerate(zoo):
        if math.isnan(r["auroc"]):
            zoo[i] = rerun_zoo_row(r["dataset"], r["model"], args.quick)
            # checkpoint after every repaired row
            write_outputs(ggad, zoo, mb)
    if mb is None and not args.skip_minibatch:
        from scripts.run_results import run_minibatch_row
        try:
            mb = run_minibatch_row(args.quick)
            print(json.dumps(mb), flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[minibatch] FAILED: {e!r:.300}", flush=True)
    write_outputs(ggad, zoo, mb)


if __name__ == "__main__":
    main()
