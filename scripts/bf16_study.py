"""bf16-tile AUROC/AP parity + speed study for the BCSR MXU kernels.

PERF.md lists the bf16 tile mode (values + operands bf16, f32
accumulation) as the main single-chip headroom, gated on a quality
study: bf16 breaks the 1e-4 activation-parity tests by construction, so
the question is whether end-metric quality (AUROC/AP after the full
reference training budget) is unaffected.

This script trains GGAD with identical seeds/budgets under
``spmm_dtype=float32`` and ``spmm_dtype=bfloat16`` on the BCSR-eligible
benchmark-shaped graphs and records final AUROC/AP plus steady-state
step time. Results → docs/BF16_STUDY.md (+ bf16_study.json).

Usage: python scripts/bf16_study.py [--quick]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def steady_step_ms(tr, n_warmup=3, n_iter=20):
    import jax

    rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    params, opt_state = tr.init(init_rng)

    def run(n):
        nonlocal params, opt_state, rng
        losses = None
        for _ in range(n):
            rng, k = jax.random.split(rng)
            params, opt_state, losses = tr._train_step(
                params, opt_state, k, tr.adj, tr.raw_adj, tr.features,
                tr.seed_idx, tr.normal_idx)
        jax.block_until_ready(losses.total)
        return losses

    run(n_warmup)
    t0 = time.perf_counter()
    run(n_iter)
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="docs/BF16_STUDY.md")
    args = ap.parse_args()

    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.train.full_batch import FullBatchTrainer

    runs = [("photo", 1.0, None), ("reddit", 1.0, None),
            ("Amazon", 1.0, None), ("t_finance", 0.25, 200)]
    if args.quick:
        runs = [(n, min(s, 0.2), 20) for n, s, _ in runs[:2]]

    rows = []
    for name, scale, epochs in runs:
        ds = load_dataset(name, synthetic_scale=scale, seed=0)
        print(f"=== {ds.name}: {ds.n_nodes}N {ds.n_edges}E "
              f"{ds.feat_dim}F ===", flush=True)
        rec = {"dataset": name,
               "graph": f"{ds.n_nodes}N/{ds.n_edges}E/{ds.feat_dim}F"}
        for dtype in ("float32", "bfloat16"):
            tr = FullBatchTrainer(
                ds, num_epoch=epochs, eval_every=1000, log_every=1000,
                scan_steps=25, spmm_impl="pallas", spmm_dtype=dtype)
            res = tr.train(verbose=False)
            ms = steady_step_ms(tr)
            tag = "f32" if dtype == "float32" else "bf16"
            rec[f"auroc_{tag}"] = round(res.final_auc, 4)
            rec[f"ap_{tag}"] = round(res.final_ap, 4)
            rec[f"step_ms_{tag}"] = round(ms, 2)
            print(json.dumps({k: v for k, v in rec.items()
                              if tag in k or k == "dataset"}), flush=True)
        rec["d_auroc"] = round(rec["auroc_bf16"] - rec["auroc_f32"], 4)
        rec["speedup"] = round(rec["step_ms_f32"] / rec["step_ms_bf16"], 2)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    with open(args.out, "w") as f:
        f.write("# bf16 BCSR tile mode — quality/speed study\n\n")
        f.write("GGAD trained to the full reference budget per dataset, "
                "identical seed, `spmm_impl=pallas`; only the BCSR tile "
                "dtype differs (f32 `Precision.HIGHEST` vs bf16 operands "
                "with f32 accumulation). Step time = steady-state full "
                "train step (fwd+bwd+Adam) on one chip.\n\n")
        f.write("| dataset | graph | AUROC f32 | AUROC bf16 | ΔAUROC | "
                "AP f32 | AP bf16 | step f32 (ms) | step bf16 (ms) | "
                "speedup |\n|---|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['dataset']} | {r['graph']} | {r['auroc_f32']} | "
                    f"{r['auroc_bf16']} | {r['d_auroc']} | {r['ap_f32']} | "
                    f"{r['ap_bf16']} | {r['step_ms_f32']} | "
                    f"{r['step_ms_bf16']} | {r['speedup']}× |\n")
    with open("bf16_study.json", "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {args.out} + bf16_study.json")


if __name__ == "__main__":
    main()
