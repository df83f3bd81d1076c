"""Command-line driver: ``python -m ggad_tpu.cli --dataset photo``.

Replaces the reference's per-model driver scripts (``run.py``,
``dominant.py``, …) with a single entry point; per-dataset defaults come
from the preset registry (reference ``run.py:38-66``).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ggad_tpu training driver")
    p.add_argument("--dataset", type=str, default="synthetic",
                   help="photo|reddit|Amazon|t_finance|elliptic|dgraphfin|"
                        "synthetic|synthetic_<name>")
    p.add_argument("--model", type=str, default="ggad",
                   choices=["ggad", "ggad-minibatch", "dominant",
                            "anomalydae", "ocgnn", "aegis", "gaan", "tam",
                            "sage", "pcgnn", "dominant-minibatch",
                            "anomalydae-minibatch", "aegis-minibatch"])
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--embedding_dim", type=int, default=300)
    p.add_argument("--num_epoch", type=int, default=None)
    p.add_argument("--mean", type=float, default=None)
    p.add_argument("--var", type=float, default=None)
    p.add_argument("--negsamp_ratio", type=int, default=1)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--synthetic_scale", type=float, default=1.0,
                   help="scale factor when falling back to synthetic data")
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--train_auc_every", type=int, default=None,
                   help="print train-split AUROC every k epochs "
                        "(reference run.py:217-228 cadence: 2)")
    p.add_argument("--spmm_impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas", "ell"])
    p.add_argument("--log_jsonl", type=str, default=None,
                   help="write per-epoch metric records to this jsonl file")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--config", type=str, default=None,
                   help="YAML config (list-valued keys expand to a grid)")
    p.add_argument("--multi_run", action="store_true",
                   help="run the full config grid, aggregate mean±std")
    p.add_argument("--scan_steps", type=int, default=1)
    p.add_argument("--spmm_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--reorder", action="store_true",
                   help="RCM-reorder nodes for BCSR tile locality")
    p.add_argument("--aegis_faithful", action="store_true",
                   help="reproduce the reference AEGIS driver's effective "
                        "behavior, bugs included (model_AEGIS.py:240)")
    p.add_argument("--tam_split", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="use TAM's own split protocol (80%% labeled "
                        "normals + active contamination, "
                        "utils_tam.py:159-178); --no-tam_split keeps the "
                        "GGAD split the dataset ships with")
    p.add_argument("--dp_devices", type=int, default=None,
                   help="data-parallel device count for ggad-minibatch "
                        "(batch axis shards over the mesh)")
    p.add_argument("--mesh_devices", type=int, default=None,
                   help="device count for distributed full-batch ggad "
                        "(edge-partitioned halo exchange)")
    p.add_argument("--dist_impl", type=str, default="halo",
                   choices=["halo", "gspmd"],
                   help="multi-device schedule for --mesh_devices")
    p.add_argument("--dist_schedule", type=str, default="dense",
                   choices=["dense", "ring", "sched"],
                   help="halo wire schedule: dense = one all_to_all "
                        "(global-max padding), ring = per-distance-padded "
                        "ppermute rounds, sched = matched rounds "
                        "(max-weight matchings; wins on skewed "
                        "boundaries, falls back to ring otherwise)")
    p.add_argument("--score_only", action="store_true",
                   help="restore --checkpoint_dir and score the dataset "
                        "instead of training (ggad only)")
    p.add_argument("--score_out", type=str, default=None,
                   help="write per-node scores to this .npz")
    p.add_argument("--retries", type=int, default=0,
                   help="rebuild + resume from checkpoint after crashes "
                        "(needs --checkpoint_dir)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.datasets.registry import preset_for
    from ggad_tpu.utils.logging import JsonlLogger

    if args.config:
        return run_from_config(args)

    if args.dist_schedule != "dense" and args.dist_impl == "gspmd":
        # the wire schedule only applies to the halo path; silently
        # benchmarking "gspmd+ring" would measure dense-equivalent comm
        raise SystemExit(
            f"--dist_schedule {args.dist_schedule} only applies to "
            f"--dist_impl halo (gspmd lets XLA choose the collectives)")

    preset = preset_for(args.dataset)
    logger = JsonlLogger(args.log_jsonl) if args.log_jsonl else None

    ds = load_dataset(args.dataset, data_dir=args.data_dir, seed=args.seed,
                      synthetic_scale=args.synthetic_scale)
    if args.reorder:
        from ggad_tpu.datasets.reorder import reorder_rcm
        ds = reorder_rcm(ds)
    print(f"dataset={ds.name} nodes={ds.n_nodes} edges={ds.n_edges} "
          f"feats={ds.feat_dim} anomalies={int(ds.ano_labels.sum())} "
          f"labeled_normals={len(ds.normal_label_idx)} "
          f"seeds={len(ds.abnormal_label_idx)}")

    if args.model == "ggad" and args.score_only:
        import numpy as np

        from ggad_tpu.serve import score_dataset

        if not args.checkpoint_dir:
            raise SystemExit("--score_only requires --checkpoint_dir")
        res = score_dataset(args.checkpoint_dir, ds,
                            embedding_dim=args.embedding_dim,
                            spmm_impl=args.spmm_impl,
                            spmm_dtype=args.spmm_dtype)
        if args.score_out:
            np.savez(args.score_out, scores=res.scores,
                     labels=ds.ano_labels)
        print(json.dumps({"dataset": ds.name, "model": "ggad",
                          "mode": "score_only", "ckpt_step": res.step,
                          "auc": res.auc, "ap": res.ap}))
        return 0

    if args.model == "ggad":
        from ggad_tpu.train.full_batch import (
            FullBatchTrainer,
            train_with_retries,
        )

        def make_trainer():
            return FullBatchTrainer(
                ds,
                lr=args.lr if args.lr is not None else preset.lr,
                weight_decay=args.weight_decay,
                num_epoch=args.num_epoch,
                embedding_dim=args.embedding_dim,
                noise_mean=args.mean,
                noise_std=args.var,
                pos_weight=float(args.negsamp_ratio),
                seed=args.seed,
                eval_every=args.eval_every,
                train_auc_every=args.train_auc_every,
                spmm_impl=args.spmm_impl,
                spmm_dtype=args.spmm_dtype,
                scan_steps=args.scan_steps,
                checkpoint_dir=args.checkpoint_dir,
                logger=logger.log if logger else None,
                mesh=args.mesh_devices,
                dist_impl=args.dist_impl,
                dist_schedule=args.dist_schedule,
            )

        res = train_with_retries(make_trainer, retries=args.retries,
                                 verbose=True)
        print(json.dumps({"dataset": ds.name, "model": "ggad",
                          "auc": res.final_auc, "ap": res.final_ap,
                          "wall_time_s": res.wall_time_s}))
        return 0

    if args.model in ("dominant", "anomalydae", "ocgnn", "aegis", "gaan",
                      "tam", "sage", "pcgnn", "ggad-minibatch",
                      "dominant-minibatch", "anomalydae-minibatch",
                      "aegis-minibatch"):
        from ggad_tpu.train.baselines import run_baseline
        res = run_baseline(args.model, ds, args)
        print(json.dumps(res))
        return 0

    raise SystemExit(f"unknown model {args.model}")


def run_from_config(args) -> int:
    """YAML config (+ optional grid multi-run) path — reference
    ``src/main.py`` equivalent."""
    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.datasets.splits import minibatch_split_for
    from ggad_tpu.train.config import load_config, multi_run
    from ggad_tpu.train.minibatch import MiniBatchTrainer

    cfg = load_config(args.config)

    def run_one(cnf: dict) -> dict:
        import scipy.sparse as sp

        import numpy as np

        ds = load_dataset(cnf["data_name"], data_dir=cnf.get("data_dir"),
                          seed=cnf.get("seed", 72),
                          synthetic_scale=args.synthetic_scale)
        adj = ds.adj + sp.eye(ds.n_nodes, format="csr", dtype=np.float32)
        idx_train, idx_valid, idx_test, labels, idx_anom = \
            minibatch_split_for(
                ds.name, ds.ano_labels, seed=cnf.get("seed", 72),
                test_ratio=cnf.get("test_ratio", 0.67))
        tr = MiniBatchTrainer(
            adj=adj, features=ds.features, labels=labels,
            idx_train=idx_train, idx_anomaly=idx_anom,
            idx_valid=idx_valid, idx_test=idx_test,
            emb_dim=cnf.get("emb_size", 64),
            lr=cnf.get("lr", 1e-3),
            weight_decay=cnf.get("weight_decay", 0.007),
            batch_size=cnf.get("batch_size", 150),
            num_epochs=args.num_epoch or cnf.get("num_epochs", 100),
            valid_epochs=cnf.get("valid_epochs", 5),
            thres=cnf.get("thres", 0.4),
            seed=cnf.get("seed", 72),
        )
        res = tr.train(verbose=True)
        out = dict(res.test_metrics)
        out["best_val_auc"] = res.best_val_auc
        return out

    if args.multi_run:
        agg = multi_run(cfg, run_one)
        print(json.dumps({k: v for k, v in agg.items() if k != "runs"}))
    else:
        from ggad_tpu.train.config import grid
        metrics = run_one(grid(cfg)[0])
        print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
