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
    p.add_argument("--spmm_impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--log_jsonl", type=str, default=None,
                   help="write per-epoch metric records to this jsonl file")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ggad_tpu.datasets.loaders import load_dataset
    from ggad_tpu.datasets.registry import preset_for
    from ggad_tpu.utils.logging import JsonlLogger

    preset = preset_for(args.dataset)
    logger = JsonlLogger(args.log_jsonl) if args.log_jsonl else None

    ds = load_dataset(args.dataset, data_dir=args.data_dir, seed=args.seed,
                      synthetic_scale=args.synthetic_scale)
    print(f"dataset={ds.name} nodes={ds.n_nodes} edges={ds.n_edges} "
          f"feats={ds.feat_dim} anomalies={int(ds.ano_labels.sum())} "
          f"labeled_normals={len(ds.normal_label_idx)} "
          f"seeds={len(ds.abnormal_label_idx)}")

    if args.model == "ggad":
        from ggad_tpu.train.full_batch import FullBatchTrainer
        trainer = FullBatchTrainer(
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
            spmm_impl=args.spmm_impl,
            logger=logger.log if logger else None,
        )
        res = trainer.train(verbose=True)
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


if __name__ == "__main__":
    sys.exit(main())
