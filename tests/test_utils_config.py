"""Config/grid, checkpointing, logging, viz tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggad_tpu.train.config import grid, load_config, multi_run, run_name


def test_grid_expansion():
    cfg = {"a": [1, 2], "b": ["x", "y", "z"], "c": 7}
    combos = grid(cfg)
    assert len(combos) == 6
    assert all(c["c"] == 7 for c in combos)
    assert {(c["a"], c["b"]) for c in combos} == {
        (a, b) for a in (1, 2) for b in "xyz"}


def test_grid_no_lists():
    assert grid({"a": 1}) == [{"a": 1}]


def test_multi_run_aggregation():
    cfg = {"seed": [1, 2, 3], "lr": 0.1}

    def fake_run(cnf):
        return {"auc": 0.5 + cnf["seed"] / 10, "f1_macro": 0.4,
                "f1_pos": 0.3, "f1_neg": 0.5, "gmean": 0.6}

    agg = multi_run(cfg, fake_run, verbose=False)
    assert agg["n"] == 3
    assert agg["auc_mean"] == pytest.approx(0.7)
    assert agg["auc_std"] == pytest.approx(np.std([0.6, 0.7, 0.8], ddof=1))


def test_load_config_defaults(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("model: SAGE\nlr: 0.01\n")
    cfg = load_config(str(p))
    assert cfg["model"] == "SAGE"
    assert cfg["lr"] == 0.01
    assert cfg["batch_size"] == 150  # default preserved


def test_checkpointer_roundtrip(tmp_path):
    from ggad_tpu.train.checkpoint import Checkpointer

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(3)}
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(3, jax.device_get(state))
    restored = ck.restore(template=jax.device_get(state))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert ck.latest_step() == 3


def test_jsonl_logger(tmp_path):
    from ggad_tpu.utils.logging import JsonlLogger

    path = str(tmp_path / "log.jsonl")
    lg = JsonlLogger(path)
    lg.log({"epoch": 0, "loss": 1.5})
    lg.log({"epoch": 1, "loss": 1.2})
    lg.close()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[1]["loss"] == 1.2
    assert "ts" in lines[0]


def test_viz_outputs(tmp_path):
    from ggad_tpu.viz import draw_affinity_pdf, draw_pr, draw_roc

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 100)
    scores = rng.normal(size=100)
    p1 = draw_affinity_pdf(rng.normal(0.8, 0.1, 50),
                           rng.normal(0.2, 0.1, 20),
                           rng.normal(0.3, 0.2, 30),
                           str(tmp_path / "fig/aff.pdf"))
    p2 = draw_roc(labels, scores, str(tmp_path / "fig/roc.png"))
    p3 = draw_pr(labels, scores, str(tmp_path / "fig/pr.png"))
    from ggad_tpu.viz import draw_affinity_pdf_methods
    p4 = draw_affinity_pdf_methods(
        {"GGAD": (rng.normal(0.8, 0.1, 50), rng.normal(0.2, 0.1, 20),
                  rng.normal(0.3, 0.2, 30)),
         "TAM": (rng.normal(0.7, 0.1, 50), rng.normal(0.4, 0.1, 20),
                 rng.normal(0.35, 0.2, 30))},
        str(tmp_path / "fig/aff_methods.svg"))
    for p in (p1, p2, p3, p4):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_cli_config_multirun(tmp_path, capsys):
    """CLI yaml+grid path end-to-end (tiny synthetic, 2-seed grid)."""
    import sys

    from ggad_tpu.cli import main

    p = tmp_path / "cfg.yml"
    p.write_text(
        "data_name: synthetic\n"
        "emb_size: 8\n"
        "batch_size: 16\n"
        "num_epochs: 2\n"
        "valid_epochs: 1\n"
        "seed:\n  - 1\n  - 2\n"
    )
    rc = main(["--config", str(p), "--multi_run", "--num_epoch", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "auc_mean" in out


def test_cli_ggad_smoke(capsys):
    from ggad_tpu.cli import main

    rc = main(["--dataset", "synthetic", "--model", "ggad",
               "--num_epoch", "3", "--embedding_dim", "16",
               "--eval_every", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"auc"' in out
