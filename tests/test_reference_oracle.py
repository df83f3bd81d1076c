"""End-to-end parity against the EXECUTED reference program.

Unlike every mirror-based parity test (which re-derives the reference
semantics and could share a misreading with the implementation), this
runs ``/root/reference/run.py`` itself — unmodified, via runpy with a
5-line dgl stub — on an exported synthetic ``.mat``, then trains
:class:`FullBatchTrainer` under the captured split and initial weights
and pins the loss trajectory and test AUROC/AP.

This harness is what caught the round-4 rec-loss finding: the
reference's ``torch.sum(diff_attribute, 1)`` (run.py:208) reduces over
the SEED axis because emb_abnormal keeps its batch dim — every naive
row-norm mirror (and SURVEY.md §1 L4) had it wrong.
"""

import os

import numpy as np
import pytest

REFERENCE_DIR = os.environ.get("GGAD_REFERENCE_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_DIR, "run.py")),
    reason="reference checkout not available")


@pytest.mark.slow
def test_trajectory_matches_executed_reference(tmp_path):
    pytest.importorskip("torch")
    from scripts.reference_oracle import (
        dataset_from_reference_load,
        export_mat,
        flax_params_from_state_dict,
        run_ours,
        run_reference,
    )
    from ggad_tpu.datasets.synthetic import synthetic_gad

    epochs = 14
    ds = synthetic_gad(n_nodes=200, avg_degree=8, feat_dim=12,
                       n_communities=4, anomaly_rate=0.1, seed=3)
    os.makedirs(tmp_path / "dataset", exist_ok=True)
    export_mat(ds, str(tmp_path / "dataset" / "oraclesynth.mat"))
    ref = run_reference("oraclesynth", str(tmp_path), epochs=epochs, seed=3)

    ds2 = dataset_from_reference_load(ref["load"])
    params = flax_params_from_state_dict(ref["state_dict"])
    ours = run_ours(ds2, params, epochs=epochs)

    ref_losses = ref["trajectory"]["losses"]
    assert len(ref_losses) >= epochs // 2, ref["stdout"][-2000:]
    # epoch 0 is a pure forward with identical weights: near-roundoff
    for key in ("margin", "bce", "rec", "total"):
        assert abs(ref_losses[0][key] - ours["losses"][0][key]) < 5e-4, (
            key, ref_losses[0], ours["losses"][0])
    # the whole trajectory tracks within f32 summation-order drift
    for ep, r in ref_losses.items():
        o = ours["losses"][ep]
        assert abs(r["total"] - o["total"]) < 3e-3 + 0.01 * abs(r["total"]), (
            ep, r, o)
    # eval metrics (sklearn vs our metrics on identical scores)
    for ep, r in ref["trajectory"]["evals"].items():
        o = ours["evals"][ep]
        assert abs(r["auc"] - o["auc"]) < 5e-3, (ep, r, o)
        assert abs(r["ap"] - o["ap"]) < 5e-3, (ep, r, o)


@pytest.mark.slow
def test_tam_matches_executed_reference(tmp_path):
    """TAM: the most-restructured model (sequential 8-member torch loop →
    one vmapped/block-diagonal ensemble) against the executed reference.

    tam.py hardcodes 500 epochs at lr 1e-5 and runs unseeded; the
    harness captures split + per-member NSGT cuts + inits, making both
    sides deterministic. Round-5: the f64 trajectory oracle
    (``scripts/tam_f64_leg.py``) showed the reference tracks the f64
    truth to ~3e-7 while our ensemble drifted 1.5%/500ep — the "f32
    summation drift" was actually a MISSING QUIRK: the reference calls
    zero_grad once PER MEMBER (tam.py:180), stepping on the running SUM
    of gradients every epoch. With accumulation implemented, all three
    sides agree to ~4e-7 relative over the full 500 epochs, and the
    tolerances here are tight accordingly.
    """
    pytest.importorskip("torch")
    from scripts.reference_oracle import (
        run_ours_tam,
        run_reference_tam,
        export_mat,
    )
    from ggad_tpu.datasets.synthetic import synthetic_gad

    cutting = 2
    ds = synthetic_gad(n_nodes=150, avg_degree=8, feat_dim=10,
                       n_communities=4, anomaly_rate=0.1, seed=7)
    os.makedirs(tmp_path / "data", exist_ok=True)
    export_mat(ds, str(tmp_path / "data" / "oraclesynth.mat"))
    ref = run_reference_tam("oraclesynth", str(tmp_path),
                            cutting=cutting, seed=7)
    ours = run_ours_tam(ref, cutting=cutting)

    rl, ol = ref["trajectory"]["losses"], ours["losses"]
    assert len(rl) == len(ol) == cutting * 10, (len(rl), len(ol))
    for m in range(cutting):
        for k in range(10):
            r, o = rl[m * 10 + k], ol[m * 10 + k]
            assert abs(r - o) < 1e-4 * abs(r), (m, k, r, o)
    raucs = ref["trajectory"]["aucs"]
    i = 0
    for c in range(cutting):
        mem, test, alln = raucs[i], raucs[i + 1], raucs[i + 2]
        i += 3
        assert abs(mem - ours["member_aucs"][c]) < 2e-3, (c, mem)
        assert abs(test - ours["cut_test"][c][0]) < 2e-3, (c, test)
        assert abs(alln - ours["cut_all"][c][0]) < 2e-3, (c, alln)


@pytest.mark.slow
def test_minibatch_exact_trajectory_matches_executed_reference(tmp_path):
    """DGraph mini-batch path (src/main.py → ModelHandler → GCN
    aggregators) executed unmodified and replayed at TRAJECTORY level:
    the reference's GCN model consumes no RNG inside its forward (the
    aggregation is the exact set union), so the captured shuffled batch
    sequence + initial weights pin every per-batch loss. The exact-mask
    replay (``ggad_tpu.models.sage_exact``) must match each batch total
    to f32 roundoff — this replaces round 4's 0.12-AUROC metric-level
    envelope.

    A small ``batch_size`` keeps the hardcoded 150 batches/epoch inside
    the train pool; the NaN pathology the default batch_size triggers is
    pinned separately below. (The reference's eval batching also
    crashes outright on an empty final slice whenever an eval-set size
    divides batch_size — ``int(len/bs)+1`` slices, ``src/utils.py``
    ``test_sage`` — hence the probed shapes.)"""
    pytest.importorskip("torch")
    from scripts.reference_oracle import (
        run_ours_minibatch_exact,
        run_reference_minibatch,
    )
    from ggad_tpu.datasets.synthetic import synthetic_gad

    # the reference's eval batching (int(len/bs)+1 slices,
    # src/utils.py test_sage) crashes on an empty final batch whenever
    # len(valid) %% bs == 0 — probe a couple of shapes
    ref = None
    for n_nodes in (1704, 1708, 1712, 1716, 1720):  # probed: eval-set
        # sizes must not divide bs (1704 verified)
        ds = synthetic_gad(n_nodes=n_nodes, avg_degree=10, feat_dim=17,
                           n_communities=4, anomaly_rate=0.08,
                           feature_noise=0.25, seed=2)
        try:
            ref = run_reference_minibatch(ds, str(tmp_path),
                                          num_epochs=3, batch_size=3)
            break
        except TypeError:
            continue   # empty eval batch: len(valid) divisible by bs
    assert ref is not None, "no probed shape avoided the empty-batch crash"
    assert ref["final_auc"] is not None, ref["stdout"][-2000:]
    rl = [x[0] for x in ref["batch_losses"]]
    assert not any(np.isnan(x) for x in rl), "healthy config NaN'd"
    ours = run_ours_minibatch_exact(ds, ref)
    diffs = [abs(a - b) for a, b in zip(rl, ours["losses"])]
    # per-batch parity: f32 roundoff compounding over 450 Adam steps
    assert max(diffs) < 2e-3 + 1e-3 * max(abs(x) for x in rl), (
        max(diffs), rl[:5], ours["losses"][:5])
    assert max(diffs[:20]) < 1e-4, diffs[:20]
    assert abs(ref["final_auc"] - ours["final_auc"]) < 5e-3, (
        ref["final_auc"], ours["final_auc"])
    # split capture sanity: pseudo-anomalies present
    cap = ref["dataset"]
    assert len(cap["idx_anomaly"]) > 0


@pytest.mark.slow
def test_minibatch_reference_nan_pathology_reproduced(tmp_path):
    """The handler's hardcoded 150 batches/epoch overruns a small train
    pool → empty train slices → all-seed batches → the affinity's
    normal-mean is a mean over an EMPTY selection → NaN loss, and the
    NaN gradients poison the parameters from that batch on
    (``src/model_handler.py:317,334-336``, ``src/graphsage.py:238-241``).
    Executed-oracle finding (round 5): at DGraph scale the pool is big
    enough, so this is a latent small-data bug, reproduced here; the
    exact replay matches the finite prefix."""
    pytest.importorskip("torch")
    from scripts.reference_oracle import (
        run_ours_minibatch_exact,
        run_reference_minibatch,
    )
    from ggad_tpu.datasets.synthetic import synthetic_gad

    ds = synthetic_gad(n_nodes=800, avg_degree=8, feat_dim=17,
                       n_communities=4, anomaly_rate=0.08,
                       feature_noise=0.25, seed=2)
    ref = run_reference_minibatch(ds, str(tmp_path), num_epochs=1)
    rl = [x[0] for x in ref["batch_losses"]]
    assert any(np.isnan(x) for x in rl), "pathology did not trigger"
    ours = run_ours_minibatch_exact(ds, ref)
    finite = [(a, b) for a, b in zip(rl, ours["losses"])
              if not np.isnan(a)]
    assert len(finite) >= 2
    assert max(abs(a - b) for a, b in finite) < 1e-4, finite


@pytest.mark.slow
@pytest.mark.parametrize("leg", ["dominant", "anomalydae", "aegis",
                                 "gaan"])
def test_baseline_driver_matches_executed_reference(tmp_path, leg):
    """The four remaining reference drivers EXECUTED unmodified (their
    live PyG modules provided by the faithful torch-only
    ``scripts/pyg_shim`` — torch_geometric==2.1.0 semantics incl. the
    MLP's default BatchNorm). Pins per-epoch losses (incl. AEGIS's
    pretrain accumulation quirk and GAAN's saturated-BCE growth) and
    eval AUROC/AP.

    This leg caught two mirror bugs on first execution: the missing
    BatchNorm in every AEGIS/GAAN MLP, and eps-clipped BCE
    underestimating torch's log-clamp(-100) loss 6× under
    discriminator saturation (see ``ggad_tpu/ops/bce.py``).
    """
    pytest.importorskip("torch")
    from scripts.reference_oracle import export_mat, run_baseline_leg
    from ggad_tpu.datasets.synthetic import synthetic_gad

    epochs = 12
    ds = synthetic_gad(n_nodes=200, avg_degree=8, feat_dim=12,
                       n_communities=4, anomaly_rate=0.1, seed=11)
    os.makedirs(tmp_path / "dataset", exist_ok=True)
    export_mat(ds, str(tmp_path / "dataset" / "oraclesynth.mat"))
    rec = run_baseline_leg(leg, ds, str(tmp_path), epochs=epochs,
                           lr=1e-3, seed=11)

    ref_losses = rec["reference"]["losses"]
    assert ref_losses, rec["reference"]
    # pretrain epochs (AEGIS only): gradient-accumulation quirk pinned
    for i, d in enumerate(rec["pretrain_diffs"]):
        r = rec["reference"]["pretrain_losses"][i]
        assert d < 2e-4 + 1e-4 * abs(r), (leg, "pretrain", i, d)
    for row in rec["diffs"]["loss_diffs"]:
        ep = row["epoch"]
        r = ref_losses[ep]["total"]
        assert row["d_total"] < 1e-3 + 1e-3 * abs(r), (leg, ep, row)
    assert rec["diffs"]["eval_diffs"], rec
    for row in rec["diffs"]["eval_diffs"]:
        assert row["d_auc"] < 5e-3, (leg, row)
        assert row["d_ap"] < 1e-2, (leg, row)


@pytest.mark.slow
def test_ocgnn_matches_executed_reference(tmp_path):
    pytest.importorskip("torch")
    from scripts.reference_oracle import (
        dataset_from_reference_load,
        export_mat,
        ocgnn_flax_params_from_state_dict,
        run_ours_ocgnn,
        run_reference_ocgnn,
    )
    from ggad_tpu.datasets.synthetic import synthetic_gad

    epochs = 11
    ds = synthetic_gad(n_nodes=150, avg_degree=8, feat_dim=12,
                       n_communities=4, anomaly_rate=0.1, seed=5)
    os.makedirs(tmp_path / "dataset", exist_ok=True)
    export_mat(ds, str(tmp_path / "dataset" / "oraclesynth.mat"))
    ref = run_reference_ocgnn("oraclesynth", str(tmp_path),
                              epochs=epochs, seed=5)
    ds2 = dataset_from_reference_load(ref["load"])
    params = ocgnn_flax_params_from_state_dict(ref["state_dict"])
    ours = run_ours_ocgnn(ds2, params, epochs=epochs)

    ref_losses = ref["trajectory"]["losses"]
    assert ref_losses, ref["stdout"][-2000:]
    for ep, r in ref_losses.items():
        o = ours["losses"][ep]
        assert abs(r["total"] - o["total"]) < 1e-3 + 1e-3 * abs(r["total"]), (
            ep, r, o)
    for ep, r in ref["trajectory"]["evals"].items():
        o = ours["evals"][ep]
        assert abs(r["auc"] - o["auc"]) < 5e-3, (ep, r, o)
        assert abs(r["ap"] - o["ap"]) < 5e-3, (ep, r, o)


@pytest.mark.slow
def test_tam_f64_trajectory_attribution(tmp_path):
    """Round-5 f64 trajectory oracle: with the gradient-accumulation
    quirk implemented, the f32 reference AND our f32 ensemble must both
    track an independent float64 mirror (jax x64 autodiff, subprocess)
    to ~1e-6 relative over the full 500 epochs — proving there is no
    residual semantic or precision gap (this experiment is what caught
    the missing zero_grad-once-per-member accumulation: before the fix
    ours drifted 1.5%/500ep from the f64 truth while the reference sat
    at 3e-7)."""
    pytest.importorskip("torch")
    import subprocess
    import sys

    out = tmp_path / "tam_f64.json"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "scripts/tam_f64_leg.py", "--nodes", "120",
         "--cutting", "1", "--out", str(out)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=520)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    import json

    rec = json.load(open(out))["tam_f64"]
    for row in rec:
        assert row["ref_f32_vs_f64_max_rel"] < 1e-5, row
        assert row["ours_f32_vs_f64_max_rel"] < 1e-5, row
