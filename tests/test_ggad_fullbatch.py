"""GGAD full-batch model/loss parity and end-to-end training tests.

The oracle implementations here re-derive the reference semantics
(reference ``model.py:108-191``, ``run.py:164-210``) independently in
numpy/torch on *dense* adjacencies, and check the framework's sparse
TPU-path produces identical values and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggad_tpu.datasets.synthetic import synthetic_gad
from ggad_tpu.graph import from_scipy
from ggad_tpu.models.ggad import GGAD
from ggad_tpu.ops.normalize import normalize_adj_reference
from ggad_tpu.train.full_batch import FullBatchTrainer
from ggad_tpu.train.losses import ggad_losses


def tiny_dataset(n=60, seed=0):
    return synthetic_gad(n_nodes=n, avg_degree=6, feat_dim=8,
                         n_communities=3, anomaly_rate=0.1, seed=seed)


def get_flax_weights(params):
    p = params["params"]

    def kernel(path):
        node = p
        for k in path:
            node = node[k]
        return np.asarray(node)

    return {
        "W1": kernel(["gcn1", "fc", "kernel"]),
        "b1": kernel(["gcn1", "bias"]),
        "a1": kernel(["gcn1", "prelu", "alpha"]),
        "W2": kernel(["gcn2", "fc", "kernel"]),
        "b2": kernel(["gcn2", "bias"]),
        "a2": kernel(["gcn2", "prelu", "alpha"]),
        "Wf1": kernel(["head", "fc1", "kernel"]),
        "Wf2": kernel(["head", "fc2", "kernel"]),
        "Wf3": kernel(["head", "fc3", "kernel"]),
        "W4": kernel(["fc4", "kernel"]),
    }


def numpy_oracle(w, adj_d, raw_d, x, seed_idx, normal_idx, noise_mean,
                 margin=0.7):
    """Dense numpy re-derivation of the reference forward + losses
    (noise std = 0 so the perturbation is the deterministic mean)."""

    def prelu(v, a):
        return np.where(v >= 0, v, a * v)

    h1 = prelu(adj_d @ (x @ w["W1"]) + w["b1"], w["a1"])
    emb = prelu(adj_d @ (h1 @ w["W2"]) + w["b2"], w["a2"])

    emb_abnormal = emb[seed_idx] + noise_mean
    emb_con = np.maximum((adj_d[seed_idx] @ emb) @ w["W4"], 0.0)
    emb_combine = np.concatenate([emb[normal_idx], emb_con], axis=0)
    f1 = np.maximum(emb_combine @ w["Wf1"], 0)
    f2 = np.maximum(f1 @ w["Wf2"], 0)
    logits = f2 @ w["Wf3"]
    emb_out = emb.copy()
    emb_out[seed_idx] = emb_con

    # losses (run.py:164-210)
    y = np.concatenate([np.zeros(len(normal_idx)), np.ones(len(seed_idx))])
    z = logits[:, 0]
    bce = np.mean((1 - y) * np.logaddexp(0, z) + y * np.logaddexp(0, -z))

    norm = np.linalg.norm(emb_out, axis=1, keepdims=True)
    emb_n = emb_out * np.where(norm > 0, 1 / norm, 0)
    sim = emb_n @ emb_n.T
    similar = sim * raw_d
    aff = similar.sum(0) / raw_d.sum(0)
    loss_margin = max(0.0, margin - (aff[normal_idx].mean()
                                     - aff[seed_idx].mean()))
    # seed-axis reduction: the reference's [1,S,h]-vs-[S,h] broadcast
    # quirk (run.py:207-208), pinned by scripts/reference_oracle.py
    rec = np.mean(np.sqrt(np.sum((emb_con - emb_abnormal) ** 2, axis=0)))
    return {
        "emb_out": emb_out, "logits": logits, "emb_con": emb_con,
        "bce": bce, "margin": loss_margin, "rec": rec,
        "total": bce + loss_margin + rec,
    }


@pytest.fixture(scope="module")
def setup():
    ds = tiny_dataset()
    g = from_scipy(ds.adj)
    adj, raw = normalize_adj_reference(g)
    x = jnp.asarray(ds.features)
    seed_idx = jnp.asarray(ds.abnormal_label_idx, jnp.int32)
    normal_idx = jnp.asarray(ds.normal_label_idx, jnp.int32)
    model = GGAD(n_h=16, noise_mean=0.02, noise_std=0.0)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        adj, x, seed_idx, normal_idx, train=True)
    return ds, g, adj, raw, x, seed_idx, normal_idx, model, params


def test_forward_and_losses_match_numpy_oracle(setup):
    ds, g, adj, raw, x, seed_idx, normal_idx, model, params = setup
    out = model.apply(params, adj, x, seed_idx, normal_idx, train=True,
                      rngs={"noise": jax.random.PRNGKey(2)})
    losses = ggad_losses(out, raw, seed_idx, normal_idx)

    from ggad_tpu.graph import to_scipy
    adj_d = to_scipy(adj).toarray()
    raw_d = to_scipy(raw).toarray()
    w = get_flax_weights(params)
    oracle = numpy_oracle(w, adj_d, raw_d, np.asarray(x),
                          np.asarray(seed_idx), np.asarray(normal_idx),
                          noise_mean=0.02)

    np.testing.assert_allclose(np.asarray(out.emb), oracle["emb_out"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.logits), oracle["logits"],
                               rtol=1e-4, atol=1e-5)
    assert float(losses.bce) == pytest.approx(oracle["bce"], abs=1e-5)
    assert float(losses.margin) == pytest.approx(oracle["margin"], abs=1e-5)
    assert float(losses.rec) == pytest.approx(oracle["rec"], abs=1e-5)
    assert float(losses.total) == pytest.approx(oracle["total"], abs=1e-4)


def test_eval_branch_scores_all_nodes(setup):
    ds, g, adj, raw, x, seed_idx, normal_idx, model, params = setup
    out = model.apply(params, adj, x, seed_idx, normal_idx, train=False,
                      rngs={"noise": jax.random.PRNGKey(2)})
    assert out.logits.shape == (ds.n_nodes, 1)
    # eval embedding must NOT have seed rows replaced
    emb2 = model.apply(params, adj, x, seed_idx, normal_idx, train=True,
                       rngs={"noise": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out.emb[np.asarray(seed_idx)]),
                           np.asarray(emb2.emb[np.asarray(seed_idx)]))


def test_gradients_match_torch_autograd(setup):
    """The functional seed-replacement (`emb.at[seed].set(emb_con)`) must
    carry the same gradients as the reference's in-place tensor write
    (reference ``model.py:182``) — SURVEY.md risk #2."""
    torch = pytest.importorskip("torch")
    ds, g, adj, raw, x, seed_idx, normal_idx, model, params = setup

    def jax_loss(p):
        out = model.apply(p, adj, x, seed_idx, normal_idx, train=True,
                          rngs={"noise": jax.random.PRNGKey(2)})
        return ggad_losses(out, raw, seed_idx, normal_idx).total

    jgrads = jax.grad(jax_loss)(params)

    # torch oracle with identical weights
    from ggad_tpu.graph import to_scipy
    adj_d = torch.tensor(to_scipy(adj).toarray(), dtype=torch.float64)
    raw_d = torch.tensor(to_scipy(raw).toarray(), dtype=torch.float64)
    xt = torch.tensor(np.asarray(x), dtype=torch.float64)
    si = np.asarray(seed_idx)
    ni = np.asarray(normal_idx)
    w = {k: torch.tensor(np.asarray(v), dtype=torch.float64,
                         requires_grad=True)
         for k, v in get_flax_weights(params).items()}

    def prelu(v, a):
        return torch.where(v >= 0, v, a * v)

    h1 = prelu(adj_d @ (xt @ w["W1"]) + w["b1"], w["a1"])
    emb = prelu(adj_d @ (h1 @ w["W2"]) + w["b2"], w["a2"])
    emb_abnormal = emb[si] + 0.02
    emb_con = torch.relu((adj_d[si] @ emb) @ w["W4"])
    emb_combine = torch.cat([emb[ni], emb_con], dim=0)
    f2 = torch.relu(torch.relu(emb_combine @ w["Wf1"]) @ w["Wf2"])
    logits = (f2 @ w["Wf3"])[:, 0]
    # in-place write exactly like the reference
    emb_out = emb.clone()
    emb_out[si] = emb_con

    y = torch.cat([torch.zeros(len(ni), dtype=torch.float64),
                   torch.ones(len(si), dtype=torch.float64)])
    bce = torch.mean((1 - y) * torch.nn.functional.softplus(logits)
                     + y * torch.nn.functional.softplus(-logits))
    norm = emb_out.norm(dim=1, keepdim=True)
    emb_n = emb_out * torch.where(norm > 0, 1 / norm, torch.zeros_like(norm))
    sim = emb_n @ emb_n.T
    aff = (sim * raw_d).sum(0) / raw_d.sum(0)
    loss_margin = torch.clamp(0.7 - (aff[ni].mean() - aff[si].mean()), min=0)
    rec = torch.mean(torch.sqrt(torch.sum((emb_con - emb_abnormal) ** 2, 0)))
    total = bce + loss_margin + rec
    total.backward()

    jw = get_flax_weights(jgrads)
    for name in ["W1", "W2", "W4", "Wf1", "Wf2", "Wf3", "b1", "b2",
                 "a1", "a2"]:
        tgrad = w[name].grad.numpy()
        np.testing.assert_allclose(
            jw[name], tgrad, rtol=2e-3, atol=1e-5,
            err_msg=f"gradient mismatch for {name}")
    # the generator path must receive gradient (through replacement+margin)
    assert np.abs(jw["W4"]).max() > 0


@pytest.mark.slow
def test_training_improves_auc():
    ds = synthetic_gad(n_nodes=1200, avg_degree=16, feat_dim=64,
                       anomaly_rate=0.05, seed=1)
    tr = FullBatchTrainer(ds, num_epoch=80, noise_mean=0.02, noise_std=0.01,
                          embedding_dim=300, eval_every=40)
    rng = jax.random.PRNGKey(0)
    params, _ = tr.init(rng)
    auc0, _ = tr.evaluate(params)
    res = tr.train()
    assert res.final_auc > 0.65
    assert res.final_auc > auc0 + 0.1


def test_scan_steps_equivalent_to_loop():
    """scan_steps fusing must produce identical training trajectories."""
    ds = synthetic_gad(n_nodes=150, avg_degree=6, feat_dim=8, seed=4)
    r1 = FullBatchTrainer(ds, num_epoch=8, embedding_dim=16,
                          noise_std=0.0, eval_every=8, log_every=8,
                          scan_steps=1).train()
    r2 = FullBatchTrainer(ds, num_epoch=8, embedding_dim=16,
                          noise_std=0.0, eval_every=8, log_every=8,
                          scan_steps=4).train()
    assert r1.final_auc == pytest.approx(r2.final_auc, abs=1e-6)


def test_checkpoint_resume(tmp_path):
    ds = synthetic_gad(n_nodes=150, avg_degree=6, feat_dim=8, seed=4)
    ckdir = str(tmp_path / "ck")
    kw = dict(num_epoch=6, embedding_dim=16, noise_std=0.0,
              eval_every=2, log_every=2, checkpoint_dir=ckdir)
    full = FullBatchTrainer(ds, **{**kw, "checkpoint_dir": None}).train()
    # run 6 epochs with checkpointing, then "resume" (should be a no-op
    # continuation past the last saved epoch)
    tr = FullBatchTrainer(ds, **kw)
    res = tr.train()
    tr2 = FullBatchTrainer(ds, **kw)
    res2 = tr2.train()   # restores epoch 5, trains nothing more
    assert res2.final_auc == pytest.approx(res.final_auc, abs=1e-6)
    assert len(res2.history) == 0


def test_contamination_split_options():
    from ggad_tpu.datasets.splits import reference_split

    labels = np.zeros(1000, np.int64)
    labels[:100] = 1
    plain = reference_split(labels, seed=0)
    cont = reference_split(labels, seed=0, contamination_add_rate=0.1)
    # contaminated labeled-normal set includes real anomalies
    assert labels[cont.normal_label_idx].sum() > 0
    assert labels[plain.normal_label_idx].sum() == 0
    # contaminated anomalies removed from test
    assert len(cont.idx_test) < len(plain.idx_test)


def test_camouflage_features():
    from ggad_tpu.datasets.splits import camouflage_features

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(50, 20)).astype(np.float32)
    labels = np.zeros(50, np.int64)
    labels[:5] = 1
    normal_idx = np.arange(10, 30)
    out = camouflage_features(feats, labels, normal_idx, replace_rate=0.25)
    k = 5  # 0.25 * 20
    mean = feats[normal_idx].mean(0)
    np.testing.assert_allclose(out[:5, :k], np.tile(mean[:k], (5, 1)),
                               rtol=1e-6)
    np.testing.assert_allclose(out[5:], feats[5:])
    np.testing.assert_allclose(out[:5, k:], feats[:5, k:])


def test_seed_subgraph_generator_parity():
    """spmm(rows_subgraph(adj, seed), emb) must equal the full-SpMM+slice
    generator path in values AND gradients (it exists purely to cut the
    generator aggregation to O(E_seed) both ways)."""
    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.graph import from_scipy, rows_subgraph
    from ggad_tpu.models.ggad import GGAD
    from ggad_tpu.ops.normalize import normalize_adj_reference
    from ggad_tpu.train.losses import ggad_losses

    ds = synthetic_gad(n_nodes=220, avg_degree=7, feat_dim=12, seed=6)
    adj, raw = normalize_adj_reference(from_scipy(ds.adj))
    seed_adj = rows_subgraph(adj, ds.abnormal_label_idx)
    x = jnp.asarray(ds.features, jnp.float32)
    si = jnp.asarray(ds.abnormal_label_idx, jnp.int32)
    ni = jnp.asarray(ds.normal_label_idx, jnp.int32)
    model = GGAD(n_h=16, noise_mean=0.02, noise_std=0.0)
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "noise": k}, adj, x, si, ni,
                        train=True)

    def loss(p, use_sub):
        out = model.apply(p, adj, x, si, ni, train=True,
                          seed_adj=seed_adj if use_sub else None,
                          rngs={"noise": jax.random.PRNGKey(3)})
        return ggad_losses(out, raw, si, ni).total

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g1, g0)


def test_train_with_retries_resumes_from_checkpoint(tmp_path):
    """A mid-run crash resumes from the checkpointed epoch, finishing
    with the same trajectory as an uninterrupted run."""
    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.train.full_batch import (
        FullBatchTrainer,
        train_with_retries,
    )

    ds = synthetic_gad(n_nodes=150, avg_degree=6, feat_dim=10, seed=8)
    kw = dict(num_epoch=6, embedding_dim=12, noise_std=0.0,
              eval_every=2, log_every=2, seed=0, spmm_impl="xla")

    ref = FullBatchTrainer(ds, **kw).train()

    calls = {"n": 0}

    def make_flaky():
        tr = FullBatchTrainer(ds, checkpoint_dir=str(tmp_path), **kw)
        if calls["n"] == 0:
            orig = tr._train_step

            def crashing(*a, **k):
                # crash after a few successful (checkpointed) epochs
                if calls["n"] >= 3:
                    raise RuntimeError("simulated device fault")
                calls["n"] += 1
                return orig(*a, **k)

            tr._train_step = crashing
        return tr

    res = train_with_retries(make_flaky, retries=1)
    assert res is not None
    # resumed run reaches the same final metrics as the clean run
    assert res.final_auc == pytest.approx(ref.final_auc, abs=1e-4)


def test_affinity_subset_margin_parity():
    """The column-restricted affinity gives identical margin loss and
    gradients to the full SDDMM."""
    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.models.ggad import GGAD
    from ggad_tpu.ops.normalize import normalize_adj_reference
    from ggad_tpu.ops.sddmm import (
        affinity_subset,
        node_affinity,
        node_affinity_at,
    )
    from ggad_tpu.train.losses import ggad_losses

    ds = synthetic_gad(n_nodes=200, avg_degree=7, feat_dim=12, seed=9)
    adj, raw = normalize_adj_reference(from_scipy(ds.adj))
    si = jnp.asarray(ds.abnormal_label_idx, jnp.int32)
    ni = jnp.asarray(ds.normal_label_idx, jnp.int32)
    sub = affinity_subset(raw, np.concatenate(
        [ds.normal_label_idx, ds.abnormal_label_idx]))

    emb = jax.random.normal(jax.random.PRNGKey(1), (200, 16))
    full = np.asarray(node_affinity(raw, emb))
    at = np.asarray(node_affinity_at(sub, emb))
    want = full[np.concatenate([ds.normal_label_idx,
                                ds.abnormal_label_idx])]
    np.testing.assert_allclose(at, want, rtol=1e-5, atol=1e-6)

    x = jnp.asarray(ds.features, jnp.float32)
    model = GGAD(n_h=16, noise_mean=0.02, noise_std=0.0)
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "noise": k}, adj, x, si, ni,
                        train=True)

    def loss(p, use_sub):
        out = model.apply(p, adj, x, si, ni, train=True,
                          rngs={"noise": jax.random.PRNGKey(3)})
        return ggad_losses(out, raw, si, ni,
                           aff_sub=sub if use_sub else None).total

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g1, g0)


def test_precomputed_ax_parity():
    """(Â@x)@W1 == Â@(xW1): the hoisted first-layer aggregation gives
    the same losses and gradients as the in-step SpMM."""
    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.models.ggad import GGAD
    from ggad_tpu.ops.normalize import normalize_adj_reference
    from ggad_tpu.ops.spmm import spmm
    from ggad_tpu.train.losses import ggad_losses

    ds = synthetic_gad(n_nodes=180, avg_degree=7, feat_dim=20, seed=11)
    adj, raw = normalize_adj_reference(from_scipy(ds.adj))
    x = jnp.asarray(ds.features, jnp.float32)
    ax = spmm(adj, x, impl="xla")
    si = jnp.asarray(ds.abnormal_label_idx, jnp.int32)
    ni = jnp.asarray(ds.normal_label_idx, jnp.int32)
    model = GGAD(n_h=16, noise_mean=0.02, noise_std=0.0)
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "noise": k}, adj, x, si, ni,
                        train=True)

    def loss(p, use_ax):
        out = model.apply(p, adj, x, si, ni, train=True,
                          ax=ax if use_ax else None,
                          rngs={"noise": jax.random.PRNGKey(3)})
        return ggad_losses(out, raw, si, ni).total

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4),
        g1, g0)


def test_init_ggad_params_matches_full_init():
    """init_ggad_params (2-node dummy graph) must produce EXACTLY the
    params of a full init on the real graph — flax init values depend
    only on rngs + feat_dim, which the halo/scaling paths rely on."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.models.ggad import GGAD, init_ggad_params
    from ggad_tpu.ops.normalize import normalize_adj_reference

    ds = synthetic_gad(n_nodes=150, avg_degree=6, feat_dim=19, seed=3)
    adj, _ = normalize_adj_reference(from_scipy(ds.adj))
    model = GGAD(n_h=24, noise_mean=0.02, noise_std=0.01)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    rngs = {"params": k1, "noise": k2}
    full = model.init(rngs, adj, jnp.asarray(ds.features, jnp.float32),
                      jnp.asarray(ds.abnormal_label_idx, jnp.int32),
                      jnp.asarray(ds.normal_label_idx, jnp.int32),
                      train=True)
    dummy = init_ggad_params(model, ds.features.shape[1], rngs)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        full, dummy)


def test_bf16_mode_routes_margin_through_tile_affinity():
    """spmm_dtype=bfloat16 + BCSR routes the margin through the RECT
    tile-subset SDDMM (round 4: the margin reads only labeled columns);
    f32 keeps the edge-parallel subset. Losses stay close."""
    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.ops.sddmm import AffinitySubset, TileAffinitySubset
    from ggad_tpu.train.full_batch import FullBatchTrainer

    ds = synthetic_gad(n_nodes=300, avg_degree=8, feat_dim=16, seed=5)
    kw = dict(num_epoch=3, embedding_dim=16, noise_std=0.0,
              eval_every=3, log_every=1, seed=0)
    tr16 = FullBatchTrainer(ds, spmm_impl="pallas",
                            spmm_dtype="bfloat16", **kw)
    assert isinstance(tr16.aff_sub, TileAffinitySubset)
    tr32 = FullBatchTrainer(ds, spmm_impl="pallas",
                            spmm_dtype="float32", **kw)
    assert isinstance(tr32.aff_sub, AffinitySubset)
    r16 = tr16.train()
    r32 = tr32.train()
    l16 = [r["loss"] for r in r16.history if "loss" in r]
    l32 = [r["loss"] for r in r32.history if "loss" in r]
    import numpy as np
    np.testing.assert_allclose(l16, l32, rtol=2e-2)
