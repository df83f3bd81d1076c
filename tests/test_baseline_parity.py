"""Torch-oracle loss-value parity for the baseline zoo.

Each test freezes the flax-initialized weights, re-implements the
reference model math independently in torch/numpy (float32, same
precision), and requires the loss values to agree to ~1e-5 — the same
oracle pattern as the GGAD tests (``test_ggad_fullbatch.py``).

Reference semantics cited per test; see the model docstrings for the
deliberate quirks each reproduces.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import torch

import jax
import jax.numpy as jnp

from ggad_tpu.datasets.synthetic import synthetic_gad
from ggad_tpu.graph import add_self_loops, from_scipy, to_scipy
from ggad_tpu.ops.normalize import normalize_adj_reference

TOL = dict(rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def tiny():
    ds = synthetic_gad(n_nodes=60, avg_degree=5, feat_dim=7,
                       anomaly_rate=0.1, seed=3)
    adj, raw = normalize_adj_reference(from_scipy(ds.adj))
    x = jnp.asarray(ds.features, jnp.float32)
    return ds, adj, raw, x


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float32)


def _p(params, *path):
    node = params["params"]
    for k in path:
        node = node[k]
    return _t(node)


def _prelu(x, alpha):
    return torch.where(x >= 0, x, alpha * x)


def _gcn(adj_d, h, w, b, alpha=None):
    out = adj_d @ (h @ w) + b
    return _prelu(out, alpha) if alpha is not None else torch.relu(out)


def _attr_err(x, x_rec):
    return torch.sqrt(torch.sum((x - x_rec) ** 2, dim=1))


# ---------------------------------------------------------------------------
# DOMINANT — attr-only recon loss over labeled normals (dominant.py:138,
# model_domaint.py:113-125 structure term commented out)
# ---------------------------------------------------------------------------

def test_dominant_loss_oracle(tiny):
    from ggad_tpu.models.dominant import Dominant, dominant_loss

    ds, adj, raw, x = tiny
    model = Dominant(n_h=12)
    params = model.init(jax.random.PRNGKey(0), adj, x)
    out = model.apply(params, adj, x)
    train_idx = jnp.asarray(ds.normal_label_idx, jnp.int32)
    got = float(dominant_loss(out, train_idx))

    xt = _t(x)
    a = torch.relu(xt @ _p(params, "dense_attr_1", "kernel")
                   + _p(params, "dense_attr_1", "bias"))
    x_rec = a @ _p(params, "dense_attr_2", "kernel") \
        + _p(params, "dense_attr_2", "bias")
    expect = float(_attr_err(xt, x_rec)[np.asarray(train_idx)].mean())
    np.testing.assert_allclose(got, expect, **TOL)

    # the structure branch itself must match the dense GCN stack (PyG
    # BasicGNN: ReLU between the convs, NONE after the last —
    # basic_gnn.py @2.1.0; executed-oracle-pinned in
    # tests/test_reference_oracle.py)
    adj_d = _t(to_scipy(adj).toarray())
    h = torch.relu(xt @ _p(params, "dense_stru", "kernel")
                   + _p(params, "dense_stru", "bias"))
    h = _gcn(adj_d, h, _p(params, "gcn1", "fc", "kernel"),
             _p(params, "gcn1", "bias"))
    emb = adj_d @ (h @ _p(params, "gcn2", "fc", "kernel")) \
        + _p(params, "gcn2", "bias")
    np.testing.assert_allclose(np.asarray(out.emb), emb.numpy(),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# AnomalyDAE — 0.5·attr + 0.5·structure row errors, GAT structure branch
# (model_AnomalyDAE.py:252-283)
# ---------------------------------------------------------------------------

def _gat_dense(adj_d, h, w, a_src, a_dst, b, slope=0.2):
    """Dense single-head GAT oracle (messages row→col, softmax over
    incoming edges)."""
    hw = h @ w
    n = h.shape[0]
    s_src = hw @ a_src
    s_dst = hw @ a_dst
    out = torch.zeros_like(hw)
    A = adj_d > 0
    for i in range(n):
        srcs = torch.nonzero(A[:, i]).flatten()
        logits = s_src[srcs] + s_dst[i]
        logits = torch.where(logits < 0, slope * logits, logits)
        att = torch.softmax(logits, dim=0)
        out[i] = (att[:, None] * hw[srcs]).sum(0)
    return out + b


def test_anomalydae_loss_oracle(tiny):
    from ggad_tpu.models.anomaly_dae import AnomalyDAE, anomaly_dae_loss

    ds, adj, raw, x = tiny
    model = AnomalyDAE(n_h=12)
    params = model.init(jax.random.PRNGKey(1), adj, x)
    out = model.apply(params, adj, x)
    train_idx = jnp.asarray(ds.normal_label_idx, jnp.int32)
    got = float(anomaly_dae_loss(out, train_idx))

    xt = _t(x)
    adj_d = _t(to_scipy(adj).toarray())
    h = torch.relu(xt @ _p(params, "dense_stru", "kernel")
                   + _p(params, "dense_stru", "bias"))
    emb = _gat_dense(adj_d, h, _p(params, "gat", "kernel"),
                     _p(params, "gat", "att_src")[0],
                     _p(params, "gat", "att_dst")[0],
                     _p(params, "gat", "bias"))
    a = torch.relu(xt @ _p(params, "dense_attr_1", "kernel")
                   + _p(params, "dense_attr_1", "bias"))
    x_rec = a @ _p(params, "dense_attr_2", "kernel") \
        + _p(params, "dense_attr_2", "bias")

    attr = _attr_err(xt, x_rec)
    stru = torch.sqrt(((adj_d - torch.sigmoid(emb @ emb.T)) ** 2).sum(1))
    scores = 0.5 * attr + 0.5 * stru
    expect = float(scores[np.asarray(train_idx)].mean())
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# OCGNN — faithful default: c = 0, r = 0 (ocgnn.py:86-100 re-creates both
# locally every call, so the warmup never takes effect)
# ---------------------------------------------------------------------------

def test_ocgnn_loss_oracle(tiny):
    from ggad_tpu.models.ocgnn import (
        OCGNNEncoder,
        init_ocgnn_state,
        ocgnn_loss,
    )

    ds, adj, raw, x = tiny
    model = OCGNNEncoder(n_h=12)
    params = model.init(jax.random.PRNGKey(2), adj, x)
    emb = model.apply(params, adj, x)
    train_idx = np.asarray(ds.normal_label_idx)
    state = init_ocgnn_state(12)
    loss, score, _ = ocgnn_loss(emb[jnp.asarray(train_idx)], state,
                                beta=0.5)

    xt = _t(x)
    adj_d = _t(to_scipy(adj).toarray())
    a1 = _p(params, "gcn1", "prelu", "alpha")
    a2 = _p(params, "gcn2", "prelu", "alpha")
    h = _gcn(adj_d, xt, _p(params, "gcn1", "fc", "kernel"),
             _p(params, "gcn1", "bias"), a1)
    embt = _gcn(adj_d, h, _p(params, "gcn2", "fc", "kernel"),
                _p(params, "gcn2", "bias"), a2)
    dist = (embt[train_idx] ** 2).sum(1)     # c = 0
    expect = float((1.0 / 0.5) * torch.relu(dist).mean())  # r = 0
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(score), dist.numpy(),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# AEGIS — all three losses with a fixed noise matrix
# (model_AEGIS.py:215-233)
# ---------------------------------------------------------------------------

def _mlp_bn(params, name, h, act):
    """PyG-2.1.0 MLP mirror: Linear → BatchNorm1d(train-mode batch
    stats, biased var, eps 1e-5) → act → Linear."""
    h = h @ _p(params, name, "lin1", "kernel") \
        + _p(params, name, "lin1", "bias")
    mean = h.mean(0)
    var = h.var(0, unbiased=False)
    h = (h - mean) / torch.sqrt(var + 1e-5) \
        * _p(params, name, "bn_scale") + _p(params, name, "bn_bias")
    h = torch.relu(h) if act == "relu" else torch.sigmoid(h)
    return h @ _p(params, name, "lin2", "kernel") \
        + _p(params, name, "lin2", "bias")


def _aegis_torch_forward(params, adj_d, xt, noise):
    def gcn_named(h, name):
        return _gcn(adj_d, h, _p(params, name, "fc", "kernel"),
                    _p(params, name, "bias"),
                    _p(params, name, "prelu", "alpha"))

    x_gen = _mlp_bn(params, "generator", _t(noise), "relu")
    z_gen = gcn_named(gcn_named(x_gen, "gcn_enc1"), "gcn_enc2")
    z = gcn_named(gcn_named(xt, "gcn_enc1"), "gcn_enc2")
    x_dec = gcn_named(gcn_named(z, "gcn_dec1"), "gcn_dec2")
    # reference model_AEGIS.py:215-220: disc over cat([z, z_gen]) (BN
    # stats over 2N rows) AND separately over z_gen (stats over N rows)
    emb_all = torch.cat([z, z_gen], 0)
    probs_all = torch.sigmoid(
        _mlp_bn(params, "discriminator2", emb_all, "sigmoid"))[:, 0]
    p_gen = torch.sigmoid(
        _mlp_bn(params, "discriminator2", z_gen, "sigmoid"))[:, 0]
    return z, z_gen, x_dec, probs_all, p_gen


def test_aegis_losses_oracle(tiny):
    from ggad_tpu.models.aegis import AEGIS, aegis_losses

    ds, adj, raw, x = tiny
    model = AEGIS(n_h=12)
    rng = jax.random.PRNGKey(4)
    noise = jax.random.normal(jax.random.PRNGKey(5), (ds.n_nodes, 16))
    params = model.init({"params": rng}, adj, x, noise)
    out = model.apply(params, adj, x, noise)
    train_idx = np.asarray(ds.normal_label_idx)
    la, ld, lg = aegis_losses(out, x, jnp.asarray(train_idx, jnp.int32))

    adj_d = _t(to_scipy(adj).toarray())
    xt = _t(x)
    z, z_gen, x_dec, probs_all, p_gen = _aegis_torch_forward(
        params, adj_d, xt, noise)

    la_t = float(_attr_err(xt, x_dec)[train_idx].mean())
    n = ds.n_nodes
    pr = probs_all[:n][train_idx]
    pg_all = probs_all[n:]
    # torch F.binary_cross_entropy semantics (log clamp -100)
    ld_t = float(-(torch.clamp(torch.log(1 - pr), min=-100).sum()
                   + torch.clamp(torch.log(pg_all), min=-100).sum())
                 / (len(train_idx) + len(pg_all)))
    lg_t = float(torch.nn.functional.binary_cross_entropy(
        p_gen, torch.zeros_like(p_gen)))
    np.testing.assert_allclose(float(la), la_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(ld), ld_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(lg), lg_t, rtol=1e-4, atol=1e-4)


def test_aegis_faithful_step_matches_two_optimizer_torch(tiny):
    """The faithful adversarial step (grad(loss_g + loss_ae) → full-params
    Adam + generator-only Adam on the same grads) must equal the
    reference's effective wiring: ``loss_g.backward(); loss_dis.backward()``
    with loss_dis IS loss_ae (model_AEGIS.py:240), then
    ``optimiser.step(); optimiser_gen.step()`` (aegis.py:128-140)."""
    import optax
    from ggad_tpu.models.aegis import AEGIS, aegis_losses
    from ggad_tpu.train.baselines import _generator_mask, generator_only_adam

    ds, adj, raw, x = tiny
    model = AEGIS(n_h=6, hid_dim=5, noise_dim=4)
    noise = jax.random.normal(jax.random.PRNGKey(7), (ds.n_nodes, 4))
    params = model.init({"params": jax.random.PRNGKey(6)}, adj, x, noise)
    all_idx = jnp.arange(ds.n_nodes, dtype=jnp.int32)
    lr = 1e-2

    tx_adv = optax.adam(lr)
    tx_gen = generator_only_adam(lr, _generator_mask(params))

    def loss_fn(p):
        out = model.apply(p, adj, x, noise)
        la, _, lg = aegis_losses(out, x, all_idx)
        return la + lg

    grads = jax.grad(loss_fn)(params)
    opt = tx_adv.init(params)
    opt_g = tx_gen.init(params)
    upd, opt = tx_adv.update(grads, opt, params)
    new_params = optax.apply_updates(params, upd)
    upd_g, opt_g = tx_gen.update(grads, opt_g, new_params)
    new_params = optax.apply_updates(new_params, upd_g)

    # ---- torch replica of the reference's effective step ---------------
    adj_d = _t(to_scipy(adj).toarray())
    xt = _t(x)
    flat = {}

    def as_param(path, arr):
        t = _t(arr).clone().requires_grad_(True)
        flat[path] = t
        return t

    import flax
    pf = flax.traverse_util.flatten_dict(params["params"])
    tp = {k: as_param(k, v) for k, v in pf.items()}

    def gcn_named(h, name):
        out = adj_d @ (h @ tp[(name, "fc", "kernel")]) \
            + tp[(name, "bias")]
        return _prelu(out, tp[(name, "prelu", "alpha")])

    def mlp(name, h, act):
        h = h @ tp[(name, "lin1", "kernel")] + tp[(name, "lin1", "bias")]
        mean = h.mean(0)
        var = h.var(0, unbiased=False)
        h = (h - mean) / torch.sqrt(var + 1e-5) \
            * tp[(name, "bn_scale")] + tp[(name, "bn_bias")]
        h = torch.relu(h) if act == "relu" else torch.sigmoid(h)
        return h @ tp[(name, "lin2", "kernel")] + tp[(name, "lin2", "bias")]

    x_gen = mlp("generator", _t(noise), "relu")
    z_gen = gcn_named(gcn_named(x_gen, "gcn_enc1"), "gcn_enc2")
    z = gcn_named(gcn_named(xt, "gcn_enc1"), "gcn_enc2")
    x_dec = gcn_named(gcn_named(z, "gcn_dec1"), "gcn_dec2")
    p_gen = torch.sigmoid(mlp("discriminator2", z_gen, "sigmoid"))[:, 0]

    loss_ae = _attr_err(xt, x_dec).mean()
    loss_g = torch.nn.functional.binary_cross_entropy(
        p_gen, torch.zeros_like(p_gen))

    all_params = list(flat.values())
    gen_params = [v for k, v in flat.items() if k[0] == "generator"]
    opt_all = torch.optim.Adam(all_params, lr=lr)
    opt_gen = torch.optim.Adam(gen_params, lr=lr)
    opt_all.zero_grad()
    loss_g.backward(retain_graph=True)
    loss_ae.backward()
    opt_all.step()
    opt_gen.step()

    # BN-shadowed biases (the Linear feeding a BatchNorm) are
    # forward-invisible: BN subtracts the batch mean, so their exact
    # gradient is 0 and both frameworks produce float-noise gradients
    # that Adam amplifies to lr-scale chaotic (but output-irrelevant)
    # updates — not comparable, and harmless (the executed AEGIS oracle
    # leg confirms trajectory parity regardless).
    bn_shadowed = {("generator", "lin1", "bias"),
                   ("discriminator2", "lin1", "bias")}
    nf = flax.traverse_util.flatten_dict(new_params["params"])
    for k, v in nf.items():
        if k in bn_shadowed:
            continue
        np.testing.assert_allclose(
            np.asarray(v), flat[k].detach().numpy(), rtol=2e-4, atol=2e-5,
            err_msg=str(k))


# ---------------------------------------------------------------------------
# GAAN — discriminator BCE over train-row edges + generator recon
# (model_gaan.py:266-270, 318-326)
# ---------------------------------------------------------------------------

def test_gaan_losses_oracle(tiny):
    from ggad_tpu.models.gaan import GAAN, gaan_losses, gaan_scores

    ds, adj, raw, x = tiny
    model = GAAN(noise_dim=4, hid_dim=8)
    noise = jax.random.normal(jax.random.PRNGKey(9), (ds.n_nodes, 4))
    params = model.init({"params": jax.random.PRNGKey(8)}, x, noise)
    out = model.apply(params, x, noise)

    train_idx = np.asarray(ds.normal_label_idx)
    mask = np.zeros(ds.n_nodes, bool)
    mask[train_idx] = True
    ld, lg = gaan_losses(out, adj, x, jnp.asarray(mask),
                         jnp.asarray(train_idx, jnp.int32))

    z = _t(out.z)
    z_gen = _t(out.z_gen)
    x_gen = _t(out.x_gen)
    row = np.asarray(adj.row)
    col = np.asarray(adj.col)
    val = np.asarray(adj.val)
    sel = mask[row] & (val != 0)
    a_real = torch.sigmoid((z[row[sel]] * z[col[sel]]).sum(1))
    a_fake = torch.sigmoid((z_gen[row[sel]] * z_gen[col[sel]]).sum(1))
    # torch F.binary_cross_entropy semantics (model_gaan.py:266-270)
    loss_r = torch.nn.functional.binary_cross_entropy(
        a_real, torch.ones_like(a_real))
    loss_f = torch.nn.functional.binary_cross_entropy(
        a_fake, torch.zeros_like(a_fake))
    ld_t = float(0.5 * (loss_r + loss_f))
    lg_t = float(_attr_err(_t(x), x_gen)[train_idx].mean())
    np.testing.assert_allclose(float(ld), ld_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(lg), lg_t, rtol=1e-4, atol=1e-4)

    scores = np.asarray(gaan_scores(out, x))
    expect = _attr_err(_t(x), x_gen).numpy()
    np.testing.assert_allclose(scores, expect, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# TAM — max_message loss on the raw graph (tam.py:113-133)
# ---------------------------------------------------------------------------

def test_tam_loss_oracle(tiny):
    from ggad_tpu.models.tam import tam_loss

    ds, adj, raw, x = tiny
    emb = jax.random.normal(jax.random.PRNGKey(11), (ds.n_nodes, 9))
    normal_idx = np.asarray(ds.normal_label_idx)
    loss, message = tam_loss(emb, raw, jnp.asarray(normal_idx, jnp.int32))

    embt = _t(emb)
    raw_d = _t(to_scipy(raw).toarray())
    f = embt / torch.norm(embt, dim=-1, keepdim=True)
    sim = (f @ f.T) * raw_d
    r_inv = 1.0 / raw_d.sum(0)
    r_inv[torch.isinf(r_inv)] = 0.0
    msg = sim.sum(1) * r_inv
    msg_n = (msg - msg.min()) / (msg.max() - msg.min())
    expect = float(-msg_n[normal_idx].sum())
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(message), msg.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_aegis_faithful_driver_smoke(tiny):
    from ggad_tpu.train.baselines import run_aegis

    ds, *_ = tiny
    res = run_aegis(ds, num_epoch=3, recon_num_epoch=2, embedding_dim=8,
                    eval_every=2, faithful=True)
    assert np.isfinite(res.auc)
