"""Multi-step training parity: ggad_tpu vs a torch reference-semantics
implementation with identical initial weights (SURVEY.md P4 harness).

Covers the full loop: forward, 3-term loss, backward through the in-place
seed replacement, and Adam — losses must track within float32 drift over
several epochs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggad_tpu.datasets.synthetic import synthetic_gad
from ggad_tpu.graph import from_scipy, to_scipy
from ggad_tpu.models.ggad import GGAD
from ggad_tpu.ops.normalize import normalize_adj_reference
from ggad_tpu.train.losses import ggad_losses

from tests.test_ggad_fullbatch import get_flax_weights


@pytest.mark.slow
def test_training_trajectory_matches_torch():
    torch = pytest.importorskip("torch")

    ds = synthetic_gad(n_nodes=80, avg_degree=6, feat_dim=10,
                       n_communities=3, anomaly_rate=0.1, seed=11)
    g = from_scipy(ds.adj)
    adj, raw = normalize_adj_reference(g)
    x = jnp.asarray(ds.features)
    si = jnp.asarray(ds.abnormal_label_idx, jnp.int32)
    ni = jnp.asarray(ds.normal_label_idx, jnp.int32)
    n_h = 12
    lr = 1e-3
    n_epochs = 6

    model = GGAD(n_h=n_h, noise_mean=0.02, noise_std=0.0)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        adj, x, si, ni, train=True)

    import optax
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, adj, x, si, ni, train=True,
                              rngs={"noise": jax.random.PRNGKey(2)})
            return ggad_losses(out, raw, si, ni).total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for _ in range(n_epochs):
        params, opt_state, loss = step(params, opt_state)
        jax_losses.append(float(loss))

    # ---- torch mirror (fresh re-derivation of reference semantics) ----
    adj_d = torch.tensor(to_scipy(adj).toarray())
    raw_d = torch.tensor(to_scipy(raw).toarray())
    xt = torch.tensor(np.asarray(x))
    sit = np.asarray(si)
    nit = np.asarray(ni)
    w = {k: torch.tensor(np.asarray(v), requires_grad=True)
         for k, v in get_flax_weights(model.init(
             {"params": jax.random.PRNGKey(0),
              "noise": jax.random.PRNGKey(1)},
             adj, x, si, ni, train=True)).items()}
    opt = torch.optim.Adam(list(w.values()), lr=lr)

    def prelu(v, a):
        return torch.where(v >= 0, v, a * v)

    torch_losses = []
    for _ in range(n_epochs):
        opt.zero_grad()
        h1 = prelu(adj_d @ (xt @ w["W1"]) + w["b1"], w["a1"])
        emb = prelu(adj_d @ (h1 @ w["W2"]) + w["b2"], w["a2"])
        emb_abn = emb[sit] + 0.02
        emb_con = torch.relu((adj_d[sit] @ emb) @ w["W4"])
        comb = torch.cat([emb[nit], emb_con], 0)
        f2 = torch.relu(torch.relu(comb @ w["Wf1"]) @ w["Wf2"])
        logits = (f2 @ w["Wf3"])[:, 0]
        emb_out = emb.clone()
        emb_out[sit] = emb_con
        y = torch.cat([torch.zeros(len(nit)), torch.ones(len(sit))])
        bce = torch.mean((1 - y) * torch.nn.functional.softplus(logits)
                         + y * torch.nn.functional.softplus(-logits))
        norm = emb_out.norm(dim=1, keepdim=True)
        emb_n = emb_out * torch.where(norm > 0, 1 / norm,
                                      torch.zeros_like(norm))
        aff = ((emb_n @ emb_n.T) * raw_d).sum(0) / raw_d.sum(0)
        margin = torch.clamp(0.7 - (aff[nit].mean() - aff[sit].mean()),
                             min=0)
        # seed-axis sum: reference's batch-dim broadcast quirk
        # (run.py:207-208, verified by scripts/reference_oracle.py)
        rec = (emb_con - emb_abn).pow(2).sum(0).sqrt().mean()
        total = bce + margin + rec
        total.backward()
        opt.step()
        torch_losses.append(float(total))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3,
                               atol=2e-4)
