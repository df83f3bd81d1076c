"""TAM 500-epoch drift attribution: float64 trajectory oracle.

The executed-oracle TAM leg (``reference_oracle.py --leg tam``) shows
~1%/500-epoch loss drift between the reference (torch f32 dense
matmuls) and our ensemble (f32 ELL slot order), attributed to f32
summation-order bias. This script PROVES the attribution: it trains an
independent float64 mirror of each member (same captured NSGT cuts +
init weights, jax x64 autodiff + f64 Adam, the reference's
zero_grad-once-per-member gradient-ACCUMULATION quirk included,
``tam.py:180,195-196``) and measures how far the f32 reference drifts
from the f64 truth. If |ref_f32 − mirror_f64| reaches the same order
as the ours-vs-ref envelope, the drift is summation precision, not
semantics. (Running the reference itself under
``torch.set_default_dtype(float64)`` is impossible without editing it:
its ``torch.FloatTensor`` literals crash against f64 activations.)

Usage (CPU):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/tam_f64_leg.py [--nodes 150] [--cutting 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("TAM_F64_CHILD"):
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp


def member_f64_trajectory(cut: np.ndarray, sd: dict, feats: np.ndarray,
                          raw_adj: np.ndarray, normal_idx: np.ndarray,
                          num_epoch: int = 500, lr: float = 1e-5,
                          record_every: int = 50) -> list:
    """One TAM member's training in float64, mirroring
    ``tam.py:180-198`` exactly: D^-1/2 cut D^-1/2 forward
    (``normalize_adj_tensor``), max_message loss on raw_adj, Adam on
    the RUNNING SUM of gradients (zero_grad is outside the epoch
    loop)."""
    f64 = jnp.float64
    x = jnp.asarray(feats, f64)
    raw = jnp.asarray(raw_adj, f64)

    deg = np.asarray(cut, np.float64).sum(axis=0)
    dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    adj_n = jnp.asarray(dinv[None, :] * np.asarray(cut, np.float64)
                        * dinv[:, None], f64)
    # torch order: mm(adj, diag(r)) then mm(diag(r), ·) → r_i A_ij r_j ✓

    params = {
        "w1": jnp.asarray(sd["gcn1.fc.weight"], f64),
        "b1": jnp.asarray(sd["gcn1.bias"], f64),
        "a1": jnp.asarray(sd["gcn1.act.weight"], f64).reshape(()),
        "w2": jnp.asarray(sd["gcn2.fc.weight"], f64),
        "b2": jnp.asarray(sd["gcn2.bias"], f64),
        "a2": jnp.asarray(sd["gcn2.act.weight"], f64).reshape(()),
    }
    rinv_raw = jnp.where(raw.sum(axis=0) > 0, 1.0 / raw.sum(axis=0), 0.0)
    normal_idx = jnp.asarray(normal_idx)

    def prelu(v, a):
        return jnp.where(v >= 0, v, a * v)

    def loss_fn(p):
        h = prelu(adj_n @ (x @ p["w1"].T) + p["b1"], p["a1"])
        emb = prelu(adj_n @ (h @ p["w2"].T) + p["b2"], p["a2"])
        f = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        sim = (f @ f.T) * raw
        msg = jnp.sum(sim, axis=1) * rinv_raw
        msg = (msg - jnp.min(msg)) / (jnp.max(msg) - jnp.min(msg))
        return -jnp.sum(msg[normal_idx])

    tx = optax.adam(lr)
    opt = tx.init(params)
    acc = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def step(params, opt, acc):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        acc = jax.tree.map(jnp.add, acc, grads)
        updates, opt = tx.update(acc, opt, params)
        return optax.apply_updates(params, updates), opt, acc, loss

    rec = []
    for ep in range(num_epoch):
        params, opt, acc, loss = step(params, opt, acc)
        if ep % record_every == 0:
            rec.append(float(loss))   # pre-update loss, like the print
    return rec


def run_child_mirror(payload_path: str):
    """x64 child: f64 mirror trajectories for every member."""
    import pickle

    with open(payload_path, "rb") as f:
        pay = pickle.load(f)
    out = []
    for cut, sd in zip(pay["cuts"], pay["state_dicts"]):
        out.append(member_f64_trajectory(
            cut, sd, pay["feats"], pay["raw"], pay["normal_idx"]))
    with open(payload_path + ".out", "w") as f:
        json.dump(out, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=150)
    ap.add_argument("--cutting", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default=None)
    ap.add_argument("--mirror-only", default=None,
                    help="(internal) payload path for the x64 child")
    args = ap.parse_args()

    if args.mirror_only:
        return run_child_mirror(args.mirror_only)

    from reference_oracle import export_mat, run_reference_tam
    from ggad_tpu.datasets.synthetic import synthetic_gad

    ds = synthetic_gad(n_nodes=args.nodes, avg_degree=8, feat_dim=10,
                       n_communities=4, anomaly_rate=0.1, seed=args.seed)
    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        export_mat(ds, os.path.join(tmp, "data", "oraclesynth.mat"))
        ref = run_reference_tam("oraclesynth", tmp,
                                cutting=args.cutting, seed=args.seed)

    (adj, feat, _ano, _s, _a, normal_idx, _it) = ref["load"]
    feats = np.asarray(sp.csr_matrix(feat).todense(), np.float64)
    raw = np.asarray((sp.csr_matrix(adj)
                      + sp.eye(adj.shape[0])).todense(), np.float64)

    # ---- our f32 ensemble under the captured cuts/inits (parent:
    # x64 OFF, the production configuration) ----
    from reference_oracle import run_ours_tam

    ours = run_ours_tam(ref, cutting=args.cutting)

    # ---- f64 mirror in an x64 child process ----
    import pickle
    import subprocess

    ref_losses = ref["trajectory"]["losses"]   # member-major, 10/member
    with tempfile.TemporaryDirectory() as tmp:
        payload = os.path.join(tmp, "payload.pkl")
        with open(payload, "wb") as f:
            pickle.dump({"cuts": ref["cuts"],
                         "state_dicts": ref["state_dicts"],
                         "feats": feats, "raw": raw,
                         "normal_idx": np.asarray(normal_idx)}, f)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(JAX_PLATFORMS="cpu", TAM_F64_CHILD="1")
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--mirror-only", payload], env=env, check=True)
        with open(payload + ".out") as f:
            mirrors = json.load(f)

    rows = []
    for m, rec64 in enumerate(mirrors):
        r32 = ref_losses[m * 10:(m + 1) * 10]
        o32 = [float(ours["losses"][m * 10 + k]) for k in range(10)]
        d_ref = [abs(a - b) / max(abs(a), 1.0)
                 for a, b in zip(r32, rec64)]
        d_ours = [abs(a - b) / max(abs(a), 1.0)
                  for a, b in zip(o32, rec64)]
        rows.append({"member": m,
                     "ref_f32_vs_f64_max_rel": max(d_ref),
                     "ours_f32_vs_f64_max_rel": max(d_ours),
                     "ref_f32": r32, "ours_f32": o32,
                     "mirror_f64": rec64})
        print(f"member {m}: ref_f32-vs-f64 max rel {max(d_ref):.2e} | "
              f"ours_f32-vs-f64 max rel {max(d_ours):.2e}", flush=True)

    print(json.dumps({"members": rows}, default=float))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"tam_f64": rows}, f, indent=1, default=float)


if __name__ == "__main__":
    main()
