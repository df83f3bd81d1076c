"""Execute the ACTUAL reference program as an end-to-end training oracle.

Every other parity test in this repo pins against *re-derived* torch/numpy
mirrors of the reference semantics; a shared misreading of the reference
would pass all of them.  This harness removes that failure mode: it runs
``/root/reference/run.py`` itself — unmodified, via ``runpy`` — on an
exported synthetic ``.mat`` and compares its printed per-epoch loss
trajectory and test AUROC/AP against :class:`FullBatchTrainer` under an
*identical* split and *identical* initial weights.

Why this is exact enough to compare trajectory-for-trajectory:

  * For any dataset name outside ``['reddit', 'photo']`` the reference
    forces ``mean = var = 0`` (``run.py:61-66``) and its perturbation is
    ``torch.randn(size) * var + mean`` (``model.py:143``) — exactly zero.
    Training is then fully deterministic given the initial weights.
  * The split is captured by recording ``utils.load_mat``'s return value
    (``utils.py:66-141``); the initial weights by recording
    ``Model.state_dict()`` at construction (``model.py:108-131``).
  * The reference's only irreproducible dependency is ``dgl``
    (``run.py:8,72``, ``utils.py:7,144-148``) — its sole *executed* use for
    GGAD is ``dgl.random.seed`` plus the dead ``adj_to_dgl_graph`` result
    (``run.py:92``, unused thereafter), so a 5-line stub is faithful.

Remaining divergence is pure float32 summation-order drift (dense torch
matmul vs. our sparse segment-sum aggregation), which compounds through
Adam; epoch-0 losses agree to ~1e-5 and the drift is reported per epoch.

Usage (CPU; scrub the remote-TPU plugin env first):

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/reference_oracle.py --nodes 500 --epochs 40

Writes ``ORACLE.json`` (side-by-side trajectories + diffs) at --out.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import tempfile
import types

import numpy as np
import scipy.io as sio
import scipy.sparse as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = os.environ.get("GGAD_REFERENCE_DIR", "/root/reference")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))  # pyg_shim


def install_shims():
    """Make the reference's imports satisfiable without dgl / old networkx.

    ``dgl`` (absent here) is used only for ``dgl.random.seed`` and the
    dead ``adj_to_dgl_graph`` (``utils.py:144-148``); networkx ≥3 renamed
    ``from_scipy_sparse_matrix`` → ``from_scipy_sparse_array``.
    """
    if "dgl" not in sys.modules:
        dgl = types.ModuleType("dgl")
        dgl.random = types.SimpleNamespace(seed=lambda s: None)
        dgl.DGLGraph = lambda *a, **k: None
        dgl.contrib = types.SimpleNamespace(sampling=None)
        sys.modules["dgl"] = dgl
    import networkx as nx

    if not hasattr(nx, "from_scipy_sparse_matrix"):
        nx.from_scipy_sparse_matrix = nx.from_scipy_sparse_array


def export_mat(ds, path: str):
    """Write a dataset in the reference's ``.mat`` schema (utils.py:69-87)."""
    sio.savemat(path, {
        "Network": sp.csr_matrix(ds.adj),
        "Attributes": sp.csr_matrix(np.asarray(ds.features, np.float64)),
        "Label": np.asarray(ds.ano_labels).reshape(1, -1),
    })


def run_reference(dataset: str, workdir: str, *, epochs: int,
                  lr: float = 1e-3, seed: int = 0) -> dict:
    """Run ``/root/reference/run.py`` unmodified; capture split, init
    weights, and stdout. ``workdir`` must contain ``dataset/<name>.mat``."""
    install_shims()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import model as ref_model  # /root/reference/model.py
    import utils as ref_utils  # /root/reference/utils.py

    holder: dict = {}
    orig_load = ref_utils.load_mat
    orig_init = ref_model.Model.__init__

    def load_rec(*a, **k):
        out = orig_load(*a, **k)
        holder["load"] = out
        return out

    def init_rec(self, *a, **k):
        orig_init(self, *a, **k)
        # .clone() is load-bearing: optimiser.step() mutates the params
        # in place, and .numpy() without a copy would alias that memory —
        # the "captured init" would silently become the trained weights.
        holder["state_dict"] = {
            k2: v.detach().cpu().clone().numpy()
            for k2, v in self.state_dict().items()}

    ref_utils.load_mat = load_rec
    ref_model.Model.__init__ = init_rec
    argv = ["run.py", "--dataset", dataset, "--lr", str(lr),
            "--num_epoch", str(epochs), "--seed", str(seed)]
    buf = io.StringIO()
    old_argv, old_cwd = sys.argv, os.getcwd()
    try:
        os.chdir(workdir)
        sys.argv = argv
        import runpy

        with contextlib.redirect_stdout(buf):
            runpy.run_path(os.path.join(REFERENCE_DIR, "run.py"),
                           run_name="__main__")
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        ref_utils.load_mat = orig_load
        ref_model.Model.__init__ = orig_init
    holder["stdout"] = buf.getvalue()
    holder["trajectory"] = parse_reference_stdout(holder["stdout"])
    return holder


def run_reference_ocgnn(dataset: str, workdir: str, *, epochs: int,
                        lr: float = 1e-3, seed: int = 0) -> dict:
    """Run ``/root/reference/ocgnn.py`` unmodified (torch-only + the same
    dgl stub). OCGNN training is fully deterministic — no RNG is consumed
    after init (``ocgnn.py:80-113`` re-creates r=0, c=0 every call; the
    warmup block's update is discarded)."""
    install_shims()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import model_ocgnn as ref_model_ocgnn
    import utils as ref_utils

    holder: dict = {}
    orig_load = ref_utils.load_mat
    orig_init = ref_model_ocgnn.Model.__init__

    def load_rec(*a, **k):
        out = orig_load(*a, **k)
        holder["load"] = out
        return out

    def init_rec(self, *a, **k):
        orig_init(self, *a, **k)
        holder["state_dict"] = {
            k2: v.detach().cpu().clone().numpy()
            for k2, v in self.state_dict().items()}

    ref_utils.load_mat = load_rec
    ref_model_ocgnn.Model.__init__ = init_rec
    argv = ["ocgnn.py", "--dataset", dataset, "--lr", str(lr),
            "--num_epoch", str(epochs), "--seed", str(seed)]
    buf = io.StringIO()
    old_argv, old_cwd = sys.argv, os.getcwd()
    try:
        os.chdir(workdir)
        sys.argv = argv
        import runpy

        with contextlib.redirect_stdout(buf):
            runpy.run_path(os.path.join(REFERENCE_DIR, "ocgnn.py"),
                           run_name="__main__")
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        ref_utils.load_mat = orig_load
        ref_model_ocgnn.Model.__init__ = orig_init
    holder["stdout"] = buf.getvalue()
    text = holder["stdout"]
    losses = {int(m.group(1)): {"total": float(m.group(2))}
              for m in re.finditer(r"Epoch: (\d+) train_loss= ([-\d.eE]+)",
                                   text)}
    aucs = [float(m.group(1))
            for m in re.finditer(r"Testing \S+ AUC:([\d.eE-]+)", text)]
    aps = [float(m.group(1))
           for m in re.finditer(r"Testing AP: ([\d.eE-]+)", text)]
    evals = {5 * i: {"auc": a, "ap": p}
             for i, (a, p) in enumerate(zip(aucs, aps))}
    holder["trajectory"] = {"losses": losses, "evals": evals}
    return holder


def ocgnn_flax_params_from_state_dict(sd: dict) -> dict:
    """torch OCGNN ``Model.state_dict()`` → our OCGNNEncoder param tree
    (the disc/readout members are unused in its forward,
    ``model_ocgnn.py:128-131``)."""
    def T(k):
        return np.asarray(sd[k], np.float32)

    def gcn(name):
        return {"fc": {"kernel": T(f"{name}.fc.weight").T},
                "bias": T(f"{name}.bias"),
                "prelu": {"alpha": T(f"{name}.act.weight").reshape(())}}

    return {"params": {"gcn1": gcn("gcn1"), "gcn2": gcn("gcn2")}}


def run_ours_ocgnn(ds, initial_params, *, epochs: int,
                   lr: float = 1e-3) -> dict:
    from ggad_tpu.train.baselines import run_ocgnn

    res = run_ocgnn(ds, num_epoch=epochs, lr=lr, eval_every=5,
                    initial_params=initial_params)
    losses = {r["epoch"]: {"total": r["loss"]} for r in res.history}
    evals = {r["epoch"]: {"auc": r["auc"], "ap": r["ap"]}
             for r in res.history}
    return {"losses": losses, "evals": evals}


# ---------------------------------------------------------------------------
# Baseline-driver legs (dominant / anomalyDAE / aegis / gaan)
# ---------------------------------------------------------------------------
#
# These four drivers import torch_geometric modules that are LIVE in
# their forward passes (PyG ``GCN``/``GATConv``/``MLP``); the faithful
# torch-only reimplementation in :mod:`scripts.pyg_shim` (semantics of
# the pinned torch_geometric==2.1.0) lets the ACTUAL driver code —
# where the known quirks live (AEGIS's loss unpacking at
# ``model_AEGIS.py:240``, GAAN's double generator step at
# ``gaan.py:132-135``, the hard ``.cuda()`` at ``model_domaint.py:169``)
# — execute unmodified.

@contextlib.contextmanager
def _cpu_cuda_shim():
    """Identity-patch ``Tensor.cuda`` for the drivers with hard-coded
    ``.cuda()`` calls (``model_domaint.py:169``, ``model_AEGIS.py:
    201,223``, ``aegis.py:149``) on this CUDA-less host. The reference
    itself ran on CPU (``README.md:21``) with these lines as latent
    bugs."""
    import torch

    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


@contextlib.contextmanager
def _capture_randn(holder: dict, shape):
    """Record every ``torch.randn`` draw matching ``shape`` (the
    per-forward noise, ``model_AEGIS.py:232`` / ``model_gaan.py:312``)
    so our side can replay the identical sequence."""
    import torch

    orig = torch.randn
    holder.setdefault("noise", [])

    def rec(*a, **k):
        out = orig(*a, **k)
        if tuple(out.shape) == tuple(shape):
            holder["noise"].append(out.detach().clone().numpy())
        return out

    torch.randn = rec
    try:
        yield
    finally:
        torch.randn = orig


def run_reference_baseline(driver: str, model_module: str, dataset: str,
                           workdir: str, *, epochs: int, lr: float,
                           seed: int = 0, patch_cuda: bool = False,
                           noise_shape=None, no_draw: bool = False) -> dict:
    """Execute ``/root/reference/<driver>.py`` unmodified via runpy with
    the PyG shim installed; capture the split (``utils.load_mat``), the
    init weights (``Model.state_dict()``), the stdout trajectory, and —
    when ``noise_shape`` is given — the per-forward noise draws."""
    install_shims()
    from pyg_shim import install_pyg_shim

    install_pyg_shim()
    _stub_torch_geometric()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib

    ref_model = importlib.import_module(model_module)
    import utils as ref_utils

    holder: dict = {}
    orig_load = ref_utils.load_mat
    orig_init = ref_model.Model.__init__
    orig_draw = getattr(ref_utils, "draw_pdf_methods", None)

    def load_rec(*a, **k):
        out = orig_load(*a, **k)
        holder["load"] = out
        return out

    def init_rec(self, *a, **k):
        orig_init(self, *a, **k)
        holder["state_dict"] = {
            k2: v.detach().cpu().clone().numpy()
            for k2, v in self.state_dict().items()}

    ref_utils.load_mat = load_rec
    ref_model.Model.__init__ = init_rec
    if no_draw and orig_draw is not None:
        # diagnostics-only (affinity-histogram figures on a matplotlib
        # API removed after 3.0.x, aegis.py:175-177); consumes no RNG,
        # touches no training state
        ref_utils.draw_pdf_methods = lambda *a, **k: None
    argv = [f"{driver}.py", "--dataset", dataset, "--lr", str(lr),
            "--num_epoch", str(epochs), "--seed", str(seed)]
    buf = io.StringIO()
    old_argv, old_cwd = sys.argv, os.getcwd()
    ctx = _cpu_cuda_shim() if patch_cuda else contextlib.nullcontext()
    nctx = (_capture_randn(holder, noise_shape)
            if noise_shape is not None else contextlib.nullcontext())
    try:
        os.chdir(workdir)
        sys.argv = argv
        import runpy

        with ctx, nctx, contextlib.redirect_stdout(buf):
            runpy.run_path(os.path.join(REFERENCE_DIR, f"{driver}.py"),
                           run_name="__main__")
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        ref_utils.load_mat = orig_load
        ref_model.Model.__init__ = orig_init
        if no_draw and orig_draw is not None:
            ref_utils.draw_pdf_methods = orig_draw
    text = holder["stdout"] = buf.getvalue()
    losses = {int(m.group(1)): {"total": float(m.group(2))}
              for m in re.finditer(
                  r"Epoch: (\d+) train_loss= ([-\d.eE]+)", text)}
    pre = [float(m.group(2)) for m in re.finditer(
        r"Epoch: (\d+) ae_loss= ([-\d.eE]+)", text)]
    aucs = [float(m.group(1))
            for m in re.finditer(r"Testing \S+ AUC:([\d.eE-]+)", text)]
    aps = [float(m.group(1))
           for m in re.finditer(r"Testing AP: ([\d.eE-]+)", text)]
    evals = {5 * i: {"auc": a, "ap": p}
             for i, (a, p) in enumerate(zip(aucs, aps))}
    holder["trajectory"] = {"losses": losses, "evals": evals,
                            "pretrain_losses": pre}
    return holder


def _lin_p(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{name}.bias"], np.float32)}


def _gcn_p(sd, name):
    return {"fc": {"kernel": np.asarray(sd[f"{name}.fc.weight"],
                                        np.float32).T},
            "bias": np.asarray(sd[f"{name}.bias"], np.float32),
            "prelu": {"alpha": np.asarray(sd[f"{name}.act.weight"],
                                          np.float32).reshape(())}}


def _mlp_p(sd, name):
    """Shim PyG-MLP state_dict → our PyGMLP params (BN running stats are
    never consumed — train-mode batch statistics only)."""
    return {"lin1": _lin_p(sd, f"{name}.lins.0"),
            "bn_scale": np.asarray(sd[f"{name}.norms.0.weight"],
                                   np.float32),
            "bn_bias": np.asarray(sd[f"{name}.norms.0.bias"], np.float32),
            "lin2": _lin_p(sd, f"{name}.lins.1")}


def dominant_flax_params_from_state_dict(sd: dict) -> dict:
    """torch DOMINANT ``Model.state_dict()`` → our Dominant tree (the
    disc/readout members are dead, ``model_domaint.py:105``)."""
    def conv(i):
        return {"fc": {"kernel": np.asarray(
            sd[f"gat_layer.convs.{i}.lin.weight"], np.float32).T},
            "bias": np.asarray(sd[f"gat_layer.convs.{i}.bias"],
                               np.float32)}

    return {"params": {
        "dense_stru": _lin_p(sd, "dense_stru"),
        "gcn1": conv(0), "gcn2": conv(1),
        "dense_attr_1": _lin_p(sd, "dense_attr_1"),
        "dense_attr_2": _lin_p(sd, "dense_attr_2")}}


def anomalydae_flax_params_from_state_dict(sd: dict) -> dict:
    return {"params": {
        "dense_stru": _lin_p(sd, "dense_stru"),
        "gat": {"kernel": np.asarray(sd["gat_layer.lin_src.weight"],
                                     np.float32).T,
                "att_src": np.asarray(sd["gat_layer.att_src"],
                                      np.float32).reshape(1, -1),
                "att_dst": np.asarray(sd["gat_layer.att_dst"],
                                      np.float32).reshape(1, -1),
                "bias": np.asarray(sd["gat_layer.bias"], np.float32)},
        "dense_attr_1": _lin_p(sd, "dense_attr_1"),
        "dense_attr_2": _lin_p(sd, "dense_attr_2")}}


def aegis_flax_params_from_state_dict(sd: dict) -> dict:
    """(the ``discriminator`` MLP is constructed but never called in the
    AEGIS forward, ``model_AEGIS.py:164-170`` — zero grad, Adam no-op,
    so dropping it preserves the trajectory)"""
    return {"params": {
        "gcn_enc1": _gcn_p(sd, "gcn_enc1"),
        "gcn_enc2": _gcn_p(sd, "gcn_enc2"),
        "gcn_dec1": _gcn_p(sd, "gcn_dec1"),
        "gcn_dec2": _gcn_p(sd, "gcn_dec2"),
        "generator": _mlp_p(sd, "generator"),
        "discriminator2": _mlp_p(sd, "discriminator2")}}


def gaan_flax_params_from_state_dict(sd: dict) -> dict:
    return {"params": {
        "generator": _mlp_p(sd, "generator"),
        "discriminator": _mlp_p(sd, "discriminator")}}


def run_ours_recon(model_name: str, ds, initial_params, *, epochs: int,
                   lr: float) -> dict:
    from ggad_tpu.train.baselines import run_reconstruction

    res = run_reconstruction(model_name, ds, num_epoch=epochs, lr=lr,
                             eval_every=1, initial_params=initial_params)
    losses = {r["epoch"]: {"total": r["loss"]} for r in res.history}
    evals = {r["epoch"]: {"auc": r["auc"], "ap": r["ap"]}
             for r in res.history}
    return {"losses": losses, "evals": evals}


def run_ours_aegis(ds, initial_params, noise, *, epochs: int,
                   lr: float) -> dict:
    from ggad_tpu.train.baselines import run_aegis

    res = run_aegis(ds, num_epoch=epochs, recon_num_epoch=10, lr=lr,
                    eval_every=1, faithful=True,
                    initial_params=initial_params, noise_seq=noise)
    losses = {r["epoch"]: {"total": r["loss"]} for r in res.history
              if "epoch" in r}
    evals = {r["epoch"]: {"auc": r["auc"], "ap": r["ap"]}
             for r in res.history if "auc" in r}
    pre = [r["loss"] for r in res.history if "pretrain_epoch" in r]
    return {"losses": losses, "evals": evals, "pretrain_losses": pre}


def run_ours_gaan(ds, initial_params, noise, *, epochs: int,
                  lr: float) -> dict:
    from ggad_tpu.train.baselines import run_gaan

    res = run_gaan(ds, num_epoch=epochs, lr=lr, eval_every=1,
                   faithful=True, initial_params=initial_params,
                   noise_seq=noise)
    losses = {r["epoch"]: {"total": r["loss"]} for r in res.history}
    evals = {r["epoch"]: {"auc": r["auc"], "ap": r["ap"]}
             for r in res.history}
    return {"losses": losses, "evals": evals}


BASELINE_LEGS = {
    "dominant": dict(driver="dominant", model_module="model_domaint",
                     patch_cuda=True, noise=False),
    "anomalydae": dict(driver="anomalyDAE",
                       model_module="model_AnomalyDAE",
                       patch_cuda=False, noise=False),
    "aegis": dict(driver="aegis", model_module="model_AEGIS",
                  patch_cuda=True, noise=True, no_draw=True),
    "gaan": dict(driver="gaan", model_module="model_gaan",
                 patch_cuda=False, noise=True),
}


def run_baseline_leg(leg: str, ds, workdir: str, *, epochs: int,
                     lr: float, seed: int = 0) -> dict:
    """One executed-reference baseline leg: run the driver, rebuild the
    captured dataset/init on our side, train, and diff trajectories."""
    cfg = BASELINE_LEGS[leg]
    print(f"[oracle] running reference {cfg['driver']}.py: "
          f"epochs={epochs} lr={lr}")
    ref = run_reference_baseline(
        cfg["driver"], cfg["model_module"], "oraclesynth", workdir,
        epochs=epochs, lr=lr, seed=seed, patch_cuda=cfg["patch_cuda"],
        noise_shape=((ds.n_nodes, 16) if cfg["noise"] else None),
        no_draw=cfg.get("no_draw", False))
    ds2 = dataset_from_reference_load(ref["load"])
    sd = ref["state_dict"]
    if leg == "dominant":
        ours = run_ours_recon(
            "dominant", ds2, dominant_flax_params_from_state_dict(sd),
            epochs=epochs, lr=lr)
    elif leg == "anomalydae":
        ours = run_ours_recon(
            "anomalydae", ds2,
            anomalydae_flax_params_from_state_dict(sd),
            epochs=epochs, lr=lr)
    elif leg == "aegis":
        ours = run_ours_aegis(
            ds2, aegis_flax_params_from_state_dict(sd), ref["noise"],
            epochs=epochs, lr=lr)
    else:
        ours = run_ours_gaan(
            ds2, gaan_flax_params_from_state_dict(sd), ref["noise"],
            epochs=epochs, lr=lr)
    diffs = compare(ref["trajectory"], ours)
    rpre = ref["trajectory"].get("pretrain_losses", [])
    opre = ours.get("pretrain_losses", [])
    pre_diffs = [abs(a - b) for a, b in zip(rpre, opre)]
    for i, d in enumerate(pre_diffs):
        print(f"[{leg}] pretrain {i}: ref {rpre[i]:.5f} ours "
              f"{opre[i]:.5f} |Δ| {d:.2e}")
    for row in diffs["loss_diffs"]:
        ep = row["epoch"]
        r = ref["trajectory"]["losses"][ep]["total"]
        o = ours["losses"][ep]["total"]
        print(f"[{leg}] epoch {ep:>4} ref {r:.5f} ours {o:.5f} "
              f"|Δ| {abs(r - o):.2e}")
    for row in diffs["eval_diffs"]:
        print(f"[{leg}] eval @{row['epoch']:>4}: ΔAUROC "
              f"{row['d_auc']:.4f} ΔAP {row['d_ap']:.4f}")
    return {"reference": ref["trajectory"], "ours": ours, "diffs": diffs,
            "pretrain_diffs": pre_diffs}


def _stub_torch_geometric():
    """Create or augment a torch_geometric stub with every class the
    reference imports at module level but never executes (GINConv in
    model_tam.py:266, GCNConv in src/graphsage.py:8)."""
    tg = sys.modules.get("torch_geometric")
    if tg is None:
        tg = types.ModuleType("torch_geometric")
        tg.nn = types.ModuleType("torch_geometric.nn")
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.nn"] = tg.nn
    for cls in ("GINConv", "GCNConv", "GATConv"):
        if not hasattr(tg.nn, cls):
            setattr(tg.nn, cls, type(cls, (), {}))


def run_reference_tam(dataset: str, workdir: str, *, cutting: int = 8,
                      seed: int = 0, inject: dict | None = None,
                      f64: bool = False) -> dict:
    """Run ``/root/reference/tam.py`` unmodified (torch-only; dgl and
    torch_geometric stubbed — the latter's only import is the GINConv
    used by the unused GIN class, ``model_tam.py:266-279``).

    TAM hardcodes lr=1e-5 and num_epoch=500 (``tam.py:35-36``) and runs
    UNSEEDED (every seeding line is commented out, ``tam.py:40-46``), so
    the harness captures everything stochastic: the split
    (``utils_tam.load_mat``), each member's NSGT cut adjacency
    (``graph_nsgt`` returns), and each member's init ``state_dict``.
    Given those, training is deterministic.

    ``inject``: a previous run's holder — its captured cuts/state_dicts
    are REPLAYED instead of re-drawn, making two runs identical up to
    arithmetic. ``f64``: run the reference under
    ``torch.set_default_dtype(float64)`` — paired with an injected f32
    run this isolates pure summation-precision drift (the round-5
    attribution experiment for the TAM 500-epoch envelope).
    """
    install_shims()
    _stub_torch_geometric()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import model_tam as ref_model_tam
    import utils_tam as ref_utils_tam

    holder: dict = {"cuts": [], "state_dicts": []}
    orig_load = ref_utils_tam.load_mat
    orig_nsgt = ref_utils_tam.graph_nsgt
    orig_init = ref_model_tam.Model.__init__
    import torch as _torch

    def load_rec(*a, **k):
        if inject is not None:
            holder["load"] = inject["load"]
            return inject["load"]
        out = orig_load(*a, **k)
        holder["load"] = out
        return out

    def nsgt_rec(dis_array, adj):
        if inject is not None:
            cut = inject["cuts"][len(holder["cuts"])]
            holder["cuts"].append(cut)
            return _torch.tensor(cut).to(adj.dtype)
        out = orig_nsgt(dis_array, adj)
        holder["cuts"].append(out.detach().clone().numpy())
        return out

    def init_rec(self, *a, **k):
        orig_init(self, *a, **k)
        if inject is not None:
            sd = inject["state_dicts"][len(holder["state_dicts"])]
            self.load_state_dict({k2: _torch.tensor(v).to(
                _torch.get_default_dtype())
                for k2, v in sd.items()})
            holder["state_dicts"].append(sd)
            return
        holder["state_dicts"].append({
            k2: v.detach().cpu().clone().numpy()
            for k2, v in self.state_dict().items()})

    ref_utils_tam.load_mat = load_rec
    ref_utils_tam.graph_nsgt = nsgt_rec
    ref_model_tam.Model.__init__ = init_rec
    old_dtype = _torch.get_default_dtype()
    if f64:
        _torch.set_default_dtype(_torch.float64)
    argv = ["tam.py", "--dataset", dataset, "--dataset_model", dataset,
            "--cutting", str(cutting), "--seed", str(seed)]
    buf = io.StringIO()
    old_argv, old_cwd = sys.argv, os.getcwd()
    try:
        os.chdir(workdir)
        os.makedirs("data", exist_ok=True)
        os.makedirs("distance_save", exist_ok=True)
        sys.argv = argv
        import runpy

        with contextlib.redirect_stdout(buf):
            runpy.run_path(os.path.join(REFERENCE_DIR, "tam.py"),
                           run_name="__main__")
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        _torch.set_default_dtype(old_dtype)
        ref_utils_tam.load_mat = orig_load
        ref_utils_tam.graph_nsgt = orig_nsgt
        ref_model_tam.Model.__init__ = orig_init
    text = holder["stdout"] = buf.getvalue()
    # per-member pre-update losses at epochs 0,50,...,450 (tam.py:196-198)
    losses = [float(m.group(1))
              for m in re.finditer(r"mean_loss is ([-\d.eE]+)", text)]
    aucs = [float(m.group(1))
            for m in re.finditer(r"AUC:([\d.eE-]+)", text)]
    aps = [float(m.group(1))
           for m in re.finditer(r"AP: ([\d.eE-]+)", text)]
    # per cut: [member AUCs ×N_tree], AP_test, AUC_test, AP_all, AUC_all
    holder["trajectory"] = {"losses": losses, "aucs": aucs, "aps": aps}
    return holder


def tam_flax_params_from_state_dicts(sds: list) -> dict:
    """Stacked member param tree for our TAMEncoder (gcn1 n_in→2h,
    gcn2 2h→h — ``model_tam.py:129-135``; fc1/fc2 feed only the
    commented-out regularizer and get no gradient)."""
    def gcn(sd, name):
        return {"fc": {"kernel": np.asarray(sd[f"{name}.fc.weight"],
                                            np.float32).T},
                "bias": np.asarray(sd[f"{name}.bias"], np.float32),
                "prelu": {"alpha": np.asarray(
                    sd[f"{name}.act.weight"], np.float32).reshape(())}}

    stacked = [{"params": {"gcn1": gcn(sd, "gcn1"),
                           "gcn2": gcn(sd, "gcn2")}} for sd in sds]
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *stacked)


def run_ours_tam(ref: dict, *, cutting: int, n_h: int = 128,
                 num_epoch: int = 500) -> dict:
    """Our TAM ensemble under the reference's captured cuts + inits."""
    import jax.numpy as jnp

    from ggad_tpu.graph import add_self_loops, from_scipy
    from ggad_tpu.models.tam import minmax, run_tam

    adj, feat, ano_labels, _str, _attr, normal_idx, idx_test = ref["load"]
    adj = sp.csr_matrix(adj)
    feats = np.asarray(feat.todense(), np.float32)
    graph = from_scipy(adj)
    raw_adj = add_self_loops(graph)
    e = raw_adj.n_edges
    row = np.asarray(raw_adj.row)[:e]
    col = np.asarray(raw_adj.col)[:e]
    val_stack = np.zeros((len(ref["cuts"]), raw_adj.row.shape[0]),
                         np.float32)
    for m, cut in enumerate(ref["cuts"]):
        val_stack[m, :e] = cut[row, col]
    params = tam_flax_params_from_state_dicts(ref["state_dicts"])
    res = run_tam(graph, raw_adj, feats,
                  np.asarray(normal_idx, np.int64),
                  n_h=n_h, cutting=cutting, n_tree=1,
                  num_epoch=num_epoch, lr=1e-5,
                  val_stack_override=val_stack,
                  member_params_override=params,
                  loss_record=list(range(0, num_epoch, 50)))

    from ggad_tpu.ops.metrics import average_precision, roc_auc

    ano = np.asarray(ano_labels).ravel()
    idx_test = np.asarray(idx_test)
    member_aucs = []
    for m in range(res.member_messages.shape[0]):
        s = 1.0 - np.asarray(minmax(jnp.asarray(res.member_messages[m])))
        member_aucs.append(roc_auc(ano, s))
    # the reference's mid-loop test AUC is the PER-CUT score (mean over
    # that cut's N_tree members only, tam.py:211-224), not the
    # cumulative ensemble (which is its third, all-nodes print)
    n_tree = res.member_messages.shape[0] // cutting
    per_cut = res.member_messages.reshape(cutting, n_tree, -1).mean(1)
    cut_scores = [1.0 - np.asarray(minmax(jnp.asarray(per_cut[c])))
                  for c in range(cutting)]
    cut_test = [(roc_auc(ano[idx_test], cut_scores[r][idx_test]),
                 average_precision(ano[idx_test],
                                   cut_scores[r][idx_test]))
                for r in range(cutting)]
    cut_all = [(roc_auc(ano, res.per_round_scores[r]),
                average_precision(ano, res.per_round_scores[r]))
               for r in range(cutting)]
    # flatten loss history to the reference's print order:
    # member-major, epoch-minor (tam.py trains members sequentially)
    n_members = res.member_messages.shape[0]
    eps = sorted(res.loss_history)
    flat_losses = [float(res.loss_history[ep][m])
                   for m in range(n_members) for ep in eps]
    return {"losses": flat_losses, "member_aucs": member_aucs,
            "cut_test": cut_test, "cut_all": cut_all}


def run_reference_minibatch(ds, workdir: str, *, num_epochs: int = 30,
                            seed: int = 72, batch_size: int = 150) -> dict:
    """Execute the reference's DGraph mini-batch path
    (``src/main.py`` → ``ModelHandler`` → GCNAggregator/GCNEncoder/GCN)
    unmodified on a synthetic dgraphfin-format dataset.

    torch_geometric's ``GCNConv`` is imported but never used
    (``src/graphsage.py:8``) — stubbed like dgl. The GCN model consumes
    NO RNG in its forward (``GCNAggregator`` is the exact set union —
    only ``MeanAggregator``, the SAGE path, samples), so capturing the
    shuffled batch sequence + pre-first-step weights pins the WHOLE
    trajectory; ``run_ours_minibatch_exact`` replays it.

    Round-5 finding: with the handler's hardcoded ``num_batches = 150``
    (``src/model_handler.py:317``), any run where
    150·batch_size > len(idx_train) hits EMPTY train slices → batches
    of only label-1 seeds → ``affinity_normal_mean`` = mean of an empty
    selection = NaN → NaN gradients poison the parameters from that
    batch on (``src/graphsage.py:238-241``). At DGraph scale the train
    pool is large enough; at oracle scale pass a small ``batch_size``
    to keep every batch populated (or use the default to reproduce the
    pathology itself).

    NB quirk reproduced as-is: ``ModelHandler.train`` assigns
    idx_valid = idx_test (``src/model_handler.py:260-261``) — "valid"
    selection happens on the test split.
    """
    install_shims()
    _stub_torch_geometric()
    src_dir = os.path.join(REFERENCE_DIR, "src")
    # the src/ package reuses module NAMES from the reference root
    # (utils, model) — purge any cached root-modules and front-load src
    for name in ("utils", "model", "layers", "graphsage",
                 "model_handler", "main"):
        sys.modules.pop(name, None)
    sys.path.insert(0, src_dir)

    run_dir = os.path.join(workdir, "run")
    os.makedirs(os.path.join(run_dir, "data"), exist_ok=True)
    os.makedirs(os.path.join(run_dir, "pytorch_models"), exist_ok=True)
    os.makedirs(os.path.join(workdir, "data"), exist_ok=True)
    np.savez(os.path.join(workdir, "data", "dgraphfin.npz"),
             x=np.asarray(ds.features, np.float32),
             y=np.asarray(ds.ano_labels, np.int64))

    import graphsage as src_gs         # /root/reference/src/graphsage.py
    import model_handler as src_mh
    import utils as src_utils          # /root/reference/src/utils.py

    # the reference's own offline prep builds the pickled adjacency list
    # (adds self-loops + symmetrizes, src/utils.py:45-61)
    src_utils.sparse_to_adjlist(
        sp.csr_matrix(ds.adj),
        os.path.join(run_dir, "data", "dgraphfin_adj_list"))

    holder: dict = {"batches": [], "batch_losses": []}
    orig_init = src_mh.ModelHandler.__init__
    orig_loss = src_gs.GCN.loss

    def init_rec(self, config):
        orig_init(self, config)
        holder["dataset"] = {
            k: (np.asarray(v) if isinstance(v, (list, np.ndarray))
                else v)
            for k, v in self.dataset.items()
            if k not in ("adj_lists", "homo")}

    def loss_rec(self, nodes, labels):
        # the GCN minibatch model consumes NO RNG inside its forward
        # (GCNAggregator is the exact set-union, src/graphsage.py:295-
        # 360); capturing the shuffled batch sequence + the pre-first-
        # step weights makes the whole trajectory deterministic.
        if "state_dict" not in holder:
            holder["state_dict"] = {
                k: v.detach().cpu().clone().numpy()
                for k, v in self.state_dict().items()}
        holder["batches"].append((
            np.asarray(list(nodes), np.int64),
            np.asarray(labels, np.float32)))
        out = orig_loss(self, nodes, labels)
        holder["batch_losses"].append(
            [float(t.detach()) for t in out])
        return out

    src_mh.ModelHandler.__init__ = init_rec
    src_gs.GCN.loss = loss_rec

    import yaml

    cfg = {
        "data_name": "dgraphfin", "data_dir": "./data/",
        "train_ratio": 0.4, "test_ratio": 0.67,
        "save_dir": "./pytorch_models/", "model": "GCN",
        "multi_relation": "GNN", "emb_size": 64, "thres": 0.4,
        "rho": 0.5, "seed": seed, "optimizer": "adam", "lr": 0.001,
        "weight_decay": 0.007, "batch_size": batch_size,
        "num_epochs": num_epochs, "valid_epochs": 5, "alpha": 2,
        "no_cuda": True, "cuda_id": "0",
    }
    yml = os.path.join(run_dir, "oracle_dgraph.yml")
    with open(yml, "w") as f:
        yaml.safe_dump(cfg, f)

    argv = ["main.py", "--config", yml]
    buf = io.StringIO()
    old_argv, old_cwd = sys.argv, os.getcwd()
    try:
        os.chdir(run_dir)
        sys.argv = argv
        import runpy

        with contextlib.redirect_stdout(buf):
            runpy.run_path(os.path.join(src_dir, "main.py"),
                           run_name="__main__")
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        src_mh.ModelHandler.__init__ = orig_init
        src_gs.GCN.loss = orig_loss
        # un-shadow: the src/ modules reuse root-reference module names
        # (utils, model) — purge them and drop src from the path so the
        # full-batch legs import the ROOT modules afterwards
        for name in ("utils", "model", "layers", "graphsage",
                     "model_handler", "main"):
            sys.modules.pop(name, None)
        if src_dir in sys.path:
            sys.path.remove(src_dir)
    holder["batch_size"] = batch_size
    text = holder["stdout"] = buf.getvalue()
    aucs = [float(m.group(1))
            for m in re.finditer(r"AUC: ([\d.eE-]+)", text)]
    aps = [float(m.group(1))
           for m in re.finditer(r"Testing AP: ([\d.eE-]+)", text)]
    # last AUC/AP lines are the restored-best final test (plus main()'s
    # summary "AUC: {}" print)
    holder["final_auc"] = aucs[-1] if aucs else None
    holder["final_ap"] = aps[-1] if aps else None
    return holder


def minibatch_exact_params_from_state_dict(sd: dict) -> dict:
    """torch ``GCN.state_dict()`` (weight [1,D], enc.weight [D,F],
    enc.fc.weight [D,D]) → the exact-path params dict."""
    return {"w_enc": np.asarray(sd["enc.weight"], np.float32),
            "fc": np.asarray(sd["enc.fc.weight"], np.float32),
            "w_score": np.asarray(sd["weight"], np.float32)}


def run_ours_minibatch_exact(ds, ref: dict) -> dict:
    """TRAJECTORY-level replay: the captured batch sequence through the
    exact set-union aggregation (``ggad_tpu.models.sage_exact``) under
    the captured initial weights and the reference's coupled-L2 Adam.
    Per-batch total losses compare directly to the captured ones."""
    import jax
    import jax.numpy as jnp

    from ggad_tpu.models.sage_exact import (
        build_exact_batch,
        coupled_adam,
        exact_losses,
        exact_scores,
    )

    cap = ref["dataset"]
    feats = jnp.asarray(np.asarray(cap["feat_data"], np.float32))
    # the replay adjacency must equal the pickled adj_list. NB
    # src/utils.py defines sparse_to_adjlist TWICE; the second
    # definition (src/utils.py:105-112) WINS and has the self-loop line
    # commented out — the pickle is the symmetrized graph WITHOUT self
    # loops. Self enters only via the aggregator's 1-hop union
    # (src/graphsage.py:304), never the 2-hop rows (executed-oracle-
    # caught: a +I replay adjacency shifts every 2-hop context).
    a = sp.csr_matrix(ds.adj)
    adj = ((a + a.T) > 0).astype(np.float32).tocsr()
    indptr, indices = adj.indptr, adj.indices

    params = jax.tree.map(
        jnp.asarray, minibatch_exact_params_from_state_dict(
            ref["state_dict"]))
    tx = coupled_adam(1e-3, 0.007)   # oracle cfg lr/weight_decay
    opt = tx.init(params)

    # one static pad over the whole sequence → one compile
    batches = ref["batches"]
    built, u_max, e_max = [], 0, 0
    for nodes, labels in batches:
        neigh_sets = [set(indices[indptr[n]: indptr[n + 1]].tolist())
                      | {int(n)} for n in nodes]
        uniq = set().union(*neigh_sets)
        exp = set().union(*[set(
            indices[indptr[n]: indptr[n + 1]].tolist())
            for n in uniq])
        u_max = max(u_max, len(uniq))
        e_max = max(e_max, len(exp))
    u_pad = -(-u_max // 64) * 64
    e_pad = -(-e_max // 64) * 64

    @jax.jit
    def step(params, opt, feats, b):
        (total, parts), grads = jax.value_and_grad(
            exact_losses, has_aux=True)(params, feats, b)
        updates, opt = tx.update(grads, opt, params)
        import optax

        return optax.apply_updates(params, updates), opt, total, parts

    # eval machinery (the reference validates every valid_epochs and
    # restores the BEST-valid-AUC snapshot for the final test,
    # src/model_handler.py:379-407; idx_valid == idx_test quirk)
    from ggad_tpu.ops.metrics import average_precision, roc_auc

    bs = int(ref.get("batch_size", 150))
    labels_all = np.asarray(cap["labels"]).ravel()

    def eval_slices(ids):
        out = [ids[i * bs: min((i + 1) * bs, len(ids))]
               for i in range(len(ids) // bs + 1)]
        return [s for s in out if len(s)]

    def upad_of(slices):
        u = 0
        for chunk in slices:
            uniq = set()
            for n in chunk:
                uniq |= set(indices[indptr[n]: indptr[n + 1]].tolist())
                uniq.add(int(n))
            u = max(u, len(uniq))
        return -(-u // 32) * 32

    ev = jax.jit(exact_scores)

    def eval_auc(params, ids):
        slices = eval_slices(np.asarray(ids, np.int64))
        u_ev = upad_of(slices)
        probs = np.empty(sum(len(s) for s in slices), np.float32)
        pos = 0
        for chunk in slices:
            b = build_exact_batch(indptr, indices, chunk,
                                  np.zeros(len(chunk), np.float32),
                                  u_ev, 32, two_hop=False)
            probs[pos: pos + len(chunk)] = np.asarray(
                ev(params, feats, b))
            pos += len(chunk)
        ids = np.concatenate(slices)
        return (roc_auc(labels_all[ids], probs),
                average_precision(labels_all[ids], probs), probs)

    idx_valid = np.asarray(cap["idx_valid"], np.int64)
    n_per_epoch = 150                 # hardcoded num_batches
    valid_every = 5                   # cfg valid_epochs
    best_auc, best_params = 0.0, jax.tree.map(lambda a: a, params)
    losses = []
    for i, (nodes, labels) in enumerate(batches):
        b = build_exact_batch(indptr, indices, nodes, labels,
                              u_pad, e_pad)
        params, opt, total, parts = step(params, opt, feats, b)
        losses.append(float(total))
        if (i + 1) % n_per_epoch == 0:
            epoch = i // n_per_epoch
            if epoch % valid_every == 0:
                auc_v, _, _ = eval_auc(params, idx_valid)
                if auc_v > best_auc:
                    best_auc = auc_v
                    best_params = jax.tree.map(lambda a: a.copy(),
                                               params)

    # final test from the restored-best snapshot, with the reference's
    # exact eval slicing (the mask's column normalization depends on
    # batch composition — a 256-node eval batch scores differently;
    # both caught by the final-AUC comparison missing by ~1e-2)
    idx_test = np.asarray(cap["idx_test"], np.int64)
    auc_t, ap_t, _ = eval_auc(best_params, idx_test)
    return {"losses": losses, "best_val_auc": best_auc,
            "final_auc": auc_t, "final_ap": ap_t}


def run_ours_minibatch(ds, ref: dict, *, num_epochs: int = 30,
                       batch_size: int = 150) -> dict:
    """MiniBatchTrainer under the reference's captured split/labels
    (including its pseudo-anomaly relabels + contamination)."""
    from ggad_tpu.train.minibatch import MiniBatchTrainer

    cap = ref["dataset"]
    labels = np.asarray(cap["labels"]).ravel()
    adj = sp.csr_matrix(ds.adj) + sp.eye(ds.adj.shape[0], format="csr",
                                         dtype=np.float32)
    tr = MiniBatchTrainer(
        adj=adj, features=np.asarray(ds.features, np.float32),
        labels=labels,
        idx_train=np.asarray(cap["idx_train"], np.int64),
        idx_anomaly=np.asarray(cap["idx_anomaly"], np.int64),
        # reference quirk: valid == test (src/model_handler.py:260-261)
        idx_valid=np.asarray(cap["idx_test"], np.int64),
        idx_test=np.asarray(cap["idx_test"], np.int64),
        emb_dim=64, num_epochs=num_epochs, num_batches=150,
        batch_size=batch_size, valid_epochs=5)
    res = tr.train()
    return {"final_auc": res.test_metrics["auc"],
            "final_ap": res.test_metrics["ap"],
            "best_val_auc": res.best_val_auc}


def parse_reference_stdout(text: str) -> dict:
    """Parse run.py's printed losses (every 2 epochs, run.py:217-229) and
    test AUROC/AP (every 10 epochs, run.py:230-240)."""
    losses: dict = {}
    for key, tag in [("margin", "train_loss_margin"), ("bce", "train_loss_bce"),
                     ("rec", "rec_loss"), ("total", "train_loss")]:
        for m in re.finditer(rf"Epoch: (\d+) {tag}= ([-\d.eE]+)", text):
            losses.setdefault(int(m.group(1)), {})[key] = float(m.group(2))
    aucs = [float(m.group(1))
            for m in re.finditer(r"Testing \S+ AUC:([\d.eE-]+)", text)]
    aps = [float(m.group(1))
           for m in re.finditer(r"Testing AP: ([\d.eE-]+)", text)]
    evals = {10 * i: {"auc": a, "ap": p}
             for i, (a, p) in enumerate(zip(aucs, aps))}
    return {"losses": losses, "evals": evals}


def flax_params_from_state_dict(sd: dict) -> dict:
    """torch ``Model.state_dict()`` → our flax GGAD param tree.

    torch ``nn.Linear.weight`` is [out, in] → flax kernel [in, out];
    ``nn.PReLU.weight`` is [1] → flax scalar alpha. The reference Model's
    dead members (gcn3/fc5/fc6/disc/readout, model.py:114-131) receive no
    gradient (unused in forward) so dropping them preserves the update.
    """
    def T(k):
        return np.asarray(sd[k], np.float32)

    def gcn(name):
        return {"fc": {"kernel": T(f"{name}.fc.weight").T},
                "bias": T(f"{name}.bias"),
                "prelu": {"alpha": T(f"{name}.act.weight").reshape(())}}

    return {"params": {
        "gcn1": gcn("gcn1"),
        "gcn2": gcn("gcn2"),
        "head": {f"fc{i}": {"kernel": T(f"fc{i}.weight").T}
                 for i in (1, 2, 3)},
        "fc4": {"kernel": T("fc4.weight").T},
    }}


def dataset_from_reference_load(load_tuple, name: str = "oracle"):
    """Rebuild a GADDataset from the tuple the reference's load_mat
    actually returned — identical adjacency, features (raw: the unknown
    dataset name takes run.py:90's ``.todense()`` branch), and split."""
    from ggad_tpu.datasets.core import GADDataset

    (adj, feat, ano_labels, _all_idx, idx_train, idx_val, idx_test,
     _ano2, _str_ano, _attr_ano, normal_label_idx,
     abnormal_label_idx) = load_tuple
    return GADDataset(
        name=name,
        adj=sp.csr_matrix(adj),
        features=np.asarray(feat.todense(), np.float32),
        ano_labels=np.asarray(ano_labels).ravel(),
        idx_train=np.asarray(idx_train, np.int64),
        idx_val=np.asarray(idx_val, np.int64),
        idx_test=np.asarray(idx_test, np.int64),
        normal_label_idx=np.asarray(normal_label_idx, np.int64),
        abnormal_label_idx=np.asarray(abnormal_label_idx, np.int64),
    )


def run_ours(ds, initial_params, *, epochs: int, lr: float = 1e-3) -> dict:
    """FullBatchTrainer under the reference's exact split + init.

    ``hoist_ax=False`` keeps the reference's per-step op order
    (Â(xW₁), not (Âx)W₁) so epoch-0 losses agree to float32 roundoff.
    """
    from ggad_tpu.train.full_batch import FullBatchTrainer

    trainer = FullBatchTrainer(
        dataset=ds, lr=lr, num_epoch=epochs, noise_mean=0.0, noise_std=0.0,
        spmm_impl="xla", log_every=2, eval_every=10, hoist_ax=False,
        initial_params=initial_params)
    res = trainer.train()
    losses = {r["epoch"]: {"margin": r["loss_margin"], "bce": r["loss_bce"],
                           "rec": r["loss_rec"], "total": r["loss"]}
              for r in res.history if "loss" in r}
    evals = {r["epoch"]: {"auc": r["auc"], "ap": r["ap"]}
             for r in res.history if "auc" in r}
    return {"losses": losses, "evals": evals,
            "final_auc": res.final_auc, "final_ap": res.final_ap}


def compare(ref: dict, ours: dict) -> dict:
    """Per-epoch |Δ| on every logged loss term and eval metric."""
    rows = []
    for ep in sorted(ref["losses"]):
        if ep not in ours["losses"]:
            continue
        r, o = ref["losses"][ep], ours["losses"][ep]
        rows.append({"epoch": ep, **{
            f"d_{k}": abs(r[k] - o[k]) for k in ("margin", "bce", "rec",
                                                 "total") if k in r and k in o}})
    ev = []
    for ep in sorted(ref["evals"]):
        if ep not in ours["evals"]:
            continue
        r, o = ref["evals"][ep], ours["evals"][ep]
        ev.append({"epoch": ep, "d_auc": abs(r["auc"] - o["auc"]),
                   "d_ap": abs(r["ap"] - o["ap"])})
    return {"loss_diffs": rows, "eval_diffs": ev}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500)
    ap.add_argument("--degree", type=int, default=8)
    ap.add_argument("--feat-dim", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=os.path.join(REPO, "ORACLE.json"))
    ap.add_argument("--leg", choices=["ggad", "ocgnn", "tam", "minibatch",
                                      "dominant", "anomalydae", "aegis",
                                      "gaan", "baselines", "all", "both"],
                    default="all")
    ap.add_argument("--tam_cutting", type=int, default=8)
    args = ap.parse_args()

    from ggad_tpu.datasets.synthetic import synthetic_gad

    ds = synthetic_gad(n_nodes=args.nodes, avg_degree=args.degree,
                       feat_dim=args.feat_dim, n_communities=4,
                       anomaly_rate=0.1, seed=args.seed)

    ocgnn_record = None
    tam_record = None
    minibatch_record = None
    if args.leg in ("minibatch", "all"):
        from ggad_tpu.datasets.synthetic import synthetic_gad as _sg

        ds_mb = _sg(n_nodes=2500, avg_degree=12, feat_dim=17,
                    n_communities=4, anomaly_rate=0.08,
                    feature_noise=0.25, seed=2)
        # batch_size sized so the hardcoded 150 batches/epoch never run
        # past the train pool (the NaN pathology — see
        # run_reference_minibatch docstring)
        with tempfile.TemporaryDirectory() as tmp_mb:
            print("[oracle] running reference src/main.py (minibatch "
                  "GGAD): N=2500, 12 epochs x 150 batches (healthy "
                  "batch_size=4)")
            mref = run_reference_minibatch(ds_mb, tmp_mb, num_epochs=12,
                                           batch_size=4)
        mexact = run_ours_minibatch_exact(ds_mb, mref)
        rl = [x[0] for x in mref["batch_losses"]]
        dl = [abs(a - b) for a, b in zip(rl, mexact["losses"])
              if not np.isnan(a)]
        print(f"[minibatch] EXACT trajectory: {len(dl)} batches, "
              f"max |Δloss| {max(dl):.2e}; final AUROC ref "
              f"{mref['final_auc']:.4f} exact {mexact['final_auc']:.4f}")
        mours = run_ours_minibatch(ds_mb, mref, num_epochs=12,
                                   batch_size=4)
        print(f"[minibatch] sampled-trainer (fanout approx) final AUROC "
              f"{mours['final_auc']:.4f} vs ref {mref['final_auc']:.4f}")
        minibatch_record = {
            "reference": {"final_auc": mref["final_auc"],
                          "final_ap": mref["final_ap"]},
            "exact_replay": {"max_batch_loss_diff": max(dl),
                             "max_batch_loss_diff_epoch0": max(dl[:150]),
                             "n_batches": len(dl),
                             "final_auc": mexact["final_auc"],
                             "final_ap": mexact["final_ap"]},
            "ours_sampled": mours,
        }
        if args.leg == "minibatch":
            with open(args.out, "w") as f:
                json.dump({"minibatch": minibatch_record}, f, indent=1,
                          default=float)
            print(f"[oracle] wrote {args.out}")
            return
    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(os.path.join(tmp, "dataset"), exist_ok=True)
        export_mat(ds, os.path.join(tmp, "dataset", "oraclesynth.mat"))
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        export_mat(ds, os.path.join(tmp, "data", "oraclesynth.mat"))
        baseline_records = {}
        baseline_names = [n for n in BASELINE_LEGS
                          if args.leg in (n, "baselines", "all")]
        for leg in baseline_names:
            baseline_records[leg] = run_baseline_leg(
                leg, ds, tmp, epochs=args.epochs, lr=args.lr,
                seed=args.seed)
        if args.leg in BASELINE_LEGS or args.leg == "baselines":
            with open(args.out, "w") as f:
                json.dump({"baselines": baseline_records}, f, indent=1,
                          default=float)
            print(f"[oracle] wrote {args.out}")
            return
        if args.leg in ("tam", "all"):
            print(f"[oracle] running reference tam.py: N={args.nodes} "
                  f"cutting={args.tam_cutting} (500 epochs/member, "
                  f"hardcoded)")
            tref = run_reference_tam("oraclesynth", tmp,
                                     cutting=args.tam_cutting,
                                     seed=args.seed)
            tours = run_ours_tam(tref, cutting=args.tam_cutting)
            rl, ol = tref["trajectory"]["losses"], tours["losses"]
            n = min(len(rl), len(ol))
            dmax = max(abs(a - b) / max(abs(a), 1.0)
                       for a, b in zip(rl[:n], ol[:n])) if n else None
            print(f"[tam] {n} per-member loss points, max rel |Δ| "
                  f"{dmax:.2e}")
            # reference AUC print order per cut: members, test, all
            raucs = tref["trajectory"]["aucs"]
            i = 0
            for c in range(args.tam_cutting):
                mem = raucs[i]; i += 1
                test = raucs[i]; i += 1
                alln = raucs[i]; i += 1
                print(f"[tam] cut {c}: member AUC ref {mem:.4f} ours "
                      f"{tours['member_aucs'][c]:.4f} | test ref "
                      f"{test:.4f} ours {tours['cut_test'][c][0]:.4f} | "
                      f"all ref {alln:.4f} ours "
                      f"{tours['cut_all'][c][0]:.4f}")
            tam_record = {"reference": tref["trajectory"], "ours": tours,
                          "max_loss_rel_diff": dmax}
        if args.leg == "tam":
            with open(args.out, "w") as f:
                json.dump({"tam": tam_record}, f, indent=1, default=float)
            print(f"[oracle] wrote {args.out}")
            return
        if args.leg in ("ocgnn", "both", "all"):
            oc_epochs = min(args.epochs, 30)
            print(f"[oracle] running reference ocgnn.py: N={args.nodes} "
                  f"epochs={oc_epochs}")
            oref = run_reference_ocgnn("oraclesynth", tmp,
                                       epochs=oc_epochs, lr=args.lr,
                                       seed=args.seed)
            ds_oc = dataset_from_reference_load(oref["load"])
            oc_params = ocgnn_flax_params_from_state_dict(
                oref["state_dict"])
            oours = run_ours_ocgnn(ds_oc, oc_params, epochs=oc_epochs,
                                   lr=args.lr)
            oc_diffs = compare(oref["trajectory"], oours)
            for row in oc_diffs["loss_diffs"]:
                ep = row["epoch"]
                r = oref["trajectory"]["losses"][ep]["total"]
                o = oours["losses"][ep]["total"]
                print(f"[ocgnn] epoch {ep:>4} ref {r:.5f} ours {o:.5f} "
                      f"|Δ| {abs(r - o):.2e}")
            for row in oc_diffs["eval_diffs"]:
                print(f"[ocgnn] eval @{row['epoch']:>4}: ΔAUROC "
                      f"{row['d_auc']:.4f} ΔAP {row['d_ap']:.4f}")
            ocgnn_record = {"reference": oref["trajectory"],
                            "ours": oours, "diffs": oc_diffs}
        if args.leg == "ocgnn":
            with open(args.out, "w") as f:
                json.dump({"ocgnn": ocgnn_record}, f, indent=1,
                          default=float)
            print(f"[oracle] wrote {args.out}")
            return
        print(f"[oracle] running reference run.py: N={args.nodes} "
              f"E={ds.n_edges} F={args.feat_dim} epochs={args.epochs}")
        ref = run_reference("oraclesynth", tmp, epochs=args.epochs,
                            lr=args.lr, seed=args.seed)

    ds2 = dataset_from_reference_load(ref["load"])
    params = flax_params_from_state_dict(ref["state_dict"])
    print("[oracle] running FullBatchTrainer under the captured "
          "split + initial weights")
    ours = run_ours(ds2, params, epochs=args.epochs, lr=args.lr)
    diffs = compare(ref["trajectory"], ours)

    print(f"{'epoch':>6} {'ref total':>10} {'ours total':>10} {'|Δ|':>9}")
    for ep in sorted(ref["trajectory"]["losses"]):
        if ep not in ours["losses"]:
            continue
        r = ref["trajectory"]["losses"][ep]["total"]
        o = ours["losses"][ep]["total"]
        print(f"{ep:>6} {r:>10.5f} {o:>10.5f} {abs(r - o):>9.2e}")
    for row in diffs["eval_diffs"]:
        ep = row["epoch"]
        r = ref["trajectory"]["evals"][ep]
        o = ours["evals"][ep]
        print(f"eval @{ep:>4}: AUROC ref {r['auc']:.4f} ours {o['auc']:.4f} "
              f"(Δ {row['d_auc']:.4f})  AP ref {r['ap']:.4f} "
              f"ours {o['ap']:.4f} (Δ {row['d_ap']:.4f})")

    record = {
        "config": {"nodes": args.nodes, "edges": int(ds.n_edges),
                   "feat_dim": args.feat_dim, "epochs": args.epochs,
                   "lr": args.lr, "seed": args.seed},
        "reference": ref["trajectory"],
        "ours": {"losses": ours["losses"], "evals": ours["evals"]},
        "diffs": diffs,
        "ocgnn": ocgnn_record,
        "tam": tam_record,
        "minibatch": minibatch_record,
        "baselines": baseline_records,
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1, default=float)
    print(f"[oracle] wrote {args.out}")


if __name__ == "__main__":
    main()
