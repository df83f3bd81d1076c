"""Full-batch training drivers for the baseline zoo.

One harness per objective family, replacing the reference's six cloned
driver scripts (``dominant.py``, ``anomalyDAE.py``, ``ocgnn.py``,
``aegis.py``, ``gaan.py``, ``tam.py``) with shared jitted epoch steps.
Every driver reports AUROC/AP on the test split like the reference
(eval cadence ``run_*`` every 5/10 epochs → here once per ``eval_every``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ggad_tpu.datasets.core import GADDataset
from ggad_tpu.graph import from_scipy
from ggad_tpu.ops.metrics import average_precision, roc_auc
from ggad_tpu.ops.normalize import normalize_adj_reference


@dataclasses.dataclass
class BaselineResult:
    auc: float
    ap: float
    history: list
    wall_time_s: float

    def as_dict(self, name: str, dataset: str) -> dict:
        return {"model": name, "dataset": dataset, "auc": self.auc,
                "ap": self.ap, "wall_time_s": self.wall_time_s}


def _prep(ds: GADDataset):
    from ggad_tpu.train.full_batch import maybe_bcsr

    adj, raw = normalize_adj_reference(from_scipy(ds.adj))
    # same kernel routing as the GGAD trainer: BCSR MXU tiles / ELL on
    # TPU (f32-HIGHEST keeps the 1e-4 torch-parity envelope), plain
    # Graph elsewhere — BCSRGraph/ELLGraph delegate row/col/val so the
    # recon/affinity consumers are unaffected
    adj = maybe_bcsr(adj, "auto")
    x = jnp.asarray(ds.features, jnp.float32)
    train_idx = jnp.asarray(ds.normal_label_idx, jnp.int32)
    return adj, raw, x, train_idx


def _eval_auc_ap(ds: GADDataset, scores: np.ndarray):
    idx = ds.idx_test
    return (roc_auc(ds.ano_labels[idx], scores[idx]),
            average_precision(ds.ano_labels[idx], scores[idx]))


def _loop(num_epoch, eval_every, step, get_scores, ds, verbose, logger=None):
    history = []
    t0 = time.time()
    auc = ap = float("nan")
    for epoch in range(num_epoch):
        loss = step()
        if epoch % eval_every == 0 or epoch == num_epoch - 1:
            scores = get_scores()
            auc, ap = _eval_auc_ap(ds, scores)
            rec = {"epoch": epoch, "loss": float(loss),
                   "auc": auc, "ap": ap}
            history.append(rec)
            if logger:
                logger(rec)
            if verbose:
                print(f"epoch {epoch:4d}  loss {float(loss):.4f}  "
                      f"AUROC {auc:.4f}  AP {ap:.4f}")
    return BaselineResult(auc=auc, ap=ap, history=history,
                          wall_time_s=time.time() - t0)


# ---------------------------------------------------------------------------
# Reconstruction family: DOMINANT / AnomalyDAE
# ---------------------------------------------------------------------------

def run_reconstruction(model_name: str, ds: GADDataset, *,
                       num_epoch: int = 100, lr: float = 1e-3,
                       embedding_dim: int = 300, eval_every: int = 5,
                       seed: int = 0, verbose: bool = False,
                       logger=None, initial_params=None) -> BaselineResult:
    """``initial_params``: exact starting weights (reference-oracle
    injection); replaces the seeded init."""
    from ggad_tpu.models.anomaly_dae import AnomalyDAE, anomaly_dae_loss
    from ggad_tpu.models.dominant import Dominant, dominant_loss
    from ggad_tpu.ops.normalize import gcn_norm_graph

    adj, raw, x, train_idx = _prep(ds)
    if model_name == "dominant":
        model = Dominant(n_h=embedding_dim)
        loss_of = dominant_loss
        # PyG GCNConv re-normalizes the binarized graph (gcn_norm) —
        # the structure branch sees unit-weight sym-normalization, not
        # the reference's normalize-then-+I weights. raw (= A + I, plain
        # Graph) has the identical binarized structure as adj and avoids
        # re-deriving from a BCSR-routed graph.
        gcn_adj = gcn_norm_graph(raw)
    else:
        model = AnomalyDAE(n_h=embedding_dim)
        loss_of = anomaly_dae_loss
        gcn_adj = None

    params = (jax.tree.map(jnp.asarray, initial_params)
              if initial_params is not None
              else model.init(jax.random.PRNGKey(seed), adj, x))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    # adj/x/train_idx enter as jit ARGUMENTS: closure constants would
    # ship with the remote-compile payload (HTTP 413 at t_finance scale).
    @jax.jit
    def train_step(params, opt_state, adj, gcn_adj, x, train_idx):
        def loss_fn(p):
            out = (model.apply(p, adj, x, gcn_adj=gcn_adj)
                   if gcn_adj is not None else model.apply(p, adj, x))
            return loss_of(out, train_idx), out.scores

        (loss, scores), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, scores

    state = {"params": params, "opt": opt_state, "scores": None,
             "loss": 0.0}

    def step():
        state["params"], state["opt"], loss, scores = train_step(
            state["params"], state["opt"], adj, gcn_adj, x, train_idx)
        state["scores"] = scores
        return loss

    def get_scores():
        return np.asarray(state["scores"])

    return _loop(num_epoch, eval_every, step, get_scores, ds, verbose,
                 logger)


# ---------------------------------------------------------------------------
# OCGNN
# ---------------------------------------------------------------------------

def run_ocgnn(ds: GADDataset, *, num_epoch: int = 100, lr: float = 1e-3,
              embedding_dim: int = 300, eval_every: int = 5, seed: int = 0,
              beta: float = 0.5, use_warmup: bool = False,
              verbose: bool = False, logger=None,
              initial_params=None) -> BaselineResult:
    """NB unlike the DOMINANT driver (pre-update scores,
    ``dominant.py:138-153``), the reference OCGNN driver evaluates with a
    FRESH forward after ``optimiser.step()`` (``ocgnn.py:196-203``) — so
    scores here come from a separate post-update eval pass.
    ``initial_params``: exact starting weights (reference-oracle
    injection); replaces the seeded init."""
    from ggad_tpu.models.ocgnn import (
        OCGNNEncoder,
        init_ocgnn_state,
        ocgnn_loss,
        ocgnn_scores,
    )

    adj, raw, x, train_idx = _prep(ds)
    model = OCGNNEncoder(n_h=embedding_dim)
    params = (jax.tree.map(jnp.asarray, initial_params)
              if initial_params is not None
              else model.init(jax.random.PRNGKey(seed), adj, x))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    oc_state = init_ocgnn_state(embedding_dim)

    # adj/x/train_idx are jit ARGUMENTS, not closure constants (payload).
    @jax.jit
    def train_step(params, opt_state, oc_state, adj, x, train_idx):
        def loss_fn(p):
            emb = model.apply(p, adj, x)
            loss, _, new_state = ocgnn_loss(
                emb[train_idx], oc_state, beta=beta, use_warmup=use_warmup)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss

    @jax.jit
    def eval_scores(params, oc_state, adj, x):
        return ocgnn_scores(model.apply(params, adj, x), oc_state)

    state = {"params": params, "opt": opt_state, "oc": oc_state}

    def step():
        (state["params"], state["opt"], state["oc"],
         loss) = train_step(state["params"], state["opt"], state["oc"],
                            adj, x, train_idx)
        return loss

    return _loop(num_epoch, eval_every, step,
                 lambda: np.asarray(eval_scores(state["params"],
                                                state["oc"], adj, x)),
                 ds, verbose, logger)


# ---------------------------------------------------------------------------
# Adversarial family: AEGIS / GAAN (two optimizers via masked updates)
# ---------------------------------------------------------------------------

def _generator_mask(params):
    """Bool pytree selecting the AEGIS generator subtree (for the
    reference's generator-only second optimizer, ``aegis.py:97-98``)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    return flax.traverse_util.unflatten_dict(
        {k: ("generator" in k) for k in flat})


def generator_only_adam(lr: float, mask) -> optax.GradientTransformation:
    """Adam restricted to the generator subtree. NB plain
    ``optax.masked`` passes non-masked leaves through UNCHANGED (i.e.
    raw gradients would be applied to them); the complement mask must be
    explicitly zeroed."""
    inv_mask = jax.tree.map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(optax.adam(lr), mask),
        optax.masked(optax.set_to_zero(), inv_mask),
    )


def run_aegis(ds: GADDataset, *, num_epoch: int = 100,
              recon_num_epoch: int = 10, lr: float = 1e-3,
              embedding_dim: int = 300, eval_every: int = 5, seed: int = 0,
              faithful: bool = False, verbose: bool = False,
              logger=None, initial_params=None,
              noise_seq=None) -> BaselineResult:
    """AEGIS driver.

    ``faithful=False`` (default): the *intended* adversarial objective —
    discriminator trained on real-vs-stop_grad(generated), generator on
    its own BCE, AE loss on the encoder/decoder (one summed step).

    ``faithful=True``: the reference's *effective* behavior, bugs
    included (``model_AEGIS.py:240`` returns ``loss_ae`` in the dis
    slot; ``aegis.py:118-140``):
      * AE pretraining never calls ``zero_grad`` → gradients accumulate
        across pretrain epochs (epoch e steps on the sum of grads of
        epochs 0..e);
      * adversarial epochs: ``loss_g.backward(); loss_dis.backward()``
        where loss_dis IS loss_ae, then BOTH a full-params Adam and a
        generator-only Adam step on the same accumulated grads — the
        true discriminator loss never drives a gradient;
      * the adversarial AE term uses ALL nodes (``aegis.py:133``), not
        the labeled normals.

    ``initial_params``: exact starting weights (reference-oracle
    injection). ``noise_seq``: per-epoch [N, noise_dim] noise draws to
    replay (pretrain epochs first, then adversarial — the reference
    consumes one ``torch.randn`` per forward, ``model_AEGIS.py:232``);
    None draws fresh noise from the seeded stream.
    """
    from ggad_tpu.models.aegis import AEGIS, aegis_losses, aegis_scores

    adj, raw, x, _ = _prep(ds)
    train_idx = jnp.asarray(ds.normal_label_idx, jnp.int32)
    all_idx = jnp.arange(ds.n_nodes, dtype=jnp.int32)
    model = AEGIS(n_h=embedding_dim)
    rng = jax.random.PRNGKey(seed)
    if initial_params is not None:
        params = jax.tree.map(jnp.asarray, initial_params)
    else:
        params = model.init({"params": rng, "noise": rng}, adj, x)
    tx_ae = optax.adam(1e-3)     # reference aegis.py:96 (lr fixed 1e-3)
    opt_ae = tx_ae.init(params)
    tx_adv = optax.adam(lr)
    tx_gen = generator_only_adam(lr, _generator_mask(params))
    opt_gen = tx_gen.init(params)

    noise_box = {"i": 0, "rng": rng}

    def next_noise():
        if noise_seq is not None:
            n = jnp.asarray(noise_seq[noise_box["i"]], jnp.float32)
        else:
            noise_box["rng"], k = jax.random.split(noise_box["rng"])
            n = jax.random.normal(k, (x.shape[0], model.noise_dim))
        noise_box["i"] += 1
        return n

    # adj/x/indices/noise are jit ARGUMENTS, not closure constants
    # (payload rule).
    @jax.jit
    def ae_step(params, opt, noise, adj, x, train_idx):
        def loss_fn(p):
            out = model.apply(p, adj, x, noise)
            la, _, _ = aegis_losses(out, x, train_idx)
            return la

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx_ae.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, grads

    @jax.jit
    def ae_step_faithful(params, opt, grad_acc, noise, adj, x, train_idx):
        """Pretrain step with the reference's missing zero_grad: step on
        the RUNNING SUM of pretrain gradients (``aegis.py:119-124``)."""
        def loss_fn(p):
            out = model.apply(p, adj, x, noise)
            la, _, _ = aegis_losses(out, x, train_idx)
            return la

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
        updates, opt = tx_ae.update(grad_acc, opt, params)
        return optax.apply_updates(params, updates), opt, grad_acc, loss

    @jax.jit
    def adv_step(params, opt, noise, adj, x, train_idx):
        """Intended adversarial semantics: discriminator+AE on non-gen
        params, generator on its BCE (reference wiring at
        ``aegis.py:118-140``; see docstring for the quirk)."""
        def loss_fn(p):
            out = model.apply(p, adj, x, noise)
            la, ld, lg = aegis_losses(out, x, train_idx)
            # gen params only get gradient from lg because la/ld paths
            # stop at the generated features:
            return la + ld + lg, (out, la)

        (loss, (out, la)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx_adv.update(grads, opt, params)
        return (optax.apply_updates(params, updates), opt, la,
                aegis_scores(out))

    @jax.jit
    def adv_step_faithful(params, opt, opt_g, noise, adj, x, all_idx):
        """Reference-effective adversarial step: grad(loss_g + loss_ae)
        drives a full-params Adam AND a generator-only Adam (same grads,
        independent moment state) — ``aegis.py:128-140``."""
        def loss_fn(p):
            out = model.apply(p, adj, x, noise)
            la, _, lg = aegis_losses(out, x, all_idx)
            return la + lg, (out, la)

        (loss, (out, la)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx_adv.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        updates_g, opt_g = tx_gen.update(grads, opt_g, params)
        params = optax.apply_updates(params, updates_g)
        return params, opt, opt_g, la, aegis_scores(out)

    state = {"params": params, "scores": None}
    pretrain_losses = []
    if faithful:
        grad_acc = jax.tree.map(jnp.zeros_like, params)
        for _ in range(recon_num_epoch):
            state["params"], opt_ae, grad_acc, pl = ae_step_faithful(
                state["params"], opt_ae, grad_acc, next_noise(), adj, x,
                train_idx)
            pretrain_losses.append(float(pl))
    else:
        for _ in range(recon_num_epoch):
            state["params"], opt_ae, pl, _ = ae_step(
                state["params"], opt_ae, next_noise(), adj, x, train_idx)
            pretrain_losses.append(float(pl))

    opt_box = {"opt": tx_adv.init(state["params"]),
               "opt_g": tx_gen.init(state["params"])}

    def step():
        noise = next_noise()
        if faithful:
            (state["params"], opt_box["opt"], opt_box["opt_g"], loss,
             scores) = adv_step_faithful(
                state["params"], opt_box["opt"], opt_box["opt_g"], noise,
                adj, x, all_idx)
        else:
            state["params"], opt_box["opt"], loss, scores = adv_step(
                state["params"], opt_box["opt"], noise, adj, x, train_idx)
        state["scores"] = scores
        return loss

    res = _loop(num_epoch, eval_every, step,
                lambda: np.asarray(state["scores"]), ds, verbose, logger)
    # prepend the AE-pretrain trajectory (reference prints ae_loss per
    # pretrain epoch, aegis.py:126) for oracle comparison
    res.history = ([{"pretrain_epoch": i, "loss": v}
                    for i, v in enumerate(pretrain_losses)] + res.history)
    return res


def run_gaan(ds: GADDataset, *, num_epoch: int = 100, lr: float = 1e-3,
             eval_every: int = 5, seed: int = 0, faithful: bool = False,
             verbose: bool = False, logger=None, initial_params=None,
             noise_seq=None) -> BaselineResult:
    """GAAN driver.

    ``faithful=False`` (default): one summed Adam step — the gradient
    sets of ``loss`` (encoder only; fake side detached) and ``loss_g``
    (generator only) are disjoint, so this equals the reference's
    ``optimiser.step()`` alone.

    ``faithful=True`` additionally reproduces the reference's SECOND
    generator update: after ``optimiser.step()`` over all params,
    ``optimiser_gen.step()`` applies a separate-moments Adam to the
    generator on the SAME gradients (``gaan.py:100-102,132-135``) — the
    generator moves twice per epoch.

    ``initial_params`` / ``noise_seq``: reference-oracle injection (one
    [N, noise_dim] draw per epoch, ``model_gaan.py:312``).
    """
    from ggad_tpu.models.gaan import GAAN, gaan_losses, gaan_scores

    adj, raw, x, _ = _prep(ds)
    # reference gaan.py:131 trains on all_idx
    train_idx = jnp.arange(ds.n_nodes, dtype=jnp.int32)
    train_mask = jnp.ones(ds.n_nodes, bool)
    model = GAAN()
    rng = jax.random.PRNGKey(seed)
    if initial_params is not None:
        params = jax.tree.map(jnp.asarray, initial_params)
    else:
        params = model.init({"params": rng, "noise": rng}, x)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    tx_gen = generator_only_adam(lr, _generator_mask(params))
    opt_gen = tx_gen.init(params)

    noise_box = {"i": 0, "rng": rng}

    def next_noise():
        if noise_seq is not None:
            n = jnp.asarray(noise_seq[noise_box["i"]], jnp.float32)
        else:
            noise_box["rng"], k = jax.random.split(noise_box["rng"])
            n = jax.random.normal(k, (x.shape[0], model.noise_dim))
        noise_box["i"] += 1
        return n

    # adj/x/masks/noise are jit ARGUMENTS, not closure constants
    # (payload rule).
    @jax.jit
    def train_step(params, opt, opt_g, noise, adj, x, train_mask,
                   train_idx):
        def loss_fn(p):
            out = model.apply(p, x, noise)
            ld, lg = gaan_losses(out, adj, x, train_mask, train_idx)
            # encoder gets grads from ld (fake side detached); generator
            # from lg — disjoint sets, so the summed step equals the
            # reference's optimiser.step() (gaan.py:100-135).
            return ld + lg, (ld, out)

        (loss, (ld, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        if faithful:
            # second generator Adam on the same grads (gaan.py:135)
            updates_g, opt_g = tx_gen.update(grads, opt_g, params)
            params = optax.apply_updates(params, updates_g)
        return params, opt, opt_g, ld, gaan_scores(out, x)

    state = {"params": params, "opt": opt_state, "opt_g": opt_gen,
             "scores": None}

    def step():
        (state["params"], state["opt"], state["opt_g"], loss,
         scores) = train_step(state["params"], state["opt"],
                              state["opt_g"], next_noise(), adj, x,
                              train_mask, train_idx)
        state["scores"] = scores
        return loss

    return _loop(num_epoch, eval_every, step,
                 lambda: np.asarray(state["scores"]), ds, verbose, logger)


# ---------------------------------------------------------------------------
# TAM
# ---------------------------------------------------------------------------

def run_tam_baseline(ds: GADDataset, *, n_h: int = 300, cutting: int = 8,
                     n_tree: int = 1, num_epoch: int = 500, lr: float = 1e-5,
                     seed: int = 0, use_tam_split: bool = True,
                     eval_every: int | None = None,
                     verbose: bool = False,
                     logger=None, **tam_kwargs) -> BaselineResult:
    """TAM driver. ``use_tam_split=True`` (default) reproduces TAM's own
    protocol — 80% labeled normals + active 15% real-anomaly
    contamination of the labeled set, contaminants removed from test
    (reference ``utils_tam.py:159-178``) — instead of the GGAD split the
    dataset ships with.

    History carries one AUROC/AP entry per ensemble ROUND (the running
    cumulative-mean score after each cut, reference ``tam.py:206-237``) —
    TAM's natural eval cadence; ``eval_every`` subsamples the rounds.
    """
    from ggad_tpu.models.tam import run_tam

    t0 = time.time()
    graph = from_scipy(ds.adj)
    from ggad_tpu.graph import add_self_loops
    raw_adj = add_self_loops(graph)

    if use_tam_split:
        from ggad_tpu.datasets.splits import tam_split
        split = tam_split(ds.ano_labels, seed=seed)
        normal_idx, idx_test = split.normal_label_idx, split.idx_test
    else:
        normal_idx, idx_test = ds.normal_label_idx, ds.idx_test

    res = run_tam(graph, raw_adj, ds.features, normal_idx,
                  n_h=n_h, cutting=cutting, n_tree=n_tree,
                  num_epoch=num_epoch, lr=lr, seed=seed, verbose=verbose,
                  **tam_kwargs)
    history = []
    stride = max(int(eval_every or 1), 1)
    for r in range(0, cutting, stride):
        s = res.per_round_scores[r]
        rec = {"round": r + 1,
               "auc": roc_auc(ds.ano_labels[idx_test], s[idx_test]),
               "ap": average_precision(ds.ano_labels[idx_test],
                                       s[idx_test])}
        history.append(rec)
        if logger:
            logger(rec)
        if verbose:
            print(f"tam round {r + 1}/{cutting}: AUROC {rec['auc']:.4f} "
                  f"AP {rec['ap']:.4f}")
    auc = roc_auc(ds.ano_labels[idx_test], res.scores[idx_test])
    ap = average_precision(ds.ano_labels[idx_test], res.scores[idx_test])
    rec = {"epoch": num_epoch, "auc": auc, "ap": ap}
    history.append(rec)
    if logger:
        logger(rec)
    return BaselineResult(auc=auc, ap=ap, history=history,
                          wall_time_s=time.time() - t0)


# ---------------------------------------------------------------------------
# CLI dispatch
# ---------------------------------------------------------------------------

def run_baseline(name: str, ds: GADDataset, args) -> dict:
    num_epoch = args.num_epoch or 100
    lr = args.lr or 1e-3
    common = dict(num_epoch=num_epoch, lr=lr, seed=args.seed,
                  eval_every=args.eval_every, verbose=True)
    if name in ("dominant", "anomalydae"):
        res = run_reconstruction(name, ds, embedding_dim=args.embedding_dim,
                                 **common)
    elif name == "ocgnn":
        res = run_ocgnn(ds, embedding_dim=args.embedding_dim, **common)
    elif name == "aegis":
        res = run_aegis(ds, embedding_dim=args.embedding_dim,
                        faithful=getattr(args, "aegis_faithful", False),
                        **common)
    elif name == "gaan":
        res = run_gaan(ds, **common)
    elif name == "tam":
        res = run_tam_baseline(ds, n_h=args.embedding_dim,
                               num_epoch=args.num_epoch or 500,
                               lr=args.lr or 1e-5, seed=args.seed,
                               use_tam_split=getattr(args, "tam_split",
                                                     True),
                               eval_every=args.eval_every, verbose=True)
    elif name in ("sage", "ggad-minibatch", "pcgnn", "dominant-minibatch",
                  "anomalydae-minibatch", "aegis-minibatch"):
        return run_minibatch_model(name, ds, args)
    else:
        raise ValueError(name)
    return res.as_dict(name, ds.name)


def run_minibatch_model(name: str, ds: GADDataset, args) -> dict:
    import scipy.sparse as sp

    from ggad_tpu.datasets.splits import minibatch_split_for
    from ggad_tpu.train.minibatch import MiniBatchTrainer

    adj = ds.adj + sp.eye(ds.n_nodes, format="csr", dtype=np.float32)
    # per-dataset split preset (reference src/model_handler.py:31-214)
    idx_train, idx_valid, idx_test, labels, idx_anom = minibatch_split_for(
        ds.name, ds.ano_labels, seed=args.seed)
    if name == "ggad-minibatch":
        tr = MiniBatchTrainer(
            adj=adj, features=ds.features, labels=labels,
            idx_train=idx_train, idx_anomaly=idx_anom,
            idx_valid=idx_valid, idx_test=idx_test,
            num_epochs=args.num_epoch or 30,
            checkpoint_dir=args.checkpoint_dir,
            mesh=getattr(args, "dp_devices", None))
        res = tr.train(verbose=True)
        out = {"model": name, "dataset": ds.name,
               "best_val_auc": res.best_val_auc,
               "best_epoch": res.best_epoch,
               "wall_time_s": res.wall_time_s}
        out.update({f"test_{k}": v for k, v in res.test_metrics.items()})
        return out
    if name in ("sage", "pcgnn"):
        res = run_minibatch_classifier(
            name, adj, ds.features, labels, idx_train, idx_anom,
            idx_valid, idx_test, num_epochs=args.num_epoch or 30,
            lr=args.lr or 1e-3, seed=args.seed,
            relations=getattr(ds, "relations", None), verbose=True)
        res.update({"model": name, "dataset": ds.name})
        return res
    if name in ("dominant-minibatch", "anomalydae-minibatch",
                "aegis-minibatch"):
        res = run_minibatch_recon(
            name, adj, ds.features, labels, idx_train, idx_valid, idx_test,
            num_epochs=args.num_epoch or 30, lr=args.lr or 1e-3,
            seed=args.seed, verbose=True)
        res.update({"model": name, "dataset": ds.name})
        return res
    raise ValueError(name)


def run_minibatch_recon(name, adj, features, labels, idx_train, idx_valid,
                        idx_test, *, emb_dim: int = 64, batch_size: int = 150,
                        num_batches: int = 50, num_epochs: int = 30,
                        lr: float = 1e-3, seed: int = 0,
                        verbose: bool = False) -> dict:
    """Drivers for the C27–C29 minibatch baselines
    (reference ``src/model_handler_dominate.py`` etc.)."""
    from ggad_tpu.models.sage_recon import (
        MiniBatchAEGIS,
        MiniBatchRecon,
        aegis_mb_losses,
    )
    from ggad_tpu.ops.metrics import average_precision, roc_auc
    from ggad_tpu.sampler.neighbor import NeighborTable

    table = NeighborTable.from_scipy(adj)
    feats = jnp.asarray(features, jnp.float32)
    labels = np.asarray(labels)
    rng = jax.random.PRNGKey(seed)

    # graph/features/noise enter the jitted steps as ARGUMENTS (aux):
    # closure constants would ship with the remote-compile payload.
    if name == "aegis-minibatch":
        model = MiniBatchAEGIS(emb_dim=emb_dim)
        rng, nk = jax.random.split(rng)
        aux = jax.random.normal(nk, feats.shape)  # noise table

        def loss_fn(p, batch, key, feats, table, aux):
            out = model.apply(p, feats, aux, table, batch,
                              rngs={"sample": key})
            ld, lg = aegis_mb_losses(out)
            return ld + lg

        def score_fn(p, batch, key, feats, table, aux):
            out = model.apply(p, feats, aux, table, batch,
                              rngs={"sample": key})
            return out.prob_real

        rng, ik, sk = jax.random.split(rng, 3)
        params = model.init({"params": ik, "sample": sk}, feats,
                            aux, table, jnp.zeros(batch_size, jnp.int32))
    else:
        model = MiniBatchRecon(
            emb_dim=emb_dim,
            pos_weighted=(name == "anomalydae-minibatch"))
        aux = jnp.zeros((1,))

        def loss_fn(p, batch, key, feats, table, aux):
            x_rec = model.apply(p, feats, table, batch,
                                rngs={"sample": key})
            return model.train_loss(x_rec, feats[batch])

        def score_fn(p, batch, key, feats, table, aux):
            x_rec = model.apply(p, feats, table, batch,
                                rngs={"sample": key})
            return MiniBatchRecon.scores(x_rec, feats[batch])

        rng, ik, sk = jax.random.split(rng, 3)
        params = model.init({"params": ik, "sample": sk}, feats, table,
                            jnp.zeros(batch_size, jnp.int32))

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, key, feats, table, aux):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key,
                                                  feats, table, aux)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_batch = 1024

    @jax.jit
    def eval_step(params, batch, key, feats, table, aux):
        return score_fn(params, batch, key, feats, table, aux)

    def score_nodes(params, ids):
        out = np.empty(len(ids), np.float32)
        key = jax.random.PRNGKey(999)
        for s in range(0, len(ids), eval_batch):
            chunk = ids[s:s + eval_batch]
            pad = eval_batch - len(chunk)
            padded = np.concatenate([chunk, np.zeros(pad, np.int64)])
            key, sub = jax.random.split(key)
            sc = np.asarray(eval_step(params,
                                      jnp.asarray(padded, jnp.int32), sub,
                                      feats, table, aux))
            out[s:s + eval_batch] = sc[: len(chunk)]
        return out

    host_rng = np.random.default_rng(seed)
    pool = np.asarray(idx_train, np.int64)
    t0 = time.time()
    loss = jnp.zeros(())
    for epoch in range(num_epochs):
        for _ in range(num_batches):
            ids = host_rng.choice(pool, batch_size, replace=True)
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(ids, jnp.int32), sub,
                feats, table, aux)
        if verbose and epoch % 5 == 0:
            print(f"epoch {epoch}  loss {float(loss):.4f}")

    probs = score_nodes(params, np.asarray(idx_test))
    return {
        "test_auc": roc_auc(labels[idx_test], probs),
        "test_ap": average_precision(labels[idx_test], probs),
        "wall_time_s": time.time() - t0,
    }


def run_minibatch_classifier(name, adj, features, labels, idx_train,
                             idx_anomaly, idx_valid, idx_test, *,
                             emb_dim: int = 64, batch_size: int = 150,
                             n_anom: int = 50, num_batches: int = 50,
                             num_epochs: int = 30, lr: float = 1e-3,
                             weight_decay: float = 0.007, seed: int = 0,
                             relations=None,
                             verbose: bool = False) -> dict:
    """Supervised minibatch classifiers: vanilla GraphSAGE (CE) and the
    PC-GNN-style multi-relation model (CE + 5·affinity margin).

    Same 150+n_anom batch composition and best-val-AUC selection as the
    GGAD minibatch handler (reference ``src/model_handler.py:310-399``).
    ``relations``: per-relation scipy adjacencies for PC-GNN (yelp-style
    RUR/RTR/RSR); None falls back to three copies of the homogeneous
    graph (the reference's active code path, ``src/model_handler.py:27``).
    """
    import scipy.sparse as sp

    from ggad_tpu.models.pcgnn import PCGNN, pcgnn_loss, pcgnn_prob
    from ggad_tpu.models.sage import GraphSAGEClassifier
    from ggad_tpu.ops.metrics import average_precision, roc_auc
    from ggad_tpu.sampler.neighbor import NeighborTable

    table = NeighborTable.from_scipy(adj)
    feats = jnp.asarray(features, jnp.float32)
    labels = np.asarray(labels)
    b_total = batch_size + n_anom

    # graph/features enter the jitted steps as ARGUMENTS (tb): closing
    # over them would embed them in the compile payload (HTTP 413 on the
    # remote-compile tunnel at DGraph scale).
    if name == "pcgnn":
        if relations is not None:
            n = adj.shape[0]
            tb = [NeighborTable.from_scipy(
                r + sp.eye(n, format="csr", dtype=np.float32))
                for r in relations]
        else:
            tb = [table] * 3
        model = PCGNN(emb_dim=emb_dim, n_relations=len(tb))

        def loss_fn(p, batch, y, key, feats, tb):
            out = model.apply(p, feats, tb, batch, rngs={"sample": key})
            total, _, _ = pcgnn_loss(out, y)
            return total

        def prob_fn(p, batch, key, feats, tb):
            return pcgnn_prob(
                model.apply(p, feats, tb, batch, rngs={"sample": key}))
    else:
        model = GraphSAGEClassifier(emb_dim=emb_dim, fanout=5)
        tb = table

        def loss_fn(p, batch, y, key, feats, tb):
            logits = model.apply(p, feats, tb, batch,
                                 rngs={"sample": key})
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                logp, y[:, None], axis=1)[:, 0])

        def prob_fn(p, batch, key, feats, tb):
            return jax.nn.sigmoid(model.apply(
                p, feats, tb, batch, rngs={"sample": key})[:, 1])

    rng = jax.random.PRNGKey(seed)
    rng, ik, sk = jax.random.split(rng, 3)
    params = model.init({"params": ik, "sample": sk}, feats, tb,
                        jnp.zeros(b_total, jnp.int32))
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, y, key, feats, tb):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, y, key,
                                                  feats, tb)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_batch = 1024

    @jax.jit
    def eval_step(params, batch, key, feats, tb):
        return prob_fn(params, batch, key, feats, tb)

    def score_nodes(params, ids):
        out = np.empty(len(ids), np.float32)
        key = jax.random.PRNGKey(4321)
        for s in range(0, len(ids), eval_batch):
            chunk = ids[s:s + eval_batch]
            pad = eval_batch - len(chunk)
            padded = np.concatenate([chunk, np.zeros(pad, np.int64)])
            key, sub = jax.random.split(key)
            probs = np.asarray(eval_step(
                params, jnp.asarray(padded, jnp.int32), sub, feats, tb))
            out[s:s + eval_batch] = probs[: len(chunk)]
        return out

    host_rng = np.random.default_rng(seed)
    train_pool = np.asarray(
        [i for i in idx_train if labels[i] == 0], np.int64)
    anom_pool = np.unique(np.asarray(
        list(idx_anomaly)
        + [i for i in idx_train if labels[i] == 1], np.int64))
    best_auc, best_params = -1.0, params

    t0 = time.time()
    for epoch in range(num_epochs):
        for _ in range(num_batches):
            tr_ids = host_rng.choice(train_pool, batch_size, replace=True)
            an_ids = host_rng.choice(anom_pool, n_anom,
                                     replace=len(anom_pool) < n_anom)
            batch = jnp.asarray(np.concatenate([tr_ids, an_ids]),
                                jnp.int32)
            y = jnp.asarray(labels[np.asarray(batch)], jnp.int32)
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(params, opt_state,
                                                 batch, y, sub, feats, tb)
        if epoch % 5 == 0 or epoch == num_epochs - 1:
            probs = score_nodes(params, np.asarray(idx_valid))
            auc = roc_auc(labels[idx_valid], probs)
            if auc > best_auc:
                best_auc, best_params = auc, jax.tree.map(
                    lambda a: a.copy(), params)
            if verbose:
                print(f"epoch {epoch}  val AUROC {auc:.4f}  "
                      f"loss {float(loss):.4f}")

    probs = score_nodes(best_params, np.asarray(idx_test))
    return {
        "best_val_auc": best_auc,
        "test_auc": roc_auc(labels[idx_test], probs),
        "test_ap": average_precision(labels[idx_test], probs),
        "wall_time_s": time.time() - t0,
    }
