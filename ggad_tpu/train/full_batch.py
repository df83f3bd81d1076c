"""Full-batch GGAD training driver (reference ``run.py`` re-designed).

The whole step — forward, three-term loss, backward, Adam — compiles to a
single XLA program per epoch; no host↔device traffic inside the loop.
Evaluation is a second jitted program returning per-node scores; metrics
(AUROC/AP, sklearn-parity) run host-side on the test subset only.
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
from ggad_tpu.datasets.registry import preset_for
from ggad_tpu.graph import Graph, from_scipy
from ggad_tpu.models.ggad import GGAD
from ggad_tpu.ops.metrics import average_precision, roc_auc
from ggad_tpu.ops.normalize import normalize_adj_reference
from ggad_tpu.train.losses import ggad_losses


def maybe_bcsr(adj: Graph, impl: str, *, min_edges_per_tile: float = 8.0,
               mem_budget_bytes: int = 4 << 30, dtype="float32"):
    """Swap in the BCSR/Pallas MXU representation when it pays off.

    Heuristic: BCSR wins when the occupied 128×128 tiles are dense enough
    (≥ ``min_edges_per_tile`` edges per occupied tile) and the tile store
    fits the budget; very sparse graphs (e.g. elliptic: ~1.5 edges/tile)
    take the ELL padded-table path (``ops/ell_spmm``) instead — still
    scatter-free, no tile blow-up. ``impl='ell'`` forces ELL;
    ``impl='xla'`` forces the gather/segment path.
    """
    if impl == "xla":
        return adj
    if impl == "ell":
        from ggad_tpu.ops.ell_spmm import as_ell_graph
        return as_ell_graph(adj, dtype=dtype, layout="sigma")
    if impl not in ("auto", "pallas"):
        return adj
    if impl == "auto" and jax.default_backend() != "tpu":
        return adj
    from ggad_tpu.ops.pallas_spmm import TILE, as_bcsr_graph

    row = np.asarray(adj.row)[: adj.n_edges]
    col = np.asarray(adj.col)[: adj.n_edges]
    n_pad_tiles = (adj.n_nodes + TILE - 1) // TILE
    tiles = np.unique(row // TILE * n_pad_tiles + col // TILE).shape[0]
    mem = 2 * tiles * TILE * TILE * 4  # fwd + bwd tile stores
    if dtype in ("bfloat16", jnp.bfloat16):
        mem //= 2
    if impl == "auto" and (adj.n_edges / max(tiles, 1) < min_edges_per_tile
                           or mem > mem_budget_bytes):
        from ggad_tpu.ops.ell_spmm import as_ell_graph
        return as_ell_graph(adj, dtype=dtype, layout="sigma")
    return as_bcsr_graph(adj, dtype=dtype)


def train_with_retries(make_trainer: Callable[[], "FullBatchTrainer"],
                       retries: int = 2, verbose: bool = False):
    """Failure recovery: rebuild the trainer and resume from its
    checkpoint after a crash (remote-TPU tunnels drop; orbax restores
    params/opt/rng/epoch, so a retry continues mid-run). The trainer
    must be constructed with ``checkpoint_dir`` for resumption to have
    state; without it a retry restarts from scratch."""
    for attempt in range(retries + 1):
        trainer = make_trainer()
        try:
            return trainer.train(verbose=verbose)
        except Exception as e:     # noqa: BLE001 — device/tunnel faults
            if attempt == retries:
                raise
            print(f"[retry] attempt {attempt + 1} failed ({e!r}); "
                  f"rebuilding and resuming from checkpoint")


@dataclasses.dataclass
class TrainResult:
    params: Any
    history: list  # list of dicts: epoch, losses, (auc, ap) when evaluated
    final_auc: float
    final_ap: float
    wall_time_s: float


@dataclasses.dataclass
class FullBatchTrainer:
    """Owns compiled train/eval steps for one dataset + model config."""

    dataset: GADDataset
    lr: float = 1e-3
    weight_decay: float = 0.0
    num_epoch: Optional[int] = None
    embedding_dim: int = 300
    noise_mean: Optional[float] = None
    noise_std: Optional[float] = None
    confidence_margin: float = 0.7
    pos_weight: float = 1.0        # negsamp_ratio in the reference
    seed: int = 0
    eval_every: int = 10
    log_every: int = 2
    spmm_impl: str = "auto"
    spmm_dtype: str = "float32"    # "bfloat16": 1-pass MXU fast mode
    logger: Optional[Callable[[dict], None]] = None
    scan_steps: int = 1            # steps fused per dispatch (lax.scan)
    checkpoint_dir: Optional[str] = None
    profile_dir: Optional[str] = None  # jax.profiler trace of steps 2..4
    train_auc_every: Optional[int] = None  # reference run.py:217-228
                                   # prints train-AUC every 2 epochs;
                                   # computed on-device (roc_auc_jnp)
    mesh: Optional[Any] = None     # jax Mesh (or device count) →
                                   # multi-device training
    dist_impl: str = "halo"        # "halo": explicit boundary-exchange
                                   # collectives (keeps Pallas kernels);
                                   # "gspmd": auto-partitioned (XLA ops)
    dist_schedule: str = "dense"   # halo wire schedule: "dense" (one
                                   # all_to_all, global-max padding) or
                                   # "ring" (per-distance ppermute hops,
                                   # ships Σ_k B_k rows — wins when the
                                   # boundary is skewed across pairs)
    initial_params: Optional[Any] = None  # exact starting weights (e.g.
                                   # converted from a torch state_dict by
                                   # scripts/reference_oracle.py); replaces
                                   # the seeded flax init when given
    hoist_ax: bool = True          # precompute Â@x once (Â(xW₁)=(Âx)W₁);
                                   # False keeps the reference's exact f32
                                   # op order for oracle comparisons

    def __post_init__(self):
        ds = self.dataset
        preset = preset_for(ds.name)
        if self.num_epoch is None:
            self.num_epoch = preset.num_epoch
        if self.noise_mean is None:
            self.noise_mean = preset.noise_mean
        if self.noise_std is None:
            self.noise_std = preset.noise_std

        graph = from_scipy(ds.adj)
        self.adj, self.raw_adj = normalize_adj_reference(graph)
        # seed-row subgraph: generator aggregation in O(E_seed) both ways
        from ggad_tpu.graph import rows_subgraph
        self.seed_adj = rows_subgraph(self.adj, ds.abnormal_label_idx)
        # the margin loss reads affinity only at labeled nodes: restrict
        # the SDDMM to their columns (identical values, O(E_sub) bwd too)
        from ggad_tpu.ops.sddmm import affinity_subset
        self.aff_sub = affinity_subset(
            self.raw_adj, np.concatenate([
                np.asarray(ds.normal_label_idx, np.int64),
                np.asarray(ds.abnormal_label_idx, np.int64)]))
        self._halo = None
        if self.mesh is not None:
            from ggad_tpu.parallel.mesh import make_mesh

            if not hasattr(self.mesh, "devices"):
                self.mesh = make_mesh(int(self.mesh),
                                      axis_names=("nodes",))
            if self.dist_impl == "halo":
                return self._post_init_halo()
            # GSPMD fallback: auto-partitioned arrays; the BCSR Pallas
            # kernels can't ride GSPMD, so force the XLA op path.
            self.spmm_impl = "xla"
        self.adj = maybe_bcsr(self.adj, self.spmm_impl,
                              dtype=self.spmm_dtype)
        self.raw_adj = maybe_bcsr(self.raw_adj, self.spmm_impl,
                                  dtype=self.spmm_dtype)
        from ggad_tpu.ops.pallas_spmm import BCSRGraph
        if (isinstance(self.raw_adj, BCSRGraph)
                and self.spmm_dtype == "bfloat16"):
            # bf16 MXU margin path, round-4 edition: the margin reads
            # only the labeled columns, so the SDDMM runs on the RECT
            # tile set of raw[:, labeled] (TileAffinitySubset) — beats
            # both the edge-parallel subset (r3: 2.55 ms) and the
            # full-column tile SDDMM it replaced (≈4 of the 7 ms amazon
            # step). Identical values at the read nodes (tested).
            # f32-HIGHEST tiles pay 6 MXU passes and stay on the
            # edge-parallel subset path (measured slower otherwise).
            from ggad_tpu.ops.sddmm import tile_affinity_subset
            self.aff_sub = tile_affinity_subset(
                self.raw_adj, np.concatenate([
                    np.asarray(ds.normal_label_idx, np.int64),
                    np.asarray(ds.abnormal_label_idx, np.int64)]),
                dtype=self.spmm_dtype)
        from ggad_tpu.ops.ell_spmm import (
            ELLGraph,
            ELLPair,
            ell_affinity_subset,
            ell_sigma_from_coo,
        )
        if isinstance(self.raw_adj, ELLGraph):
            # sparse regime: rect ELL subset replaces the edge-parallel
            # path whose backward scatter dominated (round-5: 2.37 →
            # ~1.8 ms of the elliptic step; see ELLAffinitySubset)
            self.aff_sub = ell_affinity_subset(
                self.raw_adj.graph, np.concatenate([
                    np.asarray(ds.normal_label_idx, np.int64),
                    np.asarray(ds.abnormal_label_idx, np.int64)]),
                dtype=self.spmm_dtype)
            # seed-row generator aggregation: rect sigma tables — the
            # edge-parallel backward scattered E_seed cotangents into
            # [N, n_h] (~0.5 ms, round-5 trace)
            sg = self.seed_adj
            sr = np.asarray(sg.row)[: sg.n_edges]
            sc = np.asarray(sg.col)[: sg.n_edges]
            sv = np.asarray(sg.val)[: sg.n_edges]
            self.seed_adj = ELLGraph(graph=sg, tables=ELLPair(
                fwd=ell_sigma_from_coo(sr, sc, sv, sg.n_nodes,
                                       dtype=self.spmm_dtype),
                bwd=ell_sigma_from_coo(sc, sr, sv, ds.n_nodes,
                                       dtype=self.spmm_dtype),
                n_nodes=sg.n_nodes))
        self.features = jnp.asarray(ds.features, dtype=jnp.float32)
        self.seed_idx = jnp.asarray(ds.abnormal_label_idx, dtype=jnp.int32)
        self.normal_idx = jnp.asarray(ds.normal_label_idx, dtype=jnp.int32)
        if self.mesh is not None:
            from ggad_tpu.parallel.full_batch import (
                replicate,
                shard_graph,
                shard_node_array,
            )

            self.adj = shard_graph(self.adj, self.mesh)
            self.raw_adj = shard_graph(self.raw_adj, self.mesh)
            self.features = shard_node_array(self.features, self.mesh)
            self.seed_idx = replicate(self.seed_idx, self.mesh)
            self.normal_idx = replicate(self.normal_idx, self.mesh)

        # hoist the first layer's aggregation: features are constant,
        # so Â@x is computed ONCE (f32-exact XLA path) and the per-step
        # gcn1 becomes a dense matmul — no SpMM fwd/bwd in layer 1
        from ggad_tpu.ops.spmm import spmm as _spmm
        self.ax = (_spmm(self.adj, self.features, impl="xla")
                   if self.hoist_ax else None)

        self.model = GGAD(n_h=self.embedding_dim,
                          noise_mean=self.noise_mean,
                          noise_std=self.noise_std,
                          spmm_impl=self.spmm_impl)
        self.tx = optax.adamw(self.lr, weight_decay=self.weight_decay) \
            if self.weight_decay else optax.adam(self.lr)

        # graph/features enter as jit ARGUMENTS (not closure constants):
        # closed-over BCSR tile stores would be embedded as compile-time
        # constants and shipped with the XLA payload.
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1))
        self._train_scan = jax.jit(self._train_scan_impl,
                                   donate_argnums=(0, 1),
                                   static_argnums=(8,))
        self._eval_scores = jax.jit(self._eval_scores_impl)

    # -- halo (explicit boundary-exchange) multi-device mode -----------
    def _post_init_halo(self):
        """mesh + dist_impl='halo': edge-partitioned training with one
        boundary all_to_all per SpMM, per-shard Pallas BCSR tiles when
        ``spmm_impl`` is 'pallas'/'auto' on TPU. Step signatures mirror
        the single-device path (self.adj/raw_adj/features hold the
        partition pytrees), so train()/evaluate() are shared."""
        from ggad_tpu.parallel.halo_trainer import (
            halo_ggad_eval_scores,
            make_halo_train_step,
            prepare_halo,
        )

        ds = self.dataset
        self.aff_sub = None   # halo mode computes affinity distributed
        self.ax = None
        use_pallas = (self.spmm_impl == "pallas"
                      or (self.spmm_impl == "auto"
                          and jax.default_backend() == "tpu"))
        setup = prepare_halo(
            ds, self.mesh,
            spmm_impl="pallas" if use_pallas else "xla",
            spmm_dtype=self.spmm_dtype, schedule=self.dist_schedule)
        self._halo = setup
        self.model = GGAD(n_h=self.embedding_dim,
                          noise_mean=self.noise_mean,
                          noise_std=self.noise_std, spmm_impl="xla")
        self.tx = optax.adamw(self.lr, weight_decay=self.weight_decay) \
            if self.weight_decay else optax.adam(self.lr)
        self.features = setup.x_pad
        self.seed_idx = setup.seed_idx
        self.normal_idx = setup.normal_idx

        common = dict(noise_mean=self.noise_mean,
                      noise_std=self.noise_std, n_h=self.embedding_dim,
                      confidence_margin=self.confidence_margin,
                      pos_weight=self.pos_weight)
        step1 = make_halo_train_step(self.tx, self.mesh, **common)
        scans: dict = {}

        def train_step(params, opt_state, rng, adj, raw_adj, features,
                       seed_idx, normal_idx, seed_adj=None, aff_sub=None,
                       ax=None):
            return step1(params, opt_state, rng, setup.part, setup.plan,
                         setup.raw_part, setup.raw_plan, features,
                         seed_idx, normal_idx, setup.tiles,
                         setup.raw_tiles, setup.ax, setup.seed_rows,
                         setup.aff_sub, setup.ells)

        def train_scan(params, opt_state, rng, adj, raw_adj, features,
                       seed_idx, normal_idx, n_steps, seed_adj=None,
                       aff_sub=None, ax=None):
            if n_steps not in scans:
                scans[n_steps] = make_halo_train_step(
                    self.tx, self.mesh, n_steps=n_steps, **common)
            return scans[n_steps](
                params, opt_state, rng, setup.part, setup.plan,
                setup.raw_part, setup.raw_plan, features, seed_idx,
                normal_idx, setup.tiles, setup.raw_tiles, setup.ax,
                setup.seed_rows, setup.aff_sub, setup.ells)

        eval_jit = jax.jit(
            lambda params, x_pad, ax: halo_ggad_eval_scores(
                params, setup.part, setup.plan, x_pad, self.mesh,
                tiles=setup.tiles, ax=ax, ells=setup.ells))

        def eval_scores(params, rng, adj, features, seed_idx,
                        normal_idx, ax=None):
            return eval_jit(params, features, setup.ax)[: ds.n_nodes]

        self._train_step = train_step
        self._train_scan = train_scan
        self._eval_scores = eval_scores

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array):
        p_rng, n_rng = jax.random.split(rng)
        if self.initial_params is not None:
            params = jax.tree.map(jnp.asarray, self.initial_params)
            opt_state = self.tx.init(params)
            if self.mesh is not None:
                from ggad_tpu.parallel.full_batch import replicate
                params = replicate(params, self.mesh)
                opt_state = replicate(opt_state, self.mesh)
            return params, opt_state
        if self._halo is not None:
            # init values depend only on rngs + feat_dim (identical to
            # the full init) — skip the full-size forward trace
            from ggad_tpu.models.ggad import init_ggad_params
            params = init_ggad_params(
                self.model, self.dataset.features.shape[1],
                {"params": p_rng, "noise": n_rng})
        else:
            params = self.model.init(
                {"params": p_rng, "noise": n_rng},
                self.adj, self.features, self.seed_idx, self.normal_idx,
                train=True)
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            from ggad_tpu.parallel.full_batch import replicate
            params = replicate(params, self.mesh)
            opt_state = replicate(opt_state, self.mesh)
        return params, opt_state

    def _train_step_impl(self, params, opt_state, rng, adj, raw_adj,
                         features, seed_idx, normal_idx, seed_adj=None,
                         aff_sub=None, ax=None):
        def loss_fn(p):
            out = self.model.apply(
                p, adj, features, seed_idx, normal_idx,
                train=True, seed_adj=seed_adj, ax=ax,
                rngs={"noise": rng})
            losses = ggad_losses(
                out, raw_adj, seed_idx, normal_idx,
                confidence_margin=self.confidence_margin,
                pos_weight=self.pos_weight, aff_sub=aff_sub)
            return losses.total, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    def _train_scan_impl(self, params, opt_state, rng, adj, raw_adj,
                         features, seed_idx, normal_idx, n_steps: int,
                         seed_adj=None, aff_sub=None, ax=None):
        """``n_steps`` fused training steps per dispatch (amortizes host
        round-trips; the reference pays a full python epoch per step)."""
        def body(carry, key):
            params, opt_state = carry
            params, opt_state, losses = self._train_step_impl(
                params, opt_state, key, adj, raw_adj, features, seed_idx,
                normal_idx, seed_adj, aff_sub, ax)
            return (params, opt_state), losses

        keys = jax.random.split(rng, n_steps)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys)
        last = jax.tree.map(lambda a: a[-1], losses)
        return params, opt_state, last

    def _eval_scores_impl(self, params, rng, adj, features, seed_idx,
                          normal_idx, ax=None):
        out = self.model.apply(
            params, adj, features, seed_idx, normal_idx,
            train=False, ax=ax, rngs={"noise": rng})
        return out.logits[:, 0]

    # ------------------------------------------------------------------
    def eval_scores(self, params, rng=None) -> np.ndarray:
        """Public scoring program: one one-class logit per node (higher =
        more anomalous), the reference's eval-branch semantics
        (``run.py:230-240``, ``model.py:184-188``). This is the API the
        serving path (:mod:`ggad_tpu.serve`) and any production consumer
        should call; it routes through the same jitted program as
        training-time evaluation (incl. the halo/mesh path when
        ``mesh=`` is set)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return np.asarray(self._eval_scores(
            params, rng, self.adj, self.features, self.seed_idx,
            self.normal_idx, self.ax))

    def train_auc(self, params, rng=None) -> float:
        """AUROC over the train split, entirely on device except the
        final scalar (reference ``run.py:217-228``)."""
        from ggad_tpu.ops.metrics import roc_auc_jnp

        if rng is None:
            rng = jax.random.PRNGKey(0)
        if not hasattr(self, "_train_auc_jit"):
            ds = self.dataset
            self._auc_labels = jnp.asarray(ds.ano_labels, jnp.float32)
            mask = np.zeros(ds.n_nodes, np.float32)
            mask[ds.idx_train] = 1.0
            self._auc_mask = jnp.asarray(mask)
            self._train_auc_jit = jax.jit(roc_auc_jnp)
        scores = self._eval_scores(params, rng, self.adj, self.features,
                                   self.seed_idx, self.normal_idx,
                                   self.ax)
        return float(self._train_auc_jit(self._auc_labels, scores,
                                         self._auc_mask))

    def evaluate(self, params, rng=None, subset: str = "test") -> tuple[float, float]:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        scores = np.asarray(self._eval_scores(
            params, rng, self.adj, self.features, self.seed_idx,
            self.normal_idx, self.ax))
        ds = self.dataset
        idx = {"test": ds.idx_test, "val": ds.idx_val,
               "train": ds.idx_train}[subset]
        auc = roc_auc(ds.ano_labels[idx], scores[idx])
        ap = average_precision(ds.ano_labels[idx], scores[idx])
        return auc, ap

    def train(self, verbose: bool = False) -> TrainResult:
        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        params, opt_state = self.init(init_rng)

        ckpt = None
        start_epoch = 0
        if self.checkpoint_dir:
            from ggad_tpu.train.checkpoint import Checkpointer
            ckpt = Checkpointer(self.checkpoint_dir)
            template = jax.device_get(
                {"params": params, "opt_state": opt_state,
                 "rng": rng, "epoch": 0})
            restored = ckpt.restore(template=template)
            if restored is not None:
                params = jax.device_put(restored["params"])
                opt_state = jax.device_put(restored["opt_state"])
                rng = jnp.asarray(restored["rng"])
                start_epoch = int(restored["epoch"]) + 1

        history = []
        t0 = time.time()
        epoch = start_epoch
        while epoch < self.num_epoch:
            if (self.profile_dir and epoch >= 2
                    and jax.default_backend() == "tpu"
                    and not getattr(self, "_trace_started", False)):
                jax.profiler.start_trace(self.profile_dir)
                self._trace_started = True
            # fuse steps up to the next log/eval boundary
            boundaries = [e for e in range(epoch + 1, self.num_epoch + 1)
                          if e % self.log_every == 0
                          or e % self.eval_every == 0
                          or e == self.num_epoch]
            chunk = min(max(boundaries[0] - epoch, 1), self.scan_steps) \
                if self.scan_steps > 1 else 1
            rng, step_rng = jax.random.split(rng)
            if chunk > 1:
                params, opt_state, losses = self._train_scan(
                    params, opt_state, step_rng, self.adj, self.raw_adj,
                    self.features, self.seed_idx, self.normal_idx, chunk,
                    self.seed_adj, self.aff_sub, self.ax)
                epoch += chunk - 1
            else:
                params, opt_state, losses = self._train_step(
                    params, opt_state, step_rng, self.adj, self.raw_adj,
                    self.features, self.seed_idx, self.normal_idx,
                    self.seed_adj, self.aff_sub, self.ax)
            if (self.profile_dir and epoch >= 4
                    and jax.default_backend() == "tpu"
                    and not getattr(self, "_trace_done", False)):
                jax.block_until_ready(losses.total)
                try:
                    jax.profiler.stop_trace()
                except RuntimeError:
                    pass
                self._trace_done = True

            rec = None
            if epoch % self.log_every == 0 or epoch == self.num_epoch - 1:
                rec = {
                    "epoch": epoch,
                    "loss": float(losses.total),
                    "loss_bce": float(losses.bce),
                    "loss_margin": float(losses.margin),
                    "loss_rec": float(losses.rec),
                }
            if (self.train_auc_every
                    and (epoch % self.train_auc_every == 0
                         or epoch == self.num_epoch - 1)):
                tauc = self.train_auc(params)
                rec = rec or {"epoch": epoch}
                rec["train_auc"] = tauc
                if verbose:
                    print(f"epoch {epoch:4d}  train AUROC {tauc:.4f}")
            if epoch % self.eval_every == 0 or epoch == self.num_epoch - 1:
                auc, ap = self.evaluate(params)
                rec = rec or {"epoch": epoch}
                rec.update({"auc": auc, "ap": ap})
                if verbose:
                    print(f"epoch {epoch:4d}  AUROC {auc:.4f}  AP {ap:.4f}  "
                          f"loss {float(losses.total):.4f}")
            if rec is not None:
                history.append(rec)
                if self.logger is not None:
                    self.logger(rec)
            if (ckpt is not None and (epoch % self.eval_every == 0
                                      or epoch == self.num_epoch - 1)):
                ckpt.save(epoch, jax.device_get(
                    {"params": params, "opt_state": opt_state,
                     "rng": rng, "epoch": epoch}))
            epoch += 1

        wall = time.time() - t0
        final_auc, final_ap = self.evaluate(params)
        return TrainResult(params=params, history=history,
                           final_auc=final_auc, final_ap=final_ap,
                           wall_time_s=wall)
