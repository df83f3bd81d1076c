"""Mini-batch GGAD training handler (the DGraph-scale path).

Re-designs the reference's ``src/model_handler.py``:
  * batch composition: ``batch_size`` train slots + ``n_anom_per_batch``
    outlier-seed slots appended (reference ``:330-348``);
  * ``num_batches`` per epoch (reference hardcodes 150, ``:316-317``);
  * validation every ``valid_epochs`` with best-AUC checkpointing
    (reference ``:379-399``);
  * final test restores the best checkpoint and reports
    f1-macro/f1-pos/f1-neg/AUROC/AP/G-mean (reference ``test_sage``,
    ``src/utils.py:207-247``).

All device work — neighbor sampling, two-hop aggregation, loss, Adam —
is one jitted step with static shapes; the host only draws batch ids.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ggad_tpu.models.sage import (
    MiniBatchGGAD,
    minibatch_ggad_losses,
)
from ggad_tpu.ops.metrics import (
    average_precision,
    confusion,
    f1_scores,
    gmean_from_confusion,
    prob_to_pred,
    roc_auc,
)
from ggad_tpu.sampler.neighbor import NeighborTable


@dataclasses.dataclass
class MiniBatchResult:
    params: Any
    best_params: Any
    best_val_auc: float
    best_epoch: int
    test_metrics: dict
    history: list
    wall_time_s: float
    train_time_s: float = 0.0   # device train dispatches only (no eval
                                # sweeps / host batch draws / ckpt)


@dataclasses.dataclass
class MiniBatchTrainer:
    """GGAD mini-batch trainer over a sampled-neighborhood encoder."""

    adj: Any                      # scipy sparse adjacency WITH self-loops
    features: np.ndarray          # [N, F]
    labels: np.ndarray            # [N] mutated labels (seeds = 1)
    idx_train: np.ndarray         # train-slot candidate ids
    idx_anomaly: np.ndarray       # outlier-seed ids (label 1)
    idx_valid: np.ndarray
    idx_test: np.ndarray

    emb_dim: int = 64
    fanout1: int = 16
    fanout2: int = 8
    lr: float = 1e-3
    weight_decay: float = 0.007   # reference src/dgraph.yml:36-43
    batch_size: int = 150
    n_anom_per_batch: int = 50
    num_batches: int = 150
    num_epochs: int = 100
    valid_epochs: int = 5
    thres: float = 0.4            # reference src/dgraph.yml
    seed: int = 0
    eval_batch: int = 1024
    logger: Optional[Any] = None
    checkpoint_dir: Optional[str] = None
    mesh: Optional[Any] = None    # jax Mesh (or device count) → data-
                                  # parallel batch-axis sharding (GSPMD)
    normalize_features: bool = True   # reference ModelHandler row-
                                  # normalizes with +0.01 smoothing
                                  # (src/model_handler.py:225,
                                  # src/utils.py:74-84) — executed-
                                  # oracle-caught; False keeps raw
                                  # features for ablation

    def __post_init__(self):
        self.table = NeighborTable.from_scipy(self.adj)
        if self.normalize_features:
            from ggad_tpu.ops.normalize import row_normalize_smoothed
            self.features = row_normalize_smoothed(self.features)
        self.feats = jnp.asarray(self.features, jnp.float32)
        self._batch_sh = self._repl = None
        if self.mesh is not None:
            # DP: the batch axis shards over the mesh; feature/neighbor
            # tables and params replicate. GSPMD partitions the jitted
            # step along the batch dimension and inserts the loss/grad
            # all-reduces — semantics identical to single-device.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ggad_tpu.parallel.mesh import make_mesh

            if not hasattr(self.mesh, "devices"):
                self.mesh = make_mesh(int(self.mesh),
                                      axis_names=("batch",))
            n_dev = self.mesh.devices.size
            b_total = self.batch_size + self.n_anom_per_batch
            if b_total % n_dev or self.eval_batch % n_dev:
                raise ValueError(
                    f"batch sizes ({b_total}, eval {self.eval_batch}) "
                    f"must divide the mesh size {n_dev}")
            axis = self.mesh.axis_names[0]
            self._batch_sh = NamedSharding(self.mesh, P(None, axis))
            self._repl = NamedSharding(self.mesh, P())
            self.feats = jax.device_put(self.feats, self._repl)
            self.table = jax.tree.map(
                lambda a: jax.device_put(a, self._repl), self.table)
        self.model = MiniBatchGGAD(emb_dim=self.emb_dim,
                                   fanout1=self.fanout1,
                                   fanout2=self.fanout2)
        self.tx = optax.adamw(self.lr, weight_decay=self.weight_decay)
        # train-slot candidates: the reference mixes any contaminated
        # label-1 train nodes into the normal slots; we keep slots by label
        # so shapes stay static (documented deviation, SURVEY.md §7.1).
        self._train_pool = np.asarray(
            [i for i in self.idx_train if self.labels[i] == 0], np.int32)
        # seeds may already sit inside idx_train under some split presets
        # (seeds_in_train) — dedupe so sampling isn't biased toward them
        self._anom_pool = np.unique(np.asarray(
            list(self.idx_anomaly)
            + [i for i in self.idx_train if self.labels[i] == 1],
            np.int32))

        # feats/table are jit ARGUMENTS — closing over them would embed
        # hundreds of MB as compile-payload constants (HTTP 413 on the
        # remote-compile tunnel at DGraph scale).
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1))
        self._train_epoch = jax.jit(self._train_epoch_impl,
                                    donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._eval_many = jax.jit(self._eval_many_impl)

    # ------------------------------------------------------------------
    def init(self, rng):
        p_rng, s_rng = jax.random.split(rng)
        batch = jnp.zeros(self.batch_size + self.n_anom_per_batch, jnp.int32)
        params = self.model.init({"params": p_rng, "sample": s_rng},
                                 self.feats, self.table, batch,
                                 self.n_anom_per_batch, True)
        opt_state = self.tx.init(params)
        if self._repl is not None:
            params = jax.tree.map(
                lambda a: jax.device_put(a, self._repl), params)
            opt_state = jax.tree.map(
                lambda a: jax.device_put(a, self._repl), opt_state)
        return params, opt_state

    def _shard_batches(self, batches: jax.Array) -> jax.Array:
        """Place a [C, B] id block batch-axis-sharded when DP is on."""
        if self._batch_sh is not None:
            return jax.device_put(batches, self._batch_sh)
        return batches

    def _train_step_impl(self, params, opt_state, batch, rng, feats,
                         table):
        def loss_fn(p):
            out = self.model.apply(p, feats, table, batch,
                                   self.n_anom_per_batch, True,
                                   rngs={"sample": rng})
            losses = minibatch_ggad_losses(out, self.n_anom_per_batch)
            return losses.total, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    def _train_epoch_impl(self, params, opt_state, batches, rng, feats,
                          table):
        """All of an epoch's batches in one dispatch (lax.scan): the
        per-step host round-trip dominates at small batch sizes.
        ``batches``: [num_batches, B] int32 (host-sampled ids)."""
        def body(carry, xs):
            params, opt_state = carry
            batch, key = xs
            params, opt_state, losses = self._train_step_impl(
                params, opt_state, batch, key, feats, table)
            return (params, opt_state), losses

        keys = jax.random.split(rng, batches.shape[0])
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, keys))
        return params, opt_state, jax.tree.map(lambda a: a[-1], losses)

    def _eval_step_impl(self, params, batch, rng, feats, table):
        out = self.model.apply(params, feats, table, batch, 0,
                               False, rngs={"sample": rng})
        return jax.nn.sigmoid(out.scores)

    def _eval_many_impl(self, params, batches, rng, feats, table):
        """Score [C, B] id chunks in one dispatch (lax.map over chunks)."""
        keys = jax.random.split(rng, batches.shape[0])

        def one(args):
            batch, key = args
            return self._eval_step_impl(params, batch, key, feats, table)

        return jax.lax.map(one, (batches, keys))

    # ------------------------------------------------------------------
    def score_nodes(self, params, node_ids: np.ndarray,
                    rng=None) -> np.ndarray:
        """Batched sigmoid scores for arbitrary node ids (padded), all
        chunks scored in a single fused dispatch."""
        if rng is None:
            rng = jax.random.PRNGKey(1234)
        n = len(node_ids)
        bs = self.eval_batch
        n_chunks = (n + bs - 1) // bs
        padded = np.zeros(n_chunks * bs, np.int64)
        padded[:n] = node_ids
        probs = np.asarray(self._eval_many(
            params,
            self._shard_batches(
                jnp.asarray(padded.reshape(n_chunks, bs), jnp.int32)),
            rng, self.feats, self.table))
        return probs.reshape(-1)[:n]

    def metrics_on(self, params, node_ids, labels) -> dict:
        probs = self.score_nodes(params, np.asarray(node_ids))
        labels = np.asarray(labels)
        preds = prob_to_pred(probs, self.thres)
        f1_mac, f1_pos, f1_neg = f1_scores(labels, preds)
        conf = confusion(labels, preds)
        return {
            "auc": roc_auc(labels, probs),
            "ap": average_precision(labels, probs),
            "f1_macro": f1_mac,
            "f1_pos": f1_pos,
            "f1_neg": f1_neg,
            "gmean": gmean_from_confusion(conf),
        }

    # ------------------------------------------------------------------
    def train(self, verbose: bool = False) -> MiniBatchResult:
        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        params, opt_state = self.init(init_rng)
        host_rng = np.random.default_rng(self.seed)

        ckpt = None
        if self.checkpoint_dir:
            from ggad_tpu.train.checkpoint import Checkpointer
            ckpt = Checkpointer(self.checkpoint_dir)

        best_auc, best_epoch = -1.0, -1
        best_params = params
        history = []
        t0 = time.time()
        t_train = 0.0

        for epoch in range(self.num_epochs):
            # host draws all the epoch's batch ids; the device runs the
            # whole epoch in one fused scan dispatch
            train_ids = host_rng.choice(
                self._train_pool,
                size=(self.num_batches, self.batch_size), replace=True)
            anom_ids = host_rng.choice(
                self._anom_pool,
                size=(self.num_batches, self.n_anom_per_batch),
                replace=True)
            batches = self._shard_batches(jnp.asarray(
                np.concatenate([train_ids, anom_ids], axis=1), jnp.int32))
            rng, step_rng = jax.random.split(rng)
            ts = time.time()
            params, opt_state, losses = self._train_epoch(
                params, opt_state, batches, step_rng, self.feats,
                self.table)
            jax.block_until_ready(losses.total)
            t_train += time.time() - ts

            rec = {"epoch": epoch, "loss": float(losses.total),
                   "loss_cls": float(losses.cls),
                   "loss_constraint": float(losses.constraint),
                   "loss_rec": float(losses.rec)}
            if epoch % self.valid_epochs == 0 or epoch == self.num_epochs - 1:
                val = self.metrics_on(params, self.idx_valid,
                                      self.labels[self.idx_valid])
                rec.update({f"val_{k}": v for k, v in val.items()})
                if val["auc"] > best_auc:
                    best_auc, best_epoch = val["auc"], epoch
                    best_params = jax.tree.map(lambda a: a.copy(), params)
                    if ckpt is not None:
                        ckpt.save(epoch, jax.device_get(best_params),
                                  metrics={"val_auc": float(best_auc)})
                if verbose:
                    print(f"epoch {epoch:4d}  val AUROC {val['auc']:.4f}  "
                          f"AP {val['ap']:.4f}  loss {rec['loss']:.4f}")
            history.append(rec)
            if self.logger is not None:
                self.logger(rec)

        test = self.metrics_on(best_params, self.idx_test,
                               self.labels[self.idx_test])
        return MiniBatchResult(
            params=params, best_params=best_params, best_val_auc=best_auc,
            best_epoch=best_epoch, test_metrics=test, history=history,
            wall_time_s=time.time() - t0, train_time_s=t_train)
