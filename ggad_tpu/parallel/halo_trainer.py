"""Distributed full-batch GGAD training on the boundary-halo schedule.

The production multi-device path (SURVEY.md §5, §7.2 P7): the graph is
row/edge-partitioned (:class:`EdgePartition` + :class:`HaloPlan`), every
SpMM moves only boundary feature rows over one ``all_to_all``, and the
affinity term runs the exchange forward (normalized rows) and backward
(per-column scalar partials). Parameters are replicated; XLA inserts the
gradient ``psum`` for the replicated-parameter update.

The parameter pytree is EXACTLY the flax ``GGAD`` module's
(``model.init(...)``), so single-device flax training and this step are
interchangeable and testable against each other — same math, different
comm schedule. Reference counterpart: none (``README.md:21`` — the
reference is a single-process 24-core-CPU program).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ggad_tpu.parallel.spmm_shard import (
    EdgePartition,
    HaloAffinitySubset,
    HaloBCSR,
    HaloELL,
    HaloPlan,
    HaloSeedRows,
    affinity_halo,
    affinity_halo_bcsr,
    affinity_halo_subset,
    build_halo_affinity_subset,
    build_halo_bcsr,
    build_halo_ell,
    build_halo_plan,
    build_halo_seed_rows,
    pad_nodes,
    partition_edges,
    place_halo_affinity_subset,
    place_halo_bcsr,
    place_halo_ell,
    place_halo_plan,
    place_halo_seed_rows,
    place_partition,
    spmm_halo,
    spmm_halo_bcsr,
    spmm_halo_ell,
    spmm_halo_seed_rows,
)
from ggad_tpu.train.losses import GGADLosses, bce_with_logits


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def halo_ggad_forward_and_losses(
    params: Any,
    part: EdgePartition,
    plan: HaloPlan,
    x_pad: jax.Array,
    seed_idx: jax.Array,
    normal_idx: jax.Array,
    noise: jax.Array,
    raw_part: EdgePartition,
    raw_plan: HaloPlan,
    mesh: Mesh,
    axis: str = "nodes",
    *,
    tiles: HaloBCSR | None = None,
    raw_tiles: HaloBCSR | None = None,
    ax: jax.Array | None = None,
    seed_rows: HaloSeedRows | None = None,
    aff_sub: HaloAffinitySubset | None = None,
    ells: HaloELL | None = None,
    confidence_margin: float = 0.7,
    pos_weight: float = 1.0,
) -> GGADLosses:
    """GGAD train-mode forward + 3-term loss with halo collectives.

    Mirrors ``models/ggad.py`` + ``train/losses.py`` exactly (same param
    tree, same math); ``noise`` is the pre-drawn [S, n_h] perturbation.
    ``tiles``: per-shard BCSR tile sets — the encoder/generator SpMMs
    run on the MXU (Pallas) instead of gather/segment-sum; the affinity
    stays edge-parallel (its SDDMM is the cross-device reduction).

    ``seed_rows``: distributed seed-row subgraph — the generator
    aggregation ``(Â @ emb)[seed]`` becomes per-shard column partials +
    one [S, n_h] psum instead of a full halo SpMM (+ its full transposed
    backward). ``aff_sub``: distributed column-subset restriction of the
    affinity — the margin reads only labeled nodes, so the SDDMM
    restricts to their columns and the boundary exchange collapses to
    two small psums. Both are exact at the read nodes (tested); together
    they make the distributed step's comm = gcn2's SpMM exchange only.
    """
    pr = params["params"]

    def halo_mm(h):
        if tiles is not None:
            return spmm_halo_bcsr(part, plan, tiles, h, mesh, axis)
        if ells is not None:
            return spmm_halo_ell(part, plan, ells, h, mesh, axis)
        return spmm_halo(part, plan, h, mesh, axis)

    def gcn(name, h, pre_agg=None):
        if pre_agg is not None:
            # Â(xW) = (Âx)W — the hoisted first-layer aggregation
            agg = jnp.dot(pre_agg, pr[name]["fc"]["kernel"],
                          preferred_element_type=jnp.float32) \
                + pr[name]["bias"]
        else:
            hw = jnp.dot(h, pr[name]["fc"]["kernel"],
                         preferred_element_type=jnp.float32)
            agg = halo_mm(hw) + pr[name]["bias"]
        return _prelu(agg, pr[name]["prelu"]["alpha"])

    emb = gcn("gcn2", gcn("gcn1", x_pad, pre_agg=ax))
    emb_abnormal = emb[seed_idx] + noise

    # generated outliers from neighborhood aggregates (model.py:151-156)
    if seed_rows is not None:
        agg = spmm_halo_seed_rows(seed_rows, emb, mesh, axis)
    else:
        agg = halo_mm(emb)[seed_idx]
    emb_con = jax.nn.relu(jnp.dot(agg, pr["fc4"]["kernel"],
                                  preferred_element_type=jnp.float32))
    emb_combine = jnp.concatenate([emb[normal_idx], emb_con], axis=0)

    h = jax.nn.relu(emb_combine @ pr["head"]["fc1"]["kernel"])
    h = jax.nn.relu(h @ pr["head"]["fc2"]["kernel"])
    logits = h @ pr["head"]["fc3"]["kernel"]

    emb = emb.at[seed_idx].set(emb_con)

    n_normal, n_seed = normal_idx.shape[0], seed_idx.shape[0]
    labels = jnp.concatenate([
        jnp.zeros((n_normal, 1), jnp.float32),
        jnp.ones((n_seed, 1), jnp.float32),
    ])
    loss_bce = jnp.mean(bce_with_logits(logits, labels, pos_weight))

    if aff_sub is not None:
        # built over [normal ‖ seed] (same order as the single-device
        # AffinitySubset) — exact at the read nodes
        aff = affinity_halo_subset(raw_plan, aff_sub, emb, mesh, axis)
        aff_normal = jnp.mean(aff[: normal_idx.shape[0]])
        aff_outlier = jnp.mean(aff[normal_idx.shape[0]:])
    elif raw_tiles is not None:
        affinity = affinity_halo_bcsr(raw_part, raw_plan, raw_tiles, emb,
                                      mesh, axis)
        aff_normal = jnp.mean(affinity[normal_idx])
        aff_outlier = jnp.mean(affinity[seed_idx])
    else:
        affinity = affinity_halo(raw_part, raw_plan, emb, mesh, axis)
        aff_normal = jnp.mean(affinity[normal_idx])
        aff_outlier = jnp.mean(affinity[seed_idx])
    loss_margin = jnp.maximum(
        confidence_margin - (aff_normal - aff_outlier), 0.0)

    # seed-axis reduction — the reference's batch-dim broadcast quirk
    # (run.py:207-208), see ggad_tpu/train/losses.py for the derivation
    diff = jnp.square(emb_con - emb_abnormal)
    loss_rec = jnp.mean(jnp.sqrt(jnp.sum(diff, axis=0)))

    total = loss_margin + loss_bce + loss_rec
    return GGADLosses(total, loss_bce, loss_margin, loss_rec,
                      aff_normal, aff_outlier)


def halo_ggad_eval_scores(
    params: Any,
    part: EdgePartition,
    plan: HaloPlan,
    x_pad: jax.Array,
    mesh: Mesh,
    axis: str = "nodes",
    tiles: HaloBCSR | None = None,
    ax: jax.Array | None = None,
    ells: HaloELL | None = None,
) -> jax.Array:
    """Eval-mode forward: one-class logits for ALL nodes ([N_pad])
    (reference ``model.py:184-188``). ``ax``: precomputed ``Â @ x`` —
    the hoisted first-layer aggregation (one fewer halo SpMM)."""
    pr = params["params"]

    def halo_mm(h):
        if tiles is not None:
            return spmm_halo_bcsr(part, plan, tiles, h, mesh, axis)
        if ells is not None:
            return spmm_halo_ell(part, plan, ells, h, mesh, axis)
        return spmm_halo(part, plan, h, mesh, axis)

    def gcn(name, h, pre_agg=None):
        if pre_agg is not None:
            agg = jnp.dot(pre_agg, pr[name]["fc"]["kernel"],
                          preferred_element_type=jnp.float32) \
                + pr[name]["bias"]
        else:
            hw = jnp.dot(h, pr[name]["fc"]["kernel"],
                         preferred_element_type=jnp.float32)
            agg = halo_mm(hw) + pr[name]["bias"]
        return _prelu(agg, pr[name]["prelu"]["alpha"])

    emb = gcn("gcn2", gcn("gcn1", x_pad, pre_agg=ax))
    h = jax.nn.relu(emb @ pr["head"]["fc1"]["kernel"])
    h = jax.nn.relu(h @ pr["head"]["fc2"]["kernel"])
    return (h @ pr["head"]["fc3"]["kernel"])[:, 0]


def make_halo_train_step(
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "nodes",
    *,
    noise_mean: float = 0.0,
    noise_std: float = 0.0,
    n_h: int = 300,
    confidence_margin: float = 0.7,
    pos_weight: float = 1.0,
    n_steps: int = 1,
) -> Callable:
    """Jitted (params, opt_state, rng, part, plan, raw_part, raw_plan,
    x_pad, seed_idx, normal_idx, tiles=None) → (params, opt_state,
    losses); fuses ``n_steps`` steps per dispatch via lax.scan.
    Graph/feature pytrees enter as ARGUMENTS (payload rule); pass
    ``tiles`` (HaloBCSR) to run the SpMMs on the MXU."""

    def one_step(params, opt_state, key, part, plan, raw_part, raw_plan,
                 x_pad, seed_idx, normal_idx, tiles, raw_tiles, ax,
                 seed_rows, aff_sub, ells):
        noise = (jax.random.normal(key, (seed_idx.shape[0], n_h))
                 * noise_std + noise_mean)

        def loss_fn(p):
            losses = halo_ggad_forward_and_losses(
                p, part, plan, x_pad, seed_idx, normal_idx, noise,
                raw_part, raw_plan, mesh, axis, tiles=tiles,
                raw_tiles=raw_tiles, ax=ax, seed_rows=seed_rows,
                aff_sub=aff_sub, ells=ells,
                confidence_margin=confidence_margin,
                pos_weight=pos_weight)
            return losses.total, losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    def step(params, opt_state, rng, part, plan, raw_part, raw_plan,
             x_pad, seed_idx, normal_idx, tiles=None, raw_tiles=None,
             ax=None, seed_rows=None, aff_sub=None, ells=None):
        if n_steps == 1:
            rng, key = jax.random.split(rng)
            return one_step(params, opt_state, key, part, plan, raw_part,
                            raw_plan, x_pad, seed_idx, normal_idx, tiles,
                            raw_tiles, ax, seed_rows, aff_sub, ells)

        def body(carry, key):
            params, opt_state = carry
            params, opt_state, losses = one_step(
                params, opt_state, key, part, plan, raw_part, raw_plan,
                x_pad, seed_idx, normal_idx, tiles, raw_tiles, ax,
                seed_rows, aff_sub, ells)
            return (params, opt_state), losses

        keys = jax.random.split(rng, n_steps)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys)
        return params, opt_state, jax.tree.map(lambda a: a[-1], losses)

    return jax.jit(step, donate_argnums=(0, 1))


@dataclasses.dataclass
class HaloSetup:
    part: EdgePartition
    plan: HaloPlan
    raw_part: EdgePartition
    raw_plan: HaloPlan
    x_pad: jax.Array
    seed_idx: jax.Array
    normal_idx: jax.Array
    tiles: HaloBCSR | None = None
    raw_tiles: HaloBCSR | None = None
    ax: jax.Array | None = None   # precomputed Â@x (hoisted layer 1)
    seed_rows: HaloSeedRows | None = None   # generator row-subgraph
    aff_sub: HaloAffinitySubset | None = None   # margin column subset
    ells: HaloELL | None = None   # ELL local aggregation (sparse regime)


def prepare_halo(dataset, mesh: Mesh, axis: str = "nodes",
                 spmm_impl: str = "xla",
                 spmm_dtype: str = "float32",
                 schedule: str = "dense",
                 bcsr_budget_bytes: int = 8 << 30) -> HaloSetup:
    """Partition + plan both graphs of a GAD dataset and place on mesh.

    ``spmm_impl='pallas'`` also builds the per-shard BCSR tile sets so
    the encoder/generator SpMMs run on the MXU (``spmm_dtype='bfloat16'``
    for the quality-cleared 1-pass fast mode). ``schedule='ring'``
    switches the exchange to per-distance-padded ppermute hops (ships
    Σ_k B_k boundary rows instead of (D−1)·B_max — see
    ``spmm_shard.HaloPlan``)."""
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.ops.normalize import normalize_adj_reference

    g = from_scipy(dataset.adj)
    adj, raw_adj = normalize_adj_reference(g)
    n_dev = int(np.prod(list(mesh.shape.values())))
    part = partition_edges(adj, n_dev)
    raw_part = partition_edges(raw_adj, n_dev)
    plan_host = build_halo_plan(part, schedule=schedule)
    raw_plan_host = build_halo_plan(raw_part, schedule=schedule)
    # generator seed-row subgraph + margin column-subset restriction:
    # these turn the generator SpMM and the affinity exchange into two
    # tiny psums each (exact at the read nodes; see spmm_shard)
    seed_rows = place_halo_seed_rows(
        build_halo_seed_rows(part, dataset.abnormal_label_idx), mesh,
        axis)
    labeled = np.concatenate([
        np.asarray(dataset.normal_label_idx, np.int64),
        np.asarray(dataset.abnormal_label_idx, np.int64)])
    tiles = raw_tiles = ells = None
    if spmm_impl == "pallas":
        # build_halo_bcsr returns None when the tile store would blow
        # the host/device memory budget (tile-sparse huge shards) — ELL
        # is both feasible AND faster in that occupancy regime
        tiles_host = build_halo_bcsr(part, plan_host, dtype=spmm_dtype,
                                     mem_budget_bytes=bcsr_budget_bytes)
        raw_host = (build_halo_bcsr(raw_part, raw_plan_host,
                                    dtype=spmm_dtype,
                                    mem_budget_bytes=bcsr_budget_bytes)
                    if tiles_host is not None else None)
        if tiles_host is not None and raw_host is not None:
            tiles = place_halo_bcsr(tiles_host, mesh, axis)
            raw_tiles = place_halo_bcsr(raw_host, mesh, axis)
        else:
            spmm_impl = "ell"
    if spmm_impl == "ell":
        ells = place_halo_ell(
            build_halo_ell(part, plan_host, dtype=spmm_dtype), mesh,
            axis)
    # margin subset: per-shard RECT tile sets in the BCSR regime (the
    # local SDDMM numerator runs on the MXU — round-4 tile-subset
    # margin); edge-parallel psums otherwise. U ≤ 64K guards the
    # [R × U] tile store on huge labeled sets (DGraph: U ≈ 1M).
    sub_dtype = (spmm_dtype if (tiles is not None
                                and len(np.unique(labeled)) <= 65536)
                 else None)
    aff_sub = place_halo_affinity_subset(
        build_halo_affinity_subset(raw_part, labeled,
                                   tiles_dtype=sub_dtype),
        mesh, axis)
    plan = place_halo_plan(plan_host, mesh, axis)
    raw_plan = place_halo_plan(raw_plan_host, mesh, axis)
    part = place_partition(part, mesh, axis)
    raw_part = place_partition(raw_part, mesh, axis)

    x = pad_nodes(jnp.asarray(dataset.features, jnp.float32), part)
    x_pad = jax.device_put(x, NamedSharding(mesh, P(axis)))
    repl = NamedSharding(mesh, P())
    seed_idx = jax.device_put(
        jnp.asarray(dataset.abnormal_label_idx, jnp.int32), repl)
    normal_idx = jax.device_put(
        jnp.asarray(dataset.normal_label_idx, jnp.int32), repl)
    # hoist the first-layer aggregation (features are constant): one
    # halo SpMM now instead of one per step
    if spmm_impl == "pallas":
        ax = spmm_halo_bcsr(part, plan, tiles, x_pad, mesh, axis)
    elif spmm_impl == "ell":
        ax = spmm_halo_ell(part, plan, ells, x_pad, mesh, axis)
    else:
        ax = spmm_halo(part, plan, x_pad, mesh, axis)
    return HaloSetup(part, plan, raw_part, raw_plan, x_pad, seed_idx,
                     normal_idx, tiles, raw_tiles, ax, seed_rows,
                     aff_sub, ells)


def halo_training_run(mesh: Mesh, dataset, *, n_h: int = 64,
                      lr: float = 1e-3, noise_mean: float = 0.02,
                      noise_std: float = 0.01, seed: int = 0,
                      n_steps: int = 1, steps_per_dispatch: int = 1,
                      spmm_impl: str = "xla",
                      spmm_dtype: str = "float32",
                      schedule: str = "dense"):
    """Build + run the halo-distributed GGAD training loop; returns the
    final losses pytree. Used by the multichip dry-run and the scaling
    harness."""
    from ggad_tpu.models.ggad import GGAD, init_ggad_params
    from ggad_tpu.parallel.full_batch import replicate

    setup = prepare_halo(dataset, mesh, spmm_impl=spmm_impl,
                         spmm_dtype=spmm_dtype, schedule=schedule)
    # identical param tree (and values) to the single-device flax model:
    # init depends only on rngs + feat_dim, so it runs on a dummy graph
    model = GGAD(n_h=n_h, noise_mean=noise_mean, noise_std=noise_std)
    rng = jax.random.PRNGKey(seed)
    rng, init_rng, noise_rng = jax.random.split(rng, 3)
    params = init_ggad_params(
        model, dataset.features.shape[1],
        {"params": init_rng, "noise": noise_rng})
    params = replicate(params, mesh)
    tx = optax.adam(lr)
    opt_state = replicate(tx.init(params), mesh)

    step = make_halo_train_step(
        tx, mesh, noise_mean=noise_mean, noise_std=noise_std, n_h=n_h,
        n_steps=steps_per_dispatch)
    losses = None
    for _ in range(n_steps):
        rng, step_rng = jax.random.split(rng)
        params, opt_state, losses = step(
            params, opt_state, step_rng, setup.part, setup.plan,
            setup.raw_part, setup.raw_plan, setup.x_pad, setup.seed_idx,
            setup.normal_idx, setup.tiles, setup.raw_tiles, setup.ax,
            setup.seed_rows, setup.aff_sub, setup.ells)
    jax.block_until_ready(losses.total)
    return params, losses
