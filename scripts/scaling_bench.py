"""Scaling harness: halo-distributed GGAD step vs device count.

Measures, per device count D:
  * the halo plan's comm volume (exact, host-side): boundary width B,
    bytes/step on the wire per device for the 3 SpMMs + affinity of one
    fwd+bwd GGAD step, vs the all-gather schedule's bytes;
  * (``--time``) the wall-clock of the jitted halo training step on the
    available mesh — absolute on a real TPU (D=1 here), shape-only on
    the virtual CPU mesh (virtual devices share 2 host cores, so CPU
    wall-clock is NOT a scaling signal — the comm table is);
  * a projected step time on a D-chip slice from the measured 1-chip
    compute rate + comm_bytes/ICI bandwidth (``--ici_gbps``).

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scaling_bench.py --devices 1,2,4,8 --time
  python scripts/scaling_bench.py --devices 1 --time          # real TPU
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_graph(args):
    from ggad_tpu.datasets.synthetic import synthetic_gad
    return synthetic_gad(
        name="scaling", n_nodes=args.n_nodes, avg_degree=args.avg_degree,
        feat_dim=args.feat_dim, n_communities=args.n_communities,
        intra_frac=args.intra_frac, anomaly_rate=0.09, seed=0,
        seed_frac=0.15)


def _psum_bytes(n_elems, d):
    """Per-device wire bytes of a ring all-reduce of n_elems f32."""
    return 2 * n_elems * 4 * (d - 1) / max(d, 1)


def comm_row(ds, d, n_h, schedule="dense"):
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.ops.normalize import normalize_adj_reference
    from ggad_tpu.parallel.spmm_shard import (
        build_halo_plan,
        halo_comm_stats,
        partition_edges,
    )

    adj, raw = normalize_adj_reference(from_scipy(ds.adj))
    part = partition_edges(adj, d)
    raw_part = partition_edges(raw, d)
    plan = build_halo_plan(part, schedule=schedule)
    raw_plan = build_halo_plan(raw_part, schedule=schedule)
    s = halo_comm_stats(plan, n_h)
    sr = halo_comm_stats(raw_plan, n_h)

    # production GGAD step (round 3): gcn1 is hoisted (no per-step
    # exchange), the generator is a [S, n_h] psum each way (seed-row
    # subgraph) and the affinity two small psums ([U, n_h] targets +
    # [U] partials, each way) — only gcn2's SpMM still rides the
    # boundary halo (fwd + transposed bwd).
    n_seed = len(ds.abnormal_label_idx)
    n_uniq = len(np.unique(np.concatenate([
        np.asarray(ds.normal_label_idx),
        np.asarray(ds.abnormal_label_idx)])))
    small = (2 * _psum_bytes(n_seed * n_h, d)            # generator
             + 2 * _psum_bytes(n_uniq * (n_h + 1), d))   # affinity
    step_bytes = 2 * s["spmm_halo_bytes"] + small
    # the pre-round-3 step for comparison: 6 SpMM exchanges + 2
    # full-affinity exchanges
    legacy_bytes = 6 * s["spmm_halo_bytes"] + 2 * sr["affinity_halo_bytes"]
    allgather_bytes = 8 * s["allgather_bytes"]
    row = {
        "devices": d,
        "schedule": schedule,
        "boundary_rows": s["boundary_rows"],
        "boundary_frac_of_N": round(s["boundary_rows"] / ds.n_nodes, 4),
        "halo_step_MB_per_device": round(step_bytes / 2**20, 2),
        "legacy_step_MB_per_device": round(legacy_bytes / 2**20, 2),
        "allgather_step_MB_per_device": round(allgather_bytes / 2**20, 2),
        "comm_reduction_x": round(allgather_bytes / max(step_bytes, 1), 1),
    }
    if schedule != "ring" and d > 1:
        # the per-distance-padded alternative, for the same partition
        rs = halo_comm_stats(build_halo_plan(part, schedule="ring"), n_h)
        ring_bytes = 2 * rs["spmm_halo_bytes"] + small
        row["ring_step_MB_per_device"] = round(ring_bytes / 2**20, 2)
        row["ring_vs_dense_x"] = round(step_bytes / max(ring_bytes, 1), 2)
    return row


def traced_collective_bytes(ds, d, n_h, schedule="dense",
                            spmm_impl="xla"):
    """MEASURED comm volume: trace the actual jitted halo train step and
    sum the operand bytes of every collective primitive in its jaxpr
    (recursing through pjit/scan/shard_map sub-jaxprs, scaling by scan
    trip counts). This is what the program as written ships — the
    cross-check for ``comm_row``'s host-side plan accounting. Per-device
    bytes: ppermute ships its operand once; all_to_all (D-1)/D of it;
    psum ≈ 2·(D-1)/D (ring all-reduce)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ggad_tpu.models.ggad import GGAD, init_ggad_params
    from ggad_tpu.parallel.full_batch import replicate
    from ggad_tpu.parallel.halo_trainer import (
        make_halo_train_step,
        prepare_halo,
    )
    from ggad_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(d, axis_names=("nodes",))
    setup = prepare_halo(ds, mesh, spmm_impl=spmm_impl,
                         schedule=schedule)
    model = GGAD(n_h=n_h, noise_mean=0.02, noise_std=0.01)
    rng = jax.random.PRNGKey(0)
    params = replicate(init_ggad_params(
        model, ds.features.shape[1], {"params": rng, "noise": rng}),
        mesh)
    tx = optax.adam(1e-3)
    opt_state = replicate(tx.init(params), mesh)
    step = make_halo_train_step(tx, mesh, noise_mean=0.02,
                                noise_std=0.01, n_h=n_h, n_steps=1)
    jaxpr = jax.make_jaxpr(
        lambda p, o, r: step(p, o, r, setup.part, setup.plan,
                             setup.raw_part, setup.raw_plan, setup.x_pad,
                             setup.seed_idx, setup.normal_idx,
                             setup.tiles, setup.raw_tiles, setup.ax,
                             setup.seed_rows, setup.aff_sub, setup.ells)
    )(params, opt_state, rng)

    COLLECTIVES = {"ppermute", "all_to_all", "psum", "psum_invariant",
                   "all_gather", "reduce_scatter"}
    totals: dict = {}

    def sub_jaxprs(params_dict):
        for v in params_dict.values():
            for x in (v if isinstance(v, (list, tuple)) else (v,)):
                if hasattr(x, "jaxpr"):        # ClosedJaxpr
                    yield x.jaxpr
                elif hasattr(x, "eqns"):       # Jaxpr
                    yield x

    def visit(jx, mult):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in COLLECTIVES:
                b = sum(int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                        for v in eqn.invars
                        if hasattr(v.aval, "shape"))
                if name == "all_to_all":
                    wire = b * (d - 1) / d
                elif name in ("psum", "psum_invariant", "all_gather",
                              "reduce_scatter"):
                    wire = 2 * b * (d - 1) / d
                else:
                    wire = b
                totals[name] = totals.get(name, 0.0) + wire * mult
                continue
            m = mult * (eqn.params.get("length", 1)
                        if name == "scan" else 1)
            for sub in sub_jaxprs(eqn.params):
                visit(sub, m)

    visit(jaxpr.jaxpr, 1.0)
    return totals


def time_step(ds, d, n_h, iters=10, spmm_impl="xla",
              spmm_dtype="float32", schedule="dense"):
    """Median paired-difference step time of the jitted, scan-fused halo
    training step: (T(2K-step scan) − T(K-step scan)) / K cancels the
    per-dispatch tunnel/host overhead (same estimator as bench.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ggad_tpu.models.ggad import GGAD, init_ggad_params
    from ggad_tpu.parallel.full_batch import replicate
    from ggad_tpu.parallel.halo_trainer import (
        make_halo_train_step,
        prepare_halo,
    )
    from ggad_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(d, axis_names=("nodes",))
    setup = prepare_halo(ds, mesh, spmm_impl=spmm_impl,
                         spmm_dtype=spmm_dtype, schedule=schedule)
    model = GGAD(n_h=n_h, noise_mean=0.02, noise_std=0.01)
    rng = jax.random.PRNGKey(0)
    params = replicate(init_ggad_params(
        model, ds.features.shape[1], {"params": rng, "noise": rng}),
        mesh)
    tx = optax.adam(1e-3)
    opt_state = replicate(tx.init(params), mesh)
    steps = {k: make_halo_train_step(tx, mesh, noise_mean=0.02,
                                     noise_std=0.01, n_h=n_h, n_steps=k)
             for k in (iters, 2 * iters)}

    def dispatch(params, opt_state, rng, k):
        rng, key = jax.random.split(rng)
        t0 = time.perf_counter()
        params, opt_state, losses = steps[k](
            params, opt_state, key, setup.part, setup.plan,
            setup.raw_part, setup.raw_plan, setup.x_pad, setup.seed_idx,
            setup.normal_idx, setup.tiles, setup.raw_tiles, setup.ax,
            setup.seed_rows, setup.aff_sub, setup.ells)
        jax.block_until_ready(losses.total)
        return params, opt_state, rng, time.perf_counter() - t0

    for k in (iters, 2 * iters):   # compile both
        params, opt_state, rng, _ = dispatch(params, opt_state, rng, k)
    est = []
    for _ in range(3):
        params, opt_state, rng, t1 = dispatch(params, opt_state, rng,
                                              iters)
        params, opt_state, rng, t2 = dispatch(params, opt_state, rng,
                                              2 * iters)
        est.append(max((t2 - t1) / iters, 1e-9))
    return statistics.median(est)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    ap.add_argument("--n_nodes", type=int, default=7535)
    ap.add_argument("--avg_degree", type=int, default=31)
    ap.add_argument("--feat_dim", type=int, default=745)
    ap.add_argument("--n_communities", type=int, default=8)
    ap.add_argument("--intra_frac", type=float, default=0.9,
                    help="intra-community edge fraction of the synthetic "
                         "graph (locality knob)")
    ap.add_argument("--n_h", type=int, default=300)
    ap.add_argument("--time", action="store_true",
                    help="also wall-clock the jitted step per D")
    ap.add_argument("--reorder", action="store_true",
                    help="RCM-reorder nodes first (aligns row-blocks "
                         "with graph locality; shrinks the boundary)")
    ap.add_argument("--partition", action="store_true",
                    help="LP-partition nodes into max(devices) contiguous "
                         "blocks first (the halo path's partitioner)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ici_gbps", type=float, default=100.0,
                    help="assumed per-chip ICI bandwidth for projection")
    ap.add_argument("--compute_ms_1chip", type=float, default=None,
                    help="measured 1-chip step ms for the projection "
                         "(defaults to the timed D=1 run)")
    ap.add_argument("--spmm_impl", type=str, default="xla",
                    choices=["xla", "pallas"],
                    help="local SpMM inside the halo step")
    ap.add_argument("--spmm_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--schedule", type=str, default="dense",
                    choices=["dense", "ring", "sched"],
                    help="halo wire schedule (ring: per-distance-padded "
                         "ppermute rounds; sched: matched rounds)")
    ap.add_argument("--trace_bytes", action="store_true",
                    help="also trace the jitted step's jaxpr and report "
                         "the MEASURED collective wire bytes per device "
                         "(cross-check of the host-side plan numbers)")
    args = ap.parse_args()

    import jax

    ds = build_graph(args)
    if args.reorder:
        from ggad_tpu.datasets.reorder import reorder_rcm
        ds = reorder_rcm(ds)
    devices = [int(x) for x in args.devices.split(",")]
    if args.partition:
        from ggad_tpu.datasets.partition import reorder_lp
        ds = reorder_lp(ds, max(devices))
    rows = []
    t1 = args.compute_ms_1chip
    for d in devices:
        row = comm_row(ds, d, args.n_h, args.schedule)
        if args.trace_bytes and 1 < d <= len(jax.devices()):
            traced = traced_collective_bytes(ds, d, args.n_h,
                                             args.schedule,
                                             args.spmm_impl)
            row["traced_wire_MB_per_device"] = round(
                sum(traced.values()) / 2**20, 2)
            row["traced_by_primitive_MB"] = {
                k: round(v / 2**20, 2) for k, v in traced.items()}
        if args.time and d <= len(jax.devices()):
            row["step_ms_measured"] = round(
                time_step(ds, d, args.n_h, args.iters,
                          args.spmm_impl, args.spmm_dtype,
                          args.schedule) * 1e3, 2)
            if d == 1 and t1 is None:
                t1 = row["step_ms_measured"]
        if t1 is not None and d > 1:
            comm_ms = (row["halo_step_MB_per_device"] / 2**10
                       / args.ici_gbps) * 1e3
            row["step_ms_projected"] = round(t1 / d + comm_ms, 2)
            row["scaling_eff_projected"] = round(
                t1 / d / (t1 / d + comm_ms), 3)
        rows.append(row)
        print(json.dumps(row))

    print(json.dumps({
        "graph": f"{ds.n_nodes}N/{ds.n_edges}E/{args.feat_dim}F",
        "n_h": args.n_h,
        "backend": jax.default_backend(),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
