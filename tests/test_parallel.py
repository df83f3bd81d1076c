"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ggad_tpu.datasets.synthetic import synthetic_gad
from ggad_tpu.graph import from_scipy
from ggad_tpu.ops.sddmm import node_affinity
from ggad_tpu.ops.spmm import spmm
from ggad_tpu.parallel.mesh import make_mesh
from ggad_tpu.parallel.spmm_shard import (
    affinity_sharded,
    build_halo_plan,
    halo_comm_stats,
    affinity_halo,
    pad_nodes,
    partition_edges,
    place_halo_plan,
    place_partition,
    spmm_halo,
    spmm_sharded,
)


def random_graph(n=100, density=0.08, seed=0):
    mat = sp.random(n, n, density=density,
                    random_state=np.random.RandomState(seed), format="csr",
                    dtype=np.float32)
    mat = ((mat + mat.T) > 0).astype(np.float32)
    return sp.csr_matrix(mat)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8, axis_names=("nodes",))


def test_partition_covers_all_edges(mesh):
    mat = random_graph(100)
    g = from_scipy(mat)
    part = partition_edges(g, 8)
    assert float(np.asarray(part.val).sum()) == pytest.approx(
        float(mat.sum()))


@pytest.mark.parametrize("n", [96, 100, 257])
def test_spmm_sharded_matches_single_device(mesh, n, rng):
    mat = random_graph(n)
    g = from_scipy(mat)
    part = place_partition(partition_edges(g, 8), mesh)
    x = rng.normal(size=(n, 24)).astype(np.float32)
    xp = pad_nodes(jnp.asarray(x), part)

    out = np.asarray(spmm_sharded(part, xp, mesh))[:n]
    expect = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_spmm_sharded_grad(mesh, rng):
    mat = random_graph(64)
    g = from_scipy(mat)
    part = place_partition(partition_edges(g, 8), mesh)
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))

    def f_sharded(x):
        return jnp.sum(spmm_sharded(part, pad_nodes(x, part), mesh) ** 2)

    def f_single(x):
        return jnp.sum(spmm(g, x) ** 2)

    g_sh = np.asarray(jax.grad(f_sharded)(x))
    g_si = np.asarray(jax.grad(f_single)(x))
    np.testing.assert_allclose(g_sh, g_si, rtol=1e-4, atol=1e-4)


def test_affinity_sharded_matches_single_device(mesh, rng):
    from ggad_tpu.graph import add_self_loops

    mat = random_graph(120)
    raw = add_self_loops(from_scipy(mat))
    part = place_partition(partition_edges(raw, 8), mesh)
    emb = rng.normal(size=(120, 16)).astype(np.float32)

    got = np.asarray(affinity_sharded(
        part, pad_nodes(jnp.asarray(emb), part), mesh))[:120]
    expect = np.asarray(node_affinity(raw, jnp.asarray(emb)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def community_graph(n=256, n_comm=8, p_in=0.12, p_out=0.004, seed=0):
    """Blocky graph whose cross-shard boundary is much smaller than N."""
    rng = np.random.RandomState(seed)
    comm = np.arange(n) % n_comm
    # order nodes by community so row-blocks align with communities
    order = np.argsort(comm, kind="stable")
    comm = comm[order]
    a = rng.rand(n, n)
    p = np.where(comm[:, None] == comm[None, :], p_in, p_out)
    mat = (a < p).astype(np.float32)
    mat = np.maximum(mat, mat.T)
    np.fill_diagonal(mat, 0)
    return sp.csr_matrix(mat)


@pytest.mark.parametrize("schedule", ["dense", "ring"])
@pytest.mark.parametrize("n", [96, 100, 257])
def test_spmm_halo_matches_single_device(mesh, n, schedule, rng):
    mat = random_graph(n)
    g = from_scipy(mat)
    part = place_partition(partition_edges(g, 8), mesh)
    plan = place_halo_plan(build_halo_plan(part, schedule=schedule), mesh)
    x = rng.normal(size=(n, 24)).astype(np.float32)
    xp = pad_nodes(jnp.asarray(x), part)

    out = np.asarray(spmm_halo(part, plan, xp, mesh))[:n]
    expect = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("schedule", ["dense", "ring"])
def test_spmm_halo_grad(mesh, schedule, rng):
    mat = random_graph(64)
    g = from_scipy(mat)
    part = place_partition(partition_edges(g, 8), mesh)
    plan = place_halo_plan(build_halo_plan(part, schedule=schedule), mesh)
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))

    def f_halo(x):
        return jnp.sum(spmm_halo(part, plan, pad_nodes(x, part), mesh) ** 2)

    def f_single(x):
        return jnp.sum(spmm(g, x) ** 2)

    g_h = np.asarray(jax.grad(f_halo)(x))
    g_s = np.asarray(jax.grad(f_single)(x))
    np.testing.assert_allclose(g_h, g_s, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("schedule", ["dense", "ring"])
def test_affinity_halo_matches_single_device(mesh, schedule, rng):
    from ggad_tpu.graph import add_self_loops

    mat = random_graph(120)
    raw = add_self_loops(from_scipy(mat))
    part = place_partition(partition_edges(raw, 8), mesh)
    plan = place_halo_plan(build_halo_plan(part, schedule=schedule), mesh)
    emb = rng.normal(size=(120, 16)).astype(np.float32)

    got = np.asarray(affinity_halo(
        part, plan, pad_nodes(jnp.asarray(emb), part), mesh))[:120]
    expect = np.asarray(node_affinity(raw, jnp.asarray(emb)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("schedule", ["dense", "ring"])
def test_affinity_halo_grad(mesh, schedule, rng):
    """The affinity gradient crosses BOTH halo exchanges (forward rows +
    reverse partials) — must match the single-device SDDMM gradient."""
    from ggad_tpu.graph import add_self_loops

    mat = random_graph(72, seed=3)
    raw = add_self_loops(from_scipy(mat))
    part = place_partition(partition_edges(raw, 8), mesh)
    plan = place_halo_plan(build_halo_plan(part, schedule=schedule), mesh)
    emb = jnp.asarray(rng.normal(size=(72, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(72,)).astype(np.float32))

    def f_halo(e):
        aff = affinity_halo(part, plan, pad_nodes(e, part), mesh)[:72]
        return jnp.sum(aff * w)

    def f_single(e):
        return jnp.sum(node_affinity(raw, e) * w)

    g_h = np.asarray(jax.grad(f_halo)(emb))
    g_s = np.asarray(jax.grad(f_single)(emb))
    np.testing.assert_allclose(g_h, g_s, rtol=1e-4, atol=1e-4)


def test_halo_comm_volume(mesh):
    """Bytes on the wire must scale with the true boundary, not N."""
    mat = community_graph(n=256, n_comm=8)
    g = from_scipy(mat)
    part = partition_edges(g, 8)
    plan = build_halo_plan(part)

    # the plan's halo width equals the true max boundary-set size
    row = np.asarray(g.row)[: g.n_edges]
    col = np.asarray(g.col)[: g.n_edges]
    R = part.rows_per_shard
    true_b = max(
        len(np.unique(col[(row // R == d) & (col // R == s)]))
        for d in range(8) for s in range(8) if d != s)
    assert plan.boundary == max(true_b, 1)

    stats = halo_comm_stats(plan, feat_dim=300)
    # per-device halo traffic ≈ boundary·d — far below the full gather
    assert stats["spmm_halo_bytes"] < stats["allgather_bytes"] / 4
    assert stats["boundary_rows"] * 8 < g.n_nodes

    # ring schedule pads per DISTANCE, not to the global max: it never
    # ships more rows than dense, and is exact too
    ring = build_halo_plan(part, schedule="ring")
    ring_stats = halo_comm_stats(ring, feat_dim=300)
    assert ring_stats["wire_rows"] <= stats["wire_rows"]
    xr = np.random.RandomState(2).normal(size=(256, 12)).astype(np.float32)
    ring_d = place_halo_plan(ring, mesh)
    partd2 = place_partition(part, mesh)
    out_r = np.asarray(
        spmm_halo(partd2, ring_d, pad_nodes(jnp.asarray(xr), partd2),
                  mesh))[:256]
    np.testing.assert_allclose(
        out_r, np.asarray(spmm(g, jnp.asarray(xr))), rtol=1e-4, atol=1e-5)

    # and the exchange is still exact on this clustered graph
    x = np.random.RandomState(1).normal(size=(256, 12)).astype(np.float32)
    partd = place_partition(part, mesh)
    pland = place_halo_plan(plan, mesh)
    out = np.asarray(
        spmm_halo(partd, pland, pad_nodes(jnp.asarray(x), partd),
                  mesh))[:256]
    np.testing.assert_allclose(out, np.asarray(spmm(g, jnp.asarray(x))),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("schedule", ["dense", "ring"])
def test_spmm_halo_bcsr_matches_single_device(mesh, schedule, rng):
    """Sharded Pallas path: boundary exchange + per-shard BCSR tiles."""
    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.parallel.spmm_shard import (
        build_halo_bcsr,
        place_halo_bcsr,
        spmm_halo_bcsr,
    )

    g = add_self_loops(from_scipy(random_graph(200, seed=5)))
    part = partition_edges(g, 8)
    plan = build_halo_plan(part, schedule=schedule)
    tiles = place_halo_bcsr(build_halo_bcsr(part, plan), mesh)
    part = place_partition(part, mesh)
    plan = place_halo_plan(plan, mesh)
    x = rng.normal(size=(200, 24)).astype(np.float32)
    xp = pad_nodes(jnp.asarray(x), part)

    out = np.asarray(spmm_halo_bcsr(part, plan, tiles, xp, mesh))[:200]
    expect = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("schedule", ["dense", "ring"])
def test_affinity_halo_bcsr_matches_single_device(mesh, schedule, rng):
    """The tile-kernel (Pallas-path) affinity matches the XLA oracle on
    BOTH wire schedules — ``--spmm_impl pallas --dist_schedule ring``
    reaches this in production."""
    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.parallel.spmm_shard import (
        affinity_halo_bcsr,
        build_halo_bcsr,
        place_halo_bcsr,
    )

    raw = add_self_loops(from_scipy(community_graph(200)))
    part = partition_edges(raw, 8)
    plan = build_halo_plan(part, schedule=schedule)
    tiles = place_halo_bcsr(build_halo_bcsr(part, plan), mesh)
    part = place_partition(part, mesh)
    plan = place_halo_plan(plan, mesh)
    emb = rng.normal(size=(200, 16)).astype(np.float32)

    got = np.asarray(affinity_halo_bcsr(
        part, plan, tiles, pad_nodes(jnp.asarray(emb), part), mesh))[:200]
    expect = np.asarray(node_affinity(raw, jnp.asarray(emb)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("schedule", ["dense", "ring"])
def test_spmm_halo_bcsr_grad(mesh, schedule, rng):
    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.parallel.spmm_shard import (
        build_halo_bcsr,
        place_halo_bcsr,
        spmm_halo_bcsr,
    )

    g = add_self_loops(from_scipy(random_graph(96, seed=6)))
    part = partition_edges(g, 8)
    plan = build_halo_plan(part, schedule=schedule)
    tiles = place_halo_bcsr(build_halo_bcsr(part, plan), mesh)
    part = place_partition(part, mesh)
    plan = place_halo_plan(plan, mesh)
    x = jnp.asarray(rng.normal(size=(96, 8)).astype(np.float32))

    def f_bcsr(x):
        return jnp.sum(
            spmm_halo_bcsr(part, plan, tiles, pad_nodes(x, part),
                           mesh) ** 2)

    def f_single(x):
        return jnp.sum(spmm(g, x) ** 2)

    g_b = np.asarray(jax.grad(f_bcsr)(x))
    g_s = np.asarray(jax.grad(f_single)(x))
    np.testing.assert_allclose(g_b, g_s, rtol=1e-4, atol=1e-4)


def test_affinity_halo_subset_matches_full(mesh, rng):
    """The distributed column-subset affinity equals the full halo
    affinity at the requested nodes (incl. repeats: seeds ⊂ normals)."""
    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.parallel.spmm_shard import (
        affinity_halo_subset,
        build_halo_affinity_subset,
        place_halo_affinity_subset,
    )

    raw = add_self_loops(from_scipy(community_graph(200)))
    part = partition_edges(raw, 8)
    plan = build_halo_plan(part)
    idx = np.concatenate([rng.choice(200, 40, replace=False),
                          rng.choice(200, 12, replace=False)])
    sub = place_halo_affinity_subset(
        build_halo_affinity_subset(part, idx), mesh)
    part = place_partition(part, mesh)
    plan = place_halo_plan(plan, mesh)
    emb = rng.normal(size=(200, 16)).astype(np.float32)
    embp = pad_nodes(jnp.asarray(emb), part)

    got = np.asarray(affinity_halo_subset(plan, sub, embp, mesh))
    full = np.asarray(affinity_halo(part, plan, embp, mesh))
    np.testing.assert_allclose(got, full[idx], rtol=1e-4, atol=1e-6)
    expect = np.asarray(node_affinity(raw, jnp.asarray(emb)))[idx]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_affinity_halo_subset_grad(mesh, rng):
    """Gradient crosses both psums (target assembly + numerator)."""
    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.ops.sddmm import node_affinity as aff_single
    from ggad_tpu.parallel.spmm_shard import (
        affinity_halo_subset,
        build_halo_affinity_subset,
        place_halo_affinity_subset,
    )

    raw = add_self_loops(from_scipy(random_graph(96, seed=7)))
    part = partition_edges(raw, 8)
    plan = build_halo_plan(part)
    idx = np.asarray(rng.choice(96, 24, replace=False))
    sub = place_halo_affinity_subset(
        build_halo_affinity_subset(part, idx), mesh)
    part = place_partition(part, mesh)
    plan = place_halo_plan(plan, mesh)
    emb = jnp.asarray(rng.normal(size=(96, 8)).astype(np.float32))

    def f_halo(e):
        aff = affinity_halo_subset(plan, sub, pad_nodes(e, part), mesh)
        return jnp.sum(jnp.sin(aff))

    def f_single(e):
        return jnp.sum(jnp.sin(aff_single(raw, e)[jnp.asarray(idx)]))

    g_h = np.asarray(jax.grad(f_halo)(emb))
    g_s = np.asarray(jax.grad(f_single)(emb))
    np.testing.assert_allclose(g_h, g_s, rtol=1e-4, atol=1e-5)


def test_spmm_halo_seed_rows_matches_slice(mesh, rng):
    """(Â @ h)[seed] via per-shard column partials + one psum equals
    slicing the full halo SpMM; gradient matches too."""
    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.parallel.spmm_shard import (
        build_halo_seed_rows,
        place_halo_seed_rows,
        spmm_halo_seed_rows,
    )

    g = add_self_loops(from_scipy(random_graph(200, seed=8)))
    part = partition_edges(g, 8)
    seeds = np.asarray(rng.choice(200, 18, replace=False))
    sub = place_halo_seed_rows(build_halo_seed_rows(part, seeds), mesh)
    part = place_partition(part, mesh)
    x = rng.normal(size=(200, 16)).astype(np.float32)
    xp = pad_nodes(jnp.asarray(x), part)

    got = np.asarray(spmm_halo_seed_rows(sub, xp, mesh))
    expect = np.asarray(spmm(g, jnp.asarray(x)))[seeds]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    def f_sub(h):
        return jnp.sum(
            spmm_halo_seed_rows(sub, pad_nodes(h, part), mesh) ** 2)

    def f_single(h):
        return jnp.sum(spmm(g, h)[jnp.asarray(seeds)] ** 2)

    g_h = np.asarray(jax.grad(f_sub)(jnp.asarray(x)))
    g_s = np.asarray(jax.grad(f_single)(jnp.asarray(x)))
    np.testing.assert_allclose(g_h, g_s, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_halo_ggad_losses_match_flax(mesh):
    """The halo-distributed GGAD forward+losses must equal the
    single-device flax model + ggad_losses, same params, term by term
    (noise_std=0 so the perturbation is the deterministic mean)."""
    from ggad_tpu.models.ggad import GGAD
    from ggad_tpu.ops.normalize import normalize_adj_reference
    from ggad_tpu.parallel.halo_trainer import (
        halo_ggad_forward_and_losses,
        prepare_halo,
    )
    from ggad_tpu.train.losses import ggad_losses

    ds = synthetic_gad(n_nodes=200, avg_degree=8, feat_dim=16, seed=1)
    adj, raw = normalize_adj_reference(from_scipy(ds.adj))
    x = jnp.asarray(ds.features, jnp.float32)
    si = jnp.asarray(ds.abnormal_label_idx, jnp.int32)
    ni = jnp.asarray(ds.normal_label_idx, jnp.int32)

    model = GGAD(n_h=24, noise_mean=0.02, noise_std=0.0)
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "noise": k}, adj, x, si, ni,
                        train=True)
    out = model.apply(params, adj, x, si, ni, train=True,
                      rngs={"noise": jax.random.PRNGKey(2)})
    ref = ggad_losses(out, raw, si, ni)

    setup = prepare_halo(ds, mesh)
    noise = jnp.full((si.shape[0], 24), 0.02, jnp.float32)
    got = halo_ggad_forward_and_losses(
        params, setup.part, setup.plan, setup.x_pad, setup.seed_idx,
        setup.normal_idx, noise, setup.raw_part, setup.raw_plan, mesh)

    for field in ("total", "bce", "margin", "rec", "affinity_normal",
                  "affinity_outlier"):
        np.testing.assert_allclose(
            float(getattr(got, field)), float(getattr(ref, field)),
            rtol=1e-4, atol=1e-5, err_msg=field)

    # the production fast path (seed-row generator + subset affinity +
    # hoisted layer 1) must give the same losses term by term
    fast = halo_ggad_forward_and_losses(
        params, setup.part, setup.plan, setup.x_pad, setup.seed_idx,
        setup.normal_idx, noise, setup.raw_part, setup.raw_plan, mesh,
        ax=setup.ax, seed_rows=setup.seed_rows, aff_sub=setup.aff_sub)
    for field in ("total", "bce", "margin", "rec", "affinity_normal",
                  "affinity_outlier"):
        np.testing.assert_allclose(
            float(getattr(fast, field)), float(getattr(ref, field)),
            rtol=1e-4, atol=1e-5, err_msg=f"fast path: {field}")


@pytest.mark.slow
def test_halo_ggad_losses_match_flax_pallas_tiles(mesh):
    """Same equality with the per-shard BCSR (Pallas) local SpMMs."""
    from ggad_tpu.models.ggad import GGAD
    from ggad_tpu.ops.normalize import normalize_adj_reference
    from ggad_tpu.parallel.halo_trainer import (
        halo_ggad_forward_and_losses,
        prepare_halo,
    )
    from ggad_tpu.train.losses import ggad_losses

    ds = synthetic_gad(n_nodes=200, avg_degree=8, feat_dim=16, seed=1)
    adj, raw = normalize_adj_reference(from_scipy(ds.adj))
    x = jnp.asarray(ds.features, jnp.float32)
    si = jnp.asarray(ds.abnormal_label_idx, jnp.int32)
    ni = jnp.asarray(ds.normal_label_idx, jnp.int32)

    model = GGAD(n_h=24, noise_mean=0.02, noise_std=0.0)
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "noise": k}, adj, x, si, ni,
                        train=True)
    out = model.apply(params, adj, x, si, ni, train=True,
                      rngs={"noise": jax.random.PRNGKey(2)})
    ref = ggad_losses(out, raw, si, ni)

    setup = prepare_halo(ds, mesh, spmm_impl="pallas")
    assert setup.tiles is not None and setup.raw_tiles is not None
    noise = jnp.full((si.shape[0], 24), 0.02, jnp.float32)
    got = halo_ggad_forward_and_losses(
        params, setup.part, setup.plan, setup.x_pad, setup.seed_idx,
        setup.normal_idx, noise, setup.raw_part, setup.raw_plan, mesh,
        tiles=setup.tiles, raw_tiles=setup.raw_tiles)
    for field in ("total", "bce", "margin", "rec"):
        np.testing.assert_allclose(
            float(getattr(got, field)), float(getattr(ref, field)),
            rtol=1e-4, atol=1e-5, err_msg=field)

    # and the gradients cross the tile SDDMM + both exchanges intact
    def loss_halo(p):
        return halo_ggad_forward_and_losses(
            p, setup.part, setup.plan, setup.x_pad, setup.seed_idx,
            setup.normal_idx, noise, setup.raw_part, setup.raw_plan,
            mesh, tiles=setup.tiles, raw_tiles=setup.raw_tiles).total

    def loss_flax(p):
        out = model.apply(p, adj, x, si, ni, train=True,
                          rngs={"noise": jax.random.PRNGKey(2)})
        return ggad_losses(out, raw, si, ni).total

    g_h = jax.grad(loss_halo)(params)
    g_f = jax.grad(loss_flax)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        g_h, g_f)


@pytest.mark.parametrize("schedule", ["dense", "ring"])
def test_halo_training_device_count_invariant(mesh, schedule):
    """Two jitted halo training steps give the same loss on 2 vs 8
    devices (replicated params, boundary exchange is exact)."""
    from ggad_tpu.parallel.halo_trainer import halo_training_run

    ds = synthetic_gad(n_nodes=256, avg_degree=8, feat_dim=16, seed=0)
    _, l8 = halo_training_run(make_mesh(8), ds, n_h=32, n_steps=2,
                              schedule=schedule)
    _, l2 = halo_training_run(make_mesh(2), ds, n_h=32, n_steps=2,
                              schedule=schedule)
    assert np.isfinite(float(l8.total))
    assert float(l8.total) == pytest.approx(float(l2.total), rel=1e-4)


def test_fullbatch_trainer_halo_mesh_matches_single_device(mesh):
    """FullBatchTrainer(mesh=8, dist_impl='halo') follows the
    single-device trajectory exactly when the noise is deterministic
    (std=0 → perturbation == mean on both paths)."""
    from ggad_tpu.train.full_batch import FullBatchTrainer

    ds = synthetic_gad(n_nodes=300, avg_degree=8, feat_dim=16, seed=4)
    kwargs = dict(num_epoch=6, embedding_dim=24, noise_mean=0.02,
                  noise_std=0.0, eval_every=3, log_every=2, seed=0)
    res_1 = FullBatchTrainer(ds, spmm_impl="xla", **kwargs).train()
    res_h = FullBatchTrainer(ds, mesh=8, dist_impl="halo",
                             spmm_impl="xla", **kwargs).train()
    l1 = [r["loss"] for r in res_1.history if "loss" in r]
    lh = [r["loss"] for r in res_h.history if "loss" in r]
    np.testing.assert_allclose(lh, l1, rtol=2e-4)
    assert res_h.final_auc == pytest.approx(res_1.final_auc, abs=1e-3)


def test_fullbatch_trainer_halo_mesh_pallas(mesh):
    """The mesh trainer with per-shard BCSR tiles trains and scores."""
    from ggad_tpu.train.full_batch import FullBatchTrainer

    ds = synthetic_gad(n_nodes=300, avg_degree=8, feat_dim=16, seed=4)
    tr = FullBatchTrainer(ds, mesh=8, dist_impl="halo",
                          spmm_impl="pallas", num_epoch=3,
                          embedding_dim=24, noise_mean=0.02,
                          noise_std=0.01, eval_every=2, seed=0)
    assert tr._halo is not None and tr._halo.tiles is not None
    res = tr.train()
    assert np.isfinite(res.final_auc)
    assert all(np.isfinite(r["loss"]) for r in res.history
               if "loss" in r)


def test_minibatch_trainer_dp_matches_single_device(mesh):
    """MiniBatchTrainer(mesh=8) must follow the single-device loss
    trajectory (GSPMD batch-axis DP is semantics-preserving)."""
    from ggad_tpu.datasets.splits import minibatch_split
    from ggad_tpu.train.minibatch import MiniBatchTrainer

    ds = synthetic_gad(n_nodes=800, avg_degree=8, feat_dim=12, seed=2)
    adj = ds.adj + sp.eye(ds.n_nodes, format="csr", dtype=np.float32)
    idx_train, idx_valid, idx_test, labels, idx_anom = minibatch_split(
        ds.ano_labels, seed=0, pseudo_anomaly_frac=0.1)
    kwargs = dict(
        adj=adj, features=ds.features, labels=labels,
        idx_train=idx_train, idx_anomaly=idx_anom, idx_valid=idx_valid,
        idx_test=idx_test, emb_dim=16, fanout1=4, fanout2=3,
        batch_size=24, n_anom_per_batch=8, num_batches=4, num_epochs=2,
        valid_epochs=1, eval_batch=32, seed=0)

    res_1 = MiniBatchTrainer(**kwargs).train()
    res_8 = MiniBatchTrainer(**kwargs, mesh=8).train()
    for r1, r8 in zip(res_1.history, res_8.history):
        assert r1["loss"] == pytest.approx(r8["loss"], rel=2e-4)
    assert res_1.test_metrics["auc"] == pytest.approx(
        res_8.test_metrics["auc"], abs=1e-3)


def test_gspmd_sharded_training_step(mesh):
    """The GSPMD full-batch GGAD step runs and is device-count invariant."""
    from ggad_tpu.parallel.full_batch import sharded_train_step

    ds = synthetic_gad(n_nodes=256, avg_degree=8, feat_dim=16, seed=0)
    loss8 = sharded_train_step(make_mesh(8), ds, n_h=32, n_steps=2)
    loss2 = sharded_train_step(make_mesh(2), ds, n_h=32, n_steps=2)
    assert np.isfinite(loss8)
    assert loss8 == pytest.approx(loss2, rel=1e-4)


def test_tensor_parallel_2d_mesh_matches_1d(mesh):
    """2-D ('nodes','model') TP mesh must give the same loss as the 1-D
    node mesh (GSPMD is semantics-preserving under resharding)."""
    from jax.sharding import Mesh

    from ggad_tpu.parallel.full_batch import (
        sharded_train_step,
        sharded_train_step_2d,
    )

    ds = synthetic_gad(n_nodes=256, avg_degree=8, feat_dim=16, seed=0)
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2d = Mesh(devs, axis_names=("nodes", "model"))
    loss_2d = sharded_train_step_2d(mesh2d, ds, n_h=32, n_steps=2)
    loss_1d = sharded_train_step(make_mesh(8), ds, n_h=32, n_steps=2)
    assert np.isfinite(loss_2d)
    assert loss_2d == pytest.approx(loss_1d, rel=1e-4)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dp_minibatch_step(mesh):
    import scipy.sparse as sp

    from ggad_tpu.parallel.minibatch_dp import run_dp_minibatch_demo

    ds = synthetic_gad(n_nodes=300, avg_degree=8, feat_dim=12, seed=1)
    adj = ds.adj + sp.eye(ds.n_nodes, format="csr", dtype=np.float32)
    rng = np.random.default_rng(0)
    batch = rng.integers(0, ds.n_nodes, 32 + 16)
    loss8 = run_dp_minibatch_demo(mesh, adj, ds.features, batch, n_anom=16)
    loss1 = run_dp_minibatch_demo(make_mesh(1), adj, ds.features, batch,
                                  n_anom=16)
    assert np.isfinite(loss8)
    assert loss8 == pytest.approx(loss1, rel=1e-4)


def test_fullbatch_trainer_with_mesh(mesh):
    from ggad_tpu.train.full_batch import FullBatchTrainer

    ds = synthetic_gad(n_nodes=200, avg_degree=8, feat_dim=12, seed=2)
    kw = dict(num_epoch=4, embedding_dim=16, noise_std=0.0,
              eval_every=4, log_every=4)
    r1 = FullBatchTrainer(ds, **kw).train()
    r8 = FullBatchTrainer(ds, mesh=8, **kw).train()
    assert np.isfinite(r8.final_auc)
    assert r8.final_auc == pytest.approx(r1.final_auc, abs=1e-5)


def test_entry_compiles_single_device():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))


def skewed_graph(n=512, d=8, wide=((1, 0), (4, 2), (3, 5)), w=60, bg=4,
                 seed=0):
    """Block graph whose wide boundaries sit on DISTINCT src/dst pairs at
    different ring distances — the case where matched rounds (sched)
    beat fixed distance pairing."""
    r = n // d
    rng = np.random.RandomState(seed)
    rows, cols = [], []
    for dst, src in wide:
        c = rng.choice(r, w, replace=False) + src * r
        rr = rng.randint(0, r, w) + dst * r
        rows.extend(rr); cols.extend(c)
    for dst in range(d):
        for src in range(d):
            if dst == src or (dst, src) in wide:
                continue
            c = rng.choice(r, bg, replace=False) + src * r
            rr = rng.randint(0, r, bg) + dst * r
            rows.extend(rr); cols.extend(c)
    # self-loops keep every row non-empty
    rows.extend(range(n)); cols.extend(range(n))
    mat = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                        shape=(n, n)).tocsr()
    mat.data[:] = 1.0
    return mat


def test_sched_schedule_beats_ring_on_skew(mesh):
    """Matched rounds pack the wide pairs into one round: wire volume
    approaches the per-device lower bound max_s sum_d |req[d][s]|."""
    from ggad_tpu.parallel.spmm_shard import halo_comm_stats

    g = from_scipy(skewed_graph())
    part = partition_edges(g, 8)
    ring = build_halo_plan(part, schedule="ring")
    sched = build_halo_plan(part, schedule="sched")
    assert sched.dist_perms, "matched rounds should engage on skew"
    ring_rows = halo_comm_stats(ring, 1)["wire_rows"]
    sched_rows = halo_comm_stats(sched, 1)["wire_rows"]
    assert sched_rows < ring_rows

    # per-device lower bound: the widest total any single source ships
    D, E, R = part.n_shards, part.e_shard, part.rows_per_shard
    col = np.asarray(part.col).reshape(D, E)
    val = np.asarray(part.val).reshape(D, E)
    out_total = np.zeros(D, np.int64)
    for d in range(D):
        live = val[d] != 0
        owner = col[d] // R
        for s in range(D):
            if s != d:
                out_total[s] += len(np.unique(col[d][live & (owner == s)]))
    lb = out_total.max()
    assert sched_rows <= 1.15 * lb, (sched_rows, lb, ring_rows)


@pytest.mark.parametrize("schedule", ["ring", "sched"])
def test_sched_schedule_exact(mesh, schedule, rng):
    """SpMM + affinity exactness and gradients on the matched-round plan
    (non-trivial dist_perms) vs the single-device oracle."""
    from ggad_tpu.graph import add_self_loops

    g = from_scipy(skewed_graph())
    part = partition_edges(g, 8)
    plan = build_halo_plan(part, schedule=schedule)
    part = place_partition(part, mesh)
    plan = place_halo_plan(plan, mesh)
    x = rng.normal(size=(512, 24)).astype(np.float32)
    xp = pad_nodes(jnp.asarray(x), part)
    out = np.asarray(spmm_halo(part, plan, xp, mesh))[:512]
    expect = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    got = np.asarray(affinity_halo(part, plan, xp, mesh))[:512]
    aff = np.asarray(node_affinity(g, jnp.asarray(x)))
    np.testing.assert_allclose(got, aff, rtol=1e-4, atol=1e-5)

    def f_halo(h):
        return jnp.sum(spmm_halo(part, plan, pad_nodes(h, part),
                                 mesh) ** 2)

    def f_single(h):
        return jnp.sum(spmm(g, h) ** 2)

    g_h = np.asarray(jax.grad(f_halo)(jnp.asarray(x)))
    g_s = np.asarray(jax.grad(f_single)(jnp.asarray(x)))
    np.testing.assert_allclose(g_h, g_s, rtol=1e-4, atol=1e-4)


def test_sched_training_matches_dense(mesh):
    """Full halo training losses agree across all three wire schedules."""
    from ggad_tpu.parallel.halo_trainer import halo_training_run

    ds = synthetic_gad(n_nodes=256, avg_degree=8, feat_dim=16, seed=0)
    _, l_d = halo_training_run(make_mesh(8), ds, n_h=32, n_steps=2)
    _, l_s = halo_training_run(make_mesh(8), ds, n_h=32, n_steps=2,
                               schedule="sched")
    assert float(l_s.total) == pytest.approx(float(l_d.total), rel=1e-4)


def test_spmm_halo_edge_chunked(mesh, rng):
    """edge_chunks>1 (bounded-memory scan aggregation) is exact and has
    the same gradient as the single-shot path."""
    mat = random_graph(100)
    g = from_scipy(mat)
    part = place_partition(
        partition_edges(g, 8, edge_chunks=4), mesh)
    assert part.edge_chunks == 4
    plan = place_halo_plan(build_halo_plan(part), mesh)
    x = rng.normal(size=(100, 24)).astype(np.float32)
    xp = pad_nodes(jnp.asarray(x), part)

    out = np.asarray(spmm_halo(part, plan, xp, mesh))[:100]
    expect = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    def f_halo(h):
        return jnp.sum(spmm_halo(part, plan, pad_nodes(h, part),
                                 mesh) ** 2)

    def f_single(h):
        return jnp.sum(spmm(g, h) ** 2)

    g_h = np.asarray(jax.grad(f_halo)(jnp.asarray(x)))
    g_s = np.asarray(jax.grad(f_single)(jnp.asarray(x)))
    np.testing.assert_allclose(g_h, g_s, rtol=1e-4, atol=1e-4)


def test_spmm_halo_bcsr_tall_tiles(mesh, rng):
    """Tall rect tile sets (tile_rows=256) on the halo path: SpMM and
    affinity exactness + SpMM gradient."""
    from ggad_tpu.graph import add_self_loops
    from ggad_tpu.parallel.spmm_shard import (
        affinity_halo_bcsr,
        build_halo_bcsr,
        place_halo_bcsr,
        spmm_halo_bcsr,
    )

    g = add_self_loops(from_scipy(community_graph(512)))
    part = partition_edges(g, 8)
    plan = build_halo_plan(part)
    tiles = place_halo_bcsr(
        build_halo_bcsr(part, plan, tile_rows=256), mesh)
    assert tiles.loc_vals.shape[-2] == 256
    part = place_partition(part, mesh)
    plan = place_halo_plan(plan, mesh)
    x = rng.normal(size=(512, 24)).astype(np.float32)
    xp = pad_nodes(jnp.asarray(x), part)

    out = np.asarray(spmm_halo_bcsr(part, plan, tiles, xp, mesh))[:512]
    expect = np.asarray(spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    aff = np.asarray(affinity_halo_bcsr(part, plan, tiles, xp,
                                        mesh))[:512]
    aff_ref = np.asarray(node_affinity(g, jnp.asarray(x)))
    np.testing.assert_allclose(aff, aff_ref, rtol=1e-4, atol=1e-5)

    def f_tiles(h):
        return jnp.sum(
            spmm_halo_bcsr(part, plan, tiles, pad_nodes(h, part),
                           mesh) ** 2)

    def f_single(h):
        return jnp.sum(spmm(g, h) ** 2)

    g_t = np.asarray(jax.grad(f_tiles)(jnp.asarray(x)))
    g_s = np.asarray(jax.grad(f_single)(jnp.asarray(x)))
    np.testing.assert_allclose(g_t, g_s, rtol=1e-4, atol=1e-4)


def test_halo_bcsr_budget_degrades_to_xla():
    """Over-budget tile stores must degrade the pallas halo path to the
    XLA spmm (round-4: forcing pallas on the 0.1x-DGraph shard tried to
    allocate a 256 GiB tile store host-side)."""
    import jax

    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.parallel.halo_trainer import halo_training_run
    from ggad_tpu.parallel.mesh import make_mesh
    from ggad_tpu.parallel.spmm_shard import (
        build_halo_bcsr,
        build_halo_plan,
        partition_edges,
    )
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.ops.normalize import normalize_adj_reference

    ds = synthetic_gad(n_nodes=200, avg_degree=6, feat_dim=8, seed=0)
    adj, _ = normalize_adj_reference(from_scipy(ds.adj))
    part = partition_edges(adj, 2)
    plan = build_halo_plan(part)
    assert build_halo_bcsr(part, plan, mem_budget_bytes=1) is None
    assert build_halo_bcsr(part, plan) is not None

    # end-to-end: prepare_halo with a tiny budget must still train
    # (degraded) and produce the same loss as the XLA path
    from ggad_tpu.parallel.halo_trainer import prepare_halo  # noqa: F401
    mesh = make_mesh(min(2, len(jax.devices())), axis_names=("nodes",))
    _, l_xla = halo_training_run(mesh, ds, n_h=8, n_steps=1,
                                 spmm_impl="xla")
    import ggad_tpu.parallel.halo_trainer as ht
    orig = ht.prepare_halo

    def tiny_budget(*a, **k):
        k["bcsr_budget_bytes"] = 1
        return orig(*a, **k)

    ht.prepare_halo = tiny_budget
    try:
        _, l_deg = halo_training_run(mesh, ds, n_h=8, n_steps=1,
                                     spmm_impl="pallas")
    finally:
        ht.prepare_halo = orig
    assert abs(float(l_deg.total) - float(l_xla.total)) < 1e-5


@pytest.mark.slow
def test_spmm_halo_ell_matches_xla_and_grads():
    """ELL halo local aggregation == XLA gather/segment halo path,
    values and gradients (the sparse-regime distributed SpMM)."""
    import jax
    import jax.numpy as jnp

    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.ops.normalize import normalize_adj_reference
    from ggad_tpu.parallel.mesh import make_mesh
    from ggad_tpu.parallel.spmm_shard import (
        build_halo_ell,
        build_halo_plan,
        pad_nodes,
        partition_edges,
        place_halo_ell,
        place_halo_plan,
        place_partition,
        spmm_halo,
        spmm_halo_ell,
    )

    ds = synthetic_gad(n_nodes=300, avg_degree=7, feat_dim=12, seed=4)
    adj, _ = normalize_adj_reference(from_scipy(ds.adj))
    d = min(4, len(jax.devices()))
    mesh = make_mesh(d, axis_names=("nodes",))
    part_h = partition_edges(adj, d)
    plan_h = build_halo_plan(part_h)
    ells = place_halo_ell(build_halo_ell(part_h, plan_h), mesh)
    plan = place_halo_plan(plan_h, mesh)
    part = place_partition(part_h, mesh)
    x = pad_nodes(jnp.asarray(
        np.random.default_rng(0).normal(size=(300, 16)).astype(np.float32)),
        part_h)

    out_ell = np.asarray(spmm_halo_ell(part, plan, ells, x, mesh))
    out_xla = np.asarray(spmm_halo(part, plan, x, mesh))
    np.testing.assert_allclose(out_ell, out_xla, rtol=1e-4, atol=1e-5)

    g_ell = jax.grad(lambda h: jnp.sum(
        jnp.sin(spmm_halo_ell(part, plan, ells, h, mesh))))(x)
    g_xla = jax.grad(lambda h: jnp.sum(
        jnp.sin(spmm_halo(part, plan, h, mesh))))(x)
    np.testing.assert_allclose(np.asarray(g_ell), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-5)


def test_halo_training_run_ell_matches_xla():
    """Full distributed GGAD step on the ELL local path == XLA path."""
    import jax

    from ggad_tpu.datasets.synthetic import synthetic_gad
    from ggad_tpu.parallel.halo_trainer import halo_training_run
    from ggad_tpu.parallel.mesh import make_mesh

    ds = synthetic_gad(n_nodes=200, avg_degree=6, feat_dim=8, seed=1)
    mesh = make_mesh(min(2, len(jax.devices())), axis_names=("nodes",))
    _, l_xla = halo_training_run(mesh, ds, n_h=8, n_steps=2,
                                 spmm_impl="xla")
    _, l_ell = halo_training_run(mesh, ds, n_h=8, n_steps=2,
                                 spmm_impl="ell")
    assert abs(float(l_ell.total) - float(l_xla.total)) < 1e-5 * max(
        1.0, abs(float(l_xla.total)))
