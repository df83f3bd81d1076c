"""Benchmark: full GGAD training step throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: a photo-shaped synthetic graph (7,535 nodes / ~456K edges /
745 attrs — reference ``README.md:57``), embedding dim 300, the full
3-term GGAD objective (forward + backward + Adam), exactly the per-epoch
work of the reference's ``run.py`` loop.

Metric: edge-updates/s = graph edges × training steps/s on this chip.

Robustness (round-2 redesign): this environment reaches the TPU through
a remote tunnel whose per-dispatch latency can degrade by 10-100 ms
without warning, which in round 1 inflated a single-window wall-clock
measurement ~15x. Defenses:
  * the headline step time is a PAIRED-DIFFERENCE estimate —
    (T(scan of 2K steps) - T(scan of K steps)) / K — which cancels the
    per-dispatch tunnel/host overhead exactly (both dispatches pay it
    once); the scan body is trajectory-identical to the trainer's;
  * the estimate is the MEDIAN over ``n_windows`` independent windows,
    with the full per-window list + IQR reported in ``detail``;
  * per-dispatch overhead is measured separately (median over windows)
    and reported as ``dispatch_overhead_ms``; if it exceeds
    ``TUNNEL_DEGRADED_MS`` the JSON carries ``"tunnel_degraded": true``
    so a bad capture is self-identifying.

Baseline: the reference implementation's algorithmic shape — dense N×N
adjacency matmuls (2 GCN layers + N×N affinity similarity) in float32 on
CPU via torch — measured here on the same graph, same step semantics.
``vs_baseline`` is the speedup factor (ours / reference-style).
"""

import json
import os
import statistics
import sys
import time

import numpy as np

TUNNEL_DEGRADED_MS = 50.0  # healthy tunnel dispatch is ~5 ms


def build_dataset():
    from ggad_tpu.datasets.synthetic import synthetic_gad
    return synthetic_gad(
        name="bench_photo", n_nodes=7535, avg_degree=31, feat_dim=745,
        n_communities=8, anomaly_rate=0.09, seed=0, seed_frac=0.15)


def bench_tpu_step(ds, *, spmm_dtype="float32", scan_steps=20, n_windows=5):
    """Per-step seconds: median paired-difference estimate over windows.

    Returns (step_s_median, detail_dict). Each window times one
    ``scan_steps``-step fused dispatch and one ``2*scan_steps``-step
    dispatch; their difference is ``scan_steps`` steps of pure device
    time with the dispatch overhead subtracted out.
    ``spmm_dtype='bfloat16'`` is the quality-cleared fast mode
    (docs/BF16_STUDY.md: ΔAUROC within ±0.004 of f32 at full budgets).
    """
    import jax
    from ggad_tpu.train.full_batch import FullBatchTrainer

    tr = FullBatchTrainer(ds, num_epoch=1, noise_mean=0.02, noise_std=0.01,
                          embedding_dim=300, spmm_dtype=spmm_dtype)
    rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    params, opt_state = tr.init(init_rng)

    def dispatch(params, opt_state, rng, n_steps):
        rng, step_rng = jax.random.split(rng)
        t0 = time.perf_counter()
        params, opt_state, losses = tr._train_scan(
            params, opt_state, step_rng, tr.adj, tr.raw_adj,
            tr.features, tr.seed_idx, tr.normal_idx, n_steps,
            tr.seed_adj, tr.aff_sub, tr.ax)
        jax.block_until_ready(losses.total)
        return params, opt_state, rng, time.perf_counter() - t0, losses

    # warmup: compile both scan lengths
    params, opt_state, rng, _, _ = dispatch(params, opt_state, rng,
                                            scan_steps)
    params, opt_state, rng, _, losses = dispatch(params, opt_state, rng,
                                                 2 * scan_steps)
    assert np.isfinite(float(losses.total))

    step_est, overhead_est = [], []
    for _ in range(n_windows):
        params, opt_state, rng, t1, _ = dispatch(params, opt_state, rng,
                                                 scan_steps)
        params, opt_state, rng, t2, _ = dispatch(params, opt_state, rng,
                                                 2 * scan_steps)
        est = (t2 - t1) / scan_steps
        step_est.append(max(est, 1e-9))
        overhead_est.append(max(t1 - est * scan_steps, 0.0))

    med = statistics.median(step_est)
    srt = sorted(step_est)
    q1, q3 = srt[len(srt) // 4], srt[(3 * len(srt)) // 4]
    detail = {
        "step_ms_windows": [round(s * 1e3, 3) for s in step_est],
        "step_ms_iqr": round((q3 - q1) * 1e3, 3),
        "dispatch_overhead_ms": round(
            statistics.median(overhead_est) * 1e3, 3),
    }
    detail["tunnel_degraded"] = (
        detail["dispatch_overhead_ms"] > TUNNEL_DEGRADED_MS)
    return med, detail


def bench_bcsr_kernel(ds, *, dtype="bfloat16", n_h=300, scan_steps=20,
                      n_windows=3):
    """Isolated BCSR SpMM forward: achieved TFLOP/s, MXU utilization and
    HBM bandwidth vs the chip roofline (regression canary for the hot
    kernel — step-level numbers can hide a kernel slowdown behind fusion
    changes).

    FLOPs are counted over the full tile store (the MXU multiplies every
    slot of every occupied 128x128 tile, zeros included) — utilization
    is therefore the kernel-efficiency number, not the algorithmic
    useful-work fraction. Peaks default to TPU v5e (override via
    GGAD_PEAK_BF16_TFLOPS / GGAD_PEAK_HBM_GBS for other chips).
    f32-HIGHEST is modeled as 6 bf16 MXU passes per product — a
    conservative yardstick: measured util slightly above 1.0 means the
    compiler chose a cheaper decomposition (e.g. 5-pass).
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ggad_tpu.graph import from_scipy
    from ggad_tpu.ops.normalize import normalize_adj_reference
    from ggad_tpu.ops.pallas_spmm import TILE, as_bcsr_graph, bcsr_spmm

    peak_bf16 = float(os.environ.get("GGAD_PEAK_BF16_TFLOPS", 197.0)) * 1e12
    peak_hbm = float(os.environ.get("GGAD_PEAK_HBM_GBS", 819.0)) * 1e9
    peak_mxu = peak_bf16 if dtype == "bfloat16" else peak_bf16 / 6.0

    adj, _ = normalize_adj_reference(from_scipy(ds.adj))
    g = as_bcsr_graph(adj, dtype=dtype)
    tiles = g.tiles
    n_tiles = tiles.fwd.n_tiles
    # actual tile shape — pick_tile_rows may choose TALL tiles (512×128);
    # hardcoding TILE×TILE here undercounted flops AND tile-store bytes
    # 4× in round 3 (the "39% of HBM roofline" was an accounting artifact)
    t_rows, t_cols = (int(s) for s in tiles.fwd.values.shape[-2:])
    d_pad = ((n_h + TILE - 1) // TILE) * TILE

    @partial(jax.jit, static_argnums=(2,))
    def chain(tiles, h, k):
        def body(h, _):
            out = bcsr_spmm(tiles, h)
            # keep magnitudes bounded; VPU cost is negligible vs the MXU
            return out * jax.lax.rsqrt(
                jnp.mean(jnp.square(out)) + 1e-6), None

        h, _ = jax.lax.scan(body, h, None, length=k)
        return h

    h0 = jax.random.normal(jax.random.PRNGKey(0), (adj.n_nodes, n_h),
                           jnp.float32)
    for k in (scan_steps, 2 * scan_steps):  # compile
        jax.block_until_ready(chain(tiles, h0, k))
    est = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(tiles, h0, scan_steps))
        t1 = time.perf_counter()
        jax.block_until_ready(chain(tiles, h0, 2 * scan_steps))
        t2 = time.perf_counter()
        est.append(max(((t2 - t1) - (t1 - t0)) / scan_steps, 1e-9))
    dt = statistics.median(est)

    flops = 2.0 * n_tiles * t_rows * t_cols * d_pad
    val_bytes = 2 if dtype == "bfloat16" else 4
    # tile store + one [t_cols, d] H slab read per occupied tile +
    # output writes (f32 accumulator store, one per output block)
    hbm_bytes = (n_tiles * t_rows * t_cols * val_bytes
                 + n_tiles * t_cols * d_pad * val_bytes
                 + tiles.fwd.n_rows * d_pad * 4)
    tflops = flops / dt
    gbs = hbm_bytes / dt
    util_mxu = tflops / peak_mxu
    util_hbm = gbs / peak_hbm
    return {
        "dtype": dtype,
        "spmm_fwd_ms": round(dt * 1e3, 3),
        "n_tiles": int(n_tiles),
        "tile_shape": [t_rows, t_cols],
        "achieved_tflops": round(tflops / 1e12, 2),
        "mxu_util": round(util_mxu, 3),
        "achieved_hbm_gbs": round(gbs / 1e9, 1),
        "hbm_util": round(util_hbm, 3),
        "bound": "mxu" if util_mxu >= util_hbm else "hbm",
    }


def bench_regimes():
    """Round-stamped records for the OTHER two kernel regimes (kept
    cheap: fewer windows). The headline photo graph exercises the
    tile-dense BCSR path only; a regression in the dense (amazon-shaped,
    4.4M E) or sparse→ELL (elliptic-shaped, 73K E) families would be
    invisible without these."""
    from ggad_tpu.datasets.synthetic import synthetic_like

    out = {}
    for name, ref_name in (("amazon", "Amazon"), ("elliptic", "elliptic")):
        dsr = synthetic_like(ref_name, seed=0)
        dt, det = bench_tpu_step(dsr, spmm_dtype="bfloat16",
                                 scan_steps=10, n_windows=3)
        out[name] = {
            "graph": f"{dsr.n_nodes}N/{dsr.n_edges}E/{dsr.feat_dim}F",
            "step_ms": round(dt * 1e3, 3),
            "edges_per_s": round(dsr.n_edges / dt, 1),
            "step_ms_windows": det["step_ms_windows"],
            "tunnel_degraded": det["tunnel_degraded"],
        }
    return out


def bench_reference_style_step(ds, n_iter=3):
    """Reference-style dense-adjacency training step on CPU (torch).

    Mirrors the reference's per-epoch compute (``run.py:145-213``): two
    dense GCN layers, generator, head, dense N×N affinity, backward, Adam.
    Freshly implemented here purely as a measurement baseline. Reports
    the MIN over iterations — the 2-core host is easily contended and
    the minimum is the robust estimate of the uncontended step.
    """
    import torch

    torch.set_num_threads(os.cpu_count())
    n, f = ds.features.shape
    h = 300
    adj = torch.tensor(
        (ds.adj + __import__("scipy.sparse", fromlist=["eye"]).eye(n))
        .toarray(), dtype=torch.float32)
    raw = adj  # same sparsity; values differ but cost is identical
    x = torch.tensor(ds.features)
    si = torch.tensor(ds.abnormal_label_idx, dtype=torch.long)
    ni = torch.tensor(ds.normal_label_idx, dtype=torch.long)

    w1 = torch.randn(f, h, requires_grad=True)
    w2 = torch.randn(h, h, requires_grad=True)
    w4 = torch.randn(h, h, requires_grad=True)
    wf1 = torch.randn(h, h // 2, requires_grad=True)
    wf2 = torch.randn(h // 2, h // 4, requires_grad=True)
    wf3 = torch.randn(h // 4, 1, requires_grad=True)
    params = [w1, w2, w4, wf1, wf2, wf3]
    opt = torch.optim.Adam(params, lr=1e-3)

    def step():
        opt.zero_grad()
        emb = torch.relu(adj @ (torch.relu(adj @ (x @ w1)) @ w2))
        emb_con = torch.relu((adj[si] @ emb) @ w4)
        emb_combine = torch.cat([emb[ni], emb_con], 0)
        logits = (torch.relu(torch.relu(emb_combine @ wf1) @ wf2) @ wf3)[:, 0]
        y = torch.cat([torch.zeros(len(ni)), torch.ones(len(si))])
        bce = torch.nn.functional.binary_cross_entropy_with_logits(logits, y)
        emb_out = emb.clone()
        emb_out[si] = emb_con
        emb_n = torch.nn.functional.normalize(emb_out, dim=1)
        sim = emb_n @ emb_n.T          # the reference's N×N hot loop
        aff = (sim * raw).sum(0) / raw.sum(0)
        margin = torch.clamp(0.7 - (aff[ni].mean() - aff[si].mean()), min=0)
        rec = (emb_con - emb[si]).pow(2).sum(1).sqrt().mean()
        (bce + margin + rec).backward()
        opt.step()

    step()  # warmup
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ds = build_dataset()
    edges = ds.n_edges

    # headline: the trainer's production configuration — scan-fused
    # dispatch (trajectory-identical) + bf16 tiles (quality-cleared,
    # docs/BF16_STUDY.md); f32 kept in detail for comparison.
    tpu_dt, tpu_detail = bench_tpu_step(ds, spmm_dtype="bfloat16",
                                        scan_steps=20, n_windows=5)
    tpu_dt_f32, f32_detail = bench_tpu_step(ds, spmm_dtype="float32",
                                            scan_steps=10, n_windows=3)
    kernel = {
        "bf16": bench_bcsr_kernel(ds, dtype="bfloat16"),
        "f32_highest": bench_bcsr_kernel(ds, dtype="float32"),
    }
    regimes = bench_regimes()
    ref_dt = bench_reference_style_step(ds)

    edges_per_s = edges / tpu_dt
    detail = {
        "config": "bf16+scan20, paired-diff median of 5 windows",
        "graph": f"{ds.n_nodes}N/{edges}E/745F (photo-shaped)",
        "step_ms": round(tpu_dt * 1e3, 3),
        "step_ms_f32": round(tpu_dt_f32 * 1e3, 3),
        "reference_style_cpu_step_ms": round(ref_dt * 1e3, 3),
        "backend": __import__("jax").default_backend(),
    }
    detail.update(tpu_detail)
    detail["f32_step_ms_windows"] = f32_detail["step_ms_windows"]
    detail["kernel"] = kernel
    detail["regimes"] = regimes
    result = {
        "metric": "ggad_fullbatch_train_edge_updates_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(ref_dt / tpu_dt, 3),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
