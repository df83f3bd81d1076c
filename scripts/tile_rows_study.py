"""Tile-row-height study for the BCSR SpMM kernel.

The forward kernel reads one [TC, d] H slab per occupied tile; for a
tile-dense graph the total H traffic is N²·d·b / TR — inversely
proportional to the tile ROW height. This script times an experimental
TR-parameterized copy of the kernel at TR ∈ {128, 256, 512} on the
photo-shaped benchmark graph (real TPU) to decide whether the
production kernel should grow taller tiles.

Usage: python scripts/tile_rows_study.py [--trs 128,256,512] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_tiles(row, col, val, n_nodes, tr, tc, dtype):
    import jax.numpy as jnp

    def r_up(x, m):
        return ((x + m - 1) // m) * m

    rp, cp = r_up(max(n_nodes, tr), tr), r_up(max(n_nodes, tc), tc)
    trow = row // tr
    tcol = col // tc
    tkey = trow.astype(np.int64) * (cp // tc) + tcol
    uniq, inv = np.unique(tkey, return_inverse=True)
    vals = np.zeros((len(uniq), tr, tc), np.float32)
    np.add.at(vals, (inv, row % tr, col % tc), val)
    return (jnp.asarray((uniq // (cp // tc)).astype(np.int32)),
            jnp.asarray((uniq % (cp // tc)).astype(np.int32)),
            jnp.asarray(vals.astype(dtype)), rp, cp)


def make_matmul(tr, tc, d_tile):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(rows_ref, cols_ref, vals_ref, h_ref, out_ref):
        t = pl.program_id(1)

        @pl.when((t == 0) | (rows_ref[t] != rows_ref[
            jnp.maximum(t - 1, 0)]))
        def _zero():
            out_ref[...] = jnp.zeros_like(out_ref)

        a = vals_ref[0]
        h = h_ref[...]
        if a.dtype == jnp.bfloat16:
            out_ref[...] += jax.lax.dot(
                a, h.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            out_ref[...] += jax.lax.dot(
                a, h, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    def matmul(rows, cols, vals, h, n_rows_pad):
        n_t = rows.shape[0]
        d_pad = h.shape[1]
        if vals.dtype == jnp.bfloat16:
            h = h.astype(jnp.bfloat16)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(d_pad // d_tile, n_t),
            in_specs=[
                pl.BlockSpec((1, tr, tc),
                             lambda d, t, rows, cols: (t, 0, 0)),
                pl.BlockSpec((tc, d_tile),
                             lambda d, t, rows, cols: (cols[t], d)),
            ],
            out_specs=pl.BlockSpec((tr, d_tile),
                                   lambda d, t, rows, cols: (rows[t], d)),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows_pad, d_pad),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n_t * tr * tc * d_pad,
                bytes_accessed=n_t * tr * tc * vals.dtype.itemsize
                + n_t * tc * d_pad * h.dtype.itemsize,
                transcendentals=0),
            interpret=jax.default_backend() != "tpu",
        )(rows, cols, vals, h)

    return matmul


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trs", type=str, default="128,256,512")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--n_h", type=int, default=300)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--graph", type=str, default="photo",
                    choices=["photo", "amazon"],
                    help="benchmark-shaped graph regime: photo (7.5K N / "
                         "457K E, tile-dense) or amazon (12K N / 4.4M E, "
                         "dense — reference README.md:53)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggad_tpu.datasets.synthetic import synthetic_gad, synthetic_like
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.ops.normalize import normalize_adj_reference

    if args.graph == "amazon":
        ds = synthetic_like("Amazon", seed=0)
    else:
        ds = synthetic_gad(name="bench_photo", n_nodes=7535, avg_degree=31,
                           feat_dim=745, n_communities=8, anomaly_rate=0.09,
                           seed=0, seed_frac=0.15)
    print(json.dumps({"graph": args.graph, "n_nodes": int(ds.n_nodes),
                      "n_edges": int(ds.n_edges)}), flush=True)
    adj, _ = normalize_adj_reference(from_scipy(ds.adj))
    e = adj.n_edges
    row = np.asarray(adj.row)[:e]
    col = np.asarray(adj.col)[:e]
    val = np.asarray(adj.val)[:e]
    dtype = np.float32 if args.dtype == "float32" else jnp.bfloat16

    d_pad = ((args.n_h + 127) // 128) * 128
    h0 = jax.random.normal(jax.random.PRNGKey(0),
                           (adj.n_nodes, args.n_h), jnp.float32)
    ref = None
    for tr in (int(x) for x in args.trs.split(",")):
        rows, cols, vals, rp, cp = build_tiles(
            row, col, val, adj.n_nodes, tr, 128, dtype)
        mm = make_matmul(tr, 128, d_pad)

        @partial(jax.jit, static_argnums=(4,))
        def chain(rows, cols, vals, h, k, rp=rp, cp=cp, mm=mm):
            hp = jnp.pad(h, ((0, cp - h.shape[0]),
                             (0, d_pad - h.shape[1])))

            def body(hp, _):
                out = mm(rows, cols, vals, hp, rp)
                # normalize over the LIVE rows only: rp (row padding)
                # varies with tile height, so an RMS over the padded
                # array scales outputs by sqrt(rp/rp') across heights —
                # a 4% artifact once misread as kernel inaccuracy
                live = out[: h.shape[0]]
                live = live * jax.lax.rsqrt(
                    jnp.mean(jnp.square(live)) + 1e-6)
                return jnp.pad(live, ((0, cp - h.shape[0]), (0, 0))), None

            hp, _ = jax.lax.scan(body, hp, None, length=k)
            return hp

        out1 = np.asarray(chain(rows, cols, vals, h0, 1))[:adj.n_nodes,
                                                          :args.n_h]
        if ref is None:
            ref = out1
        else:
            err = float(np.max(np.abs(out1 - ref)) /
                        (np.max(np.abs(ref)) + 1e-9))
            assert err < 2e-2, f"TR={tr} mismatch {err}"

        for k in (args.iters, 2 * args.iters):
            jax.block_until_ready(chain(rows, cols, vals, h0, k))
        est = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(rows, cols, vals, h0, args.iters))
            t1 = time.perf_counter()
            jax.block_until_ready(chain(rows, cols, vals, h0,
                                        2 * args.iters))
            t2 = time.perf_counter()
            est.append(((t2 - t1) - (t1 - t0)) / args.iters)
        dt = statistics.median(est)
        n_t = int(rows.shape[0])
        print(json.dumps({
            "tile_rows": tr, "n_tiles": n_t,
            "tile_store_MB": round(n_t * tr * 128
                                   * (2 if dtype == jnp.bfloat16 else 4)
                                   / 2**20, 1),
            "spmm_ms": round(dt * 1e3, 3),
            "edges_per_tile": round(e / n_t, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
