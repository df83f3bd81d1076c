"""Graph and feature normalization with the reference's exact semantics.

The reference's pipeline (``run.py:96-101``) is load-bearing for parity:

    adj      = D^{-1/2} A D^{-1/2}      (no self-loops during norm!)
    adj      = adj + I                   (identity added AFTER normalizing)
    raw_adj  = A + I

and feature row-normalization (``utils.py:37-44``) is applied only to some
datasets (including a misspelling that skips t_finance — see
``ggad_tpu.datasets.registry``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ggad_tpu.graph import Graph, add_self_loops


def sym_normalize(g: Graph) -> Graph:
    """Symmetric normalization Â = D^{-1/2} A D^{-1/2} (device-side).

    Degrees are weighted *row* sums, matching scipy
    ``adj.sum(1)`` in the reference (``utils.py:50``). Zero-degree rows get
    d^{-1/2} = 0 (inf-guard), like the reference's isinf clamp.
    """
    deg = g.out_degrees()
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    new_val = g.val * inv_sqrt[g.row] * inv_sqrt[g.col]
    return g.with_val(new_val)


def normalize_adj_reference(g: Graph) -> tuple[Graph, Graph]:
    """Full reference preprocessing: returns (adj, raw_adj).

      adj     = sym_normalize(A) + I    (reference ``run.py:98-101``)
      raw_adj = A + I

    Host-side (adds self-loop edges, rebuilding the edge list).
    """
    adj_norm = sym_normalize(g)
    adj = add_self_loops(adj_norm)
    raw_adj = add_self_loops(g)
    return adj, raw_adj


def row_normalize_smoothed(x: np.ndarray) -> np.ndarray:
    """The MINIBATCH path's feature normalization
    (``src/utils.py:74-84``): x / (rowsum + 0.01) — note the +0.01
    smoothing, a reference quirk distinct from the full-batch
    ``row_normalize_features``. Applied unconditionally by the
    reference's ModelHandler (``src/model_handler.py:225``); caught by
    the executed src/main.py oracle leg — earlier rounds' minibatch
    trainers skipped it."""
    x = np.asarray(x, dtype=np.float32)
    rowsum = x.sum(axis=1) + 0.01
    inv = np.where(np.isfinite(1.0 / rowsum), 1.0 / rowsum, 0.0)
    return x * inv[:, None]


def gcn_norm_graph(g: Graph) -> Graph:
    """PyG ``gcn_norm`` semantics (torch_geometric 2.1.0): unit edge
    weights over the BINARIZED edge set, symmetric D^-1/2 B D^-1/2.

    The reference's PyG-based baselines (DOMINANT's ``GCN`` stack,
    ``model_domaint.py:90,168``) pass edge indices derived from the
    already-normalized dense ``adj`` — GCNConv discards those weights
    and re-normalizes the binarized graph. ``g`` must already carry
    exactly one self-loop per node (true for the reference's
    normalize-then-+I graph), matching ``add_remaining_self_loops``.
    Padding edges (val == 0) stay zero.
    """
    valid = (g.val != 0).astype(jnp.float32)
    deg = jax.ops.segment_sum(valid, g.col, num_segments=g.n_nodes)
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    return g.with_val(valid * dinv[g.row] * dinv[g.col])


def row_normalize_features(x: np.ndarray) -> np.ndarray:
    """D_x^{-1} X row normalization (reference ``utils.py:37-44``).

    Rows with zero sum stay zero (inf-guard). Host-side numpy (runs once at
    load).
    """
    x = np.asarray(x, dtype=np.float32)
    rowsum = x.sum(axis=1)
    inv = np.where(rowsum != 0, 1.0 / rowsum, 0.0)
    return x * inv[:, None]
