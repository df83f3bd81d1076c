"""Sparse message-passing ops (the framework's "kernel layer").

Replaces the reference's dense ``torch.bmm(adj, h)`` / ``torch.mm`` calls
(reference ``model.py:26-35``, ``run.py:182-188``) with sparse O(E·d) ops:

  * :func:`spmm` — Â @ H aggregation (GCN propagate).
  * :func:`sddmm_dot` — per-edge ⟨a_u, b_v⟩ (sampled dense-dense matmul),
    used for the local-affinity loss without materializing N×N.
  * normalization utilities with the reference's exact quirks.

Every op has an XLA reference implementation (segment ops) and, where it is
a hot path, a Pallas TPU kernel selected automatically (see
``ggad_tpu.ops.pallas_spmm``).
"""

from ggad_tpu.ops.spmm import spmm, spmm_coo
from ggad_tpu.ops.sddmm import sddmm_dot, edge_cosine, node_affinity
from ggad_tpu.ops.normalize import (
    sym_normalize,
    row_normalize_features,
    normalize_adj_reference,
)

__all__ = [
    "spmm",
    "spmm_coo",
    "sddmm_dot",
    "edge_cosine",
    "node_affinity",
    "sym_normalize",
    "row_normalize_features",
    "normalize_adj_reference",
]
