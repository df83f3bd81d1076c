"""Faithful torch-only reimplementation of the three ``torch_geometric``
modules the reference imports AND executes, so the remaining reference
drivers (``dominant.py``, ``anomalyDAE.py``, ``aegis.py``, ``gaan.py``)
can run unmodified through :mod:`scripts.reference_oracle` on a machine
without PyG.

The reference pins ``torch_geometric==2.1.0`` (``requirements.txt:8``).
Its live PyG surface is exactly three classes:

  * ``GCN(n_h, n_in, num_layers=2)``   — ``model_domaint.py:90``
  * ``GATConv(n_h, n_in)``             — ``model_AnomalyDAE.py:123``
  * ``MLP(in_channels=..., hidden_channels=..., out_channels=...,
    num_layers=2, dropout=0., act=...)``
                                       — ``model_AEGIS.py:157-177``,
                                         ``model_gaan.py:157-170``

Each class below reproduces the 2.1.0 semantics of its namesake
(constructor defaults, layer composition, normalization, and parameter
shapes), NOT a simplification:

  * ``MLP``: ``batch_norm=True`` by DEFAULT in PyG 2.1.0 — every hidden
    layer is Linear → BatchNorm1d → act → dropout, final layer plain
    (``torch_geometric/nn/models/mlp.py`` @2.1.0). The reference's
    AEGIS/GAAN generators and discriminators therefore contain
    train-mode batch normalization; re-derived mirrors that drop the BN
    are NOT faithful (this is precisely the class of quirk the executed
    oracle exists to catch).
  * ``GCNConv``: ``gcn_norm`` — dedupe to exactly one self-loop per node
    (``add_remaining_self_loops`` keeps existing loop weights), unit
    edge weights, symmetric D^-1/2(B+I)D^-1/2 over the BINARIZED edge
    set; x→lin(x)→aggregate→+bias. NB this re-normalizes: the reference
    drivers pass edge indices derived from their already-normalized
    dense ``adj`` (``model_domaint.py:168``), and GCNConv ignores those
    weights entirely.
  * ``GCN`` (BasicGNN): with ``out_channels=None`` both convs are
    in→hidden, hidden→hidden; ReLU between layers, NO activation after
    the last (``torch_geometric/nn/models/basic_gnn.py`` @2.1.0).
  * ``GATConv``: single shared ``lin_src`` (``lin_dst = lin_src`` for
    non-bipartite input), ``att_src/att_dst [1, H, C]``,
    remove-then-add self-loops (exactly one per node), LeakyReLU(0.2)
    logits, softmax over incoming edges of each TARGET with PyG's
    ``+1e-16`` denominator guard, sum-aggregate, +bias.

Everything is plain torch (index_add/scatter_reduce); no PyG code is
imported or vendored. ``install_pyg_shim()`` publishes the classes as
``torch_geometric.nn`` in ``sys.modules``.
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn.functional as F
from torch import nn


def glorot(t: torch.Tensor) -> None:
    """PyG ``inits.glorot``: U(-a, a), a = sqrt(6/(size(-2)+size(-1)))."""
    if t is not None:
        stdv = math.sqrt(6.0 / (t.size(-2) + t.size(-1)))
        t.data.uniform_(-stdv, stdv)


def _resolve_act(act):
    """PyG ``activation_resolver``: str → module, callable → itself."""
    if act is None:
        return None
    if callable(act) and not isinstance(act, str):
        return act
    if act == "relu":
        return torch.relu
    if act == "sigmoid":
        return torch.sigmoid
    raise ValueError(f"unsupported act {act!r}")


def dedupe_self_loops(edge_index: torch.Tensor, num_nodes: int):
    """``add_remaining_self_loops`` semantics with unit weights: drop
    every (i, i) edge, append exactly one self-loop per node. Returns
    the new edge_index; all implied weights are 1."""
    mask = edge_index[0] != edge_index[1]
    loop = torch.arange(num_nodes, device=edge_index.device)
    loop = loop.unsqueeze(0).repeat(2, 1)
    return torch.cat([edge_index[:, mask], loop], dim=1)


def segment_softmax(logits: torch.Tensor, index: torch.Tensor,
                    num_nodes: int) -> torch.Tensor:
    """``torch_geometric.utils.softmax``: grouped softmax with the
    +1e-16 denominator guard. The grouped max is detached — softmax is
    shift-invariant, so gradients are unchanged."""
    m = torch.full((num_nodes,), float("-inf"), dtype=logits.dtype,
                   device=logits.device)
    m = m.scatter_reduce(0, index, logits.detach(), reduce="amax",
                         include_self=True)
    m = torch.where(torch.isfinite(m), m, torch.zeros_like(m))
    ex = torch.exp(logits - m[index])
    denom = torch.zeros(num_nodes, dtype=logits.dtype,
                        device=logits.device).index_add(0, index, ex)
    return ex / (denom[index] + 1e-16)


class GCNConv(nn.Module):
    """``torch_geometric.nn.GCNConv`` @2.1.0, defaults only
    (improved=False, cached=False, add_self_loops=True, normalize=True,
    bias=True, unit edge weights)."""

    def __init__(self, in_channels: int, out_channels: int,
                 bias: bool = True):
        super().__init__()
        self.in_channels, self.out_channels = in_channels, out_channels
        # PyG dense Linear, bias=False, weight_initializer='glorot'
        self.lin = nn.Linear(in_channels, out_channels, bias=False)
        glorot(self.lin.weight)
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter("bias", None)

    def forward(self, x: torch.Tensor,
                edge_index: torch.Tensor) -> torch.Tensor:
        n = x.size(0)
        ei = dedupe_self_loops(edge_index, n)
        row, col = ei[0], ei[1]
        w = torch.ones(ei.size(1), dtype=x.dtype, device=x.device)
        deg = torch.zeros(n, dtype=x.dtype,
                          device=x.device).index_add(0, col, w)
        dinv = deg.pow(-0.5)
        dinv = torch.where(torch.isinf(dinv), torch.zeros_like(dinv),
                           dinv)
        norm = dinv[row] * w * dinv[col]
        h = self.lin(x)
        out = torch.zeros_like(h).index_add(0, col,
                                            norm.unsqueeze(-1) * h[row])
        if self.bias is not None:
            out = out + self.bias
        return out


class GCN(nn.Module):
    """``torch_geometric.nn.models.GCN`` (BasicGNN) @2.1.0 defaults:
    act='relu' between layers, none after the last, norm=None, jk=None,
    dropout=0."""

    def __init__(self, in_channels: int, hidden_channels: int,
                 num_layers: int, out_channels=None, dropout: float = 0.0,
                 act="relu"):
        super().__init__()
        self.num_layers = num_layers
        self.dropout = dropout
        self.act = _resolve_act(act)
        self.convs = nn.ModuleList()
        if num_layers == 1:
            self.convs.append(GCNConv(
                in_channels,
                out_channels if out_channels is not None
                else hidden_channels))
        else:
            self.convs.append(GCNConv(in_channels, hidden_channels))
            for _ in range(num_layers - 2):
                self.convs.append(GCNConv(hidden_channels,
                                          hidden_channels))
            self.convs.append(GCNConv(
                hidden_channels,
                out_channels if out_channels is not None
                else hidden_channels))

    def forward(self, x: torch.Tensor,
                edge_index: torch.Tensor) -> torch.Tensor:
        for i in range(self.num_layers):
            x = self.convs[i](x, edge_index)
            if i == self.num_layers - 1:
                break
            if self.act is not None:
                x = self.act(x)
            x = F.dropout(x, p=self.dropout, training=self.training)
        return x


class GATConv(nn.Module):
    """``torch_geometric.nn.GATConv`` @2.1.0, defaults only (heads=1,
    concat=True, negative_slope=0.2, dropout=0, add_self_loops=True,
    bias=True; non-bipartite input ⇒ lin_dst IS lin_src)."""

    def __init__(self, in_channels: int, out_channels: int,
                 heads: int = 1, negative_slope: float = 0.2,
                 bias: bool = True):
        super().__init__()
        self.heads, self.out_channels = heads, out_channels
        self.negative_slope = negative_slope
        self.lin_src = nn.Linear(in_channels, heads * out_channels,
                                 bias=False)
        glorot(self.lin_src.weight)
        self.att_src = nn.Parameter(torch.empty(1, heads, out_channels))
        self.att_dst = nn.Parameter(torch.empty(1, heads, out_channels))
        glorot(self.att_src)
        glorot(self.att_dst)
        if bias:
            self.bias = nn.Parameter(torch.zeros(heads * out_channels))
        else:
            self.register_parameter("bias", None)

    def forward(self, x: torch.Tensor,
                edge_index: torch.Tensor) -> torch.Tensor:
        n, h, c = x.size(0), self.heads, self.out_channels
        hw = self.lin_src(x).view(n, h, c)
        alpha_src = (hw * self.att_src).sum(-1)   # [N, H]
        alpha_dst = (hw * self.att_dst).sum(-1)   # [N, H]
        ei = dedupe_self_loops(edge_index, n)
        src, dst = ei[0], ei[1]
        logits = F.leaky_relu(alpha_src[src] + alpha_dst[dst],
                              self.negative_slope)       # [E, H]
        out = torch.zeros(n, h, c, dtype=x.dtype, device=x.device)
        for k in range(h):
            att = segment_softmax(logits[:, k], dst, n)
            out[:, k] = torch.zeros(n, c, dtype=x.dtype,
                                    device=x.device).index_add(
                0, dst, att.unsqueeze(-1) * hw[src, k])
        out = out.view(n, h * c)                  # concat=True
        if self.bias is not None:
            out = out + self.bias
        return out


class MLP(nn.Module):
    """``torch_geometric.nn.models.MLP`` @2.1.0 with the keyword calling
    convention the reference uses. DEFAULT ``batch_norm=True``: hidden
    layers are Linear → BatchNorm1d → act → dropout; final Linear plain.
    """

    def __init__(self, channel_list=None, *, in_channels=None,
                 hidden_channels=None, out_channels=None, num_layers=None,
                 dropout: float = 0.0, act="relu", batch_norm: bool = True,
                 act_first: bool = False, bias: bool = True):
        super().__init__()
        if channel_list is None:
            assert num_layers >= 1
            channel_list = ([in_channels]
                            + [hidden_channels] * (num_layers - 1)
                            + [out_channels])
        self.channel_list = list(channel_list)
        self.dropout = dropout
        self.act = _resolve_act(act)
        self.act_first = act_first
        self.lins = nn.ModuleList(
            nn.Linear(a, b, bias=bias)
            for a, b in zip(channel_list[:-1], channel_list[1:]))
        self.norms = nn.ModuleList(
            nn.BatchNorm1d(hc) if batch_norm else nn.Identity()
            for hc in channel_list[1:-1])

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.lins[0](x)
        for lin, norm in zip(self.lins[1:], self.norms):
            if self.act is not None and self.act_first:
                x = self.act(x)
            x = norm(x)
            if self.act is not None and not self.act_first:
                x = self.act(x)
            x = F.dropout(x, p=self.dropout, training=self.training)
            x = lin(x)
        return x


def install_pyg_shim() -> None:
    """Publish the faithful classes as ``torch_geometric.nn``. Inert
    placeholders for classes that are imported but never executed
    (GINConv in ``model_tam.py:266``) are left to
    ``reference_oracle._stub_torch_geometric``."""
    tg = sys.modules.get("torch_geometric")
    if tg is None:
        tg = types.ModuleType("torch_geometric")
        tg.nn = types.ModuleType("torch_geometric.nn")
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.nn"] = tg.nn
    for cls in (GCN, GCNConv, GATConv, MLP):
        setattr(tg.nn, cls.__name__, cls)
