"""ctypes bindings for the native graph-construction library.

Builds ``native/libgraphbuild.so`` on first use if the toolchain is
available; every entry point has a numpy fallback so the framework is
fully functional without a compiler. The native paths matter at
DGraph scale (73M-edge sorts/symmetrization/tile builds).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgraphbuild.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        src = os.path.join(_NATIVE_DIR, "graphbuild.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.gg_sort_coo.restype = ctypes.c_int
    lib.gg_sort_coo.argtypes = [ctypes.c_int64, i32p, i32p, f32p]
    lib.gg_symmetrize.restype = ctypes.c_int64
    lib.gg_symmetrize.argtypes = [ctypes.c_int64, i32p, i32p, f32p,
                                  i32p, i32p, f32p]
    lib.gg_coalesce.restype = ctypes.c_int64
    lib.gg_coalesce.argtypes = [ctypes.c_int64, i32p, i32p, f32p]
    lib.gg_build_indptr.restype = ctypes.c_int
    lib.gg_build_indptr.argtypes = [ctypes.c_int64, ctypes.c_int32, i32p,
                                    i32p]
    lib.gg_sym_normalize.restype = ctypes.c_int
    lib.gg_sym_normalize.argtypes = [ctypes.c_int64, ctypes.c_int32, i32p,
                                     i32p, f32p]
    lib.gg_bcsr_count.restype = ctypes.c_int64
    lib.gg_bcsr_count.argtypes = [ctypes.c_int64, ctypes.c_int32, i32p,
                                  i32p, i64p]
    lib.gg_bcsr_fill.restype = ctypes.c_int
    lib.gg_bcsr_fill.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                 ctypes.c_int64, i32p, i32p, f32p, i64p,
                                 i32p, i32p, f32p]
    lib.gg_sample_neighbors.restype = ctypes.c_int
    lib.gg_sample_neighbors.argtypes = [ctypes.c_int64, i32p, i32p, i32p,
                                        ctypes.c_int32, ctypes.c_uint64,
                                        i32p, f32p]
    lib.gg_partition_refine.restype = ctypes.c_int64
    lib.gg_partition_refine.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                        ctypes.c_int64, i32p, i32p, f32p,
                                        i32p, i32p, ctypes.c_int32,
                                        ctypes.c_uint64]
    lib.gg_hem_match.restype = ctypes.c_int64
    lib.gg_hem_match.argtypes = [ctypes.c_int32, i32p, i32p, f32p,
                                 ctypes.c_uint64, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def sort_coo(rows: np.ndarray, cols: np.ndarray,
             vals: Optional[np.ndarray]):
    """Sort edges by (row, col); returns new arrays."""
    rows = np.ascontiguousarray(rows, np.int32).copy()
    cols = np.ascontiguousarray(cols, np.int32).copy()
    vals = (np.ascontiguousarray(vals, np.float32).copy()
            if vals is not None else None)
    lib = _load()
    if lib is not None:
        lib.gg_sort_coo(len(rows), _p(rows, ctypes.c_int32),
                        _p(cols, ctypes.c_int32),
                        _p(vals, ctypes.c_float) if vals is not None
                        else None)
        return rows, cols, vals
    order = np.lexsort((cols, rows))
    return rows[order], cols[order], (vals[order] if vals is not None
                                      else None)


def symmetrize(rows: np.ndarray, cols: np.ndarray,
               vals: Optional[np.ndarray]):
    """Union-symmetrize max(A, Aᵀ) with dedup; returns sorted arrays."""
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals_in = (np.ascontiguousarray(vals, np.float32)
               if vals is not None else np.ones(len(rows), np.float32))
    lib = _load()
    if lib is not None:
        m = 2 * len(rows)
        orow = np.empty(m, np.int32)
        ocol = np.empty(m, np.int32)
        oval = np.empty(m, np.float32)
        n = lib.gg_symmetrize(len(rows), _p(rows, ctypes.c_int32),
                              _p(cols, ctypes.c_int32),
                              _p(vals_in, ctypes.c_float),
                              _p(orow, ctypes.c_int32),
                              _p(ocol, ctypes.c_int32),
                              _p(oval, ctypes.c_float))
        return orow[:n].copy(), ocol[:n].copy(), oval[:n].copy()
    # numpy fallback
    r = np.concatenate([rows, cols]).astype(np.int64)
    c = np.concatenate([cols, rows]).astype(np.int64)
    v = np.concatenate([vals_in, vals_in])
    n = int(max(r.max(), c.max())) + 1 if len(r) else 1
    key = r * n + c
    order = np.argsort(key, kind="stable")
    key, r, c, v = key[order], r[order], c[order], v[order]
    uniq, start = np.unique(key, return_index=True)
    out_v = np.maximum.reduceat(v, start) if len(v) else v
    return (r[start].astype(np.int32), c[start].astype(np.int32),
            out_v.astype(np.float32))


def build_indptr(rows: np.ndarray, n_nodes: int) -> np.ndarray:
    rows = np.ascontiguousarray(rows, np.int32)
    lib = _load()
    indptr = np.zeros(n_nodes + 1, np.int32)
    if lib is not None:
        lib.gg_build_indptr(len(rows), n_nodes,
                            _p(rows, ctypes.c_int32),
                            _p(indptr, ctypes.c_int32))
        return indptr
    counts = np.bincount(rows, minlength=n_nodes)
    indptr[1:] = np.cumsum(counts)
    return indptr


def sym_normalize_vals(rows: np.ndarray, cols: np.ndarray,
                       vals: np.ndarray, n_nodes: int) -> np.ndarray:
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32).copy()
    lib = _load()
    if lib is not None:
        lib.gg_sym_normalize(len(rows), n_nodes,
                             _p(rows, ctypes.c_int32),
                             _p(cols, ctypes.c_int32),
                             _p(vals, ctypes.c_float))
        return vals
    deg = np.zeros(n_nodes, np.float64)
    np.add.at(deg, rows, vals)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0).astype(np.float32)
    return vals * dinv[rows] * dinv[cols]


def bcsr_build(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
               n_pad_tiles: int):
    """Tile-COO construction; returns (tile_rows, tile_cols, values)."""
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    tile_ids = np.empty(len(rows), np.int64)
    n_tiles = lib.gg_bcsr_count(len(rows), n_pad_tiles,
                                _p(rows, ctypes.c_int32),
                                _p(cols, ctypes.c_int32),
                                _p(tile_ids, ctypes.c_int64))
    tile_rows = np.empty(n_tiles, np.int32)
    tile_cols = np.empty(n_tiles, np.int32)
    values = np.zeros((n_tiles, 128, 128), np.float32)
    rc = lib.gg_bcsr_fill(len(rows), n_pad_tiles, n_tiles,
                          _p(rows, ctypes.c_int32),
                          _p(cols, ctypes.c_int32),
                          _p(vals, ctypes.c_float),
                          _p(tile_ids, ctypes.c_int64),
                          _p(tile_rows, ctypes.c_int32),
                          _p(tile_cols, ctypes.c_int32),
                          values.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_float)))
    assert rc == 0
    return tile_rows, tile_cols, values


def sample_neighbors_host(query: np.ndarray, indptr: np.ndarray,
                          indices: np.ndarray, fanout: int,
                          seed: int = 0):
    """Host-side fixed-fanout sampling (prefetch pipelines)."""
    query = np.ascontiguousarray(query, np.int32)
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    lib = _load()
    neigh = np.empty((len(query), fanout), np.int32)
    mask = np.empty((len(query), fanout), np.float32)
    if lib is not None:
        lib.gg_sample_neighbors(len(query), _p(query, ctypes.c_int32),
                                _p(indptr, ctypes.c_int32),
                                _p(indices, ctypes.c_int32), fanout,
                                seed,
                                neigh.ctypes.data_as(
                                    ctypes.POINTER(ctypes.c_int32)),
                                mask.ctypes.data_as(
                                    ctypes.POINTER(ctypes.c_float)))
        return neigh, mask
    rng = np.random.default_rng(seed)
    deg = indptr[query + 1] - indptr[query]
    offs = (rng.random((len(query), fanout))
            * np.maximum(deg, 1)[:, None]).astype(np.int64)
    idx = indptr[query][:, None] + np.minimum(
        offs, np.maximum(deg - 1, 0)[:, None])
    has = (deg > 0)[:, None]
    neigh = np.where(has, indices[idx] if len(indices) else 0,
                     query[:, None])
    mask = has.astype(np.float32) * np.ones((1, fanout), np.float32)
    return neigh.astype(np.int32), mask


def partition_refine(indptr: np.ndarray, indices: np.ndarray,
                     part: np.ndarray, n_parts: int, cap: int,
                     rounds: int = 10, seed: int = 1,
                     weights: Optional[np.ndarray] = None,
                     node_w: Optional[np.ndarray] = None) -> np.ndarray:
    """Capacity-bounded async label-propagation refinement of a node
    partition (in C++ — an O(N·rounds) scalar loop). ``weights``: edge
    weights (default 1); ``node_w``: node weights for the capacity
    (default 1). Python fallback is a synchronous vectorized
    approximation (coarser but functional)."""
    part = np.ascontiguousarray(part, np.int32).copy()
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    if weights is not None:
        weights = np.ascontiguousarray(weights, np.float32)
    if node_w is not None:
        node_w = np.ascontiguousarray(node_w, np.int32)
    lib = _load()
    if lib is not None:
        lib.gg_partition_refine(
            len(part), n_parts, cap, _p(indptr, ctypes.c_int32),
            _p(indices, ctypes.c_int32),
            _p(weights, ctypes.c_float) if weights is not None else None,
            _p(node_w, ctypes.c_int32) if node_w is not None else None,
            _p(part, ctypes.c_int32), rounds, seed)
        return part
    import scipy.sparse as sp
    n = len(part)
    w = (weights if weights is not None
         else np.ones(len(indices), np.float32))
    nw = (node_w if node_w is not None else np.ones(n, np.int64))
    a = sp.csr_matrix((w, indices, indptr), shape=(n, n))
    for _ in range(rounds):
        onehot = sp.csr_matrix(
            (np.ones(n, np.float32), (np.arange(n), part)),
            shape=(n, n_parts))
        votes = np.asarray((a @ onehot).todense())
        best = votes.argmax(axis=1).astype(np.int32)
        gain = votes[np.arange(n), best] - votes[np.arange(n), part]
        move = np.flatnonzero((best != part) & (gain > 0))
        # honor capacity greedily, best gains first
        sizes = np.bincount(part, weights=nw, minlength=n_parts)
        for i in move[np.argsort(-gain[move])]:
            q = best[i]
            if sizes[q] + nw[i] <= cap:
                sizes[part[i]] -= nw[i]
                sizes[q] += nw[i]
                part[i] = q
        if len(move) == 0:
            break
    return part


def hem_match(indptr: np.ndarray, indices: np.ndarray,
              weights: Optional[np.ndarray] = None,
              seed: int = 1) -> np.ndarray:
    """Heavy-edge matching for multilevel coarsening: partner[i] = the
    matched peer of i (i itself when unmatched)."""
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    if weights is not None:
        weights = np.ascontiguousarray(weights, np.float32)
    n = len(indptr) - 1
    partner = np.empty(n, np.int32)
    lib = _load()
    if lib is not None:
        lib.gg_hem_match(
            n, _p(indptr, ctypes.c_int32), _p(indices, ctypes.c_int32),
            _p(weights, ctypes.c_float) if weights is not None else None,
            seed, _p(partner, ctypes.c_int32))
        return partner
    # python fallback: sequential greedy matching
    rng = np.random.default_rng(seed)
    partner[:] = -1
    w = (weights if weights is not None
         else np.ones(len(indices), np.float32))
    for i in rng.permutation(n):
        if partner[i] != -1:
            continue
        sl = slice(indptr[i], indptr[i + 1])
        nbrs, ws = indices[sl], w[sl]
        free = (partner[nbrs] == -1) & (nbrs != i)
        if free.any():
            j = nbrs[free][int(np.argmax(ws[free]))]
            partner[i], partner[j] = j, i
        else:
            partner[i] = i
    return partner
