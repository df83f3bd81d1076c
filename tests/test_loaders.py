"""Loader routing: real-file routes must be reachable, fallbacks loud."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from ggad_tpu.datasets.loaders import (
    load_dataset,
    load_dgraphfin,
    load_dgraphfin_dataset,
)


@pytest.fixture
def tiny_npz_dir(tmp_path):
    """A dgraphfin.npz shaped like the real one (x, y, edge_index)."""
    rng = np.random.default_rng(0)
    n = 400
    x = rng.normal(size=(n, 17)).astype(np.float32)
    # real DGraph labels are 0..3; only y==1 is an anomaly
    y = rng.choice([0, 1, 2, 3], size=n, p=[0.7, 0.1, 0.1, 0.1])
    src = rng.integers(0, n, 1600)
    dst = rng.integers(0, n, 1600)
    keep = src != dst
    ei = np.stack([src[keep], dst[keep]])
    np.savez(tmp_path / "dgraphfin.npz", x=x, y=y, edge_index=ei)
    return tmp_path, x, y, ei


def test_load_dgraphfin_reads_npz(tiny_npz_dir):
    d, x, y, ei = tiny_npz_dir
    adj, feats, labels = load_dgraphfin(data_dir=str(d))
    np.testing.assert_array_equal(feats, x)
    np.testing.assert_array_equal(labels, (y == 1).astype(np.int64))
    # symmetrized + self-loops, binary values (src/utils.py:52-58)
    assert (adj != adj.T).nnz == 0
    assert np.all(adj.diagonal() == 1)
    assert set(np.unique(adj.data)) == {1.0}
    for s, t in ei.T[:20]:
        assert adj[s, t] == 1 and adj[t, s] == 1


def test_load_dataset_routes_dgraphfin_npz(tiny_npz_dir):
    """load_dataset('dgraphfin') must take the real-npz route when the
    file exists (the round-2 routing bug silently trained on synthetic)."""
    d, x, y, _ = tiny_npz_dir
    ds = load_dataset("dgraphfin", data_dir=str(d), seed=0)
    assert ds.name == "dgraphfin"
    assert ds.n_nodes == x.shape[0]
    np.testing.assert_array_equal(ds.features, x)
    np.testing.assert_array_equal(ds.ano_labels, (y == 1).astype(np.int64))
    # GADDataset.adj carries no self-loops (consumers add them)
    assert np.all(ds.adj.diagonal() == 0)
    # the split is populated and consistent
    assert len(ds.idx_train) + len(ds.idx_val) + len(ds.idx_test) \
        == ds.n_nodes
    assert np.all(ds.ano_labels[ds.normal_label_idx] == 0)


def test_load_dataset_fallback_is_loud(tmp_path, capsys):
    ds = load_dataset("dgraphfin", data_dir=str(tmp_path), seed=0,
                      synthetic_scale=0.0002)
    err = capsys.readouterr().err
    assert "[synthetic fallback]" in err
    assert ds.n_nodes > 0


def test_load_dataset_allow_synthetic_false_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="dgraphfin.npz"):
        load_dataset("dgraphfin", data_dir=str(tmp_path),
                     allow_synthetic=False)
    with pytest.raises(FileNotFoundError, match="photo.mat"):
        load_dataset("photo", data_dir=str(tmp_path),
                     allow_synthetic=False)


def test_dgraphfin_dataset_feeds_minibatch_split(tiny_npz_dir):
    """The loaded dataset drives the reference minibatch split + trainer
    wiring end-to-end (src/model_handler.py:150-178 semantics)."""
    from ggad_tpu.datasets.splits import minibatch_split_for

    d, _, _, _ = tiny_npz_dir
    ds = load_dataset("dgraphfin", data_dir=str(d), seed=0)
    idx_train, idx_valid, idx_test, labels, idx_anom = minibatch_split_for(
        "dgraphfin", ds.ano_labels, seed=72)
    assert len(idx_train) > 0 and len(idx_anom) > 0
    assert np.all(labels[idx_anom] == 1)


def test_parity_run_harness(tiny_npz_dir, tmp_path, capsys, monkeypatch):
    """scripts/parity_run.py end-to-end on a tiny real npz + mat:
    runs the pinned presets, refuses synthetic, appends to BASELINE.md."""
    import runpy
    import scipy.io as sio
    import scipy.sparse as sp
    import shutil
    import sys as _sys

    d, _, _, _ = tiny_npz_dir
    # a tiny reference-format photo.mat in the same dir
    rng = np.random.default_rng(1)
    n = 200
    adj = sp.random(n, n, density=0.05, random_state=np.random.RandomState(0),
                    format="csr", dtype=np.float32)
    adj = ((adj + adj.T) > 0).astype(np.float32)
    labels = (rng.random(n) < 0.1).astype(np.float64)
    sio.savemat(d / "photo.mat", {
        "Network": adj, "Attributes": rng.normal(size=(n, 8)),
        "Label": labels.reshape(-1, 1)})

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    baseline = os.path.join(repo, "BASELINE.md")
    backup = str(tmp_path / "BASELINE.md.bak")
    shutil.copy(baseline, backup)
    try:
        monkeypatch.setattr(_sys, "argv", [
            "parity_run.py", "--all", "--data_dir", str(d),
            "--num_epoch", "3", "--dgraph_epochs", "2", "--seeds", "1",
            "--spmm_impl", "xla"])
        with pytest.raises(SystemExit) as exc:
            runpy.run_path(os.path.join(repo, "scripts", "parity_run.py"),
                           run_name="__main__")
        assert exc.value.code == 0
        out = capsys.readouterr().out
        assert '"dataset": "photo"' in out
        assert '"dataset": "dgraphfin"' in out
        with open(baseline) as f:
            txt = f.read()
        assert "Real-dataset parity run" in txt
        assert "| photo | full-batch |" in txt
    finally:
        shutil.copy(backup, baseline)
