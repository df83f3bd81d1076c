import jax.numpy as jnp
import numpy as np
import pytest
import sklearn.metrics as skm

from ggad_tpu.ops.metrics import (
    average_precision,
    confusion,
    f1_scores,
    gmean_from_confusion,
    prob_to_pred,
    roc_auc,
    roc_auc_jnp,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roc_auc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, size=500)
    scores = rng.normal(size=500) + labels * 0.5
    assert roc_auc(labels, scores) == pytest.approx(
        skm.roc_auc_score(labels, scores), abs=1e-10)


def test_roc_auc_with_ties():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 2, size=300)
    scores = rng.integers(0, 5, size=300).astype(float)  # heavy ties
    assert roc_auc(labels, scores) == pytest.approx(
        skm.roc_auc_score(labels, scores), abs=1e-10)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, size=400)
    scores = rng.normal(size=400) + labels * 0.3
    assert average_precision(labels, scores) == pytest.approx(
        skm.average_precision_score(labels, scores), abs=1e-10)


def test_ap_with_ties():
    rng = np.random.default_rng(4)
    labels = rng.integers(0, 2, size=200)
    scores = rng.integers(0, 4, size=200).astype(float)
    assert average_precision(labels, scores) == pytest.approx(
        skm.average_precision_score(labels, scores), abs=1e-10)


def test_f1_and_gmean_match_sklearn():
    rng = np.random.default_rng(5)
    labels = rng.integers(0, 2, size=300)
    probs = rng.random(size=300)
    preds = prob_to_pred(probs, 0.5)
    f1_mac, f1_pos, f1_neg = f1_scores(labels, preds)
    assert f1_mac == pytest.approx(skm.f1_score(labels, preds, average="macro"))
    assert f1_pos == pytest.approx(skm.f1_score(labels, preds, pos_label=1))
    assert f1_neg == pytest.approx(skm.f1_score(labels, preds, pos_label=0))
    conf = confusion(labels, preds)
    np.testing.assert_array_equal(conf, skm.confusion_matrix(labels, preds))
    tn, fp = conf[0]
    fn, tp = conf[1]
    expect_g = np.sqrt((tp / (tp + fn)) * (tn / (tn + fp)))
    assert gmean_from_confusion(conf) == pytest.approx(expect_g)


@pytest.mark.parametrize("seed", [0, 1])
def test_roc_auc_jnp_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, size=256)
    scores = rng.normal(size=256).astype(np.float32) + labels * 0.5
    got = float(roc_auc_jnp(jnp.asarray(labels), jnp.asarray(scores)))
    assert got == pytest.approx(skm.roc_auc_score(labels, scores), abs=1e-5)


def test_roc_auc_jnp_masked():
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 2, size=200)
    scores = rng.normal(size=200).astype(np.float32) + labels
    mask = rng.integers(0, 2, size=200)
    got = float(roc_auc_jnp(jnp.asarray(labels), jnp.asarray(scores),
                            jnp.asarray(mask)))
    keep = mask.astype(bool)
    assert got == pytest.approx(
        skm.roc_auc_score(labels[keep], scores[keep]), abs=1e-5)
