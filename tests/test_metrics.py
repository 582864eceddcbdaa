import numpy as np

from geossl_tpu.utils import metrics


def test_basic_regression_metrics():
    y = np.array([1.0, 2.0, 3.0, 4.0])
    f = np.array([1.1, 1.9, 3.2, 3.8])
    assert abs(metrics.mae(y, f) - 0.15) < 1e-9
    assert abs(metrics.rmse(y, f) - np.sqrt(np.mean((y - f) ** 2))) < 1e-9
    assert metrics.pearson(y, f) > 0.99
    assert metrics.spearman(y, f) == 1.0


def test_spearman_with_ties():
    y = np.array([1.0, 1.0, 2.0, 3.0])
    f = np.array([0.5, 0.5, 1.5, 9.0])
    assert abs(metrics.spearman(y, f) - 1.0) < 1e-9


def test_roc_auc_known_values():
    labels = np.array([0, 0, 1, 1])
    assert metrics.roc_auc(labels, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert metrics.roc_auc(labels, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert abs(metrics.roc_auc(labels, np.array([0.1, 0.8, 0.2, 0.9])) - 0.75) < 1e-9


def test_pr_auc_perfect():
    labels = np.array([0, 1, 1, 0])
    scores = np.array([0.1, 0.9, 0.8, 0.2])
    assert metrics.pr_auc(labels, scores) == 1.0


def test_roc_pr_match_sklearn_when_available():
    try:
        from sklearn.metrics import average_precision_score, roc_auc_score
    except ImportError:
        return
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, size=200)
    scores = rng.normal(size=200) + labels * 0.7
    np.testing.assert_allclose(
        metrics.roc_auc(labels, scores), roc_auc_score(labels, scores), rtol=1e-9
    )
    np.testing.assert_allclose(
        metrics.pr_auc(labels, scores),
        average_precision_score(labels, scores),
        rtol=1e-9,
    )


def test_pr_auc_tied_scores_order_invariant():
    """Tied scores form one threshold block (sklearn semantics): the value
    must not depend on which tied row comes first (review finding, round 4)."""
    a = metrics.pr_auc(np.array([1, 0]), np.array([0.5, 0.5]))
    b = metrics.pr_auc(np.array([0, 1]), np.array([0.5, 0.5]))
    assert a == b == 0.5
    try:
        from sklearn.metrics import average_precision_score
    except ImportError:
        return
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 2, size=300)
    scores = np.round(rng.normal(size=300) + labels * 0.7, 1)  # many ties
    np.testing.assert_allclose(
        metrics.pr_auc(labels, scores),
        average_precision_score(labels, scores), rtol=1e-9)


def test_concordance_index():
    y = np.array([1.0, 2.0, 3.0])
    f = np.array([1.0, 2.0, 3.0])
    assert metrics.concordance_index(y, f) == 1.0
