"""In-engine logistic-regression training (operators/clustering.py
logreg_fit): learns the right sign on a separable toy set, stays
deterministic across runs, and matches a numpy replay exactly."""

import numpy as np

from arrow_udf_spark.operators.clustering import logreg_fit


def _toy(spark):
    # y == 1 exactly when x1 is large: the fit must put positive weight
    # on x1 and near-zero on the noise feature x2
    rows = [
        (1.0, 0.9 + 0.01 * i, 0.5) for i in range(10)
    ] + [
        (0.0, 0.1 + 0.01 * i, 0.5) for i in range(10)
    ]
    return spark.createDataFrame(rows, "y double, x1 double, x2 double")


def test_learns_separable_signal(spark):
    w = dict(logreg_fit(_toy(spark), ["x1", "x2"], "y", iters=5, lr=2.0))
    assert w["x1"] > 0.5  # discriminative feature gets positive weight


def test_deterministic_and_matches_numpy(spark):
    df = _toy(spark)
    a = logreg_fit(df, ["x1", "x2"], "y", iters=3, lr=1.0)
    b = logreg_fit(df, ["x1", "x2"], "y", iters=3, lr=1.0)
    assert a == b
    # numpy replay of the identical trajectory
    X = np.array(
        [[1.0, 0.9 + 0.01 * i, 0.5] for i in range(10)]
        + [[1.0, 0.1 + 0.01 * i, 0.5] for i in range(10)]
    )
    y = np.array([1.0] * 10 + [0.0] * 10)
    w = np.zeros(3)
    for _ in range(3):
        z = X @ w
        w = w + (X.T @ (y - 1.0 / (1.0 + np.exp(-z)))) / len(y)
    got = np.array([v for _, v in a])
    assert np.allclose(got, w, atol=1e-9)
