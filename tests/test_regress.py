"""Grouped-TSQR OLS differential vs numpy lstsq (relational/regress.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from matrixinversion_spark.relational.regress import ols_fit


@pytest.fixture(scope="module")
def fit_input(spark):
    rng = np.random.default_rng(99)
    rows = []
    for g, (a0, a1, a2) in enumerate([(3.0, 2.0, -1.0), (-5.0, 0.5, 4.0)]):
        x1 = rng.random(400) * 10
        x2 = rng.standard_normal(400)
        y = a0 + a1 * x1 + a2 * x2 + rng.standard_normal(400) * 0.1
        rows.extend(
            {"grp": f"g{g}", "x1": float(a), "x2": float(b), "y": float(c)}
            for a, b, c in zip(x1, x2, y)
        )
    pdf = pd.DataFrame(rows)
    # several partitions so the tree reduction actually reduces
    return spark.createDataFrame(pdf).repartition(8), pdf


def test_ols_matches_numpy_per_group(spark, fit_input):
    df, pdf = fit_input
    out = {
        r["grp"]: r
        for r in ols_fit(
            df, y_col="y", x_cols=["x1", "x2"], group_cols=["grp"]
        ).collect()
    }
    assert set(out) == {"g0", "g1"}
    for g in ("g0", "g1"):
        sub = pdf[pdf["grp"] == g]
        x = np.column_stack(
            [np.ones(len(sub)), sub["x1"].to_numpy(), sub["x2"].to_numpy()]
        )
        y = sub["y"].to_numpy()
        beta, *_ = np.linalg.lstsq(x, y, rcond=None)
        got = np.asarray(out[g]["coef"])
        assert out[g]["n"] == len(sub)
        assert np.allclose(got, beta, atol=1e-8)
        resid = y - x @ beta
        tss = float(np.sum((y - y.mean()) ** 2))
        r2 = 1.0 - float(resid @ resid) / tss
        assert abs(out[g]["r2"] - r2) < 1e-10


def test_ols_requires_groups(spark, fit_input):
    df, _ = fit_input
    with pytest.raises(ValueError, match="group_cols"):
        ols_fit(df, y_col="y", x_cols=["x1"], group_cols=[])


def test_ols_global_fit_via_constant_group(spark, fit_input):
    df, pdf = fit_input
    row = ols_fit(
        df.withColumn("all", F.lit(1)),
        y_col="y", x_cols=["x1"], group_cols=["all"],
    ).collect()[0]
    x = np.column_stack([np.ones(len(pdf)), pdf["x1"].to_numpy()])
    beta, *_ = np.linalg.lstsq(x, pdf["y"].to_numpy(), rcond=None)
    assert row["n"] == len(pdf)
    assert np.allclose(np.asarray(row["coef"]), beta, atol=1e-8)


def test_ridge_shrinks_toward_zero(spark, fit_input):
    df, pdf = fit_input
    sub = pdf[pdf["grp"] == "g0"]
    x = np.column_stack([np.ones(len(sub)), sub["x1"].to_numpy(),
                         sub["x2"].to_numpy()])
    y = sub["y"].to_numpy()
    lam = 50.0
    # closed-form ridge with unpenalized intercept
    pen = np.diag([0.0, lam, lam])
    beta_ridge = np.linalg.solve(x.T @ x + pen, x.T @ y)
    row = {
        r["grp"]: r
        for r in ols_fit(df, y_col="y", x_cols=["x1", "x2"],
                         group_cols=["grp"], l2=lam).collect()
    }["g0"]
    assert np.allclose(np.asarray(row["coef"]), beta_ridge, atol=1e-8)
    # r2 is the UNPENALIZED residual of the shrunken coefficients
    resid = y - x @ beta_ridge
    tss = float(np.sum((y - y.mean()) ** 2))
    assert abs(row["r2"] - (1.0 - resid @ resid / tss)) < 1e-9
    # slopes strictly shrunk vs OLS
    beta_ols = np.linalg.lstsq(x, y, rcond=None)[0]
    assert np.all(np.abs(np.asarray(row["coef"])[1:]) <
                  np.abs(beta_ols[1:]) + 1e-12)


def test_logistic_matches_numpy_irls(spark):
    from matrixinversion_spark.relational.regress import logistic_fit

    rng = np.random.default_rng(3)
    n = 2000
    x1 = rng.standard_normal(n)
    x2 = rng.standard_normal(n)
    true_beta = np.array([0.5, -1.2, 2.0])
    eta = true_beta[0] + true_beta[1] * x1 + true_beta[2] * x2
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
    pdf = pd.DataFrame({"x1": x1, "x2": x2, "y": y})
    df = spark.createDataFrame(pdf).repartition(8)

    beta = logistic_fit(df, y_col="y", x_cols=["x1", "x2"])

    # driver-side Newton on the same data
    X = np.column_stack([np.ones(n), x1, x2])
    b = np.zeros(3)
    for _ in range(25):
        p = 1.0 / (1.0 + np.exp(-X @ b))
        g = X.T @ (y - p)
        H = X.T @ (X * (p * (1 - p))[:, None])
        step = np.linalg.solve(H, g)
        b = b + step
        if np.max(np.abs(step)) < 1e-12:
            break
    assert np.allclose(beta, b, atol=1e-8)
    # sanity: recovered parameters near the generating ones
    assert np.max(np.abs(beta - true_beta)) < 0.3
