"""Distributed least-squares regression via grouped TSQR.

``ols_fit`` fits one ordinary-least-squares model PER GROUP over a
plain DataFrame — the segmented-regression primitive (per-country
price curves, per-experiment trend fits) that single-model libraries
make awkward. The numerics are the augmented-TSQR trick: QR-factor
``[1 | X | y]`` blockwise, reduce the tiny R factors per group, and
read every fit statistic straight off the final R —

- ``R[0,0]² = n`` (intercept column of ones),
- ``β`` solves the leading (p+1)×(p+1) triangle against R's y column,
- ``SSE = R[last,last]²`` (the y column's residual after projection),
- ``TSS = Σ R[1:,last]²`` (y's energy below the mean row),

so r² = 1 − SSE/TSS needs no second data pass. Two shuffles total:
(group, partition) → local R, then group → final R; the bytes moved
per group are O(partitions · (p+2)²) — independent of row count,
which is what makes this the 100 TB plan (a naive
collect-and-sklearn "fit" moves the data; this moves (p+2)² doubles).

Reference provenance: the reference has no relational or statistical
surface (SURVEY.md §2.2); the factorization core mirrors
matrix/qr.py's TSQR (Demmel et al. 2012) applied per group key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


def ols_fit(df: DataFrame, y_col: str, x_cols: list[str],
            group_cols: list[str], l2: float = 0.0) -> DataFrame:
    """Per-group OLS / ridge of ``y ~ 1 + X``. Returns one row per
    group: ``group_cols…, n BIGINT, coef ARRAY<DOUBLE> (intercept
    first), r2 DOUBLE``. Requires ≥ p+2 rows and full-rank design per
    group.

    ``l2 > 0`` adds Tikhonov regularization on the SLOPES (the
    intercept stays unpenalized, the standard convention): the final
    per-group QR simply absorbs ``p`` extra rows ``√λ·eⱼ`` — zero
    additional data movement, the penalty lives entirely in the
    (p+2)×(p+2) reduction. ``r2`` always reports the UNPENALIZED
    residual of the (shrunken) coefficients, so it stays comparable
    across λ values (the λ‖β‖² share of the augmented residual is
    subtracted back out).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty (use a literal "
                         "constant column for a global fit)")
    p = len(x_cols)
    m = p + 2  # [1 | X | y]
    gfields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*group_cols).schema.fields
    )
    part_schema = f"{gfields}, n bigint, rdata array<double>"
    out_schema = f"{gfields}, n bigint, coef array<double>, r2 double"

    feat = df.select(
        *group_cols, *x_cols, y_col,
        F.spark_partition_id().alias("_pid"),
    )

    def local_r(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_cols].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        block = np.column_stack([np.ones(len(pdf)), x, y])
        r = np.linalg.qr(block, mode="r")  # (min(n,m) × m)
        keys = [pdf[g].iloc[0] for g in group_cols]
        return pd.DataFrame(
            [(*keys, len(pdf), r.ravel())],
            columns=[*group_cols, "n", "rdata"],
        )

    def final_fit(pdf: pd.DataFrame) -> pd.DataFrame:
        stacked = np.vstack(
            [np.asarray(d, dtype=np.float64).reshape(-1, m)
             for d in pdf["rdata"]]
        )
        if l2 > 0.0:
            # √λ·eⱼ rows for each slope column — augmented least
            # squares IS ridge; intercept (col 0) and y (col p+1)
            # stay untouched
            pen = np.zeros((p, m))
            pen[np.arange(p), np.arange(1, p + 1)] = np.sqrt(l2)
            stacked = np.vstack([stacked, pen])
        r = np.linalg.qr(stacked, mode="r")
        beta = np.linalg.solve(r[: p + 1, : p + 1], r[: p + 1, p + 1])
        # augmented residual = SSE + λ‖β_slopes‖²; report true SSE
        sse = float(r[p + 1, p + 1] ** 2) - l2 * float(
            beta[1:] @ beta[1:]
        )
        tss = float(np.sum(r[1:, p + 1] ** 2))
        keys = [pdf[g].iloc[0] for g in group_cols]
        return pd.DataFrame(
            [(*keys, int(pdf["n"].sum()), beta, 1.0 - sse / tss)],
            columns=[*group_cols, "n", "coef", "r2"],
        )

    partials = feat.groupBy(*group_cols, "_pid").applyInPandas(
        local_r, part_schema
    )
    return partials.groupBy(*group_cols).applyInPandas(
        final_fit, out_schema
    )


@query(
    "q_ols_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)                                 AS n,
           round(regr_intercept(l_extendedprice, l_quantity), 2)    AS intercept,
           round(regr_slope(l_extendedprice, l_quantity), 3)        AS slope,
           round(regr_r2(l_extendedprice, l_quantity), 6)           AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented linear regression (price ~ quantity per returnflag)
    fitted by the grouped-TSQR operator and cross-checked against
    DuckDB's native ``regr_slope/regr_intercept/regr_r2`` — a true
    cross-engine differential for the distributed least-squares path
    (rounding: slope ~1e3 with ~1e-9 cross-engine fp spread, so 3
    decimals is ≥1e5× margin; r2 spread ~1e-12 vs 1e-6 granularity).
    """
    li = read_table(spark, sf_dir, "lineitem")
    fit = ols_fit(
        li, y_col="l_extendedprice", x_cols=["l_quantity"],
        group_cols=["l_returnflag"],
    )
    return fit.select(
        "l_returnflag",
        "n",
        F.round(F.col("coef")[0], 2).alias("intercept"),
        F.round(F.col("coef")[1], 3).alias("slope"),
        F.round("r2", 6).alias("r2"),
    )


@query(
    "q_ridge_regression",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT)               AS n,
               count(*) * covar_pop(l_quantity, l_extendedprice) AS sxy,
               count(*) * var_pop(l_quantity)         AS sxx,
               avg(l_extendedprice)                   AS ybar,
               avg(l_quantity)                        AS xbar
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(ybar - sxy / (sxx + 1000.0) * xbar, 2) AS intercept,
           round(sxy / (sxx + 1000.0), 4)               AS slope
    FROM s
    """,
)
def q_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge (λ=1000, slope-penalized, intercept free) per
    returnflag, via the grouped-TSQR path with the √λ-row
    augmentation — cross-checked against the CLOSED FORM
    ``slope = Sxy/(Sxx+λ)``, ``intercept = ȳ − slope·x̄`` that holds
    for single-feature ridge, computed by DuckDB from its native
    covariance/variance aggregates. λ is large enough (Sxx ≈ 1e6) to
    shrink the slope visibly, so the row actually distinguishes ridge
    from OLS at the rounded digits."""
    li = read_table(spark, sf_dir, "lineitem")
    fit = ols_fit(
        li, y_col="l_extendedprice", x_cols=["l_quantity"],
        group_cols=["l_returnflag"], l2=1000.0,
    )
    return fit.select(
        "l_returnflag",
        "n",
        F.round(F.col("coef")[0], 2).alias("intercept"),
        F.round(F.col("coef")[1], 4).alias("slope"),
    )


def logistic_fit(df: DataFrame, y_col: str, x_cols: list[str],
                 max_iter: int = 12, tol: float = 1e-10) -> np.ndarray:
    """Distributed logistic regression (y ∈ {0,1} ~ 1 + X) by exact
    Newton-Raphson. Each iteration is ONE Spark job: the gradient
    Xᵀ(y−p̂) and Hessian XᵀWX (W = p̂(1−p̂)) are sums of row-local JVM
    expressions — no Python UDF touches data, and the driver receives
    exactly (p+1) + (p+1)² doubles per step, independent of row
    count. β updates driver-side (a (p+1)×(p+1) solve).

    Scale, 100 TB honest: this is the textbook full-batch IRLS layout
    every distributed ML system uses (Spark MLlib's LogisticRegression
    aggregates the same sufficient statistics); convergence is
    quadratic near the optimum, so ~8 iterations ≡ ~8 scans. The scan
    is a pure map-aggregate — no shuffle wider than the partial-agg
    combine. Requires a non-separable design (separable data sends
    ‖β‖ → ∞, as in any unregularized logistic fit).
    """
    p = len(x_cols)
    names = ["__one"] + x_cols
    feat = df.select(
        F.lit(1.0).alias("__one"),
        *[F.col(c).cast("double").alias(c) for c in x_cols],
        F.col(y_col).cast("double").alias("__y"),
    ).persist()
    beta = np.zeros(p + 1)
    try:
        for _ in range(max_iter):
            eta = sum(
                (F.col(c) * float(b) for c, b in zip(names, beta)),
                start=F.lit(0.0),
            )
            prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            resid = F.col("__y") - prob
            w = prob * (F.lit(1.0) - prob)
            aggs = [
                F.sum(F.col(c) * resid).alias(f"g{i}")
                for i, c in enumerate(names)
            ]
            aggs += [
                F.sum(F.col(ci) * F.col(cj) * w).alias(f"h{i}_{j}")
                for i, ci in enumerate(names)
                for j, cj in enumerate(names)
                if i <= j
            ]
            row = feat.agg(*aggs).collect()[0]
            grad = np.array([row[f"g{i}"] for i in range(p + 1)])
            hess = np.empty((p + 1, p + 1))
            for i in range(p + 1):
                for j in range(i, p + 1):
                    hess[i, j] = hess[j, i] = row[f"h{i}_{j}"]
            step = np.linalg.solve(hess, grad)
            beta = beta + step
            if np.max(np.abs(step)) < tol:
                break
    finally:
        feat.unpersist()
    return beta


@query(
    "q_logistic_regression",
    oracle=(
        "SELECT CAST(3 AS BIGINT) AS n_coef, 0.0 AS grad_inf_norm_r6, "
        "TRUE AS converged"
    ),
)
def q_logistic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic fit of P(returnflag = 'R') on scaled
    quantity + discount over lineitem. No SQL engine can fit a
    logistic model, but the OPTIMALITY CONDITION is hash-checkable
    (la_lu_residual pattern): at the MLE the score Xᵀ(y−p̂) is
    exactly zero, so the fitted model's gradient ∞-norm — computed
    by one more distributed pass — rounds to 0.0 at 6 decimals and
    ``converged`` pins the tolerance. Pytest cross-checks the
    coefficients against driver-side numpy IRLS on the same data."""
    li = read_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") / 25.0).alias("x1"),
        (F.col("l_discount") * 10.0).alias("x2"),
        (F.col("l_returnflag") == "R").cast("double").alias("y"),
    )
    beta = logistic_fit(li, y_col="y", x_cols=["x1", "x2"])
    eta = (
        F.lit(float(beta[0]))
        + F.col("x1") * float(beta[1])
        + F.col("x2") * float(beta[2])
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    resid = F.col("y") - prob
    row = li.agg(
        F.abs(F.sum(resid)).alias("g0"),
        F.abs(F.sum(F.col("x1") * resid)).alias("g1"),
        F.abs(F.sum(F.col("x2") * resid)).alias("g2"),
    ).collect()[0]
    gnorm = max(row["g0"], row["g1"], row["g2"])
    return spark.createDataFrame(
        [(3, float(round(gnorm, 6)), bool(gnorm < 1e-6))],
        "n_coef bigint, grad_inf_norm_r6 double, converged boolean",
    )
