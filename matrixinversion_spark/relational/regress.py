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
            group_cols: list[str]) -> DataFrame:
    """Per-group OLS of ``y ~ 1 + X``. Returns one row per group:
    ``group_cols…, n BIGINT, coef ARRAY<DOUBLE> (intercept first),
    r2 DOUBLE``. Requires ≥ p+2 rows and full-rank design per group.
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
        r = np.linalg.qr(stacked, mode="r")
        beta = np.linalg.solve(r[: p + 1, : p + 1], r[: p + 1, p + 1])
        sse = float(r[p + 1, p + 1] ** 2)
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
