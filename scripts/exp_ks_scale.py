"""Multi-column prefix_sum / KS-statistic scale smoke, closed form.

Plants two samples over 10M distinct values with an exactly known
KS distance: sample 1 holds each value of 1..m once; sample 2 holds
each value of 1..m/2 twice. Both have n = m observations, the ECDFs
are F1(x) = x/m and F2(x) = min(2x, m)/m, and the supremum distance
is exactly 0.5 (attained at x = m/2).

This drives the round-7 multi-column ``prefix_sum`` (both running
counts sharing ONE range shuffle) at a width where the r5
RangePartitioner double-execution drift would corrupt offsets —
the single-column variant is smoked by exp_rownum_scale; this is
the multi-column path's own certificate.

Usage: python scripts/exp_ks_scale.py [m]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.relational.profiling import prefix_sum
from matrixinversion_spark.session import get_spark

M = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

spark = get_spark("ks-scale")

# grouped (value, c1, c2) frame, hash-scattered so the range shuffle
# actually has to move everything
g = (
    spark.range(1, M + 1)
    .select(
        F.col("id").alias("value"),
        F.lit(1).cast("bigint").alias("c1"),
        F.when(F.col("id") <= M // 2, 2)
        .otherwise(0)
        .cast("bigint")
        .alias("c2"),
    )
    .repartition(64, "value")
)

t0 = time.time()
cum = prefix_sum(
    g, [F.col("value")], ["c1", "c2"], out_col=["a", "b"], n_parts=48
)
row = cum.agg(
    F.max(F.abs(F.col("a") / M - F.col("b") / M)).alias("d"),
    F.max("a").alias("n1"),
    F.max("b").alias("n2"),
).collect()[0]
wall = time.time() - t0

ok = row["n1"] == M and row["n2"] == M and abs(row["d"] - 0.5) < 1e-12
print(
    f"ks_scale m={M} D={row['d']:.12f} n1={row['n1']} n2={row['n2']} "
    f"wall={wall:.1f}s ok={ok}"
)
spark.stop()
sys.exit(0 if ok else 1)
