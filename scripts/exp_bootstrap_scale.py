"""Poisson-bootstrap scale smoke, closed form.

20M rows drawn as a deterministic linear ramp over [0, 100) (mean
exactly 50·(1 − 1/N) — a closed form, no RNG): the 64-replicate
Poisson bootstrap's 95% CI must bracket the true mean, its width
must match the CLT prediction for a mean of Uniform-like data
(σ/√N·1.96·2, within 3×), and — the scale property — the
aggregation after the 64× expansion must shuffle only R-bounded
partial rows: the smoke asserts the post-explosion exchange carries
R × partitions rows at most, by checking the plan has a partial
hash aggregate BEFORE the exchange (map-side combine), not a raw
1.28B-row shuffle.

Usage: python scripts/exp_bootstrap_scale.py [n_rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.relational.infostats import _BOOT_R, _POIS1_CDF
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000

spark = get_spark("bootstrap-scale")

# deterministic "prices": cents ramp 0.00 .. 99.99 repeating
rows = spark.range(0, N).select(
    F.col("id").alias("k"), (F.col("id") % 10_000).alias("cents")
)
# exact population mean of the ramp in dollars for the ACTUAL N
# (the trailing partial cycle matters when N % 10000 != 0)
_full, _rem = divmod(N, 10_000)
_total_cents = _full * sum(range(10_000)) + sum(range(_rem))
true_mean = _total_cents / N / 100.0

t0 = time.time()
e = rows.select(
    "cents",
    F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
    "k",
)
u = (
    F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("k").cast("string"),
                    F.lit(":"),
                    F.col("r").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    + F.lit(1.0)
) / F.lit(4294967297.0)
w = F.when(u < F.lit(_POIS1_CDF[0]), 0)
for i in range(1, len(_POIS1_CDF)):
    w = w.when(u < F.lit(_POIS1_CDF[i]), i)
w = w.otherwise(9)
b = (
    e.select("r", "cents", w.alias("w"))
    .groupBy("r")
    .agg(
        (
            F.sum(F.col("w") * F.col("cents")) / (F.sum("w") * 100.0)
        ).alias("bm")
    )
)
row = b.agg(
    F.count(F.lit(1)).alias("nr"),
    F.avg("bm").alias("boot_mean"),
    F.percentile("bm", F.lit(0.025)).alias("lo"),
    F.percentile("bm", F.lit(0.975)).alias("hi"),
).collect()[0]
wall = time.time() - t0

# plan property: partial aggregate BEFORE the exchange (map-side
# combine) — without it the shuffle carries N·R rows
plan = b._jdf.queryExecution().executedPlan().toString()
before_exchange = plan.split("Exchange")[-1]  # text BELOW the exchange
partial_below = "partial_" in before_exchange

# CLT width check: sd of Uniform(0,100) ≈ 28.87; CI width ≈
# 2·1.96·sd/√N — tiny at 20M; allow a generous 3× band both ways
import math

pred = 2 * 1.96 * (100.0 / math.sqrt(12.0)) / math.sqrt(N)
width = row["hi"] - row["lo"]
ok = (
    row["nr"] == _BOOT_R
    and row["lo"] <= true_mean <= row["hi"]
    and pred / 3 < width < pred * 3
    and partial_below
)
print(
    f"n={N} replicates={row['nr']} wall={wall:.1f}s "
    f"boot_mean={row['boot_mean']:.4f} true={true_mean:.4f} "
    f"ci=[{row['lo']:.4f},{row['hi']:.4f}] width={width:.5f} "
    f"clt_pred={pred:.5f} partial_below_exchange={partial_below} "
    f"ok={ok}"
)
spark.stop()
sys.exit(0 if ok else 1)
