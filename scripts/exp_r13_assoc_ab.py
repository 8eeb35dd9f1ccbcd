"""Same-session A/B: q_association_rules with the part-dimension
`item` frame pinned once (it is built TWICE today — i1/i2 are
separate identical full-lineitem countDistinct subtrees under
BroadcastExchange boundaries, where AQE stage reuse does not fire).
Usage: python scripts/exp_r13_assoc_ab.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from matrixinversion_spark.session import get_spark, read_table  # noqa: E402
from matrixinversion_spark.pipeline.curation import (  # noqa: E402
    _fresh_stats_barrier,
)
from matrixinversion_spark.relational.mining import (  # noqa: E402
    q_copurchase_pairs,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("exp_r13_assoc_ab")
spark.sparkContext.setLogLevel("ERROR")
qs = entry_mod.queries()
tracker = spark.sparkContext.statusTracker()


def _jobs() -> int:
    ids = tracker.getJobIdsForGroup(None)
    return max(ids) if ids else -1


def run(fn, label):
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(label)
    j0 = _jobs()
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    return dt, _jobs() - j0


def rows(fn):
    spark.catalog.clearCache()
    return sorted(map(tuple, fn().collect()))


qs["q1_pricing_summary"](spark, SF).write.format("noop").mode(
    "overwrite").save()


def assoc_old():
    return qs["q_association_rules"](spark, SF)


def assoc_new():
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    n_orders = li.select("l_orderkey").distinct().count()
    item = _fresh_stats_barrier(
        li.groupBy(F.col("l_partkey").alias("p")).agg(
            F.countDistinct("l_orderkey").alias("np")
        )
    )
    pair = q_copurchase_pairs(spark, SF).withColumnRenamed(
        "n_orders", "n12"
    )
    i1 = item.select(F.col("p").alias("p1"), F.col("np").alias("np1"))
    i2 = item.select(F.col("p").alias("p2"), F.col("np").alias("np2"))
    return (
        pair.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .select(
            "p1",
            "p2",
            F.col("n12").cast("bigint").alias("n12"),
            F.round(F.col("n12") * 1.0 / F.col("np1"), 6).alias(
                "conf_1_2"
            ),
            F.round(F.col("n12") * 1.0 / F.col("np2"), 6).alias(
                "conf_2_1"
            ),
            F.round(
                (F.col("n12") * 1.0 * F.lit(n_orders))
                / (F.col("np1") * F.col("np2")),
                6,
            ).alias("lift"),
        )
    )


for name, old, new in [("q_association_rules", assoc_old, assoc_new)]:
    ro, rn = rows(old), rows(new)
    same = ro == rn
    print(f"{name}: rows_equal={same} n={len(ro)}", flush=True)
    if not same:
        print("  MISMATCH — skipping timing")
        continue
    olds, news = [], []
    for i in range(3):
        t, j = run(old, f"{name} old#{i}")
        olds.append((round(t, 3), j))
        t, j = run(new, f"{name} new#{i}")
        news.append((round(t, 3), j))
    print(f"  old: {olds}  min={min(t for t, _ in olds)}")
    print(f"  new: {news}  min={min(t for t, _ in news)}", flush=True)

spark.stop()
