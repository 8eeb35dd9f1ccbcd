"""Same-session A/B probes for the round-13 plan-census candidates
(q_funnel, p_kmv_source_jaccard): their runtime plans recompute a
small derived frame under BroadcastExchange boundaries (where AQE
stage reuse does not fire — the p_dsir_select lesson), so the
variant pins that frame with ``_fresh_stats_barrier``.

Alternates old/new runs inside ONE session (host drift neutralized),
noop sink, cold caches per run; asserts the variant returns the
exact same rows before timing it. Usage:
    python scripts/exp_r13_census_ab.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from matrixinversion_spark.session import get_spark, read_table  # noqa: E402
from matrixinversion_spark.pipeline.curation import (  # noqa: E402
    _fresh_stats_barrier,
)
from matrixinversion_spark.pipeline import corpus  # noqa: E402
from matrixinversion_spark.relational.analytics import _t  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("exp_r13_census_ab")
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


# warm
qs["q1_pricing_summary"](spark, SF).write.format("noop").mode(
    "overwrite").save()

# ---------------------------------------------------------------- variants


def funnel_old():
    return qs["q_funnel"](spark, SF)


def funnel_new():
    # pin v and c (user-cardinality frames, each referenced twice:
    # next stage's join build side + its own count leg)
    e = _t(spark, SF, "events")

    def stage(etype, prev):
        s = e.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(
                prev.select("user_id", F.col("ts").alias("_prev_ts")),
                "user_id",
            ).filter(F.col("ts") > F.col("_prev_ts"))
        return s.groupBy("user_id").agg(F.min("ts").alias("ts"))

    v = _fresh_stats_barrier(stage("view", None))
    c = _fresh_stats_barrier(stage("click", v))
    p = stage("purchase", c)

    def count_stage(name, df):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        ).select("stage", "n_users")

    return (
        count_stage("view", v)
        .unionByName(count_stage("click", c))
        .unionByName(count_stage("purchase", p))
    )


def kmv_old():
    return qs["p_kmv_source_jaccard"](spark, SF)


def kmv_new():
    # pin the k-row-per-source sketch: corpus explode+distinct+bottom-k
    # runs ONCE; srcs/pairs/legs all derive from the pinned frame
    d = read_table(spark, SF, "documents")
    sk = _fresh_stats_barrier(
        corpus._kmv_ranked(d).select("source", "u")
    )
    srcs = sk.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("s1")).join(
        srcs.select(F.col("source").alias("s2")),
        F.col("s1") < F.col("s2"),
    )

    def _leg(side):
        skl = sk.select(F.col("source").alias("sk_src"), F.col("u"))
        return pairs.join(
            skl, F.col("sk_src") == F.col(side), "inner"
        ).select(
            "s1",
            "s2",
            "u",
            (F.col("sk_src") == F.col("s1")).cast("int").alias("i1"),
            (F.col("sk_src") == F.col("s2")).cast("int").alias("i2"),
        )

    e = _leg("s1").unionAll(_leg("s2"))
    g = e.groupBy("s1", "s2", "u").agg(
        F.max("i1").alias("in1"), F.max("i2").alias("in2")
    )
    wp = W.partitionBy("s1", "s2").orderBy(F.col("u").asc())
    r = g.withColumn("rn", F.row_number().over(wp)).where(
        F.col("rn") <= corpus._KMV_K
    )
    return r.groupBy("s1", "s2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union_sketch"),
        F.sum(F.col("in1") * F.col("in2"))
        .cast("bigint")
        .alias("n_both"),
        F.round(
            F.sum(F.col("in1") * F.col("in2")) * 1.0 / F.count(F.lit(1)),
            6,
        ).alias("jaccard_est"),
    )


PAIRS = [
    ("q_funnel", funnel_old, funnel_new),
    ("p_kmv_source_jaccard", kmv_old, kmv_new),
]

for name, old, new in PAIRS:
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
