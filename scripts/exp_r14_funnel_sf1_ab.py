"""q_funnel fact-scale A/B (r14, VERDICT r13 #3).

The funnel's runtime plan scans `events` 12x (stage frames v/c are
each referenced by the next stage's join AND the final count, and the
duplicates sit under BroadcastExchange boundaries where AQE stage
reuse does not fire). A `_fresh_stats_barrier` pin on v and c leaves
<=3 scans but measured WORSE at sf0.1 (0.759 -> 0.925 s — the
checkpoint round-trips cost more than the tiny recompute saves).
This script settles the trade at fact scale: replicate events 100x
(10M rows) with disjoint user/event ids, assert both variants return
identical rows, then time them alternating in one session.

Usage: python scripts/exp_r14_funnel_sf1_ab.py [n_replicas]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from matrixinversion_spark.pipeline.curation import (  # noqa: E402
    _fresh_stats_barrier,
)
from matrixinversion_spark.session import get_spark, read_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
OFFSET = 100_000_000


def build(spark, out_dir: str, replicas: int) -> None:
    rep_col = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
    ev = read_table(spark, SF01, "events")
    rep_ev = ev.withColumn("_rep", rep_col)
    for k in ("event_id", "user_id"):
        rep_ev = rep_ev.withColumn(
            k, F.col(k) + F.col("_rep").cast("long") * OFFSET
        )
    (
        rep_ev.drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/events.parquet")
    )


def funnel(spark, sf_dir: str, pin: bool) -> DataFrame:
    e = read_table(spark, sf_dir, "events")

    def stage(etype: str, prev: DataFrame | None) -> DataFrame:
        s = e.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(
                prev.select("user_id", F.col("ts").alias("_prev_ts")),
                "user_id",
            ).filter(F.col("ts") > F.col("_prev_ts"))
        out = s.groupBy("user_id").agg(F.min("ts").alias("ts"))
        return _fresh_stats_barrier(out) if pin else out

    v = stage("view", None)
    c = stage("click", v)
    p = stage("purchase", c)

    def count_stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        ).select("stage", "n_users")

    return (
        count_stage("view", v)
        .unionByName(count_stage("click", c))
        .unionByName(count_stage("purchase", p))
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("funnel_sf1_ab")
    spark.sparkContext.setLogLevel("ERROR")
    td = tempfile.mkdtemp(prefix="funnel_sf1_")
    t0 = time.time()
    build(spark, td, replicas)
    n = spark.read.parquet(f"{td}/events.parquet").count()
    print(f"built {n} events rows in {time.time() - t0:.1f}s -> {td}",
          flush=True)

    rows_plain = sorted(
        map(tuple, funnel(spark, td, pin=False).collect())
    )
    rows_pin = sorted(map(tuple, funnel(spark, td, pin=True).collect()))
    assert rows_plain == rows_pin, (rows_plain, rows_pin)
    print(f"rows identical: {rows_plain}", flush=True)

    tracker = spark.sparkContext.statusTracker()

    def jid() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    for rep in range(3):
        for label, pin in (("plain", False), ("pinned", True)):
            spark.catalog.clearCache()
            j0 = jid()
            t0 = time.time()
            funnel(spark, td, pin).write.format("noop").mode(
                "overwrite").save()
            print(
                f"rep{rep} {label:7s} wall={time.time() - t0:7.3f}s "
                f"jobs={jid() - j0}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
