"""Same-session A/B probes for the round-13 ANN/BFS candidates.

Alternates old/new runs inside ONE session (host drift neutralized),
noop sink, cold caches per run; asserts the variant returns the
exact same rows before timing it. Usage:
    python scripts/exp_r13_ann_ab.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from matrixinversion_spark.session import get_spark  # noqa: E402
from matrixinversion_spark.pipeline.curation import (  # noqa: E402
    _fresh_stats_barrier,
)
import matrixinversion_spark.pipeline.similarity as sim  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("exp_r13_ann_ab")
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
orig_assign = sim.assign_cells


def pinned_assign(n, cent):
    return _fresh_stats_barrier(orig_assign(n, cent))


def semdedup_old():
    sim.assign_cells = orig_assign
    return qs["p_semantic_dedup"](spark, SF)


def semdedup_new():
    sim.assign_cells = pinned_assign
    try:
        return qs["p_semantic_dedup"](spark, SF)
    finally:
        sim.assign_cells = orig_assign


def bfs_old():
    return qs["q_bfs_shortest_path"](spark, SF)


def bfs_new():
    from matrixinversion_spark.relational.mining import (
        _sparsified_trade_edges,
    )

    edges = (
        _sparsified_trade_edges(spark, SF).select("src", "dst").persist()
    )
    dist = spark.createDataFrame([(0, 0)], "node bigint, dist int")
    for k in range(1, 4):
        frontier = dist.filter(F.col("dist") == k - 1).select(
            F.col("node").alias("src")
        )
        reached = (
            edges.join(frontier, "src")
            .select(F.col("dst").alias("node"))
            .withColumn("dist", F.lit(k))
        )
        dist = _fresh_stats_barrier(
            dist.unionByName(reached)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def ivfpq_old():
    return qs["p_ann_ivfpq_topk"](spark, SF)


def ivfpq_new():
    # share ONE pinned arnks (vec_id, cid, arnk) between assign+probes
    from pyspark.sql.window import Window

    n = sim._vectors(spark, SF)
    cent = n.filter(F.col("vec_id") < sim.N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    acos = F.round(
        sim.dot(F.col("e"), F.col("ce")) / (F.col("nrm") * F.col("cn")), 6
    )
    aw = Window.partitionBy("vec_id").orderBy(
        F.desc("acos"), F.asc("cid")
    )
    arnks = _fresh_stats_barrier(
        n.crossJoin(F.broadcast(cent))
        .withColumn("acos", acos)
        .withColumn("arnk", F.row_number().over(aw))
        .select("vec_id", "cid", "arnk")
    )
    assign = arnks.filter(F.col("arnk") == 1).select("vec_id", "cid")
    probes = (
        arnks.filter(
            (F.col("arnk") <= sim.IVFPQ_NPROBE)
            & (F.col("vec_id") < sim.N_QUERIES)
        )
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    sub, cb = sim._pq_parts(n)
    codes = sim._pq_encode(sub, cb).join(assign, "vec_id")
    lut_p = probes.join(
        sim._pq_lut(sub, cb, sim.N_QUERIES), "query_id"
    ).select(
        "query_id", F.col("cid").alias("pcid"),
        F.col("m").alias("pm"), F.col("k").alias("pk"), "ip",
    )
    score = (
        codes.join(
            F.broadcast(lut_p),
            (F.col("cid") == F.col("pcid"))
            & (F.col("m") == F.col("pm"))
            & (F.col("k") == F.col("pk"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("ip"), 6).alias("adc_ip"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_ip"), F.asc("neighbor_id")
    )
    return (
        score.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= sim.TOP_K)
        .select("query_id", "neighbor_id", "adc_ip", "rnk")
    )


PAIRS = [
    ("p_semantic_dedup", semdedup_old, semdedup_new),
    ("q_bfs_shortest_path", bfs_old, bfs_new),
    ("p_ann_ivfpq_topk", ivfpq_old, ivfpq_new),
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
