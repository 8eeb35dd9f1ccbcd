"""Same-session A/B: per-round _fresh_stats_barrier for the
q_pagerank / q_label_propagation loops (the q_bfs_shortest_path
pattern). Asserts row equality before timing."""
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

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("exp_r13_graph_ab")
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
    return time.time() - t0, _jobs() - j0


def rows(fn):
    spark.catalog.clearCache()
    return sorted(map(tuple, fn().collect()))


qs["q1_pricing_summary"](spark, SF).write.format("noop").mode(
    "overwrite").save()


def pagerank_new():
    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders")
    c = read_table(spark, SF, "customer")
    s = read_table(spark, SF, "supplier")
    n = read_table(spark, SF, "nation")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    edges = _fresh_stats_barrier(edges)
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    nodes = n.select(F.col("n_nationkey").cast("bigint").alias("node"))
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    ranks = nodes.crossJoin(nn).select(
        "node", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(3):
        contrib = (
            edges.join(outw, "src")
            .join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("ow")).alias("csum"))
        )
        ranks = _fresh_stats_barrier(
            nodes.crossJoin(nn)
            .join(contrib, "node", "left")
            .select(
                "node",
                "n_nodes",
                (
                    F.lit(0.15) / F.col("n_nodes")
                    + F.lit(0.85) * F.coalesce("csum", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 6).alias("pagerank_r6"))


def lpa_new():
    from matrixinversion_spark.relational.mining import (
        _sparsified_trade_edges,
    )

    n = read_table(spark, SF, "nation")
    e0 = _sparsified_trade_edges(spark, SF)
    ue = _fresh_stats_barrier(
        e0.select(F.col("src").alias("a"), F.col("dst").alias("b"), "w")
        .unionAll(
            e0.select(
                F.col("dst").alias("a"), F.col("src").alias("b"), "w"
            )
        )
        .groupBy("a", "b")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    nodes = n.select(F.col("n_nationkey").cast("bigint").alias("node"))
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(3):
        cand = (
            ue.join(
                labels.select(F.col("node").alias("b"), "label"), "b"
            )
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.sum("w").alias("lw"))
        )
        pick = (
            cand.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("node").orderBy(
                        F.desc("lw"), F.asc("label")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = _fresh_stats_barrier(
            labels.join(pick, "node", "left").select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
    return labels.select(
        "node", F.col("label").cast("bigint").alias("community")
    )


PAIRS = [
    ("q_pagerank", lambda: qs["q_pagerank"](spark, SF), pagerank_new),
    ("q_label_propagation",
     lambda: qs["q_label_propagation"](spark, SF), lpa_new),
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
