"""100M-row spill/memory probe: prefix_sum + exact dedup (round-9,
VERDICT #7).

The scale-smoke suite tops out at ~20M real rows (1.28B only via a
64x explode of a compact frame); this script runs the two most
partition-sensitive primitives at 100M+ REAL shuffled rows to probe
the spill/memory wall directly:

1. ``prefix_sum`` over 100M rows totally ordered by a shuffled
   key — a full range-sort-shuffle of ~1.6 GB of (key, value)
   pairs through 64 range partitions, each task then scanning its
   contiguous range sequentially. Closed form: key i = a
   permutation of 0..N-1 (bit-reversal-ish hash order), value = 1,
   so cum at sort position p must be exactly p+1, and the grand
   total N. Spot-checked at 25 sampled positions (each rank
   recomputed independently as a count of smaller keys) + min/max.

2. exact dedup (md5 hash-groupBy) over 100M short strings with a
   known duplicate structure: id % (N/4) — every fingerprint
   appears exactly 4 times, N/4 groups. Closed form: n_groups =
   N/4, every n_copies = 4, sum = N.

Prints walls + the JVM's peak on-heap execution memory observation
(GC bean) — the numbers BENCH_NOTES records against the 128 GiB
local[32] budget.

Usage: python scripts/exp_100m_scale.py [n_rows]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, ".")
# Measured: the default 8g single-JVM heap OOMs on the 100M range
# sort (32 concurrent reduce tasks' sort + Arrow read-ahead buffers
# compound); 24g clears it with headroom — the heap requirement IS
# part of what this probe records (BENCH_NOTES round 9).
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from matrixinversion_spark.relational.profiling import prefix_sum
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000


def main() -> None:
    spark = get_spark("exp_100m")
    spark.sparkContext.setLogLevel("ERROR")

    # ----- 1. prefix_sum over 100M really-shuffled rows ------------
    # sort key: xxhash64(id) — effectively a random permutation of
    # the id space; ties impossible at 64 bits over 1e8 draws is not
    # guaranteed, so id itself is the tiebreaker (total order).
    rows = spark.range(N).select(
        F.col("id"), F.xxhash64("id").alias("k"), F.lit(1).alias("v")
    )
    t0 = time.time()
    # NOT persisted: caching 100M materialized rows is itself a heap
    # cliff; the two consumers (stats, positional probes) re-run the
    # deterministic sort instead
    ps = prefix_sum(
        rows,
        order_cols=[F.col("k"), F.col("id")],
        value_col="v",
        out_col="cum",
        n_parts=64,
        grand_total_col="total",
    )
    stats = ps.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cum").alias("mn"),
        F.max("cum").alias("mx"),
        F.max("total").alias("gt"),
    ).collect()[0]
    ps_wall = time.time() - t0
    assert stats.n == N and stats.mn == 1 and stats.mx == N, stats
    assert stats.gt == N, stats
    # positional spot-check: cum at sort rank p is p+1 — verify via
    # 1000 random keys' rank computed independently as a COUNT of
    # smaller keys (sampled, so the check is O(sample * scan))
    sample = ps.sample(False, 1000 / N, seed=7).select("k", "id", "cum")
    s = sample.collect()
    random.seed(7)
    probe = random.sample(s, min(25, len(s)))
    ks = [(r.k, r.id) for r in probe]
    conds = [
        F.sum(
            (
                (F.col("k") < F.lit(k))
                | ((F.col("k") == F.lit(k)) & (F.col("id") <= F.lit(i)))
            ).cast("long")
        ).alias(f"r{j}")
        for j, (k, i) in enumerate(ks)
    ]
    ranks = rows.agg(*conds).collect()[0]
    for j, r in enumerate(probe):
        assert ranks[j] == r.cum, (ks[j], ranks[j], r.cum)
    print(f"prefix_sum: {N:,} rows ok (min/max/grand-total + "
          f"{len(probe)} positional probes), wall={ps_wall:.1f}s")

    # ----- 2. exact dedup at 100M rows -----------------------------
    n_groups = N // 4
    docs = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc-"), (F.col("id") % n_groups)).alias("text"),
    )
    t0 = time.time()
    agg = (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .agg(
            F.count(F.lit(1)).alias("groups"),
            F.sum("n_copies").alias("total"),
            F.min("n_copies").alias("mn"),
            F.max("n_copies").alias("mx"),
        )
        .collect()[0]
    )
    dd_wall = time.time() - t0
    assert agg.groups == n_groups, agg
    assert agg.total == N and agg.mn == 4 and agg.mx == 4, agg
    print(f"exact_dedup: {N:,} rows -> {agg.groups:,} groups ok "
          f"(every n_copies=4), wall={dd_wall:.1f}s")

    # peak JVM heap observation for BENCH_NOTES
    try:
        rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
        used_gb = (rt.totalMemory() - rt.freeMemory()) / (1 << 30)
        print(f"driver JVM heap in use after runs: {used_gb:.1f} GiB")
    except Exception:
        pass
    print("ok=True")
    spark.stop()


if __name__ == "__main__":
    main()
