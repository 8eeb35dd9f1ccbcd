"""Domain-quota mega-domain smoke: the two-phase salted rank vs the
naive single-window rank on a planted skewed corpus.

Corpus: one mega-domain with N_MEGA rows (a 100 TB crawl's top domain)
plus FAN small domains of 100 rows each. The naive
``row_number over partitionBy(domain)`` funnels every mega-domain row
through ONE task's sort; the two-phase rank spreads it over
DQ_SALT buckets. This smoke checks:

- exactness: two-phase result == naive result (set equality on
  (doc_id, domain, quota_rank)) — the per-bucket top-k union argument,
  verified at scale, not just at the 3k-row pytest;
- structure: every domain keeps min(k, n) rows, ranks are 1..k;
- the PER-TASK BOUND, physically: max rows landing in any shuffle
  partition under the two-phase keying vs the naive keying.

Honest wall finding (measured 5M and 50M): on single-node local the
two variants are a WASH (two-phase 28.9 s vs naive 24.0 s at 50M) —
total CPU is conserved and one shared memory pool hides the
straggler. The benefit is the per-task bound: the naive window puts
ALL N_MEGA rows in one task (one core sorts 50M rows while 31 idle —
on a 1000-core cluster, 999 idle), the salted phase-1 caps any task
at ~N_MEGA/DQ_SALT. That bound is what this smoke pins.

Usage: python scripts/exp_domain_quota_scale.py [n_mega]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from matrixinversion_spark.pipeline.curation import domain_quota
from matrixinversion_spark.session import get_spark

N_MEGA = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
FAN, SMALL, K = 200, 100, 10

spark = get_spark("domain-quota-scale")

mega = spark.range(N_MEGA).select(
    F.col("id").alias("doc_id"), F.lit("megadomain.com").alias("source")
)
small = spark.range(N_MEGA, N_MEGA + FAN * SMALL).select(
    F.col("id").alias("doc_id"),
    F.concat(
        F.lit("site"), F.pmod(F.col("id"), FAN), F.lit(".com")
    ).alias("source"),
)
docs = mega.unionAll(small).repartition(32).persist()
docs.count()

t0 = time.time()
got = {
    (r["doc_id"], r["source"], r["quota_rank"])
    for r in domain_quota(docs, k=K).collect()
}
wall_two = time.time() - t0

t0 = time.time()
w = Window.partitionBy("source").orderBy(
    F.md5(F.col("doc_id").cast("string")), "doc_id"
)
want = {
    (r["doc_id"], r["source"], r["quota_rank"])
    for r in docs.withColumn(
        "quota_rank", F.row_number().over(w).cast("bigint")
    )
    .filter(F.col("quota_rank") <= K)
    .collect()
}
wall_naive = time.time() - t0

assert got == want, (
    f"two-phase != naive: {len(got - want)} extra, {len(want - got)} missing"
)
doms = {}
for _, s, r in got:
    doms.setdefault(s, []).append(r)
assert len(doms) == FAN + 1
for s, ranks in doms.items():
    assert sorted(ranks) == list(range(1, K + 1)), s

# the transferable claim: max rows any one task must sort, under the
# same hash partitioning each variant's window exchange uses
from matrixinversion_spark.pipeline.curation import DQ_SALT

two_keyed = docs.withColumn(
    "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(DQ_SALT))
).repartition(32, "source", "_salt")
naive_keyed = docs.repartition(32, "source")


def max_task_rows(df) -> int:
    return (
        df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )

max_two = max_task_rows(two_keyed)
max_naive = max_task_rows(naive_keyed)
assert max_naive >= N_MEGA          # the whole mega-domain in one task
assert max_two <= N_MEGA // DQ_SALT * 3  # salted: bounded per bucket
                                         # (x3 slack: hash collisions
                                         # of buckets onto partitions)

print(
    f"domain_quota scale: {N_MEGA} mega + {FAN}x{SMALL} small, k={K} — "
    f"two-phase {wall_two:.1f}s vs naive single-window {wall_naive:.1f}s "
    f"(local wall is a wash; the pinned claim is the task bound: "
    f"max task rows {max_two} vs {max_naive}), "
    f"results set-identical ok=True"
)
spark.stop()
