"""Distributed global row numbering scale smoke, closed form.

Runs `assign_global_ids` over 50M rows of a hash-shuffled permutation
and checks the three invariants that define a contiguous order-aligned
numbering without collecting the data:

- sum(rid) == N(N+1)/2 and max(rid) == N  (contiguity: any gap or
  duplicate breaks the pair of checks together);
- rid == k  (order alignment: the sort key IS a permutation of 1..N,
  so a correct numbering reproduces it exactly; checked as
  count(rid != k) == 0);
- integer exactness at widths where the prefix_sum DOUBLE offsets
  would still be fine (2^53) but bigint is the only honest type.

The r5 20M-row prefix_sum smoke caught RangePartitioner's
double-execution boundary drift; this re-exercises that fix on the
row_number variant.

Usage: python scripts/exp_rownum_scale.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

# 50M cached rows + a 32-thread range sort sit on the default-8g
# execution-memory boundary (observed flaky UNABLE_TO_ACQUIRE_MEMORY
# under suite page-cache pressure) — same single-JVM sort-pressure
# class the 100M probe documented; use its knob (prefix_sum
# docstring / README ops notes).
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from pyspark.sql import functions as F

from matrixinversion_spark.relational.profiling import assign_global_ids
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000

spark = get_spark("rownum-scale")

# k = a hash-shuffled permutation of 1..N (Feistel-free trick: sort
# order of xxhash64 is a uniform permutation; rank it lazily by just
# using k itself as the sort key — the permutation is in the ROW
# layout, not the key).  Rows arrive partition-striped by id, keys
# are scattered.
df = spark.range(1, N + 1).select(
    F.col("id").alias("k"), F.xxhash64("id").alias("noise")
).repartition(64, "noise")

t0 = time.time()
out = assign_global_ids(df, [F.col("k")], n_parts=48)
agg = out.agg(
    F.sum("rid").alias("s"),
    F.max("rid").alias("m"),
    F.sum((F.col("rid") != F.col("k")).cast("long")).alias("misaligned"),
).collect()[0]
wall = time.time() - t0

ok = (
    agg["s"] == N * (N + 1) // 2
    and agg["m"] == N
    and agg["misaligned"] == 0
)
print(
    f"rownum scale: rows={N} sum_ok={agg['s'] == N * (N + 1) // 2} "
    f"max={agg['m']} misaligned={agg['misaligned']} "
    f"wall={wall:.1f}s ok={ok}"
)
spark.stop()
sys.exit(0 if ok else 1)
