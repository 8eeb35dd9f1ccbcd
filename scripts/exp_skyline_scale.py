"""Skyline scale smoke: 20M points with a closed-form frontier.

Construction (K = 100_000): the anti-chain diagonal {(a, K-1-a)}
for a in [0, K) is the exact skyline by design; the other ~20M
points are (a, b) with b < K-1-a, each dominated by its diagonal
point (same p, greater d). So the expected output is exactly the K
diagonal pairs — a closed-form oracle at any scale, AND a worst-ish
case for the global phase: a 100k-point frontier survives every
local prune, so the coalesce(1) task really processes
sum-of-local-skylines rows (the documented bound in
mining.skyline_pairs), not a handful.

Records wall + checks in BENCH_NOTES (prefix_sum smoke pattern).

Usage: python scripts/exp_skyline_scale.py [n_rows] [K]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.relational.mining import skyline_pairs
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

spark = get_spark("skyline-scale")

a = F.col("id") % K
# dominated filler: b in [0, K-2-a], pseudo-random via Knuth hash;
# rows with a == K-1 have no room below the diagonal -> clamp to the
# diagonal point itself (a duplicate, which must also survive)
room = F.greatest(F.lit(1), K - 1 - a)
b = (F.col("id") * 2654435761) % room
filler = spark.range(N).select(
    a.cast("double").alias("p"),
    F.when(a == K - 1, F.lit(0)).otherwise(b).cast("bigint").alias("d"),
)
diag = spark.range(K).select(
    (F.col("id")).cast("double").alias("p"),
    (K - 1 - F.col("id")).cast("bigint").alias("d"),
)
pts = filler.unionAll(diag).repartition(64)

t0 = time.time()
sky = skyline_pairs(pts)
got = sky.collect()
wall = time.time() - t0

got_set = {(int(r["p"]), int(r["d"])) for r in got}
want = {(aa, K - 1 - aa) for aa in range(K)}
ok = got_set == want
print(f"rows={N + K} K={K} wall={wall:.1f}s frontier={len(got_set)} ok={ok}")
if not ok:
    extra = list(got_set - want)[:5]
    missing = list(want - got_set)[:5]
    print(f"EXTRA={extra} MISSING={missing}")
    sys.exit(1)
