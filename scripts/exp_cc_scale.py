"""Connected-components scale smoke: ~1M nodes in ring graphs.

15,000 rings x 64 nodes with hash-shuffled node ids, so ring
neighbours are NOT numerically adjacent — the layout where
pointer-jumping gives no chain shortcut and convergence runs at its
O(D) worst case (unlike the id-ordered 64-chain pytest, which
converges in <=8 rounds). Closed-form oracle: every node's label
must equal the min shuffled id of its ring. This is ALSO the smoke
that exposed the Catalyst sizeInBytes compounding stall (see
curation._fresh_stats_barrier): before the stats reset, per-round
wall QUADRUPLED from round ~12 regardless of data size, with the
driver in BigInteger.multiplyKaratsuba.

Usage: python scripts/exp_cc_scale.py [n_rings] [ring_len]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.pipeline.curation import connected_components
from matrixinversion_spark.session import get_spark

R = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000
L = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N = R * L

spark = get_spark("cc-scale")

# node (r, i) gets shuffled id sid = xxhash-permutation rank; we use
# a Feistel-light mix: sid = pmod(xxhash64(r*L + i), 2^62) — ids are
# unique with overwhelming probability at N=1M; verified below
raw = spark.range(N).select(
    (F.col("id") / L).cast("long").alias("r"),
    F.pmod(F.col("id"), L).alias("i"),
    F.pmod(F.xxhash64("id"), F.lit(2**62)).alias("sid"),
)
assert raw.select("sid").distinct().count() == N, "sid collision"
raw = raw.localCheckpoint(eager=True)

nxt = raw.select(
    "r", F.pmod(F.col("i") + 1, L).alias("i"),
    F.col("sid").alias("sid_u"),
)
ring_edges = raw.join(nxt, ["r", "i"]).select(
    F.col("sid_u").alias("u"), F.col("sid").alias("v")
)
edges = ring_edges.unionAll(
    ring_edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
)

t0 = time.time()
labels, rounds = connected_components(edges)
want = raw.groupBy("r").agg(F.min("sid").alias("want_label"))
bad = (
    labels.join(raw.select(F.col("sid").alias("doc_id"), "r"), "doc_id")
    .join(want, "r")
    .filter(F.col("label") != F.col("want_label"))
    .count()
)
wall = time.time() - t0
bound = L  # worst case O(D); chains converge in O(log D)
print(
    f"nodes={N} rings={R} ring_len={L} rounds={rounds} "
    f"(O(D) bound {bound}) wall={wall:.1f}s mislabeled={bad}"
)
ok = bad == 0 and rounds <= bound
print(f"ok={ok}")
if not ok:
    sys.exit(1)
