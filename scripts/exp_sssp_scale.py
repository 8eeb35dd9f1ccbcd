"""Weighted-SSSP scale smoke: ~1M-node frontier with a closed form.

K parallel chains of length P, all rooted at source 0 — after P
relaxation rounds the distance frame holds 1 + K*P nodes, so unlike
the 25-node registered trade graph this drives a FRONTIER that is a
real distributed frame (the regime the operator exists for: the
relax join and min-combine each shuffle ~K*P rows per round).
Edge costs are deterministic tolls, so every node's distance has a
closed form the driver recomputes in vectorized numpy:

  node(c, p) = 1 + c*P + (p-1)      (chain c in [0,K), pos p in [1,P])
  cost(0 -> (c,1))       = c % 10 + 1
  cost((c,p) -> (c,p+1)) = (c + p) % 10 + 1
  dist(c, p) = sum of the chain-c tolls up to position p

Verified: exact node count AND the exact SUM of all distances (a
single Spark agg vs the numpy prefix-sum total) — any dropped
frontier row, double relax, or wrong min changes the sum.

Usage: python scripts/exp_sssp_scale.py [n_chains] [chain_len]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from matrixinversion_spark.relational.mining import sssp_weighted
from matrixinversion_spark.session import get_spark

K = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
P = int(sys.argv[2]) if len(sys.argv) > 2 else 5
N = 1 + K * P

spark = get_spark("sssp-scale")
spark.sparkContext.setLogLevel("ERROR")

# edges built distributed (never collected): one row per (chain, pos)
base = spark.range(K * P).select(
    (F.col("id") / P).cast("long").alias("c"),
    (F.pmod(F.col("id"), P) + 1).alias("p"),
)
root = base.filter(F.col("p") == 1).select(
    F.lit(0).cast("bigint").alias("src"),
    (1 + F.col("c") * P).alias("dst"),
    (F.pmod(F.col("c"), 10) + 1).alias("cost"),
)
links = base.filter(F.col("p") < P).select(
    (1 + F.col("c") * P + F.col("p") - 1).alias("src"),
    (1 + F.col("c") * P + F.col("p")).alias("dst"),
    (F.pmod(F.col("c") + F.col("p"), 10) + 1).alias("cost"),
)
edges = root.unionByName(links)

t0 = time.time()
dist = sssp_weighted(edges, source=0, rounds=P)
got = dist.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum("cost").alias("total"),
).collect()[0]
wall = time.time() - t0

# closed form, vectorized: tolls[c, q] for q=0..P-1 (q=0 is the root
# edge, q>=1 the chain links), dist(c,p) = cumsum over q<p
c = np.arange(K, dtype=np.int64)[:, None]
q = np.arange(P, dtype=np.int64)[None, :]
tolls = np.where(q == 0, c % 10 + 1, (c + q) % 10 + 1)
want_total = int(np.cumsum(tolls, axis=1).sum())  # + dist(source)=0

ok = got["n"] == N and got["total"] == want_total
print(
    f"sssp_weighted: {N} nodes ({K} chains x {P}), "
    f"{K * P} edges, {P} rounds in {wall:.1f}s  "
    f"n={got['n']} total={got['total']} want={want_total} ok={ok}"
)
spark.stop()
sys.exit(0 if ok else 1)
