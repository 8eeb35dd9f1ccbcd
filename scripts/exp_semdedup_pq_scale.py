"""Semantic-dedup + PQ-ADC scale smoke with planted duplicate truth.

Synthesizes an embeddings table (default 200k x 16):

- ids 0..K-1 are cluster centers; every other id is center + bounded
  hash-noise (the exp_ann_scale corpus shape);
- the LAST N_DUPS ids are EXACT copies of early ids (8..8+N_DUPS-1) —
  planted semantic duplicates with cosine exactly 1 to an earlier
  vector.

Checks:

1. `semantic_dedup` (library core of the registered
   `p_semantic_dedup`, here with 512 sampled centroids so cells stay
   ~N/512 and the cid-partitioned pair join is bounded) must flag
   EVERY planted copy keep=0 — an exact copy shares its partner's
   cell (identical vector, same argmax) and cosine 1 >= tau.
2. `p_ann_pq_adc` (registered operator, unchanged) must place >= 90%
   of its approximate top-3 neighbors in the query's true cluster —
   the planted-truth recall metric that is robust to rank shuffling
   among near-identical in-cluster candidates.

Usage: python scripts/exp_semdedup_pq_scale.py [n_vectors] [dim]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401 — populates the registry
from matrixinversion_spark.pipeline.similarity import (
    _vectors,
    semantic_dedup,
)
from matrixinversion_spark.registry import QUERIES
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 16
K_CLUSTERS, NOISE = 8, 0.15
N_DUPS = 5_000
N_CELLS = 512  # smoke-scale centroid count (cells ~ N/512)
TAU = 0.95     # production-scale threshold; exact copies are cos 1.0

spark = get_spark("semdedup-pq-scale")


def u(seed_col, j, salt):  # hash-uniform in [-1, 1]
    return (
        F.pmod(F.xxhash64(seed_col, F.lit(j), F.lit(salt)), 10_000)
        / 5_000.0
        - 1.0
    )


# planted copies: the last N_DUPS ids replay the coords of ids
# 8 .. 8+N_DUPS-1 (all non-center early vectors)
src = F.when(F.col("id") >= N - N_DUPS, F.col("id") - (N - N_DUPS) + 8).otherwise(
    F.col("id")
)
cluster = F.when(src < K_CLUSTERS, src).otherwise(src % K_CLUSTERS)
coord = lambda j: F.when(  # noqa: E731
    src < K_CLUSTERS, u(cluster, j, "c")
).otherwise(u(cluster, j, "c") + NOISE * u(src, j, "n"))
emb = spark.range(N).select(
    F.col("id").alias("vec_id"),
    F.array(*[coord(j).cast("float") for j in range(DIM)]).alias("embedding"),
    cluster.cast("int").alias("label"),
)

tmp = tempfile.mkdtemp(prefix="semdedup_pq_scale_")
try:
    emb.write.parquet(f"{tmp}/embeddings.parquet")

    n = _vectors(spark, tmp)
    # smoke-scale centroid sample: every (N // N_CELLS)-th vector
    stride = max(1, N // N_CELLS)
    cent = (
        n.filter((F.col("vec_id") % stride == 0))
        .select(
            (F.col("vec_id") / stride).cast("int").alias("cid"),
            F.col("e").alias("ce"),
            F.col("nrm").alias("cn"),
        )
    )
    t0 = time.time()
    verdicts = (
        semantic_dedup(n, cent, TAU)
        .filter(F.col("vec_id") >= N - N_DUPS)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep")).alias("n_kept"),
        )
        .collect()[0]
    )
    sd_wall = time.time() - t0
    missed = verdicts["n_kept"]
    print(
        f"semantic_dedup: vectors={N} cells~{N_CELLS} tau={TAU} "
        f"planted={verdicts['n']} missed={missed} wall={sd_wall:.1f}s"
    )

    t0 = time.time()
    approx = QUERIES["p_ann_pq_adc"](spark, tmp).collect()
    pq_wall = time.time() - t0
    # label lookup only for ids appearing in the result
    ids = {r["neighbor_id"] for r in approx} | {r["query_id"] for r in approx}
    lbl = {
        r["vec_id"]: r["label"]
        for r in emb.filter(F.col("vec_id").isin(list(ids))).collect()
    }
    in_cluster = sum(
        1 for r in approx if lbl[r["neighbor_id"]] == lbl[r["query_id"]]
    )
    frac = in_cluster / len(approx)
    print(
        f"pq_adc: top3 rows={len(approx)} in_cluster_frac={frac:.3f} "
        f"wall={pq_wall:.1f}s"
    )
    ok = missed == 0 and frac >= 0.9
    print(f"ok={ok}")
    if not ok:
        sys.exit(1)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
