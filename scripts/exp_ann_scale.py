"""IVF-ANN recall smoke at 400k vectors with planted cluster truth.

Synthesizes an embeddings table whose first 8 vec_ids are true
cluster centers (the registered query's IVF coarse-quantizer
convention) and every other vector is center + bounded hash-noise,
lands it as embeddings.parquet, and runs BOTH registered operators
unchanged — `p_knn_bruteforce` (exact) and `p_ann_ivf_topk`
(nprobe=1 IVF) — measuring recall@3 of the approximate path against
the exact one, plus both walls. This quantifies the documented
"recall < 1 by design" trade at a scale where the in-cell search
touches ~N/8 vectors instead of N.

Usage: python scripts/exp_ann_scale.py [n_vectors] [dim]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401 — populates the registry
from matrixinversion_spark.registry import QUERIES
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 16
K_CLUSTERS, NOISE = 8, 0.15

spark = get_spark("ann-scale")

# hash-uniform in [-1, 1]
def u(seed_col, j, salt):  # noqa: ANN001
    return (
        F.pmod(F.xxhash64(seed_col, F.lit(j), F.lit(salt)), 10_000)
        / 5_000.0
        - 1.0
    )

cluster = F.when(F.col("id") < K_CLUSTERS, F.col("id")).otherwise(
    F.col("id") % K_CLUSTERS
)
coord = lambda j: F.when(  # noqa: E731
    F.col("id") < K_CLUSTERS, u(cluster, j, "c")
).otherwise(u(cluster, j, "c") + NOISE * u(F.col("id"), j, "n"))
emb = spark.range(N).select(
    F.col("id").alias("vec_id"),
    F.array(*[coord(j).cast("float") for j in range(DIM)]).alias(
        "embedding"
    ),
    cluster.cast("int").alias("label"),
)

tmp = tempfile.mkdtemp(prefix="ann_scale_")
try:
    emb.write.parquet(f"{tmp}/embeddings.parquet")

    t0 = time.time()
    exact = QUERIES["p_knn_bruteforce"](spark, tmp).collect()
    brute_wall = time.time() - t0
    t0 = time.time()
    approx = QUERIES["p_ann_ivf_topk"](spark, tmp).collect()
    ivf_wall = time.time() - t0

    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    print(
        f"vectors={N} dim={DIM} brute_wall={brute_wall:.1f}s "
        f"ivf_wall={ivf_wall:.1f}s recall@3={recall:.3f} "
        f"truth={len(truth)} got={len(got)}"
    )
    ok = recall >= 0.6
    print(f"ok={ok}")
    if not ok:
        sys.exit(1)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
