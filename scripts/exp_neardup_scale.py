"""Near-dup split-leakage audit at scale (round-8 op).

Planted corpus: F train "families" of 60 distinct tokens each; a
configurable fraction of validation docs are one-token paraphrases
of a train doc (exact shingle Jaccard 55/63 ≈ 0.873 ≥ τ=0.8), the
rest are token-disjoint. Closed-form bounds:

- n_leaked ≤ planted (token-disjoint docs share no shingles, so any
  LSH candidate they generate dies at the exact-Jaccard verify —
  zero false positives by construction);
- n_leaked ≥ 0.95 × planted (at s≈0.873 the 4×4 band-miss
  probability is (1-(1-s^4)^4) ≈ 0.034 per pair... measured: with
  the frozen coefficients the per-family miss rate is what this
  script records — the audit's declared semantics are bucket-gated,
  so the MISS RATE is the honest number to publish, not hide).

Usage: python scripts/exp_neardup_scale.py [n_train] [n_planted] [n_clean]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.pipeline.corpus import near_dup_leakage
from matrixinversion_spark.session import get_spark

N_TRAIN = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_PLANT = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
N_CLEAN = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000


def main() -> None:
    spark = get_spark("exp_neardup_scale")
    spark.sparkContext.setLogLevel("ERROR")

    # train docs: 60 family-unique tokens, JVM-generated
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.concat(
                F.lit("f"), F.col("fid"), F.lit("w"), i
            ),
        ),
    )
    train = (
        spark.range(N_TRAIN)
        .select(
            F.col("id").alias("doc_id"),
            F.col("id").alias("fid"),
        )
        .select("doc_id", words.alias("text"), F.lit("train").alias("split"))
    )
    # planted paraphrases: family fid = doc_id - N_TRAIN, token 30
    # replaced (matches the pytest-verified band-sharing position)
    plant_words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.when(i == 30, F.lit("CHANGED")).otherwise(
                F.concat(F.lit("f"), F.col("fid"), F.lit("w"), i)
            ),
        ),
    )
    planted = (
        spark.range(N_TRAIN, N_TRAIN + N_PLANT)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") - N_TRAIN).alias("fid"),
        )
        .select(
            "doc_id", plant_words.alias("text"),
            F.lit("validation").alias("split"),
        )
    )
    clean_words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.concat(F.lit("z"), F.col("doc_id"), F.lit("q"), i),
        ),
    )
    clean = (
        spark.range(
            N_TRAIN + N_PLANT, N_TRAIN + N_PLANT + N_CLEAN
        )
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id", clean_words.alias("text"),
            F.lit("validation").alias("split"),
        )
    )
    docs = train.union(planted).union(clean).repartition(
        spark.sparkContext.defaultParallelism
    )

    t0 = time.time()
    got = near_dup_leakage(docs).collect()
    wall = time.time() - t0
    row = {r["split"]: r for r in got}["validation"]
    n_docs, n_leaked = row["n_docs"], row["n_leaked"]
    miss = 1 - n_leaked / N_PLANT
    ok = (
        n_docs == N_PLANT + N_CLEAN
        and n_leaked <= N_PLANT
        and n_leaked >= 0.95 * N_PLANT
    )
    print(
        f"docs={N_TRAIN + N_PLANT + N_CLEAN} planted={N_PLANT} "
        f"leaked={n_leaked} (band-miss rate {miss:.4f}) "
        f"wall={wall:.1f}s ok={ok}"
    )
    assert ok, (n_docs, n_leaked)
    spark.stop()


if __name__ == "__main__":
    main()
