"""LSH mega-bucket skew guard at scale (round-9 hardening).

Planted pathology: 10k byte-identical documents that (hypothetically)
skipped exact dedup, plus N_CLEAN unique docs and one genuine
near-dup pair. Unguarded, the identical cluster alone yields
C(10k,2) ≈ 50M candidate pairs from ONE band bucket — the quadratic
blow-up the guard exists to refuse. With ``max_bucket`` set, the
cluster's buckets are dropped (reported, not silent) and the
candidate count is bounded by the clean corpus's collision rate.

Closed-form asserts:
- guarded candidate pair count < 10_000 (vs ≥ 49,995,000 unguarded);
- the planted near-dup pair IS found (the guard never drops
  normal-size buckets);
- oversized report = exactly N_BANDS rows of n_members = N_MEGA
  (identical docs share every band key).

Usage: python scripts/exp_lsh_megabucket.py [n_mega] [n_clean]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.pipeline.dedup import (
    N_BANDS,
    lsh_bands,
    lsh_bucket_guard,
    minhash_lsh_pairs,
    minhash_signatures,
)
from matrixinversion_spark.session import get_spark

N_MEGA = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_CLEAN = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
CAP = 64


def main() -> None:
    spark = get_spark("exp_lsh_megabucket")
    spark.sparkContext.setLogLevel("ERROR")

    mega = spark.range(N_MEGA).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    )
    # clean docs: 8 doc-unique tokens each — no cross-doc shingles
    clean_words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.concat(F.lit("d"), F.col("doc_id"), F.lit("w"), i),
        ),
    )
    clean = (
        spark.range(N_MEGA, N_MEGA + N_CLEAN)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", clean_words.alias("text"))
    )
    base = "red orange yellow green blue indigo violet umber"
    pair = spark.createDataFrame(
        [(N_MEGA + N_CLEAN, base + " one"), (N_MEGA + N_CLEAN + 1, base + " two")],
        "doc_id long, text string",
    )
    docs = mega.unionAll(clean).unionAll(pair).repartition(
        spark.sparkContext.defaultParallelism
    )

    sig = minhash_signatures(docs).persist()
    sig.count()

    t0 = time.time()
    bands = lsh_bands(sig)
    kept, oversized = lsh_bucket_guard(bands, CAP)
    over = oversized.collect()
    assert len(over) == N_BANDS, over
    assert all(r.n_members == N_MEGA for r in over), over
    print(f"oversized report: {len(over)} buckets x {over[0].n_members} "
          f"members dropped ({time.time() - t0:.1f}s)")

    t0 = time.time()
    guarded = minhash_lsh_pairs(sig, max_bucket=CAP)
    pairs = guarded.count()
    wall = time.time() - t0
    found = guarded.filter(
        (F.col("id_a") == N_MEGA + N_CLEAN)
        & (F.col("id_b") == N_MEGA + N_CLEAN + 1)
    ).count()
    unguarded_floor = N_MEGA * (N_MEGA - 1) // 2
    assert pairs < 10_000, pairs
    assert found == 1, found
    print(
        f"guarded pairs={pairs} (unguarded floor {unguarded_floor:,}), "
        f"planted pair found={bool(found)}, wall={wall:.1f}s "
        f"over {N_MEGA:,} identical + {N_CLEAN:,} clean docs"
    )
    print("ok=True")
    spark.stop()


if __name__ == "__main__":
    main()
