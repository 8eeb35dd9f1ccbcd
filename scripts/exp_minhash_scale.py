"""MinHash+LSH near-dup scale smoke with planted duplicates.

Synthesizes a corpus of N base documents (40 pseudo-random tokens
each, shared 5k-word vocabulary) plus D planted near-duplicates
(clone of doc i with ONE token mutated → shingle Jaccard ≈ 0.85-0.93),
lands it as a documents.parquet table, and runs the REGISTERED
`p_dedup_minhash_lsh` pipeline unchanged on it. Checks:

- recall: fraction of planted (i, i+N) pairs reported (theory for
  16 hashes / 4×4 bands at J≈0.9 predicts ~0.9+ after the
  n_match ≥ 12 verification filter);
- precision proxy: every reported pair is either planted or has
  est_jaccard ≥ 0.75 (random base pairs share ~0 shingles, so bulk
  false positives would mean the banding is broken);
- wall clock, for the BENCH_NOTES scale table.

Usage: python scripts/exp_minhash_scale.py [n_base] [n_dups]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
TOKENS, VOCAB = 40, 5_000

spark = get_spark("minhash-scale")

# token j of doc i = "w<xxhash64(i, j) % VOCAB>" — deterministic but
# hash-random: unrelated docs share individual TOKENS (realistic,
# shared vocabulary) yet essentially never share a 3-token SHINGLE.
# (First cut used an affine i*31 + j*17 stream; linear structure made
# whole doc FAMILIES exact duplicates — thousands of true extra
# pairs and quadratic LSH buckets. Hash, don't pattern.)
tok = lambda i, j: F.concat(  # noqa: E731
    F.lit("w"), F.pmod(F.xxhash64(i, F.lit(j)), VOCAB)
)
base = spark.range(N).select(
    F.col("id").alias("doc_id"),
    F.array(*[tok(F.col("id"), j) for j in range(TOKENS)]).alias("toks"),
)
# planted near-dup of doc i: same tokens, position (i % TOKENS)
# swapped for an out-of-vocabulary marker
mut_pos = F.col("doc_id") % TOKENS
clones = base.filter(F.col("doc_id") < D).select(
    (F.col("doc_id") + N).alias("doc_id"),
    F.transform(
        "toks",
        lambda t, i: F.when(i == mut_pos, F.lit("MUTANT")).otherwise(t),
    ).alias("toks"),
)
docs = base.unionAll(clones).select(
    "doc_id",
    F.array_join("toks", " ").alias("text"),
    F.lit("en").alias("lang"),
    F.lit("synthetic").alias("source"),
    F.length(F.array_join("toks", " ")).alias("n_chars"),
)

tmp = tempfile.mkdtemp(prefix="minhash_scale_")
try:
    docs.write.parquet(f"{tmp}/documents.parquet")

    t0 = time.time()
    pairs = QUERIES["p_dedup_minhash_lsh"](spark, tmp).collect()
    wall = time.time() - t0

    reported = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i, i + N) for i in range(D)}
    hit = len(reported & planted)
    recall = hit / D
    extras = reported - planted
    bad_extras = [
        p for p in extras
        if next(
            r["est_jaccard"] for r in pairs if (r["id_a"], r["id_b"]) == p
        )
        < 0.75
    ]
    print(
        f"docs={N + D} planted={D} wall={wall:.1f}s "
        f"recall={recall:.3f} reported={len(reported)} "
        f"extras={len(extras)} bad_extras={len(bad_extras)}"
    )
    ok = recall >= 0.7 and not bad_extras and len(extras) <= D * 0.05
    print(f"ok={ok}")
    if not ok:
        sys.exit(1)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
