"""Line-level boilerplate dedup + quality-gate scale smoke (planted truth).

Two round-10 operators get their scale evidence here:

1. `dedup.line_dedup` at 1M docs / 7M lines: each doc carries 5
   globally-unique body lines plus 2 of 20 boilerplate lines (each
   boilerplate line lands in ~100k docs — far above LINE_DUP_K=3).
   Closed-form truth: every boilerplate line is dropped from EVERY
   doc, every body line survives, so per-doc (n_lines, n_kept) is
   exactly (7, 5) for all 1M docs. Asserted by ONE aggregation, no
   driver-side loops.

2. `text.quality_gate_frame` at 1M docs: a 3:1 planted mix of a
   template that passes all six C4/Gopher rules and a too-short
   template that fails exactly r_min_len (and passes the rest, which
   pins each rule's independence). Truth: rate_pass_all == the mix
   fraction, exactly.

Prints walls for BENCH_NOTES. Usage:
    python scripts/exp_line_dedup_scale.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.pipeline.dedup import line_dedup
from matrixinversion_spark.pipeline.text import quality_gate_frame
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BP = 20          # distinct boilerplate lines
BODY, BPD = 5, 2  # body lines / boilerplate lines per doc

spark = get_spark("line-dedup-scale")

# -- 1. line_dedup at N docs -------------------------------------------------
ids = spark.range(N).withColumnRenamed("id", "doc_id").repartition(32)
body = F.transform(
    F.sequence(F.lit(0), F.lit(BODY - 1)),
    lambda i: F.concat(
        F.lit("body "), F.col("doc_id").cast("string"), F.lit(" line "),
        i.cast("string"), F.lit(" unique content"),
    ),
)
boiler = F.array(
    F.concat(F.lit("footer nav "), F.pmod(F.col("doc_id"), BP)),
    F.concat(F.lit("footer nav "), F.pmod(F.col("doc_id") + 7, BP)),
)
lines = ids.select(
    "doc_id", F.posexplode(F.concat(body, boiler)).alias("pos", "line")
)

t0 = time.time()
out = line_dedup(lines)
agg = out.agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.sum("n_lines").alias("tot_lines"),
    F.sum("n_kept").alias("tot_kept"),
    F.sum(
        F.when((F.col("n_lines") == BODY + BPD) & (F.col("n_kept") == BODY), 1)
        .otherwise(0)
    ).alias("n_exact"),
).collect()[0]
wall_dedup = time.time() - t0

assert agg["n_docs"] == N, agg
assert agg["tot_lines"] == N * (BODY + BPD), agg
assert agg["tot_kept"] == N * BODY, agg
assert agg["n_exact"] == N, agg
print(
    f"line_dedup: {N} docs / {N * (BODY + BPD)} lines in "
    f"{wall_dedup:.1f}s — every boilerplate line dropped everywhere, "
    f"every body line kept (exact, closed-form)"
)

# -- 2. quality gate at N docs ----------------------------------------------
# pass-template: 12 distinct words, 1 stopword, ~70 chars, no punct
# -> clears all six rules; fail-template: 6 distinct 2-char words
# (~17 chars) -> fails r_min_len ONLY (stopword 1/6 in band, mean
# word len exactly 2.0 = the inclusive floor, top_frac 1/6 <= 0.2,
# all-distinct, no punct)
is_pass = F.pmod(F.col("doc_id"), 4) < 3  # 3:1 mix
docs = ids.select(
    "doc_id",
    F.when(
        is_pass,
        F.concat(
            F.lit("the quick brown vulpine jumps over lazy canines near "),
            F.lit("riverbank marker "),
            F.col("doc_id").cast("string"),
        ),
    )
    .otherwise(F.concat(F.lit("it aa bb cc dd x"), F.pmod(F.col("doc_id"), 10)))
    .alias("text"),
)

t0 = time.time()
g = quality_gate_frame(docs)
r = g.agg(
    F.count(F.lit(1)).alias("n"),
    *[
        F.sum(c).alias(c)
        for c in (
            "r_min_len", "r_stopword", "r_word_len",
            "r_top_frac", "r_distinct", "r_punct", "pass_all",
        )
    ],
).collect()[0]
wall_gate = time.time() - t0

n_pass = sum(1 for i in range(4) if i < 3) * (N // 4) + min(N % 4, 3)
assert r["n"] == N, r
assert r["pass_all"] == n_pass, (r, n_pass)
assert r["r_min_len"] == n_pass, r          # only the short docs fail it
for c in ("r_stopword", "r_word_len", "r_top_frac", "r_distinct", "r_punct"):
    assert r[c] == N, (c, r)                # every other rule passes both
print(
    f"quality_gate: {N} docs in {wall_gate:.1f}s — pass_all "
    f"{r['pass_all']}/{N} == planted mix, every rule independent (exact)"
)
print(
    f"line_dedup={wall_dedup:.1f}s quality_gate={wall_gate:.1f}s "
    f"n={N} ok=True"
)

spark.stop()
