"""Heavy-hitters two-phase smoke: the pruning regime at scale.

Corpus: 20M tokens over a ~1M-token vocabulary — 2M occurrences of
10 planted heavy tokens (exactly 200k each = 1% share) plus 18M tail
occurrences spread over 1M distinct tail tokens (18 each). The
registered query's TESTDATA regime (31-token vocab) cannot exercise
the sketch's pruning; here the vocabulary exceeds the k=1024 sketch
by 1000x, so phase 1 genuinely discards ~1M keys and phase 2's
exact-count shuffle moves candidate keys only.

Checks:
- exactness: the two-phase result equals the CLOSED-FORM planted
  truth (each heavy token exactly 200k, share exactly 0.01) AND the
  naive full-vocabulary GROUP BY + HAVING;
- pruning, physically: the candidate frame has <= k rows (vs the
  ~1M distinct keys the naive plan shuffles);
- walls for both plans (single-node CPU is conserved, so the wall is
  a wash locally — the 100 TB win is the shuffle: k counters per
  partition vs the full vocabulary; both are printed).

Usage: python scripts/exp_heavy_hitters_scale.py [n_tail_millions]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.pipeline.text import heavy_hitters_exact
from matrixinversion_spark.session import get_spark

TAIL_M = int(sys.argv[1]) if len(sys.argv) > 1 else 18
N_HEAVY, HEAVY_EACH = 10, 200_000
N_TAIL_VOCAB = 1_000_000
PHI, K = 0.005, 1024

spark = get_spark("heavy-hitters-scale")
spark.sparkContext.setLogLevel("ERROR")

heavy = spark.range(N_HEAVY * HEAVY_EACH).select(
    F.concat(F.lit("h"), F.pmod("id", F.lit(N_HEAVY))).alias("tok")
)
tail = spark.range(TAIL_M * 1_000_000).select(
    F.concat(F.lit("t"), F.pmod("id", F.lit(N_TAIL_VOCAB))).alias("tok")
)
toks = heavy.unionAll(tail).repartition(32).persist()
n_total = toks.count()

t0 = time.time()
got = {
    r.tok: (r.cnt, r.share)
    for r in heavy_hitters_exact(toks, "tok", PHI, k=K).collect()
}
wall_two_phase = time.time() - t0

# closed-form planted truth
threshold = PHI * n_total
expect = {
    f"h{i}": (HEAVY_EACH, round(HEAVY_EACH / n_total, 6))
    for i in range(N_HEAVY)
    if HEAVY_EACH > threshold
}
assert got == expect, (
    f"two-phase != planted truth: got {len(got)} rows, "
    f"expect {len(expect)}; diff keys "
    f"{set(got) ^ set(expect) or 'counts differ'}"
)

# physical pruning: candidate frame <= k rows
cand = (
    toks.selectExpr(f"approx_top_k(tok, {K}, {2 * K}) AS tk")
    .select(F.explode("tk").alias("e"))
    .count()
)
assert cand <= K, f"candidate set {cand} exceeds the k={K} sketch"

# naive plan: full-vocabulary GROUP BY then threshold
t0 = time.time()
naive = {
    r.tok: (r.cnt, round(r.cnt / n_total, 6))
    for r in (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") > threshold)
        .collect()
    )
}
wall_naive = time.time() - t0
assert naive == got, "naive GROUP BY disagrees with two-phase"

n_distinct = toks.select("tok").distinct().count()
print(
    f"OK n_tokens={n_total:,} distinct_keys={n_distinct:,} "
    f"candidates={cand} (<= k={K}) heavies={len(got)} "
    f"two_phase={wall_two_phase:.1f}s naive_groupby={wall_naive:.1f}s "
    f"— exactness vs closed form and vs naive both hold; the naive "
    f"plan shuffled {n_distinct:,} keys, the sketch plan {cand}"
)
spark.stop()
