"""As-of join + MERGE smokes at 10M rows with closed-form oracles.

As-of: 10M trades across 1,000 symbols at irregular (hash-noise)
timestamps; quotes form a regular 100-tick grid per symbol, so the
matched quote for a trade at t is EXACTLY floor(t/100)*100 — a
closed-form per-row oracle with no second implementation needed.
Also plants trades BEFORE the first quote (must match NULL).

MERGE: 10M-row target (ids 0..N), 5M-row source covering
[N/2, N*1.5) with delete_when on source value parity — closed-form
action counts: matched-updates vs matched-deletes split the
[N/2, N) overlap by parity, inserts = [N, 1.5N). Verifies row
counts and spot values, exercising the full-outer dataflow at a
scale where per-key fan-out bugs (duplicate-key expansion) cannot
hide in rounding.

Usage: python scripts/exp_asof_merge_scale.py [n_rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.relational.asof import asof_join
from matrixinversion_spark.relational.merge import merge_upsert
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
SYMS, GRID = 1_000, 100

spark = get_spark("asof-merge-scale")

# --- as-of ---------------------------------------------------------
trades = spark.range(N).select(
    F.pmod(F.col("id"), SYMS).alias("sym"),
    # irregular trade times in [0, 1e6); ~1% land before the first
    # quote of their symbol (grid starts at GRID, not 0)
    F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("t"),
)
quotes = spark.range(SYMS * 10_000).select(
    F.pmod(F.col("id"), SYMS).alias("sym"),
    ((F.col("id") / SYMS).cast("long") * GRID + GRID).alias("t"),
    ((F.col("id") / SYMS).cast("long") * GRID + GRID).alias("px"),
)  # quote at every t = GRID*k (k>=1) per symbol, px == its own t

t0 = time.time()
j = asof_join(trades, quotes, on=["sym"], ts="t")
expect = F.when(
    F.col("t") >= GRID, (F.col("t") / GRID).cast("long") * GRID
)
bad = j.filter(
    ~(
        (F.col("px_right").isNull() & expect.isNull())
        | (F.col("px_right") == expect)
    )
).count()
n_out = j.count()
asof_wall = time.time() - t0
print(f"asof rows={N} out={n_out} mismatched={bad} wall={asof_wall:.1f}s")

# --- merge ---------------------------------------------------------
target = spark.range(N).select(
    F.col("id").alias("k"), F.lit("old").alias("val")
)
source = spark.range(N // 2, 3 * N // 2).select(
    F.col("id").alias("k"), F.lit("new").alias("val")
)
t0 = time.time()
merged = merge_upsert(
    target,
    source,
    on="k",
    update_set={"val": F.col("s.val")},
    insert_values={"val": F.col("s.val")},
    delete_when=F.pmod(F.col("s.k"), 2) == 0,
)
by_val = {
    r["val"]: r["n"]
    for r in merged.groupBy("val").agg(F.count(F.lit(1)).alias("n")).collect()
}
merge_wall = time.time() - t0
# closed form: keep target-only [0, N/2) as 'old'; matched [N/2, N)
# odd keys update to 'new' (evens deleted); inserts [N, 1.5N) split
# by parity too? no — delete_when only applies to MATCHED rows;
# inserts all land as 'new'
want_old = N // 2
want_new = (N // 2) // 2 + N // 2
ok = bad == 0 and n_out == N and by_val.get("old", 0) == want_old \
    and by_val.get("new", 0) == want_new
print(
    f"merge old={by_val.get('old', 0)}/{want_old} "
    f"new={by_val.get('new', 0)}/{want_new} wall={merge_wall:.1f}s"
)
print(f"ok={ok}")
if not ok:
    sys.exit(1)
