"""Grid-bucketed spatial distance join scale smoke, closed form.

Places N anchor points on a coarse lattice with spacing 1000
centi-units (2x the join radius r=500, so anchors never pair with
each other), then gives every 10th anchor a twin at offset
(+300, +400) — distance EXACTLY 500 (a 3-4-5 triangle), on the
boundary the integer-exact predicate must include, and far enough
that twin and anchor usually land in DIFFERENT grid cells (300/500,
400/500 offsets straddle cell lines depending on anchor phase), so
the 3x3 neighbor replication is exercised, not just same-cell pairs.

Closed form: exactly N/10 pairs, every one with dist_sq == 250000.

Usage: python scripts/exp_spatial_scale.py [n_points]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.relational.spatial import grid_distance_join
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
SIDE = 40_000  # lattice columns; rows = N / SIDE

spark = get_spark("spatial-scale")

anchors = spark.range(N).select(
    F.col("id"),
    ((F.col("id") % SIDE) * 1000).alias("xi"),
    ((F.col("id") / SIDE).cast("bigint") * 1000).alias("yi"),
)
twins = (
    spark.range(N)
    .filter(F.col("id") % 10 == 0)
    .select(
        (F.col("id") + N).alias("id"),
        ((F.col("id") % SIDE) * 1000 + 300).alias("xi"),
        ((F.col("id") / SIDE).cast("bigint") * 1000 + 400).alias("yi"),
    )
)
pts = anchors.unionAll(twins)

t0 = time.time()
out = grid_distance_join(pts, 500)
agg = out.agg(
    F.count(F.lit(1)).alias("n_pairs"),
    F.sum((F.col("dist_sq") == 250000).cast("long")).alias("n_exact"),
    F.sum(
        ((F.col("id_b") - F.col("id_a")) == N).cast("long")
    ).alias("n_twin_shape"),
).collect()[0]
wall = time.time() - t0

want = N // 10
ok = (
    agg["n_pairs"] == want
    and agg["n_exact"] == want
    and agg["n_twin_shape"] == want
)
print(
    f"spatial scale: points={N + want} pairs={agg['n_pairs']} "
    f"expected={want} boundary_exact={agg['n_exact']} "
    f"twin_shape={agg['n_twin_shape']} wall={wall:.1f}s ok={ok}"
)
spark.stop()
sys.exit(0 if ok else 1)
