"""Spatial grid-bucketed distance join.

The 2-D analogue of the binned interval join (``queries.q_interval_join``):
a big x big "all pairs within radius r" join executed WITHOUT a cross
join by hashing points into grid cells of side r and joining each cell
against its 3x3 neighborhood. The reference engine has no spatial
surface; this extends the relational layer with the canonical
distributed spatial-join plan (the same shape Sedona/GeoSpark use for
DistanceJoin).

Coordinates are derived deterministically from ``c_custkey`` via the
repo's portable md5-prefix hash (``pipeline.dedup.hash32`` pattern) in
centi-units, so the Spark plan and the DuckDB oracle compute
bit-identical positions that actually SCATTER (a multiply-mod lattice
was tried first and produced zero close pairs at sf0.01 — a vacuous
oracle row) and the distance test is exact integer math — no
float-comparison hazard at the radius boundary.

Scale: each point is shuffled once keyed by its cell (left side) and
nine times keyed by neighbor cells (right side) — constant fan-out,
shuffle width O(9n) regardless of data size, candidate pairs bounded
by local density rather than n^2. Skewed cells (dense hotspots) are
the residual hazard at 100 TB; the mitigation is the same salting
pattern as skew.salted_join applied to the cell key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.pipeline.dedup import _hash32_sql, hash32
from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table

# Grid world: coordinates in [0, 100000) centi-units (a 1000x1000 plane
# at 0.01 resolution); radius 5.00 units = 500 centi-units.
_MOD = 100000
_R_CENTI = 500
_R_SQ = _R_CENTI * _R_CENTI  # 250000, exact in int64

_SPATIAL_SQL = f"""
WITH pts AS (
    SELECT c_custkey AS id,
           {_hash32_sql("CAST(c_custkey AS VARCHAR)")} % {_MOD} AS xi,
           {_hash32_sql("CAST(c_custkey AS VARCHAR) || 'y'")} % {_MOD} AS yi
    FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       (a.xi - b.xi) * (a.xi - b.xi)
     + (a.yi - b.yi) * (a.yi - b.yi) AS dist_sq
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.xi - b.xi) * (a.xi - b.xi)
    + (a.yi - b.yi) * (a.yi - b.yi) <= {_R_SQ}
"""


def grid_distance_join(points: DataFrame, r: int) -> DataFrame:
    """All pairs of ``points(id, xi, yi)`` with squared distance <= r^2.

    Grid-cell plan: the left side keeps its own cell, the right side is
    replicated to the 3x3 neighborhood; any pair within r has
    |cell delta| <= 1 on both axes (cell side = r), so it matches
    exactly once — the left point's cell appears exactly once among
    the right point's nine distinct neighbor cells. ``id_a < id_b``
    keeps each unordered pair once.
    """
    # integer floor division: (x - pmod(x, r)) div r is exact in
    # int64 at any magnitude (double-division floor loses exactness
    # past ~2^53/r and can shift a boundary point's cell) and floors
    # correctly for negative coordinates (pmod is non-negative).
    def cell(c: str) -> F.Column:
        b = f"CAST({c} AS BIGINT)"
        return F.expr(f"({b} - pmod({b}, {r})) div {r}")

    pts = points.select(
        "id",
        F.col("xi").cast("bigint").alias("xi"),
        F.col("yi").cast("bigint").alias("yi"),
        cell("xi").alias("cx"),
        cell("yi").alias("cy"),
    )
    off = F.array([F.lit(d) for d in (-1, 0, 1)])
    right = (
        pts.withColumn("dx", F.explode(off))
        .withColumn("dy", F.explode(off))
        .select(
            F.col("id").alias("id_b"),
            F.col("xi").alias("xb"),
            F.col("yi").alias("yb"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    left = pts.select(
        F.col("id").alias("id_a"),
        F.col("xi").alias("xa"),
        F.col("yi").alias("ya"),
        "cx",
        "cy",
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= r * r))
        .select("id_a", "id_b", d2.alias("dist_sq"))
    )


@query("q_spatial_grid_join", oracle=_SPATIAL_SQL)
def q_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers within planar distance 5.00 of each other (grid join).

    Oracle is the brute-force O(n^2) cross join — feasible at sf0.01,
    exactly what the grid plan avoids at scale.
    """
    c = read_table(spark, sf_dir, "customer")
    ks = F.col("c_custkey").cast("string")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (hash32(ks) % _MOD).alias("xi"),
        (hash32(F.concat(ks, F.lit("y"))) % _MOD).alias("yi"),
    )
    return grid_distance_join(pts, _R_CENTI)
