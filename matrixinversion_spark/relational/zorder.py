"""Z-order (Morton) clustering for multi-column data skipping.

The 100 TB problem this solves: parquet min/max file statistics prune
scans only along the sort order — sorting by one column destroys
locality in every other. Interleaving the bits of several columns
into one Morton key and range-partitioning + sorting by it gives
every interleaved column partial locality, so filters on ANY of them
skip files (the layout optimization behind Delta's OPTIMIZE ZORDER BY
and Iceberg's sort-order z-order).

Spark-first: the Morton key is a pure JVM bit-arithmetic column
(shiftleft/shiftright/bitwise AND unrolled over the bit positions —
whole-stage-codegen'd, no UDF), and the layout step is
``repartitionByRange`` + ``sortWithinPartitions`` on it: one range
shuffle, exactly what a table OPTIMIZE pays.

Reference provenance: the reference has no relational/storage surface
(SURVEY.md §2.2); engine extension per §2.3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table

ZBITS = 8  # bits kept per column (256 buckets each)


def morton_interleave(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int
    columns into a Morton (Z-curve) key: x occupies even bit
    positions, y odd. Unrolled JVM expression — identical arithmetic
    is emitted for the DuckDB oracle by :func:`morton_sql`."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("bigint"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(y.cast("bigint"), i) % 2, 2 * i + 1)
        )
    return z


def quantize(col: Column, lo: float, hi: float,
             bits: int = ZBITS) -> Column:
    """Min-max quantization of a numeric column onto [0, 2^bits):
    the step that makes Morton interleaving effective. Without it, a
    column whose values span a narrow slice of its bucket domain
    contributes near-constant bits and gets NO locality from the
    curve (measured: p_retailprice spans 900–999.9, so a /16 bucket
    uses 7 of 256 codes and the z-layout left its file envelopes
    unchanged). Bounds come from cheap column stats (a min/max agg —
    at 100 TB, one partial+final pass or the catalog's existing
    stats); clamped so out-of-bounds late data degrades, not errors.
    """
    span = (1 << bits) - 1
    q = F.floor((col - F.lit(lo)) * span / F.lit(hi - lo)).cast("bigint")
    return F.greatest(F.lit(0), F.least(F.lit(span), q))


def morton_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """DuckDB SQL twin of :func:`morton_interleave`."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(df: DataFrame, x: Column, y: Column,
                  n_files: int = 8, bits: int = ZBITS) -> DataFrame:
    """Cluster ``df`` for writing: range-partition + sort on the
    Morton key of (x, y). The returned frame, written with one file
    per partition, yields tight per-file min/max envelopes on BOTH
    columns (verified by the footer-statistics pytest)."""
    keyed = df.withColumn("_z", morton_interleave(x, y, bits))
    return (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


@query(
    "q_zorder_key",
    oracle=f"""
    SELECT p_partkey,
           {morton_sql("(p_size % 256)",
                       "(CAST(floor(p_retailprice / 16) AS BIGINT) % 256)")}
               AS zvalue
    FROM part WHERE p_partkey <= 500
    """,
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key computation over the part table (size × price
    buckets), hash-checked bit-for-bit against the identically
    unrolled DuckDB arithmetic. The layout step itself (range
    partition + sort) is exercised by the footer-statistics pytest —
    an ordering property, not a row-value one, so it is not
    SQL-hashable."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    zx = F.col("p_size") % 256
    zy = F.floor(F.col("p_retailprice") / 16).cast("bigint") % 256
    return p.select(
        "p_partkey", morton_interleave(zx, zy).alias("zvalue")
    )
