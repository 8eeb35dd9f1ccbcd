"""Z-order layout: Morton math + the pruning property it exists for."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from matrixinversion_spark.relational.zorder import (
    morton_interleave,
    quantize,
    zorder_layout,
)
from matrixinversion_spark.session import read_table
from tests.conftest import SF_DIR


def test_morton_math(spark):
    rows = (
        spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x int, y int"
        )
        .select(morton_interleave(F.col("x"), F.col("y")).alias("z"))
        .collect()
    )

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    expect = [ref(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (3, 5),
                                     (255, 255)]]
    assert [r["z"] for r in rows] == expect
    assert expect[-1] == 65535  # full 16-bit key


def test_zorder_write_tightens_file_stats(spark, tmp_path):
    """The point of the layout: per-file min/max envelopes on BOTH
    interleaved columns must be much tighter than a hash-shuffled
    write's, so parquet footer stats prune on either column."""
    p = read_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    lo_s, hi_s, lo_p, hi_p = p.agg(
        F.min("p_size"), F.max("p_size"),
        F.min("p_retailprice"), F.max("p_retailprice"),
    ).collect()[0]
    zx = quantize(F.col("p_size"), lo_s, hi_s)
    zy = quantize(F.col("p_retailprice"), lo_p, hi_p)

    z_dir, h_dir = str(tmp_path / "z"), str(tmp_path / "h")
    zorder_layout(p, zx, zy, n_files=8).write.parquet(z_dir)
    p.repartition(8).write.parquet(h_dir)

    def envelope_sum(d: str, col: str) -> float:
        # per-file value envelope (what footer min/max stats encode)
        total = 0.0
        for f in glob.glob(f"{d}/*.parquet"):
            arr = pq.read_table(f, columns=[col]).column(0).to_pylist()
            total += max(arr) - min(arr)
        return total

    for col in ("p_size", "p_retailprice"):
        z_env = envelope_sum(z_dir, col)
        h_env = envelope_sum(h_dir, col)
        assert z_env < h_env * 0.6, (
            f"{col}: z-order envelope {z_env} not tighter than "
            f"hash-shuffle {h_env}"
        )
