"""Branch-routing tests for the MERGE/upsert operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixinversion_spark.relational.merge import merge_upsert


def test_all_four_branches(spark):
    tgt = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double"
    )
    src = spark.createDataFrame(
        # k=1 updates, k=2 deletes (flag), k=9 inserts, k=3 untouched
        [(1, 5.0, False), (2, 0.0, True), (9, 99.0, False)],
        "k int, dv double, kill boolean",
    )
    out = merge_upsert(
        tgt,
        src,
        on="k",
        update_set={"v": F.col("t.v") + F.col("s.dv")},
        insert_values={"v": F.col("s.dv")},
        delete_when=F.col("s.kill"),
    )
    rows = {r["k"]: (r["v"], r["action"]) for r in out.collect()}
    assert rows == {
        1: (15.0, "update"),
        3: (30.0, "keep"),
        9: (99.0, "insert"),
    }


def test_no_delete_branch(spark):
    tgt = spark.createDataFrame([(1, 1.0)], "k int, v double")
    src = spark.createDataFrame([(1, 2.0)], "k int, dv double")
    out = merge_upsert(
        tgt,
        src,
        on="k",
        update_set={"v": F.col("s.dv")},
        insert_values={"v": F.col("s.dv")},
    )
    assert out.collect()[0]["v"] == 2.0


def test_mismatched_column_maps_rejected(spark):
    import pytest

    tgt = spark.createDataFrame([(1, 1.0)], "k int, v double")
    with pytest.raises(ValueError, match="same columns"):
        merge_upsert(
            tgt, tgt, on="k",
            update_set={"v": F.lit(0.0)},
            insert_values={"w": F.lit(0.0)},
        )
