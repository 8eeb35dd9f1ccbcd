"""Bucketed tables: co-located, shuffle-free fact-fact joins.

At 100 TB the orders⋈lineitem join is the dominant shuffle; bucketing
both tables by the join key at write time (``bucketBy(n, key)``)
pre-co-locates matching rows so the join compiles to a zip of bucket
files — zero Exchange. This module owns the write path and a helper
that asserts the no-shuffle property (used by tests and as live
documentation of the plan shape).

The reference hand-rolls the same idea: its task-number partitioner
plus per-task block files ARE a bucketed layout
(`LUDecomposition.java:653-659` MyPartitioner; SURVEY.md §4 P9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from matrixinversion_spark.session import read_table


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 8) -> None:
    """Persist as a bucketed+sorted managed table (parquet)."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed prior session can leave the managed location behind
    # while the (per-process) catalog forgets the table — clear it
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = os.path.join(warehouse.removeprefix("file:"), table)
    shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join_orders_lineitem(spark: SparkSession, sf_dir: str,
                                  n_buckets: int = 8) -> DataFrame:
    """Build bucketed twins of orders/lineitem and join them.

    Returns the joined aggregate; the physical plan contains no
    Exchange on the join key (SortMergeJoin over pre-bucketed scans).
    """
    from pyspark.sql import functions as F

    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_bkt", "o_orderkey", n_buckets)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_bkt", "o_orderkey", n_buckets,
    )
    o = spark.table("orders_bkt")
    li = spark.table("lineitem_bkt")
    return (
        li.join(o, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of hash-partitioning Exchanges in the physical plan.

    Counts occurrences rather than parsing tree positions. Call
    BEFORE executing the frame — after execution AQE prints the
    adaptive plan twice and inflates the count. A bucketed
    orders⋈lineitem + groupBy plan has exactly one (the aggregation);
    the unbucketed twin has three (both join inputs + aggregation).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
