"""Bucketed-join plan test: the fact-fact join must not shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixinversion_spark.relational import bucketing
from matrixinversion_spark.session import read_table
from tests.conftest import SF_DIR


def test_bucketed_join_no_exchange(spark):
    # bucketed twins must beat the autoBroadcast threshold, else the
    # planner broadcasts and the property under test is vacuous
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join_orders_lineitem(spark, SF_DIR)

        # the unbucketed twin of the same join+agg
        o = read_table(spark, SF_DIR, "orders")
        li = read_table(spark, SF_DIR, "lineitem")
        plain = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            )
        )

        n_bkt = bucketing.count_exchanges(joined)
        n_plain = bucketing.count_exchanges(plain)
        assert n_bkt == 1, (  # only the aggregation shuffles
            f"bucketed plan has {n_bkt} exchanges:\n"
            + joined._jdf.queryExecution().executedPlan().toString()
        )
        assert n_plain == 3  # both join inputs + aggregation

        got = joined.orderBy("o_orderstatus").collect()
        expect = plain.orderBy("o_orderstatus").collect()
        assert got == expect
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
