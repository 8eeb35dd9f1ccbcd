"""TPC-H wave 3 — the six remaining classic shapes (Q2/Q9/Q11/Q13/Q20/Q21).

Completes the 22-query TPC-H shape inventory begun in ``tpch.py``.
TESTDATA has no ``partsupp`` table, so the four shapes that need it
derive one from ``lineitem``: per-(partkey, suppkey) aggregates stand
in for supply cost (min unit price, Q2), availability (shipped
quantity, Q20), and stock value (price x quantity, Q11);
``p_retailprice`` stands in for ``ps_supplycost`` in the Q9 profit
expression. The *plan shapes* — correlated-min decorrelation, scalar
subquery gates, left-outer count distribution, nested semi-join
chains, EXISTS/NOT-EXISTS self-joins — are the originals.

Scale notes: every dim (part / supplier / nation / region, and every
derived per-supplier set — at most one row per supplier) is broadcast;
the only shuffles are the lineitem groupBys on (partkey[, suppkey])
and the orders⋈lineitem / lineitem⋈lineitem fact joins on the order
key. Correlated subqueries are decorrelated to aggregate-then-join so
nothing re-scans the fact table per row. No driver-side loops.

Reference has no relational surface (SURVEY.md §2.2); these complete
SURVEY.md §2.3 item 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _derived_partsupp_cost(li: DataFrame) -> DataFrame:
    """partsupp stand-in: min observed unit price per (part, supplier)."""
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem GROUP BY 1, 2
    ),
    eligible AS (
        SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
        FROM ps, supplier, nation, region
        WHERE ps_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_type, round(ps_supplycost, 4) AS supplycost
    FROM eligible, part
    WHERE p_partkey = ps_partkey
      AND p_type = 'STANDARD' AND p_size <= 10
      AND ps_supplycost = (
          SELECT min(e2.ps_supplycost) FROM eligible e2
          WHERE e2.ps_partkey = eligible.ps_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: minimum-cost supplier per part in a region.

    The correlated min subquery is decorrelated into a window min over
    ``ps_partkey`` with an equality filter — one shuffle on the part
    key instead of an aggregate-plus-self-join (which costs three
    exchanges and a sort-merge join of eligible against itself). The
    supplier/nation/region side collapses to <= one row per supplier
    and is broadcast; total shuffles: the lineitem groupBy deriving
    the partsupp stand-in, then the window repartition.
    """
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    ps = _derived_partsupp_cost(li)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    supp_region = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = ps.join(supp_region, ps.l_suppkey == supp_region.s_suppkey).select(
        F.col("l_partkey").alias("ps_partkey"),
        "ps_supplycost",
        "s_name",
        "s_acctbal",
        "n_name",
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("ps_supplycost", 4).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 2) AS profit
    FROM lineitem, part, supplier, orders, nation
    WHERE l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND l_orderkey = o_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-type profit by nation and year.

    ``0.6 * p_retailprice * l_quantity`` stands in for the missing
    ``ps_supplycost * l_quantity`` cost term. part (filtered by the
    LIKE before the join), supplier, and nation broadcast; the one
    shuffle joins lineitem to orders on the order key, then a
    partial+final aggregation on (nation, year).
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("profit")
        )
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH asian AS (
        SELECT s_suppkey FROM supplier, nation, region
        WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
    ),
    value_by_part AS (
        SELECT l_partkey, sum(l_extendedprice * l_quantity) AS part_value
        FROM lineitem JOIN asian ON l_suppkey = s_suppkey
        GROUP BY l_partkey
    )
    SELECT l_partkey, round(part_value, 2) AS part_value
    FROM value_by_part
    WHERE part_value > (SELECT sum(part_value) * 0.001 FROM value_by_part)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts holding an outsized share of regional stock value.

    The scalar subquery (total value x fraction) is a one-row
    aggregate cross-joined (auto-broadcast) as the HAVING gate. The
    region's supplier set broadcasts into the lineitem scan, so the
    only shuffle is the per-part aggregation — computed once and
    reused for both the per-part values and the grand total.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    value_by_part = (
        li.join(F.broadcast(asian), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value"))
        .cache()
    )
    threshold = value_by_part.agg(
        (F.sum("part_value") * 0.001).alias("threshold")
    )
    return (
        value_by_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer.

    Left outer join keeps zero-order customers (count(o_orderkey)
    skips the nulls the outer join manufactures); the non-equi filter
    rides on the join condition, not a post-filter, so it prunes
    before the aggregation. Two shuffles: the join/count on custkey,
    then the tiny re-aggregation on c_count.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c_orders = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q20_excess_suppliers",
    oracle="""
    WITH stocked AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS avail_qty
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
        GROUP BY 1, 2
    ),
    shipped AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS year_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    )
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name IN ('NATION_1', 'NATION_2')
      AND s_suppkey IN (
          SELECT stocked.l_suppkey FROM stocked JOIN shipped
            ON stocked.l_partkey = shipped.l_partkey
           AND stocked.l_suppkey = shipped.l_suppkey
          WHERE stocked.avail_qty > 0.5 * shipped.year_qty)
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding excess stock of selected parts.

    Pre-1996 shipped quantity per (part, supplier) stands in for
    ``ps_availqty``; the original's nested-IN chain becomes two
    leftsemi joins (part-name IN pushed into the stocked aggregate's
    scan as a broadcast semi-join, supplier IN as a broadcast
    semi-join against the excess set — at most one row per supplier).
    The two lineitem aggregations share the (partkey, suppkey)
    grouping so AQE coalesces them off the same scan-side shuffle.
    """
    li = _t(spark, sf_dir, "lineitem")
    small_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    stocked = (
        li.filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .join(F.broadcast(small_parts), li.l_partkey == F.col("p_partkey"), "leftsemi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("avail_qty"))
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("sh_partkey"),
            F.col("l_suppkey").alias("sh_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("year_qty"))
    )
    excess = (
        stocked.join(
            shipped,
            (stocked.l_partkey == shipped.sh_partkey)
            & (stocked.l_suppkey == shipped.sh_suppkey),
        )
        .filter(F.col("avail_qty") > 0.5 * F.col("year_qty"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(excess), s.s_suppkey == F.col("l_suppkey"), "leftsemi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    GROUP BY s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: the supplier solely responsible for a stuck order.

    ``l_returnflag = 'R'`` stands in for the missing
    ``l_receiptdate > l_commitdate`` lateness predicate; the
    EXISTS / NOT-EXISTS self-join pair is the original shape,
    executed as a leftsemi + leftanti join of lineitem against
    itself on the order key (equi part of the condition) with the
    supplier inequality riding along — so both resolve in the same
    orderkey-shuffle layout as the orders join, and Spark/AQE reuses
    that partitioning across all three.
    """
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == F.col("o2_orderkey"))
            & (l1.l_suppkey != F.col("o2_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("o3_orderkey"))
            & (l1.l_suppkey != F.col("o3_suppkey")),
            "leftanti",
        )
        .join(o, F.col("l_orderkey") == o.o_orderkey)
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
