"""Delta-style MERGE / upsert expressed as one full-outer join.

Plain open-source Spark has no ``MERGE INTO`` target (that needs an
ACID table format), but the *dataflow* of MERGE — the single pass
that classifies every key into matched / not-matched /
not-matched-by-source and applies UPDATE / INSERT / DELETE / keep —
is a full outer join plus per-branch expressions, and that is exactly
what table formats execute underneath. This module implements that
shape as a reusable operator plus a driver-contract query.

Scale: one shuffle of each side on the merge key (or zero for the
source side when it broadcasts — typical upsert batches are tiny next
to the target table); the branch logic is row-local JVM expressions.
At 100 TB the target-side shuffle is the cost, identical to what
Delta/Iceberg pay for a copy-on-write MERGE over unpartitioned data —
partition/cluster the target by the merge key to prune it.

Reference provenance: the reference has no relational surface at all
(SURVEY.md §2.2); this is part of the mandated engine extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    on: str,
    update_set: dict[str, Column],
    insert_values: dict[str, Column],
    delete_when: Column | None = None,
) -> DataFrame:
    """MERGE semantics over DataFrames; returns the post-merge table
    with an ``action`` audit column (``update|insert|delete|keep`` —
    ``delete`` rows are classified, then dropped, so the audit trail
    and the surviving rows stay in one pass).

    - matched + ``delete_when``           → DELETE
    - matched otherwise                   → UPDATE via ``update_set``
    - source-only (not matched)           → INSERT via ``insert_values``
    - target-only (not matched by source) → keep unchanged

    Column maps are keyed by output column name; expressions may
    reference both sides via the ``t``/``s`` aliases. The target must
    already be projected to the output schema (the keep branch reads
    ``t.<output name>`` verbatim). The join broadcasts the source
    automatically below Spark's threshold; pass a
    pre-``F.broadcast()``-ed source to force it.
    """
    if set(update_set) != set(insert_values):
        raise ValueError(
            "update_set and insert_values must cover the same columns"
        )
    t, s = target.alias("t"), source.alias("s")
    tkey, skey = F.col(f"t.{on}"), F.col(f"s.{on}")
    j = t.join(s, tkey == skey, "full_outer")

    matched = tkey.isNotNull() & skey.isNotNull()
    action = (
        F.when(matched & delete_when, F.lit("delete"))
        if delete_when is not None
        else F.when(F.lit(False), F.lit("delete"))
    )
    action = (
        action.when(matched, F.lit("update"))
        .when(tkey.isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
    )

    out_cols = [F.coalesce(tkey, skey).alias(on)]
    for name in update_set:
        out_cols.append(
            F.when(F.col("action") == "update", update_set[name])
            .when(F.col("action") == "insert", insert_values[name])
            .otherwise(F.col(f"t.{name}"))
            .alias(name)
        )
    return (
        j.withColumn("action", action)
        .select(*out_cols, "action")
        .filter(F.col("action") != "delete")
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH src AS (
        SELECT o_custkey + (CASE WHEN o_custkey % 7 = 0
                                 THEN 1000000 ELSE 0 END) AS custkey,
               round(sum(o_totalprice), 2) AS delta,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-07-01'
        GROUP BY 1
    ),
    tgt AS (SELECT c_custkey AS custkey, c_acctbal, c_mktsegment
            FROM customer),
    merged AS (
        SELECT coalesce(t.custkey, s.custkey) AS custkey,
               CASE
                 WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL
                      AND s.n_orders >= 4 THEN 'delete'
                 WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL
                      THEN 'update'
                 WHEN t.custkey IS NULL THEN 'insert'
                 ELSE 'keep'
               END AS action,
               CASE
                 WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL
                      THEN round(t.c_acctbal + s.delta, 2)
                 WHEN t.custkey IS NULL THEN round(s.delta, 2)
                 ELSE t.c_acctbal
               END AS acctbal,
               CASE
                 WHEN t.custkey IS NULL THEN 'NEW'
                 ELSE t.c_mktsegment
               END AS mktsegment
        FROM tgt t FULL OUTER JOIN src s ON t.custkey = s.custkey
    )
    SELECT action, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(acctbal), 2) AS total_bal
    FROM merged WHERE action != 'delete'
    GROUP BY action
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert over the customer dim: H1-1995 order revenue is
    the change batch. Matched heavy orderers (≥4 orders) DELETE,
    other matches UPDATE (acctbal += delta), custkeys shifted out of
    range INSERT as new customers, untouched customers keep. Output
    is the per-action rollup of the merged table (count + balance
    checksum) so the driver hash-checks every branch's row routing
    AND arithmetic."""
    o = read_table(spark, sf_dir, "orders")
    src = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1995-07-01"))
        )
        .groupBy(
            (
                F.col("o_custkey")
                + F.when(F.col("o_custkey") % 7 == 0, F.lit(1000000))
                .otherwise(F.lit(0))
            ).alias("custkey")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("delta"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    tgt = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    merged = merge_upsert(
        tgt,
        src,
        on="custkey",
        update_set={
            "acctbal": F.round(F.col("t.acctbal") + F.col("s.delta"), 2),
            "mktsegment": F.col("t.mktsegment"),
        },
        insert_values={
            "acctbal": F.round(F.col("s.delta"), 2),
            "mktsegment": F.lit("NEW"),
        },
        delete_when=F.col("s.n_orders") >= 4,
    )
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("acctbal"), 2).alias("total_bal"),
    )
