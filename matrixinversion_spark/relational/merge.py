"""Delta-style MERGE / upsert expressed as one full-outer join.

Plain open-source Spark has no ``MERGE INTO`` target (that needs an
ACID table format), but the *dataflow* of MERGE — the single pass
that classifies every key into matched / not-matched /
not-matched-by-source and applies UPDATE / INSERT / DELETE / keep —
is a full outer join plus per-branch expressions, and that is exactly
what table formats execute underneath. This module implements that
shape as a reusable operator plus a driver-contract query.

Scale: the default strategy is one shuffle of EACH side on the merge
key — Spark cannot broadcast either side of a ``full_outer`` join, so
the source shuffles too, however small. At 100 TB the target-side
shuffle is the cost, identical to what Delta/Iceberg pay for a
copy-on-write MERGE over unpartitioned data — partition/cluster the
target by the merge key to prune it. For the common case where the
change batch is tiny next to the target, ``strategy="broadcast"``
replaces the full-outer join with two broadcast joins against the
target (left-outer classify + semi/anti insert derivation): the
target side never shuffles at all, at the price of a second target
scan — the same trade Delta's low-shuffle merge makes.

Reference provenance: the reference has no relational surface at all
(SURVEY.md §2.2); this is part of the mandated engine extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


def _guard_unique_source_key(source: DataFrame, on: str) -> DataFrame:
    """Fold a duplicate-merge-key assertion into the source's key.

    Delta/Iceberg MERGE raises when multiple source rows match one
    target row (the update would be nondeterministic); the full-outer
    dataflow would instead silently fan matched target rows out. This
    reproduces the Delta error, distributed and lazily: a window count
    over the key, asserted ``== 1`` via ``assert_true`` and coalesced
    into the join key itself so column pruning cannot drop the check.
    The window's hash partitioning is on the same key the downstream
    join shuffles on, so the exchange is reused — the guard adds no
    extra wide stage to the default strategy.
    """
    from pyspark.sql.window import Window

    key_type = source.schema[on].dataType
    n_with_key = F.count(F.lit(1)).over(Window.partitionBy(on))
    guard = F.assert_true(
        n_with_key == 1,
        F.concat(
            F.lit("merge_upsert: multiple source rows match merge key "),
            F.col(on).cast("string"),
        ),
    )
    return source.withColumn(
        on, F.coalesce(guard.cast(key_type), F.col(on))
    )


def _delete_action(matched: Column, delete_when: Column | None) -> Column:
    if delete_when is not None:
        return F.when(matched & delete_when, F.lit("delete"))
    return F.when(F.lit(False), F.lit("delete"))


def _branch_values(
    on: str, update_set: dict[str, Column], insert_values: dict[str, Column]
) -> list[Column]:
    out = []
    for name in update_set:
        out.append(
            F.when(F.col("action") == "update", update_set[name])
            .when(F.col("action") == "insert", insert_values[name])
            .otherwise(F.col(f"t.{name}"))
            .alias(name)
        )
    return out


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    on: str,
    update_set: dict[str, Column],
    insert_values: dict[str, Column],
    delete_when: Column | None = None,
    *,
    strategy: str = "full_outer",
    on_duplicate_source: str = "error",
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
    ``t.<output name>`` verbatim).

    ``strategy``:

    - ``"full_outer"`` (default): one full-outer join. Both sides
      shuffle on the key — Spark cannot broadcast any side of a
      full-outer join — which is the right plan when the change batch
      is a meaningful fraction of the target.
    - ``"broadcast"``: the small-batch plan. The target is scanned
      twice but NEVER shuffled: (1) a broadcast left-outer join
      classifies update/delete/keep rows, (2) a broadcast semi join
      extracts the matched keys, and the inserts are the source
      anti-joined against that (small × small). Requires the source
      (and its key set) to fit in a broadcast; raises at plan time
      only if Spark refuses, at runtime if the broadcast exceeds
      ``spark.sql.maxBroadcastTableBytes``-style limits.

    ``on_duplicate_source``: ``"error"`` (default) reproduces
    Delta/Iceberg semantics — if several source rows carry the same
    merge key the job fails with a clear message instead of silently
    fanning out matched target rows; ``"allow"`` skips the check
    (caller guarantees uniqueness, e.g. the source is a groupBy on
    the key).
    """
    if set(update_set) != set(insert_values):
        raise ValueError(
            "update_set and insert_values must cover the same columns"
        )
    if strategy not in ("full_outer", "broadcast"):
        raise ValueError(f"unknown merge strategy: {strategy!r}")
    if on_duplicate_source not in ("error", "allow"):
        raise ValueError(
            f"unknown on_duplicate_source mode: {on_duplicate_source!r}"
        )
    if on_duplicate_source == "error":
        source = _guard_unique_source_key(source, on)

    value_names = list(update_set)
    if strategy == "broadcast":
        t = target.alias("t")
        s = F.broadcast(source).alias("s")
        tkey, skey = F.col(f"t.{on}"), F.col(f"s.{on}")
        # pass 1: classify every target row (update/delete/keep);
        # broadcast hash left-outer — zero target-side movement.
        j = t.join(s, tkey == skey, "left_outer")
        matched = skey.isNotNull()
        action = (
            _delete_action(matched, delete_when)
            .when(matched, F.lit("update"))
            .otherwise(F.lit("keep"))
        )
        classified = j.withColumn("action", action).select(
            tkey.alias(on),
            *_branch_values(on, update_set, insert_values),
            "action",
        )
        # pass 2: keys the target DOES contain (broadcast semi, output
        # bounded by the source size) → inserts are source ∖ hits,
        # a small-×-small broadcast anti join. The target never
        # shuffles in either pass.
        hits = (
            target.join(F.broadcast(source), on=on, how="left_semi")
            .select(F.col(on).alias("_hit_key"))
        )
        s2 = source.alias("s")
        inserts = (
            s2.join(
                F.broadcast(hits),
                F.col(f"s.{on}") == F.col("_hit_key"),
                "left_anti",
            )
            .withColumn("action", F.lit("insert"))
            .select(
                F.col(f"s.{on}").alias(on),
                *[insert_values[name].alias(name) for name in value_names],
                "action",
            )
        )
        return classified.unionByName(inserts).filter(
            F.col("action") != "delete"
        )

    t, s = target.alias("t"), source.alias("s")
    tkey, skey = F.col(f"t.{on}"), F.col(f"s.{on}")
    j = t.join(s, tkey == skey, "full_outer")

    matched = tkey.isNotNull() & skey.isNotNull()
    action = (
        _delete_action(matched, delete_when)
        .when(matched, F.lit("update"))
        .when(tkey.isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
    )

    out_cols = [F.coalesce(tkey, skey).alias(on)]
    out_cols.extend(_branch_values(on, update_set, insert_values))
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
        # source is a groupBy on the merge key, so uniqueness holds by
        # construction — skip the runtime guard to keep the plan at
        # its r4 shape (one full-outer shuffle join, no window stage).
        on_duplicate_source="allow",
    )
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("acctbal"), 2).alias("total_bal"),
    )


@query(
    "q_merge_upsert_broadcast",
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
               END AS acctbal
        FROM tgt t FULL OUTER JOIN src s ON t.custkey = s.custkey
    )
    SELECT action, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(acctbal), 2) AS total_bal
    FROM merged WHERE action != 'delete'
    GROUP BY action
    """,
)
def q_merge_upsert_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-batch MERGE plan (``strategy="broadcast"``): same
    change-batch semantics as ``q_merge_upsert``, executed with ZERO
    target-side shuffles — a broadcast left-outer classify pass plus
    a broadcast semi/anti insert derivation (see
    :func:`merge_upsert`). The oracle is the identical full-outer
    formulation: both strategies must produce the same merged table,
    and the driver hash-checks that equivalence end-to-end. The
    duplicate-source guard stays ON here (unlike the full-outer twin)
    so the guarded dataflow also earns a driver row; the source-side
    window it adds is over the already-grouped tiny batch."""
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
        strategy="broadcast",
    )
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("acctbal"), 2).alias("total_bal"),
    )
