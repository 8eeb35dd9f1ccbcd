"""Analytic-function completions: distribution windows (ntile /
percent_rank / cume_dist), navigation windows (first / last /
nth_value), positional explode, and bucketed histograms.

All pure ``pyspark.sql.functions`` — JVM-side, codegen'd. The window
queries shuffle once on their partition key; the histogram is a
partial+final aggregation over a derived bucket column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


@query(
    "q_window_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice)  OVER w, 2) AS last_price,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions over full-partition frames:
    first / last / 2nd order price per customer history."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


@query(
    "q_posexplode",
    oracle="""
    SELECT doc_id, u.i - 1 AS pos, toks[u.i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id <= 50) d,
         unnest(generate_series(1, len(toks))) AS u(i)
    WHERE u.i <= 5
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UNNEST WITH ORDINALITY): first 5 tokens of
    each document with their positions."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .filter(F.col("pos") < 5)
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) + 1 AS BIGINT) AS bucket,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS bucket_revenue
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via width_bucket (20 buckets over
    [0, 1e6) — equivalent to floor-division binning; the oracle uses
    the floor form since DuckDB lacks width_bucket)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(1000000.0), F.lit(20))
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("bucket_revenue"),
        )
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
           count(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): supplier roster per
    nation. Expressed as collect_list → array_sort → concat_ws so the
    ordering is deterministic regardless of partitioning."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias(
                "suppliers"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@query(
    "q_from_json_struct",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS k_decile,
           count(*) AS n_events,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def q_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing (from_json → struct field access),
    vs. q_json_funcs' path-extraction form."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        F.from_json("props", "k INT").alias("p"), F.col("value")
    )
    return (
        parsed.groupBy(F.floor(F.col("p.k") / 10).cast("int").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


_LATERAL_SQL = """
SELECT n_name, t.o_orderkey, round(t.o_totalprice, 2) AS totalprice
FROM nation, LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_nationkey = n_nationkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@query("q_lateral_topk", oracle=_LATERAL_SQL)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT
    (top-2 orders per nation) — shared SQL text on both engines."""
    from matrixinversion_spark.session import load_tables

    load_tables(spark, sf_dir, ("nation", "orders", "customer"))
    return spark.sql(_LATERAL_SQL)


@query(
    "q_events_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
        FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions GROUP BY user_id, sid
    """,
)
def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` aggregation in batch (the
    same operator Structured Streaming uses for stateful session
    windows; SURVEY §2.3 item 4's batch twin through the built-in API
    rather than the manual gaps-and-islands of q_events_sessionize).

    Semantics pinned by the oracle: native session windows merge
    events strictly closer than the gap (next.ts < prev.ts + 30min),
    so the islands replay uses ``>= 1800s`` for a session break —
    NOT ``> 1800s`` (which is q_events_sessionize's inclusive-merge
    convention).

    Composition note: do NOT semi/anti-join directly on this
    aggregate's keys without materializing it first — Spark 4.1.2's
    optimizer can push such a join below the session merge and
    corrupt the result (see streaming/ops.py ``sessionized`` and
    tests/test_round13_ops.py)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_variant_json",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)),
                 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    ``parse_json`` once into a variant column, then typed path
    extraction with ``try_variant_get`` — the open-schema path for
    JSON event payloads (vs the fixed-schema ``from_json`` of
    q_from_json_struct). At scale variant parsing is JVM-side and
    columnar; the shredded access never round-trips through strings.
    """
    e = read_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.try_variant_get(
            F.parse_json("props"), "$.k", "bigint"
        ).alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )


_RECURSIVE_SQL = """
WITH RECURSIVE months(m) AS (
    SELECT DATE '1996-01-01' AS m
    UNION ALL
    SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
    WHERE m < DATE '1996-12-01'
)
SELECT CAST(year(m) * 100 + month(m) AS BIGINT) AS yyyymm,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders,
       round(coalesce(sum(o_totalprice), 0.0), 2) AS total_price
FROM months LEFT JOIN orders
  ON o_orderdate >= m
 AND o_orderdate < CAST(m + INTERVAL 1 MONTH AS DATE)
GROUP BY m
"""


@query("q_recursive_cte", oracle=_RECURSIVE_SQL)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): a month spine generated by the
    recursion, left-joined to orders for a gap-free monthly report —
    the date-dimension pattern without a physical calendar table.
    IDENTICAL SQL text runs on both engines (shared-string oracle,
    like q_lateral_topk). The spine is 12 rows, so the join
    broadcasts; orders never shuffles."""
    from matrixinversion_spark.session import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(_RECURSIVE_SQL)


@query(
    "q_hll_mergeable",
    oracle="""
    SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_groups,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS global_exact,
           TRUE AS ok
    FROM orders
    """,
)
def q_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg): per-group sketches built in one
    pass, then UNIONED into a global estimate without re-reading the
    data — the re-aggregatable-rollup pattern that makes tiered
    aggregation possible at 100 TB (store per-partition sketches,
    merge on demand; exact distinct cannot re-aggregate). Sketch
    values are engine-specific, so the row self-verifies: the exact
    global distinct rides along and ``ok`` asserts the merged
    estimate lands within the configured error bound. lgK is pinned
    explicitly (not left at the engine default) and the bound derived
    from it: HLL relative standard error ≈ 1.04/sqrt(2^lgK), so
    lgK=14 → RSE 0.81% and the 5σ bound below is ~4.1% — scale
    factor can change without the row going flaky (r2 ADVICE)."""
    _LGK = 14
    _BOUND = 5 * 1.04 / (2 ** _LGK) ** 0.5  # 5σ ≈ 0.0406
    o = read_table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey", F.lit(_LGK)).alias("sk")
    )
    merged = per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("global_exact"))
    return merged.crossJoin(exact).select(
        F.col("n_groups").cast("bigint").alias("n_groups"),
        "global_exact",
        (
            F.abs(F.col("_est") - F.col("global_exact"))
            <= _BOUND * F.col("global_exact")
        ).alias("ok"),
    )


@query(
    "q_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT re-aggregatable distinct counting via Spark 4 bitmap
    aggregates: keys bucket into 32k-bit bitmaps
    (bitmap_bucket_number / bitmap_bit_position), per-bucket bitmaps
    OR-merge, and popcounts sum — unlike HLL (q_hll_mergeable) the
    rollup stays exact, at O(key-range/8) bytes per group. The tiered
    pattern: store per-partition bitmaps, merge on demand, never
    re-scan. Hash-checked against plain COUNT(DISTINCT)."""
    o = read_table(spark, sf_dir, "orders")
    per_bucket = o.select(
        "o_orderstatus",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
        F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
    ).groupBy("o_orderstatus", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    return per_bucket.groupBy("o_orderstatus").agg(
        F.expr("sum(bitmap_count(bm))").cast("bigint").alias("n_distinct")
    )


@query(
    "q_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate,
           round(o_totalprice, 2) AS latest_totalprice
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — the SCD/changelog-compaction shape
    (keep each customer's most recent order; deterministic
    (date, orderkey) tiebreak). One shuffle on the key; the
    row_number window then scans each partition once — at 100 TB
    this is the standard "compact a CDC feed to current state"
    plan, and the same dataflow DISTINCT ON / QUALIFY lower to.
    A groupBy(max_by(...)) twin would also work; row_number
    generalizes to keep-last-N."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias(
                "latest_orderdate"
            ),
            F.round("o_totalprice", 2).alias("latest_totalprice"),
        )
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  compare: list[str]) -> DataFrame:
    """Row-level diff between two table snapshots (data-versioning /
    CDC derivation — what Delta's CDF or an Iceberg snapshot-compare
    emits): every key classified ``added | removed | changed |
    unchanged``, with the NEW side's values (OLD side's for
    ``removed``).

    One full-outer shuffle join on the key plus row-local null-safe
    comparisons (``eqNullSafe`` so NULL→NULL counts as unchanged).
    At 100 TB this is the same cost profile as ``merge_upsert``'s
    default plan; snapshot tables partitioned on the key diff
    co-located."""
    o, n = old.alias("o"), new.alias("n")
    okey, nkey = F.col(f"o.{key}"), F.col(f"n.{key}")
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(okey.isNull(), F.lit("added"))
        .when(nkey.isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = [F.coalesce(nkey, okey).alias(key)]
    for c in compare:
        out.append(F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c))
    return (
        o.join(n, okey == nkey, "full_outer")
        .select(*out, change.alias("change"))
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH snap_a AS (
        SELECT o_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders WHERE o_orderdate < DATE '1996-01-01'
        GROUP BY 1
    ),
    snap_b AS (
        SELECT o_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders WHERE o_orderdate < DATE '1996-07-01'
        GROUP BY 1
    ),
    diff AS (
        SELECT coalesce(b.custkey, a.custkey) AS custkey,
               CASE WHEN a.custkey IS NULL THEN 'added'
                    WHEN b.custkey IS NULL THEN 'removed'
                    WHEN a.n_orders IS NOT DISTINCT FROM b.n_orders
                     AND a.total    IS NOT DISTINCT FROM b.total
                         THEN 'unchanged'
                    ELSE 'changed' END AS change,
               coalesce(b.total, a.total) AS total
        FROM snap_a a FULL OUTER JOIN snap_b b ON a.custkey = b.custkey
    )
    SELECT change, CAST(count(*) AS BIGINT) AS n_keys,
           round(sum(total), 2) AS total_sum
    FROM diff GROUP BY change
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot compare: per-customer order rollups as of two dates,
    diffed with :func:`snapshot_diff`. Customers ordering only in
    H1-1996 are ``added``; repeat orderers are ``changed``; dormant
    ones ``unchanged`` (``removed`` is empty here by construction —
    snapshots are cumulative). Output is the per-change rollup so the
    driver hash-checks the classification AND the carried values."""
    o = _t(spark, sf_dir, "orders")

    def snap(cutoff: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderdate") < F.lit(cutoff))
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
        )

    diff = snapshot_diff(
        snap("1996-01-01"), snap("1996-07-01"),
        key="custkey", compare=["n_orders", "total"],
    )
    return diff.groupBy("change").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.round(F.sum("total"), 2).alias("total_sum"),
    )


@query(
    "q_data_quality_audit",
    oracle="""
    SELECT 'orders_null_custkey' AS check_name,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_pk_unique',
           CAST(count(*) AS BIGINT),
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    """,
)
def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the dbt-test / Deequ check
    suite shape): null-rate, primary-key uniqueness, referential
    integrity, and value-range constraints,
    each emitting (check, rows checked, violations).

    Every check is a single-pass conditional aggregation; the FK
    check is a broadcast-dim left join. The checks union into one
    result, so a 100 TB audit is a handful of scans with partial
    aggregation — no row-level violation materialization unless a
    check fails and is drilled into."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    def check(name: str, df: DataFrame, bad) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum(F.when(bad, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
        ).select("check_name", "n_checked", "n_violations")

    fk = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left_outer"
    )
    pk = o.agg(
        F.lit("orders_pk_unique").alias("check_name"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("n_violations"),
    ).select("check_name", "n_checked", "n_violations")
    return (
        check("orders_null_custkey", o, F.col("o_custkey").isNull())
        .unionByName(pk)
        .unionByName(
            check("orders_fk_customer", fk, F.col("c_custkey").isNull())
        )
        .unionByName(
            check(
                "lineitem_qty_range",
                li,
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            )
        )
        .unionByName(
            check(
                "lineitem_discount_range",
                li,
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
            )
        )
    )


@query(
    "q_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS ts
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.ts
        WHERE e.event_type = 'click'
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS ts
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ts
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
        SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT 'click', CAST(count(*) AS BIGINT) FROM c
        UNION ALL
        SELECT 'purchase', CAST(count(*) AS BIGINT) FROM p
    ) f
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase), the
    CEP-lite product-analytics staple: a user advances a stage only
    with an event strictly AFTER their previous stage's first event.

    Each stage is a groupBy-min over the events filtered to that
    type, joined to the previous stage's per-user timestamp — three
    shuffles on user_id which AQE plans against the same hash
    partitioning, and the stage tables shrink monotonically (later
    joins broadcast). At 100 TB the pattern holds: per-stage
    aggregates are user-cardinality-sized, never event-sized."""
    e = _t(spark, sf_dir, "events")

    def stage(etype: str, prev: DataFrame | None) -> DataFrame:
        s = e.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(
                prev.select("user_id", F.col("ts").alias("_prev_ts")),
                "user_id",
            ).filter(F.col("ts") > F.col("_prev_ts"))
        return s.groupBy("user_id").agg(F.min("ts").alias("ts"))

    v = stage("view", None)
    c = stage("click", v)
    p = stage("purchase", c)

    def count_stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        ).select("stage", "n_users")

    return (
        count_stage("view", v)
        .unionByName(count_stage("click", c))
        .unionByName(count_stage("purchase", p))
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day
        FROM events
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(active_day - cohort_day AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day,
    counted per day-offset of later activity — the standard
    engagement rollup. One user-keyed aggregation for cohort
    assignment, one distinct over (user, day), and a join that AQE
    co-partitions on user_id. Output is cohort×offset sized
    (days², not users), so the result never needs a big shuffle."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = e.select(
        "user_id", F.to_date("ts").alias("active_day")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_day", "cohort_day")
            .cast("bigint")
            .alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


@query(
    "q_gaps_islands",
    oracle="""
    WITH d AS (
        SELECT DISTINCT o_custkey AS custkey,
               CAST(o_orderdate AS DATE) AS d
        FROM orders
    ),
    r AS (
        SELECT custkey, d,
               ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY d) AS rn
        FROM d
    ),
    g AS (SELECT custkey, d, d - CAST(rn AS INTEGER) AS anchor FROM r)
    SELECT custkey,
           strftime(min(d), '%Y-%m-%d') AS streak_start,
           strftime(max(d), '%Y-%m-%d') AS streak_end,
           count(*) AS streak_days
    FROM g
    GROUP BY custkey, anchor
    HAVING count(*) >= 2
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive order days per
    customer (streak detection — the canonical sequential-pattern
    window query; reference has no relational surface, SURVEY §2.2).

    Classic row_number trick: within a customer, consecutive dates
    share ``date − row_number`` as a constant anchor, so one window
    pass plus one groupBy finds every maximal island with no self
    join. Scale plan: both the window and the aggregation partition
    by customer key — a single hash shuffle on the natural key, no
    range self-join (the O(n²) formulation this replaces)."""
    o = read_table(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).distinct()
    w = Window.partitionBy("custkey").orderBy("d")
    g = d.withColumn(
        "anchor", F.date_sub("d", F.row_number().over(w))
    )
    return (
        g.groupBy("custkey", "anchor")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
            F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        )
        .filter(F.col("streak_days") >= 2)
        .drop("anchor")
    )


@query(
    "q_incremental_agg",
    oracle="""
    SELECT o_custkey AS custkey,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price_r2
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (materialized-view refresh):
    a 'base' aggregate over the historical partition is combined with
    the aggregate of a new 'changelog' batch by merging partial
    states, never rescanning history. The oracle computes the SAME
    aggregate the naive way over all rows — hash-match proves the
    incremental path is exact.

    Scale plan: this is THE pattern that makes daily 100 TB rollups
    affordable — the refresh cost is O(delta) + a key-partitioned
    merge join against the (already partitioned/bucketed) base
    state, not O(history). count/sum are algebraic so partial states
    merge exactly; the same shape extends to any algebraic or
    sketch-mergeable aggregate (HLL — see q_hll_mergeable).
    Float note: base+delta summation differs from single-pass only
    below the 2-dp rounding."""
    o = read_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-06-01").cast("timestamp")

    def part(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("o_totalprice").alias("s"),
        )

    base = part(o.filter(F.col("o_orderdate") < cutoff))
    delta = part(o.filter(F.col("o_orderdate") >= cutoff))
    merged = base.alias("b").join(
        delta.alias("d"), "custkey", "full_outer"
    )
    return merged.select(
        "custkey",
        (
            F.coalesce(F.col("b.n"), F.lit(0))
            + F.coalesce(F.col("d.n"), F.lit(0))
        ).alias("n_orders"),
        F.round(
            F.coalesce(F.col("b.s"), F.lit(0.0))
            + F.coalesce(F.col("d.s"), F.lit(0.0)),
            2,
        ).alias("sum_price_r2"),
    )


@query(
    "q_chisq_independence",
    oracle="""
    WITH cells AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS pri,
               CAST(count(*) AS DOUBLE) AS obs
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT seg, pri, obs,
               sum(obs) OVER (PARTITION BY seg) AS row_tot,
               sum(obs) OVER (PARTITION BY pri) AS col_tot,
               sum(obs) OVER ()                 AS n
        FROM cells
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_cells,
           CAST((count(DISTINCT seg) - 1)
                * (count(DISTINCT pri) - 1) AS BIGINT)    AS dof,
           round(sum(power(obs - row_tot * col_tot / n, 2)
                     / (row_tot * col_tot / n)), 6)       AS chi2
    FROM m
    """,
)
def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (market segment × order
    priority): contingency cells by one groupBy, margins by window
    sums OVER the cell table (segment/priority cardinality rows, not
    data rows), X² as a final fold. The statistical-testing
    primitive for pipeline audits ("did the rebalance change the
    domain mix?" — companion of p_domain_mix).

    Scale plan: the only data-sized operation is the first
    aggregation (uniform two-key group); everything after runs on
    |seg|×|pri| rows. Exact-count arithmetic makes the cross-engine
    float spread last-ulp only."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("obs"))
    )
    m = cells.select(
        "seg", "pri", "obs",
        F.sum("obs").over(Window.partitionBy("seg")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("pri")).alias("col_tot"),
        F.sum("obs").over(
            Window.partitionBy()
        ).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            (F.countDistinct("seg") - 1) * (F.countDistinct("pri") - 1)
        ).cast("bigint").alias("dof"),
        F.round(
            F.sum(F.pow(F.col("obs") - exp, 2) / exp), 6
        ).alias("chi2"),
    )


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH o AS (
        SELECT event_type, value,
               (epoch_us(lead(ts) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id))
                - epoch_us(ts)) / 1e6 AS dur
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)                    AS n_intervals,
           round(sum(dur), 3)                          AS total_sec,
           round(sum(value * dur) / sum(dur), 6)       AS twap
    FROM o WHERE dur IS NOT NULL
    GROUP BY event_type
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of ``value`` per event type —
    each observation holds until the next one, so its weight is the
    interval length (the finance/metrics semantics a plain avg gets
    wrong under irregular sampling). One window pass (lead over the
    event-type partition, deterministic (ts, event_id) order) and one
    aggregation on the SAME key, so AQE reuses the exchange — the
    q_gaps_islands plan shape applied to continuous time."""
    from pyspark.sql.window import Window as W

    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    dur = (
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts")))
        / 1e6
    )
    return (
        e.select("event_type", "value", dur.alias("dur"))
        .filter(F.col("dur").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.round(F.sum("dur"), 3).alias("total_sec"),
            F.round(
                F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), 6
            ).alias("twap"),
        )
    )


@query(
    "q_cramers_v",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS pri, o_orderstatus AS st,
               CAST(count(*) AS DOUBLE) AS obs
        FROM orders GROUP BY 1, 2),
    m AS (
        SELECT pri, st, obs,
               sum(obs) OVER (PARTITION BY pri) AS row_tot,
               sum(obs) OVER (PARTITION BY st)  AS col_tot,
               sum(obs) OVER ()                 AS n
        FROM cells)
    SELECT CAST(any_value(n) AS BIGINT) AS n,
           CAST(count(DISTINCT pri) AS BIGINT) AS r,
           CAST(count(DISTINCT st) AS BIGINT)  AS c,
           round(sum(power(obs - row_tot * col_tot / n, 2)
                     / (row_tot * col_tot / n)), 6) AS chi2,
           round(sqrt(sum(power(obs - row_tot * col_tot / n, 2)
                          / (row_tot * col_tot / n))
                      / (any_value(n)
                         * (least(count(DISTINCT pri),
                                  count(DISTINCT st)) - 1))),
                 6) AS cramers_v
    FROM m
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size (order priority × order status) — the
    [0,1]-normalized association strength a drift audit reports
    NEXT TO ``q_chisq_independence``'s test statistic: χ² grows
    with n (every association is "significant" at 100 TB), V =
    sqrt(χ²/(n·(min(r,c)−1))) does not, so alerting thresholds on V
    survive data growth.

    Same plan shape as the χ² query: ONE data-sized aggregation
    (uniform two-key groupBy with map-side combine), margins as
    window sums over the r×c cell table, one final fold. Exact
    integer cell counts keep the cross-engine float spread at the
    last ulp."""
    o = read_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    m = cells.select(
        "pri", "st", "obs",
        F.sum("obs").over(Window.partitionBy("pri")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("st")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    chi2 = F.sum(F.pow(F.col("obs") - exp, 2) / exp)
    return m.agg(
        F.any_value("n").cast("bigint").alias("n"),
        F.countDistinct("pri").cast("bigint").alias("r"),
        F.countDistinct("st").cast("bigint").alias("c"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.any_value("n")
                    * (
                        F.least(
                            F.countDistinct("pri"),
                            F.countDistinct("st"),
                        )
                        - 1
                    )
                )
            ),
            6,
        ).alias("cramers_v"),
    )
