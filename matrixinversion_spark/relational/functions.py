"""Second wave of operator coverage: pivot, explode/lateral,
exact percentiles, min_by/max_by, null-safe join, union-by-name,
hopping (sliding) windows, approximate distinct counting.

Each query targets one operator family from SURVEY.md §2.3 that the
first wave didn't cover; oracle conventions as in relational.queries.
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
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linenumber = 1 THEN l_quantity END), 0), 2) AS line_1,
           round(coalesce(sum(CASE WHEN l_linenumber = 2 THEN l_quantity END), 0), 2) AS line_2,
           round(coalesce(sum(CASE WHEN l_linenumber = 3 THEN l_quantity END), 0), 2) AS line_3
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational pivot (groupBy().pivot() with an explicit value
    list — the only scale-safe form: an unlisted pivot forces an
    extra distinct pass over the data)."""
    li = _t(spark, sf_dir, "lineitem")
    pv = (
        li.filter(F.col("l_linenumber") <= 3)
        .groupBy("l_returnflag")
        .pivot("l_linenumber", [1, 2, 3])
        .sum("l_quantity")
    )
    return pv.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("1"), F.lit(0.0)), 2).alias("line_1"),
        F.round(F.coalesce(F.col("2"), F.lit(0.0)), 2).alias("line_2"),
        F.round(F.coalesce(F.col("3"), F.lit(0.0)), 2).alias("line_3"),
    )


@query(
    "q_explode_tokens",
    oracle="""
    SELECT t AS token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
    GROUP BY t
    HAVING count(*) >= 100
    """,
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode / lateral-view (UNNEST): corpus token frequencies."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 100)
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 2)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation — Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p99"),
    )


@query(
    "q_min_max_by",
    oracle="""
    SELECT n_name,
           arg_max(c_name, c_acctbal) AS richest_customer,
           arg_min(c_name, c_acctbal) AS poorest_customer,
           round(max(c_acctbal), 2) AS max_bal,
           round(min(c_acctbal), 2) AS min_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax aggregation)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", "c_acctbal").alias("richest_customer"),
            F.min_by("c_name", "c_acctbal").alias("poorest_customer"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        )
    )


@query(
    "q_null_safe_join",
    oracle="""
    WITH a AS (SELECT CASE WHEN event_type = 'click' THEN NULL
                           ELSE event_type END AS et, count(*) AS n_a
               FROM events GROUP BY 1),
         b AS (SELECT CASE WHEN event_type = 'click' THEN NULL
                           ELSE event_type END AS et,
                      round(sum(value), 2) AS v_b
               FROM events GROUP BY 1)
    SELECT a.et AS event_type, n_a, v_b
    FROM a JOIN b ON a.et IS NOT DISTINCT FROM b.et
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM) — NULL keys
    match each other instead of dropping out."""
    e = _t(spark, sf_dir, "events")
    et = F.when(F.col("event_type") == "click", None).otherwise(
        F.col("event_type")
    )
    a = e.select(et.alias("et")).groupBy("et").agg(
        F.count(F.lit(1)).alias("n_a")
    )
    b = e.select(et.alias("et"), "value").groupBy("et").agg(
        F.round(F.sum("value"), 2).alias("v_b")
    )
    return a.join(b, a.et.eqNullSafe(b.et)).select(
        a.et.alias("event_type"), "n_a", "v_b"
    )


@query(
    "q_union_by_name",
    oracle="""
    SELECT key, round(sum(amount), 2) AS total
    FROM (
        SELECT o_custkey AS key, o_totalprice AS amount FROM orders
        UNION ALL
        SELECT c_custkey AS key, c_acctbal AS amount FROM customer
    )
    GROUP BY key
    HAVING round(sum(amount), 2) > 1500000
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema-aligned union regardless of column order."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("amount"),
        F.col("o_custkey").alias("key"),
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("amount"),
    )
    return (
        o.unionByName(c)  # note: o has (amount, key), c has (key, amount)
        .groupBy("key")
        .agg(F.round(F.sum("amount"), 2).alias("total"))
        .filter(F.col("total") > 1500000)
    )


@query(
    "q_events_hopping",
    oracle="""
    SELECT strftime(date_trunc('hour', ts) - to_hours(o.off),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    CROSS JOIN (SELECT unnest([0, 1]) AS off) o
    GROUP BY 1
    """,
)
def q_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows: 2h length, 1h slide —
    every event lands in two windows. Oracle replays the window
    assignment with an explicit offset unnest."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
           count(*) OVER (
               ORDER BY o_totalprice
               RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
           ) AS n_within_1k
    FROM orders
    WHERE o_custkey <= 50
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): how many
    orders fall within ±1000 of each order's price."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.orderBy("o_totalprice").rangeBetween(-1000, 1000)
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
    )


@query(
    "q_approx_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate, self-verifying: the sketch value
    itself is engine-specific (DuckDB's HLL differs by construction), so
    the emitted row carries the exact count plus an ``ok`` boolean
    asserting |est − exact| ≤ 5% — the oracle recomputes the exact side
    and expects ``TRUE`` (same trick as the la_*_residual queries). The
    scale story: one pass, fixed memory, no expand."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
        F.countDistinct("o_custkey").alias("n_exact"),
    ).select(
        "o_orderstatus",
        "n_exact",
        (
            F.abs(F.col("_approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("ok"),
    )


@query(
    "q_sample_seeded",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total, TRUE AS ok
    FROM lineitem
    """,
)
def q_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed, self-verifying: the sampled
    subset is partition-layout-dependent (no cross-engine oracle), so
    the row carries the exact population count plus an ``ok`` boolean
    asserting the realized sample fraction is within ±1.5 percentage
    points of 10% (≫4σ for any sf ≥ 0.001) — the oracle recomputes
    the population count and expects ``TRUE``."""
    li = _t(spark, sf_dir, "lineitem")
    sampled = li.sample(fraction=0.1, seed=7).agg(
        F.count(F.lit(1)).alias("_n_sampled")
    )
    total = li.agg(F.count(F.lit(1)).alias("n_total"))
    return sampled.crossJoin(total).select(
        "n_total",
        (
            F.abs(F.col("_n_sampled") / F.col("n_total") - 0.1) <= 0.015
        ).alias("ok"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT p_partkey,
           'retail,size' AS keys_sorted,
           CAST(p_size AS DOUBLE) AS size_val,
           round(p_retailprice * 2, 2) AS retail_doubled,
           CAST(CASE WHEN p_size > 25 THEN 1 ELSE 0 END
              + CASE WHEN p_retailprice > 25 THEN 1 ELSE 0 END AS INT) AS n_big,
           round(p_retailprice + p_size, 2) AS values_sum
    FROM part
    WHERE p_partkey <= 200
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map scalar-function family: create_map, map_keys, element_at,
    transform_values / map_filter (map higher-order functions), and a
    fold over map_values — all JVM-side Catalyst expressions inside
    one whole-stage-codegen span (no shuffle, no UDF). The oracle
    computes the same scalars directly from the source columns."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    m = F.create_map(
        F.lit("size"), F.col("p_size").cast("double"),
        F.lit("retail"), F.col("p_retailprice"),
    )
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, F.lit("size")).alias("size_val"),
        F.round(
            F.element_at(F.transform_values(m, lambda k, v: v * 2), F.lit("retail")), 2
        ).alias("retail_doubled"),
        F.size(F.map_filter(m, lambda k, v: v > 25)).alias("n_big"),
        F.round(
            F.aggregate(F.map_values(m), F.lit(0.0), lambda acc, v: acc + v), 2
        ).alias("values_sum"),
    )


@query(
    "q_map_aggregate",
    oracle="""
    SELECT l_returnflag, l_linestatus AS status, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_map_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map-typed aggregate (map_from_entries over
    collect_list(struct(k, v))) then explode it back to rows. The
    collect_list sits on an already-reduced group (at most a handful
    of statuses per flag), so the map never exceeds a few entries —
    the scale-safe pattern for map aggregation: reduce first, collect
    the small reduced set, never collect raw rows."""
    li = _t(spark, sf_dir, "lineitem")
    per_status = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("qty")
    )
    as_map = per_status.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("l_linestatus"), F.col("qty")))
        ).alias("qty_by_status")
    )
    return as_map.select(
        "l_returnflag",
        F.explode("qty_by_status").alias("status", "qty_raw"),
    ).select("l_returnflag", "status", F.round("qty_raw", 2).alias("qty"))


@query(
    "q_events_gapfill",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               count(*) AS n, round(sum(value), 2) AS total
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(h) AS h0, max(h) AS h1
        FROM hourly GROUP BY 1
    ),
    spine AS (
        SELECT event_type, unnest(generate_series(h0, h1,
               INTERVAL 1 HOUR)) AS h
        FROM bounds
    )
    SELECT s.event_type,
           strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(coalesce(hourly.n, 0) AS BIGINT) AS n_events,
           round(last_value(hourly.total IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS total_locf
    FROM spine s LEFT JOIN hourly
      ON hourly.event_type = s.event_type AND hourly.h = s.h
    """,
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + LOCF: densify each event_type to its
    full hourly spine (sequence + explode — generated, never stored),
    left-join the real hourly aggregates, zero-fill counts and
    carry the last observed total forward (last_value ignoreNulls).

    Scale: the spine is rows-per-type x hours — generated at the
    aggregated grain, so the join is agg-to-agg (tiny vs the raw
    events); the LOCF window partitions by type, never globally."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.round(
                F.last("total", ignorenulls=True).over(w), 2
            ).alias("total_locf"),
        )
    )


@query(
    "q_approx_percentile",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
           round(quantile_cont(o_totalprice, 0.95), 2) AS p95_exact,
           TRUE AS ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (percentile_approx, bounded memory)
    self-verified against their exact twins: the sketch value is
    engine-specific, so the row carries the exact interpolated
    percentiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``) plus
    an ``ok`` boolean asserting both sketch estimates land within 1% —
    the oracle recomputes the exact side and expects ``TRUE``. The
    scale story: exact needs a full sort per group, the sketch is one
    pass in fixed memory."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("_p50a"),
        F.expr("percentile(o_totalprice, 0.5)").alias("_p50e"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("_p95a"),
        F.expr("percentile(o_totalprice, 0.95)").alias("_p95e"),
    )
    return agg.select(
        "o_orderstatus",
        F.round("_p50e", 2).alias("p50_exact"),
        F.round("_p95e", 2).alias("p95_exact"),
        (
            (F.abs(F.col("_p50a") - F.col("_p50e")) <= 0.01 * F.abs("_p50e"))
            & (F.abs(F.col("_p95a") - F.col("_p95e")) <= 0.01 * F.abs("_p95e"))
        ).alias("ok"),
    )


@query(
    "q_regexp_extract_all",
    oracle="""
    SELECT CAST(b AS BIGINT) AS brand_num,
           count(*) AS n_parts,
           round(avg(p_retailprice), 4) AS avg_price_r4
    FROM (
        SELECT unnest(regexp_extract_all(p_brand, '[0-9]+')) AS b,
               p_retailprice
        FROM part
    )
    GROUP BY CAST(b AS BIGINT)
    """,
)
def q_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-returning regex extraction (`regexp_extract_all`) —
    the log/ID-parsing primitive: pull every numeric group out of
    the brand string, explode, and aggregate per extracted id.

    The regex runs as a JVM expression inside whole-stage codegen
    (both engines compile `[0-9]+` identically); one aggregation
    shuffle on the extracted key. The explode is bounded by match
    count per row — no row-size blowup risk at scale."""
    p = read_table(spark, sf_dir, "part")
    return (
        p.select(
            F.explode(
                F.regexp_extract_all(F.col("p_brand"), F.lit("[0-9]+"), 0)
            ).alias("b"),
            "p_retailprice",
        )
        .groupBy(F.col("b").cast("bigint").alias("brand_num"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price_r4"),
        )
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank_r6,
           round(cume_dist() OVER w, 6) AS cume_dist_r6
    FROM customer
    WINDOW w AS (
        PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
    )
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile quartiles, percent_rank,
    cume_dist per market segment (the customer-scoring shapes).

    The order key includes the unique custkey so ntile's row
    assignment is deterministic under acctbal ties (both engines
    assign tiles by row order, so a non-deterministic order would be
    a cross-engine coin flip). One window pass = one hash shuffle on
    the segment key; all three functions share the same window frame
    so Catalyst evaluates them in a single Window operator."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank_r6"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist_r6"),
    )


@query(
    "q_regr_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
               AS n_pairs,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2)
               AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity), 2) AS avg_y
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_regr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI linear-regression aggregates (regr_slope / intercept /
    r2 / avgx / avgy / count): price-vs-quantity fit per return
    flag, entirely inside the JVM aggregate machinery — one scan,
    map-side partial moments, a 3-key final merge. The grouped-OLS
    twin of ``regress.q_ols_regression`` (which fits
    multi-feature models via mapInPandas normal equations); this
    one is the pure-SQL single-feature path both engines define
    identically, so the oracle is the same functions verbatim."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n_pairs"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 2).alias("avg_y"),
    )


@query(
    "q_bitwise_agg",
    oracle="""
    SELECT event_type,
           CAST(bit_and(event_id) AS BIGINT) AS band,
           CAST(bit_or(event_id) AS BIGINT) AS bor,
           CAST(bit_xor(event_id) AS BIGINT) AS bxor,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates over event ids per type — the
    integer-exact aggregate family behind bitmap-index style
    analytics (bit_or builds membership masks; bit_xor is the
    parity/dedup check used in set-reconciliation). All three are
    commutative/associative, so map-side partials apply and the
    result is bit-identical at any parallelism — no float hazard
    by construction."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("event_id").cast("bigint").alias("band"),
        F.bit_or("event_id").cast("bigint").alias("bor"),
        F.bit_xor("event_id").cast("bigint").alias("bxor"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
