"""Time-series and changelog operators over the events table.

Running distinct counts, linear interpolation of missing readings,
marketing-style last-touch attribution, continuous-aggregate rollup
across a time hierarchy, and changelog apply with delete markers —
the temporal layer that complements the event-windowing queries in
``queries.py`` (tumbling/hopping/sessionize) and the monitoring
layer in ``profiling.py``.

Reference provenance: no relational surface in the reference
(SURVEY.md §2.2); mandated engine extension per §2.3.

Scale notes: every window here partitions by ``user_id`` (never a
global ORDER BY — the single-partition trap), so state per task is
one user's history; the rollup is a single pass with map-side
partial aggregation; attribution adds one bounded 5-key final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


@query(
    "q_window_count_distinct",
    oracle="""
    WITH m AS (
        SELECT user_id, ts, event_id,
               CASE WHEN row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) = 1
               THEN 1 ELSE 0 END AS first_seen
        FROM events)
    SELECT user_id, event_id,
           CAST(sum(first_seen) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM m
    """,
)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — a frame Spark (and
    ANSI SQL) reject outright — via the first-occurrence trick:
    mark the first time each (user, event_type) appears
    (row_number == 1 over the pair), then a plain running SUM of the
    marker is exactly the running distinct count. Two windows, both
    partitioned by user (and user+type), so no global sort and no
    per-row set state — at 100 TB this is two user-keyed sort
    shuffles, versus the naive collect_set-over-frame whose state is
    O(distinct values) per row."""
    e = read_table(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    m = e.withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return m.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("bigint").alias(
            "distinct_types_so_far"
        ),
    )


@query(
    "q_linear_interp",
    oracle="""
    WITH k AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type <> 'error' THEN value END AS kv,
               CASE WHEN event_type <> 'error' THEN epoch_us(ts) END AS kt,
               epoch_us(ts) AS t
        FROM events),
    w AS (
        SELECT user_id, event_id, t, event_type,
               last_value(kv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pv,
               last_value(kt IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pt,
               first_value(kv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nv,
               first_value(kt IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nt
        FROM k)
    SELECT user_id, event_id,
           event_type = 'error' AS was_missing,
           round(CASE WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      WHEN nt = pt THEN pv
                      ELSE pv + (nv - pv) * (t - pt) / (nt - pt)
                 END, 6) AS value_interp
    FROM w
    """,
)
def q_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing sensor readings — the upgrade
    of ``q_events_gapfill``'s LOCF: 'error' events are treated as
    missing and rebuilt as the time-weighted blend of the nearest
    known readings on either side (LOCF/NOCB at the edges, previous
    value when both neighbours share a timestamp). Four IGNORE-NULLS
    window lookups, all partitioned by user — one user-keyed sort
    shuffle at any scale, no state beyond the frame cursor."""
    e = read_table(spark, sf_dir, "events")
    known = F.col("event_type") != "error"
    kv = F.when(known, F.col("value"))
    kt = F.when(known, F.unix_micros("ts"))
    t = F.unix_micros("ts")
    order = [F.col("ts"), F.col("event_id")]
    prev = W.partitionBy("user_id").orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    nxt = W.partitionBy("user_id").orderBy(*order).rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    pv = F.last(kv, ignorenulls=True).over(prev)
    pt = F.last(kt, ignorenulls=True).over(prev)
    nv = F.first(kv, ignorenulls=True).over(nxt)
    nt = F.first(kt, ignorenulls=True).over(nxt)
    interp = (
        F.when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .when(nt == pt, pv)
        .otherwise(pv + (nv - pv) * (t - pt) / (nt - pt))
    )
    return e.select(
        "user_id",
        "event_id",
        (~known).alias("was_missing"),
        F.round(interp, 6).alias("value_interp"),
    )


@query(
    "q_attribution_last_touch",
    oracle="""
    WITH a AS (
        SELECT event_type, value,
               coalesce(last_value(
                   CASE WHEN event_type IN ('click', 'view')
                        THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 'direct') AS channel
        FROM events)
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 2) AS revenue
    FROM a WHERE event_type = 'purchase'
    GROUP BY channel
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent click/view strictly before it in the same user's stream
    ('direct' when none precedes). One user-partitioned IGNORE-NULLS
    window lookup plus a 3-key final agg — the whole report is one
    sort shuffle and one map-side-combined aggregation at any
    scale."""
    e = read_table(spark, sf_dir, "events")
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_type")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    channel = F.coalesce(
        F.last(touch, ignorenulls=True).over(w), F.lit("direct")
    )
    return (
        e.withColumn("channel", channel)
        .filter(F.col("event_type") == "purchase")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
    )


@query(
    "q_time_rollup_hierarchy",
    oracle="""
    WITH b AS (
        SELECT EXTRACT(year FROM ts)::INTEGER AS y,
               EXTRACT(month FROM ts)::INTEGER AS m,
               EXTRACT(day FROM ts)::INTEGER AS d,
               value
        FROM events)
    SELECT CASE WHEN y IS NULL THEN 'all'
                WHEN m IS NULL THEN 'year'
                WHEN d IS NULL THEN 'month'
                ELSE 'day' END AS gran,
           y, m, d,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM b GROUP BY ROLLUP (y, m, d)
    """,
)
def q_time_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass over
    the raw events produces the day, month, year, and grand-total
    aggregates simultaneously via ROLLUP over the extracted time
    hierarchy (the batch twin of a TimescaleDB continuous
    aggregate). Map-side partials apply to every grouping set, so at
    100 TB this costs one scan plus one shuffle keyed on ~4x the
    day-level cardinality — far cheaper than four separate
    aggregations."""
    e = read_table(spark, sf_dir, "events")
    b = e.select(
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        "value",
    )
    gran = (
        F.when(F.col("y").isNull(), "all")
        .when(F.col("m").isNull(), "year")
        .when(F.col("d").isNull(), "month")
        .otherwise("day")
    )
    return (
        b.rollup("y", "m", "d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(gran.alias("gran"), "y", "m", "d", "n_events", "total_value")
    )


@query(
    "q_cdc_apply",
    oracle="""
    WITH r AS (
        SELECT user_id, event_id, value, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ops
        FROM events)
    SELECT user_id, event_id AS last_event_id, value AS last_value,
           CAST(n_ops AS BIGINT) AS n_ops
    FROM r WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog apply with delete markers: reading the event stream
    as a CDC feed (any non-error event upserts the user's state,
    'error' is a tombstone), materialize the final table — users
    whose LAST op is a tombstone are absent from the result. The
    delete-aware extension of ``q_latest_per_key``: same single
    user-keyed window (one sort shuffle, no state beyond one key's
    run), plus the tombstone filter AFTER picking the newest row,
    which is what makes the semantics MERGE-delete rather than
    just compaction."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.select(
        "user_id",
        "event_id",
        "value",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("user_id"))
        .cast("bigint")
        .alias("n_ops"),
    )
    return r.filter(
        (F.col("rn") == 1) & (F.col("event_type") != "error")
    ).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
        "n_ops",
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH p AS (
        SELECT user_id, event_type AS to_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS from_type
        FROM events),
    c AS (
        SELECT from_type, to_type, count(*) AS n
        FROM p WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_pairs,
           round(n / CAST(sum(n) OVER (PARTITION BY from_type)
                          AS BIGINT), 6) AS prob
    FROM c
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next = b | current = a), the sequence-mining summary
    behind next-action prediction and session-flow dashboards. One
    user-partitioned lag window (sort shuffle keyed on user), one
    5×5-key aggregation with map-side partials, and the
    normalization window runs over ≤ |event_type|² rows — bounded
    regardless of data scale."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(W.partitionBy("from_type"))
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(F.col("n") / tot, 6).alias("prob"),
    )


@query(
    "q_funnel_time_to_convert",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS s_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id),
    c AS (
        SELECT e.user_id,
               (epoch_us(min(e.ts)) - epoch_us(s.s_ts)) / 60000000.0
                   AS minutes
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
        GROUP BY e.user_id, s.s_ts)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(minutes, 0.5), 4) AS median_minutes,
           round(quantile_cont(minutes, 0.9), 4) AS p90_minutes
    FROM c
    """,
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: minutes from a user's first
    signup to their first subsequent purchase — the time-to-convert
    companion of ``q_funnel`` (which counts stage reach). Exact
    percentiles on both engines (same 0.5·(n−1) interpolation), so
    the oracle checks values, not just shape. Scale: two filtered
    aggregations keyed on user plus a user-keyed join — all
    map-side-combinable; the final percentile runs over the
    converted-users vector (dimension-bounded)."""
    e = read_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id", "s_ts")
        .agg(F.min("ts").alias("p_ts"))
        .select(
            (
                (F.unix_micros("p_ts") - F.unix_micros("s_ts")) / 60000000.0
            ).alias("minutes")
        )
    )
    return c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.percentile("minutes", F.lit(0.5)), 4).alias(
            "median_minutes"
        ),
        F.round(F.percentile("minutes", F.lit(0.9)), 4).alias(
            "p90_minutes"
        ),
    )


@query(
    "q_peak_concurrency",
    oracle="""
    WITH iv AS (
        SELECT event_id, epoch_us(ts) AS s,
               epoch_us(ts) + 600000000 AS e
        FROM events),
    pts AS (
        SELECT event_id, s AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT event_id, e AS t, -1 AS delta FROM iv),
    c AS (
        SELECT t, sum(delta) OVER (
                   ORDER BY t, delta DESC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM pts)
    SELECT CAST(max(cum) AS BIGINT) AS peak,
           CAST(min(CASE WHEN cum = (SELECT max(cum) FROM c)
                         THEN t END) AS BIGINT) AS peak_at_us,
           (SELECT CAST(count(*) AS BIGINT) FROM iv) AS n_intervals
    FROM c
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by interval sweep: treat each event as a
    10-minute job, emit +1/−1 boundary points, running-sum them in
    global time order, and report the maximum simultaneous count and
    the first instant it is reached — the ops-monitoring classic
    ("max concurrent sessions/queries/connections"). Starts sort
    before ends at the same instant (delta DESC), so touching
    intervals count as concurrent, identically on both engines.

    The global running sum goes through ``profiling.prefix_sum``
    (range-repartition + per-partition scan + K-row offset join) —
    NOT a single-partition ``Window.orderBy`` — so the sweep scales
    like any global sort; the two final aggregates reduce to
    scalars (the first collected driver-side, one bounded value,
    to select the argmax row in the second pass)."""
    from matrixinversion_spark.relational.profiling import prefix_sum

    e = read_table(spark, sf_dir, "events")
    s_us = F.unix_micros("ts")
    starts = e.select(
        "event_id", s_us.alias("t"), F.lit(1).alias("delta")
    )
    ends = e.select(
        "event_id",
        (s_us + 600_000_000).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionAll(ends)
    cum = prefix_sum(
        pts,
        [F.col("t").asc(), F.col("delta").desc(), F.col("event_id").asc()],
        "delta",
    )
    peak = cum.agg(F.max("cum")).collect()[0][0]  # one scalar — bounded
    n_iv = e.count()
    if peak is None:  # empty events table: one NULL row, no crash
        return spark.createDataFrame(
            [(None, None, 0)],
            "peak BIGINT, peak_at_us BIGINT, n_intervals BIGINT",
        )
    return cum.filter(F.col("cum") == peak).agg(
        F.lit(int(peak)).cast("bigint").alias("peak"),
        F.min("t").cast("bigint").alias("peak_at_us"),
        F.lit(n_iv).cast("bigint").alias("n_intervals"),
    )


@query(
    "q_acf_hourly",
    oracle="""
    WITH hourly AS (
        SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
               CAST(count(*) AS DOUBLE) AS c
        FROM events GROUP BY 1),
    pairs AS (
        SELECT l.lag AS lag, x.c AS cx, y.c AS cy
        FROM (SELECT unnest([1, 2, 3, 4, 5]) AS lag) l
        JOIN hourly x ON true
        JOIN hourly y ON y.h = x.h + l.lag)
    SELECT lag, round(corr(cx, cy), 4) AS acf,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY lag ORDER BY lag
    """,
)
def q_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lags 1-5.

    Time-series diagnostic (seasonality / burstiness detection) kept
    fully distributed: instead of a single-partition LAG window over
    the global series, the hourly series self-joins on ``h + lag = h``
    — a hash-shuffle join — and Pearson corr aggregates per lag.
    Hours with zero events are absent on both sides (inner join), and
    the oracle uses the same convention. At 100 TB the hourly rollup
    is one agg shuffle and the series is |hours| rows — tiny — but
    the same plan holds for per-key ACF (add the key to the join and
    grouping) where a global-sort window would not.
    """
    e = read_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.floor(F.unix_micros("ts") / 3600000000).cast("bigint").alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    lagged = hourly.withColumn(
        "lag", F.explode(F.array([F.lit(i) for i in range(1, 6)]))
    ).select("lag", (F.col("h") + F.col("lag")).alias("h"), F.col("c").alias("cx"))
    pairs = lagged.join(
        hourly.select("h", F.col("c").alias("cy")), "h"
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.round(F.corr("cx", "cy"), 4).alias("acf"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
        .orderBy("lag")
    )


@query(
    "q_point_in_time_join",
    oracle="""
    WITH chg AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders),
    iv AS (
        SELECT o_custkey, o_orderpriority AS priority,
               o_orderdate AS vf,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS vt
        FROM chg WHERE prev IS NULL OR prev <> o_orderpriority),
    f AS (
        SELECT o.o_custkey AS k, l.l_shipdate AS t,
               l.l_extendedprice * (1 - l.l_discount) AS rev
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT coalesce(iv.priority, 'none') AS priority_at_ship,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(f.rev), 2) AS revenue
    FROM f
    LEFT JOIN iv ON f.k = iv.o_custkey
                AND iv.vf <= f.t
                AND (iv.vt IS NULL OR f.t < iv.vt)
    GROUP BY 1
    """,
)
def q_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: attribute every shipped line item to
    the customer's order-priority REGIME that was valid on the ship
    date — the canonical "join facts to an SCD2 dimension AS OF event
    time" (feature-store training joins, bi-temporal reporting). The
    dimension timeline is q_scd2_intervals' change-point compaction
    of orders.

    Plan: the oracle's interval-containment LEFT JOIN is quadratic
    per key and unindexable at scale; the engine instead runs the
    union-marker sweep (the q_asof_join pattern): change points and
    facts union into ONE frame, one (custkey)-partitioned window
    carries the last preceding dim value onto each fact — a single
    sort shuffle regardless of interval count, ties broken
    change-point-last exactly like the oracle's zero-length-interval
    semantics ([d,d) contains nothing; the last change on date d
    owns [d, next))."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")

    wchg = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = o.select(
        "o_custkey",
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
        F.lag("o_orderpriority").over(wchg).alias("prev"),
    ).filter(
        F.col("prev").isNull()
        | (F.col("prev") != F.col("o_orderpriority"))
    )
    dim = chg.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_fact"),
        F.col("o_orderkey").alias("tie"),
        F.col("o_orderpriority").alias("priority"),
        F.lit(None).cast("double").alias("rev"),
    )
    facts = (
        li.join(o.select("o_orderkey", "o_custkey"), 
                li["l_orderkey"] == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("k"),
            F.col("l_shipdate").alias("t"),
            F.lit(1).alias("is_fact"),
            F.lit(0).cast("long").alias("tie"),
            F.lit(None).cast("string").alias("priority"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            ),
        )
    )
    # dim sorts before facts at equal t (vf <= t inclusive); among
    # same-date change points the LAST (max orderkey) wins — exactly
    # the oracle's zero-length-interval collapse
    sweep = W.partitionBy("k").orderBy(
        "t", "is_fact", "tie"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    tagged = dim.unionByName(facts).withColumn(
        "cur", F.last("priority", ignorenulls=True).over(sweep)
    )
    return (
        tagged.filter(F.col("is_fact") == 1)
        .groupBy(
            F.coalesce(F.col("cur"), F.lit("none")).alias(
                "priority_at_ship"
            )
        )
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
    )


@query(
    "q_attribution_linear",
    oracle="""
    WITH t AS (
        SELECT user_id, ts, event_id, event_type, value,
               count(*) FILTER (WHERE event_type = 'click') OVER w
                   AS c_click,
               count(*) FILTER (WHERE event_type = 'view') OVER w
                   AS c_view
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    p AS (SELECT * FROM t WHERE event_type = 'purchase')
    SELECT channel,
           CAST(n_purchases AS BIGINT) AS n_purchases,
           round(credit, 2) AS credit
    FROM (
        SELECT 'click' AS channel,
               count(*) FILTER (WHERE c_click > 0) AS n_purchases,
               sum(value * c_click / (c_click + c_view))
                   FILTER (WHERE c_click + c_view > 0) AS credit
        FROM p
        UNION ALL
        SELECT 'view',
               count(*) FILTER (WHERE c_view > 0),
               sum(value * c_view / (c_click + c_view))
                   FILTER (WHERE c_click + c_view > 0)
        FROM p
        UNION ALL
        SELECT 'direct',
               count(*) FILTER (WHERE c_click + c_view = 0),
               sum(value) FILTER (WHERE c_click + c_view = 0)
        FROM p) u
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    EQUALLY across all its preceding click/view touches in the same
    user stream (all-direct purchases keep full credit) — the
    fractional complement of q_attribution_last_touch, and the
    shape position-based (U/W) models reduce to.

    Two FILTERed counts share one user-partitioned window pass (a
    single sort shuffle); the per-purchase fractional split is
    row-local arithmetic, and the final three-channel report is one
    map-side-combined aggregation. value*c/(c1+c2): the division is
    a single IEEE op of exact integers scaled by value — both
    engines agree bit-for-bit before the 2-dp round."""
    e = read_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c_click = F.count(
        F.when(F.col("event_type") == "click", 1)
    ).over(w)
    c_view = F.count(F.when(F.col("event_type") == "view", 1)).over(w)
    p = (
        e.select(
            "event_type",
            "value",
            c_click.alias("c_click"),
            c_view.alias("c_view"),
        )
        .filter(F.col("event_type") == "purchase")
        .withColumn("c_tot", F.col("c_click") + F.col("c_view"))
    )
    agg = p.agg(
        F.sum(F.when(F.col("c_click") > 0, 1).otherwise(0)).alias("np_c"),
        F.sum(
            F.when(
                F.col("c_tot") > 0,
                F.col("value") * F.col("c_click") / F.col("c_tot"),
            )
        ).alias("cr_c"),
        F.sum(F.when(F.col("c_view") > 0, 1).otherwise(0)).alias("np_v"),
        F.sum(
            F.when(
                F.col("c_tot") > 0,
                F.col("value") * F.col("c_view") / F.col("c_tot"),
            )
        ).alias("cr_v"),
        F.sum(F.when(F.col("c_tot") == 0, 1).otherwise(0)).alias("np_d"),
        F.sum(F.when(F.col("c_tot") == 0, F.col("value"))).alias("cr_d"),
    )
    return agg.select(
        F.expr(
            "stack(3, 'click', np_c, cr_c, 'view', np_v, cr_v, "
            "'direct', np_d, cr_d) AS (channel, n_purchases, credit)"
        )
    ).select(
        "channel",
        F.col("n_purchases").cast("bigint").alias("n_purchases"),
        F.round("credit", 2).alias("credit"),
    )


@query(
    "q_kaplan_meier",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS s_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id),
    mx AS (SELECT max(ts) AS m FROM events),
    cv AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
        GROUP BY e.user_id),
    u AS (
        SELECT s.user_id,
               CAST(floor((epoch_us(coalesce(cv.p_ts, mx.m))
                           - epoch_us(s.s_ts)) / 3600000000.0)
                    AS BIGINT) AS dur,
               CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END
                   AS ev
        FROM s LEFT JOIN cv USING (user_id) CROSS JOIN mx),
    g AS (
        SELECT dur,
               CAST(sum(ev) AS BIGINT) AS d,
               CAST(sum(1 - ev) AS BIGINT) AS c
        FROM u GROUP BY dur),
    t AS (
        SELECT *, sum(d + c) OVER (ORDER BY dur) AS run,
               (SELECT sum(d + c) FROM g) AS n
        FROM g),
    k AS (SELECT *, n - (run - (d + c)) AS n_risk FROM t),
    sv AS (
        -- d = n_risk (everyone remaining converts — only possible at
        -- the last step) sends S to exactly 0; fold it as a 0-term
        -- and override, since ln(0) errors here and NULLs in Spark
        SELECT *, exp(sum(CASE WHEN d < n_risk
                               THEN ln(1 - d * 1.0 / n_risk)
                               ELSE 0 END)
                      OVER (ORDER BY dur)) AS surv
        FROM k)
    SELECT dur AS dur_hours, CAST(n_risk AS BIGINT) AS n_risk,
           d AS d_conv, c AS n_censored,
           CASE WHEN d = n_risk THEN 0.0
                ELSE round(surv, 6) END AS survival
    FROM sv WHERE d > 0
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for signup → purchase conversion
    WITH right-censoring: users who never purchase leave the risk
    set at the end of observation instead of being dropped — the
    statistically correct upgrade of ``q_funnel_time_to_convert``,
    whose converter-only percentiles are biased low whenever
    censoring is heavy (the standard mistake KM exists to fix;
    Kaplan & Meier, JASA 1958). Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over
    integer-hour durations; emitted at conversion times only (the
    curve's step points).

    Scale shape: two user-keyed filtered aggregations + one left
    join build the (duration, event) table; everything after runs
    on the duration-bounded frame — at-risk counts ride one
    ``prefix_sum`` range shuffle (grand total free via
    ``grand_total_col``), the log-survival accumulates on a second,
    and the observation horizon is an in-plan broadcast crossJoin
    of a 1-row max aggregate, never a driver collect. dᵢ/nᵢ ratios
    are exact-integer divisions (identical fp both engines); only
    the duration-bounded log sums reorder, ~1e-15 against the 6-dp
    round."""
    from matrixinversion_spark.relational.profiling import prefix_sum

    e = read_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    mx = e.agg(F.max("ts").alias("m"))
    cv = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    dur = F.floor(
        (
            F.unix_micros(F.coalesce(F.col("p_ts"), F.col("m")))
            - F.unix_micros(F.col("s_ts"))
        )
        / 3600000000.0
    ).cast("bigint")
    u = (
        s.join(cv, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            dur.alias("dur"),
            F.when(F.col("p_ts").isNotNull(), 1)
            .otherwise(0)
            .alias("ev"),
        )
    )
    g = u.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c"),
    )
    g = g.withColumn("ct", F.col("d") + F.col("c"))
    cum = prefix_sum(
        g, [F.col("dur")], "ct", out_col="run", grand_total_col="n"
    )
    k = cum.withColumn(
        "n_risk", F.col("n") - (F.col("run") - F.col("ct"))
    ).withColumn(
        # d = n_risk (terminal full-conversion step) would be ln(0) —
        # fold a 0-term and override survival to exactly 0 below
        "term",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(1 - F.col("d") * 1.0 / F.col("n_risk")),
        ).otherwise(F.lit(0.0)),
    )
    sv = prefix_sum(k, [F.col("dur")], "term", out_col="cum_term")
    return (
        sv.filter(F.col("d") > 0)
        .select(
            F.col("dur").alias("dur_hours"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").alias("d_conv"),
            F.col("c").alias("n_censored"),
            F.when(F.col("d") == F.col("n_risk"), F.lit(0.0))
            .otherwise(F.round(F.exp("cum_term"), 6))
            .alias("survival"),
        )
    )


# ---------------------------------------------------------------------------
# Holt linear-trend exponential smoothing
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5   # level smoothing
HOLT_BETA = 0.3    # trend smoothing
HOLT_HORIZON = 3   # days ahead for the demo forecast

_HOLT_SQL = f"""
WITH RECURSIVE d AS (
    SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS y
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
i AS (
    SELECT event_type, y,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY day) AS t
    FROM d),
h AS (
    SELECT a.event_type, 2 AS t, b.y AS lv, b.y - a.y AS tr
    FROM i a JOIN i b ON a.event_type = b.event_type
                     AND a.t = 1 AND b.t = 2
    UNION ALL
    SELECT h.event_type, i.t,
           {HOLT_ALPHA} * i.y
               + (1 - {HOLT_ALPHA}) * (h.lv + h.tr),
           {HOLT_BETA} * ({HOLT_ALPHA} * i.y
               + (1 - {HOLT_ALPHA}) * (h.lv + h.tr) - h.lv)
               + (1 - {HOLT_BETA}) * h.tr
    FROM h JOIN i ON i.event_type = h.event_type
                 AND i.t = h.t + 1)
SELECT event_type, CAST(t AS BIGINT) AS n_days,
       round(lv, 6) AS level, round(tr, 6) AS trend,
       round(lv + {HOLT_HORIZON} * tr, 6) AS forecast
FROM h
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY t DESC) = 1
"""


@query("q_holt_linear", oracle=_HOLT_SQL)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend (double) exponential smoothing per event
    type over the daily mean-value series, plus the h-step-ahead
    forecast level + h·trend — the trend-aware upgrade of
    ``q_ewma`` (whose single exponential average cannot forecast a
    drifting series). Textbook init l₂=y₂, b₂=y₂−y₁ (statsmodels'
    "legacy-heuristic" Holt).

    Unlike the EWMA, Holt's coupled level/trend recursion has no
    order-reducible closed form, so this is the honest sequential
    case: the fact table collapses JVM-side to one row per
    (series, day) — the ONLY data-sized stage — and the recursion
    runs per series in an Arrow-batched ``applyInPandas`` over
    series-length arrays (30 points here; bounded by the calendar,
    not the data, at any corpus size). Series parallelize across
    the cluster; per-series state is two doubles. The recursion is
    a contraction (|1−α|,|1−β| < 1), so the ~1e-13 cross-engine
    reorder in the daily means damps instead of compounding —
    far inside the 6-dp round. Series with <2 days drop on both
    sides (no trend is estimable)."""
    import pandas as pd

    d = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.avg("value").alias("y"))
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        y = pdf["y"].to_numpy()
        if len(y) < 2:
            return pd.DataFrame(
                columns=["event_type", "n_days", "lv", "tr"]
            )
        lv, tr = y[1], y[1] - y[0]
        for t in range(2, len(y)):
            nxt = HOLT_ALPHA * y[t] + (1 - HOLT_ALPHA) * (lv + tr)
            tr = HOLT_BETA * (nxt - lv) + (1 - HOLT_BETA) * tr
            lv = nxt
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(y)],
                "lv": [lv],
                "tr": [tr],
            }
        )

    out = d.groupBy("event_type").applyInPandas(
        kernel,
        schema="event_type string, n_days long, lv double, tr double",
    )
    return out.select(
        "event_type",
        "n_days",
        F.round("lv", 6).alias("level"),
        F.round("tr", 6).alias("trend"),
        F.round(
            F.col("lv") + HOLT_HORIZON * F.col("tr"), 6
        ).alias("forecast"),
    )


@query(
    "q_seasonal_decompose",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS dt,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS c
        FROM orders GROUP BY 1),
    ma AS (
        SELECT dt, c,
               avg(c)   OVER w AS trend_c,
               count(*) OVER w AS w_n
        FROM d
        WINDOW w AS (ORDER BY dt
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
        SELECT dt, c, trend_c, c - trend_c AS detr,
               CAST(strftime(dt, '%w') AS INT) AS dow
        FROM ma WHERE w_n = 7),
    dowavg AS (
        SELECT dow, avg(detr) AS raw_seas FROM det GROUP BY 1),
    seas AS (
        SELECT dow, raw_seas - avg(raw_seas) OVER () AS seas_c
        FROM dowavg)
    SELECT strftime(det.dt, '%Y-%m-%d') AS day,
           det.dow,
           round(det.c / 100.0, 2) AS revenue,
           round(det.trend_c / 100.0, 6) AS trend,
           round(seas.seas_c / 100.0, 6) AS seasonal,
           round((det.detr - seas.seas_c) / 100.0, 6) AS residual
    FROM det JOIN seas ON det.dow = seas.dow
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue
    (statsmodels ``seasonal_decompose`` semantics, period = 7):
    trend = centered 7-day moving average (full windows only),
    seasonal = mean-centered day-of-week average of the detrended
    series, residual = the rest — the y = T + S + R split every
    metric dashboard's anomaly band is built on, and the
    decomposition behind ``q_seasonal_dow_index``'s ratio summary.

    Exactness: daily revenue in integer cents (the
    q_cusum_changepoint trick), so the 7-day means are exact-int
    divisions by 7 and the DOW means exact-int divisions — both
    engines produce identical doubles. Scale shape: the fact scan
    collapses to one row per DAY (the only data-sized stage); the
    moving-average window and the 7-row seasonal frame run on the
    calendar-bounded daily series — the q_holt_linear argument: at
    ANY corpus size the series length is bounded by the date range,
    and a per-key variant partitions the same windows by series
    key."""
    o = read_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("c")
    )
    wma = W.orderBy("dt").rowsBetween(-3, 3)
    ma = d.select(
        "dt",
        "c",
        F.avg("c").over(wma).alias("trend_c"),
        F.count(F.lit(1)).over(wma).alias("w_n"),
    )
    det = ma.filter(F.col("w_n") == 7).select(
        "dt",
        "c",
        "trend_c",
        (F.col("c") - F.col("trend_c")).alias("detr"),
        (F.dayofweek("dt") - 1).alias("dow"),
    )
    dowavg = det.groupBy("dow").agg(F.avg("detr").alias("raw_seas"))
    seas = dowavg.select(
        "dow",
        (
            F.col("raw_seas") - F.avg("raw_seas").over(W.partitionBy())
        ).alias("seas_c"),
    )
    return det.join(F.broadcast(seas), "dow").select(
        F.date_format("dt", "yyyy-MM-dd").alias("day"),
        "dow",
        F.round(F.col("c") / 100.0, 2).alias("revenue"),
        F.round(F.col("trend_c") / 100.0, 6).alias("trend"),
        F.round(F.col("seas_c") / 100.0, 6).alias("seasonal"),
        F.round(
            (F.col("detr") - F.col("seas_c")) / 100.0, 6
        ).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution
# ---------------------------------------------------------------------------

MARKOV_STEPS = 12  # fixed absorption horizon (deterministic, both engines)


def _markov_sql(steps: int) -> str:
    """Unrolled DuckDB twin of the fixed-step absorption iteration."""
    head = """
WITH rnq AS MATERIALIZED (
    SELECT user_id,
           CASE WHEN event_type = 'purchase' THEN 'conv'
                ELSE event_type END AS state,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events),
seq AS MATERIALIZED (
    SELECT user_id, state, rn,
           min(CASE WHEN state = 'conv' THEN rn END)
               OVER (PARTITION BY user_id) AS fp,
           max(rn) OVER (PARTITION BY user_id) AS mx
    FROM rnq),
tr AS MATERIALIZED (
    SELECT user_id, rn, state, fp, mx,
           coalesce(lag(state) OVER (PARTITION BY user_id
                                     ORDER BY rn), 'start') AS prev
    FROM seq WHERE rn <= coalesce(fp, mx)),
m AS MATERIALIZED (
    SELECT prev AS s, state AS t, count(*) AS c FROM tr
    GROUP BY 1, 2
    UNION ALL
    SELECT state AS s, 'null' AS t, count(*) AS c
    FROM tr WHERE fp IS NULL AND rn = mx
    GROUP BY 1),
p AS MATERIALIZED (
    SELECT s, t, c * 1.0 / sum(c) OVER (PARTITION BY s) AS p
    FROM (SELECT s, t, sum(c) AS c FROM m GROUP BY 1, 2)),
ch AS MATERIALIZED (
    SELECT DISTINCT state AS chain FROM tr
    WHERE state NOT IN ('conv', 'null')
    UNION ALL SELECT 'full'),
pm AS MATERIALIZED (
    SELECT ch.chain, p.s,
           CASE WHEN ch.chain != 'full' AND p.t = ch.chain
                THEN 'null' ELSE p.t END AS t,
           p.p
    FROM ch, p
    UNION ALL
    SELECT ch.chain, a.st, a.st, 1.0
    FROM ch, (VALUES ('conv'), ('null')) AS a(st)),
v0 AS MATERIALIZED (
    SELECT chain, 'start' AS s, 1.0 AS mass FROM ch)"""
    ctes = [head]
    for i in range(1, steps + 1):
        ctes.append(
            f"""v{i} AS MATERIALIZED (
    SELECT v.chain, pm.t AS s, sum(v.mass * pm.p) AS mass
    FROM v{i - 1} v
    JOIN pm ON pm.chain = v.chain AND pm.s = v.s
    GROUP BY 1, 2)"""
        )
    return (
        ",\n".join(ctes)
        + f""",
conv AS (
    -- LEFT JOIN from the chain list: a removal that zeroes
    -- conversion leaves NO s='conv' row for its chain, and an
    -- inner-join formulation would silently DROP that channel
    -- (and misnormalize the rest) — exactly the channels with
    -- removal effect 1.0
    SELECT ch.chain, coalesce(v.p_conv, 0) AS p_conv
    FROM ch LEFT JOIN (
        SELECT chain, sum(mass) AS p_conv
        FROM v{steps} WHERE s = 'conv' GROUP BY 1) v
      USING (chain)),
eff AS (
    SELECT c.chain AS channel,
           greatest(f.p_conv - c.p_conv, 0) / f.p_conv AS effect
    FROM conv c, (SELECT p_conv FROM conv WHERE chain = 'full') f
    WHERE c.chain != 'full' AND f.p_conv > 0)
SELECT channel,
       round(effect, 6) AS removal_effect,
       CASE WHEN sum(effect) OVER () > 0
            THEN round(effect / sum(effect) OVER (), 6)
       END AS attribution
FROM eff"""
    )


@query("q_attribution_markov", oracle=_markov_sql(MARKOV_STEPS))
def q_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014) — the
    data-driven member completing the attribution family
    (``q_attribution_last_touch``, ``q_attribution_linear``): fit a
    first-order Markov chain over user journeys (states = channels,
    absorbing 'conv' on first purchase, 'null' on journey end),
    then credit each channel by how much the chain's conversion
    probability DROPS when that channel's inflow is redirected to
    'null' — the standard counterfactual the heuristic models
    can't express.

    Journeys truncate at the first purchase; transition counts come
    from one lag window per user (bounded per-user history, the
    q_attribution_* shuffle) — the ONLY data-sized stage. The
    transition matrix is |S|² ≤ 49 exact-integer rows, i.e. bounded
    state: it collects to the driver (the ``_two_sample_counts``
    precedent) and the ``MARKOV_STEPS`` fixed matrix-vector
    absorption steps run per chain in plain Python — deterministic,
    and the oracle unrolls the identical recurrence as CTEs. (A
    first cut iterated the 35-row vector frame distributively:
    correct, but 12 joins + checkpoints on channel-cardinality
    frames cost ~25 s of pure task/planning overhead — driver math
    on bounded state is the honest plan, exactly like the leaf
    kernels in the matrix layer.) Removal semantics: transitions
    INTO the removed channel die, no renormalization — the 'visits
    would not have happened' counterfactual; absorbing self-loops
    make the fixed-step truncation exact as transient mass decays
    geometrically."""
    e = read_table(spark, sf_dir, "events")
    # The chain machinery reserves 'start'/'conv'/'null'/'full' as
    # sentinel states; a REAL channel with one of those names would
    # silently merge into the sentinel identically in Spark and the
    # oracle, so the hash gate could never catch it (ADVICE r10).
    # Fail loudly instead: one column-pruned pushed-filter probe
    # ('purchase' maps to 'conv' deliberately, so it is exempt).
    collision = (
        e.filter(
            F.col("event_type").isin("start", "conv", "null", "full")
        )
        .select("event_type")
        .limit(1)
        .collect()
    )
    if collision:
        raise ValueError(
            "q_attribution_markov: event_type "
            f"{collision[0][0]!r} collides with a reserved Markov "
            "sentinel state ('start'/'conv'/'null'/'full') — rename "
            "the channel or namespace the sentinels before fitting"
        )
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    wall_u = W.partitionBy("user_id")
    seq = e.select(
        "user_id",
        F.when(F.col("event_type") == "purchase", "conv")
        .otherwise(F.col("event_type"))
        .alias("state"),
        F.row_number().over(wu).alias("rn"),
    )
    seq = seq.select(
        "*",
        F.min(
            F.when(F.col("state") == "conv", F.col("rn"))
        ).over(wall_u).alias("fp"),
        F.max("rn").over(wall_u).alias("mx"),
    )
    tr = seq.filter(
        F.col("rn") <= F.coalesce(F.col("fp"), F.col("mx"))
    ).select(
        "user_id",
        "rn",
        "state",
        "fp",
        "mx",
        F.coalesce(
            F.lag("state").over(
                W.partitionBy("user_id").orderBy("rn")
            ),
            F.lit("start"),
        ).alias("prev"),
    )
    m = (
        tr.select(F.col("prev").alias("s"), F.col("state").alias("t"))
        .unionAll(
            tr.filter(
                F.col("fp").isNull() & (F.col("rn") == F.col("mx"))
            ).select(
                F.col("state").alias("s"), F.lit("null").alias("t")
            )
        )
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # bounded state: |S|² ≤ 49 exact-integer transition counts.
    # SORT the collected rows — dict iteration follows partition
    # arrival order otherwise, and the absorption sums below must
    # add in a fixed order to be run-deterministic in the last ulp
    counts = {
        (r["s"], r["t"]): r["c"]
        for r in sorted(m.collect(), key=lambda r: (r["s"], r["t"]))
    }
    row_tot: dict[str, int] = {}
    for (s, _t), c in counts.items():
        row_tot[s] = row_tot.get(s, 0) + c
    prob = {
        (s, t): c / row_tot[s] for (s, t), c in counts.items()
    }
    channels = sorted(
        ({s for s, _ in counts} | {t for _, t in counts})
        - {"start", "conv", "null"}
    )

    def p_conv(removed: str | None) -> float:
        # mass redirected INTO `removed` dies (becomes null); conv
        # and null are absorbing, so only transient mass iterates
        mass = {"start": 1.0}
        conv = 0.0
        for _ in range(MARKOV_STEPS):
            nxt: dict[str, float] = {}
            for s, ms in mass.items():
                for (ps, t), pr in prob.items():
                    if ps != s or t == removed:
                        continue
                    if t == "conv":
                        conv += ms * pr
                    elif t != "null":
                        nxt[t] = nxt.get(t, 0.0) + ms * pr
            mass = nxt
        return conv

    schema = (
        "channel string, removal_effect double, attribution double"
    )
    full = p_conv(None)
    if full == 0.0:
        # no conversions reachable: attribution undefined — empty
        # result, matching the oracle's f.p_conv > 0 filter
        return spark.createDataFrame([], schema)
    effects = {
        c: max(full - p_conv(c), 0.0) / full for c in channels
    }
    tot_eff = sum(effects.values())
    rows = [
        (
            c,
            round(effects[c], 6),
            round(effects[c] / tot_eff, 6) if tot_eff > 0 else None,
        )
        for c in channels
    ]
    return spark.createDataFrame(rows, schema)
