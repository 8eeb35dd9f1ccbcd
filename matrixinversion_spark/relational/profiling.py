"""Data-profiling and temporal-statistics operators.

Exponentially-weighted means, rolling-window anomaly scores, SCD2
interval construction from changelogs, deterministic mode,
percentile winsorization, ABC (Pareto 80/15/5) classification on a
distributed prefix sum, and a Benford first-digit audit — the
profile/monitor layer a data platform runs over every ingested
table.

Reference provenance: no relational surface in the reference
(SURVEY.md §2.2); mandated engine extension per §2.3.

Scale notes are per-operator; the one shared building block is
``prefix_sum`` — a distributed running total that never collapses to
a single-partition window (the classic ``Window.orderBy`` scale
trap): range-repartition on the sort key, per-partition sequential
running sum, plus a driver-side exclusive scan over the K
per-partition totals (K rows — bounded by the partition count, not
the data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


def _ranged_running(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str | list[str],
    n_parts: int,
) -> DataFrame:
    """The distributed half of ``prefix_sum``: range-repartition on
    the sort key and compute the per-partition running sum (window
    partitioned by spark_partition_id — never SinglePartition).
    Split out so the plan-shape pytest can assert on the stage
    BEFORE ``prefix_sum`` checkpoints it (checkpointing truncates
    the visible lineage to a Scan ExistingRDD).

    Accepts one value column (``_local``) or a list (``_local_0``,
    ``_local_1``, ...) — a list shares the single range shuffle
    across all running totals (e.g. the two-sample ECDFs of the KS
    statistic)."""
    cols = [value_col] if isinstance(value_col, str) else list(value_col)
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    wp = W.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    if isinstance(value_col, str):
        return ranged.withColumn("_local", F.sum(value_col).over(wp))
    for i, c in enumerate(cols):
        ranged = ranged.withColumn(f"_local_{i}", F.sum(c).over(wp))
    return ranged


def _offset_frame(spark, offsets: dict[int, object], name: str):
    """K-row (pid, exclusive-offset) frame with a type-faithful
    offset column: integer inputs keep BIGINT offsets (exact past
    2^53, where DOUBLE silently rounds — e.g. global row numbering),
    Decimal totals keep DECIMAL (no lossy float round-trip), else
    DOUBLE."""
    import decimal

    vals = list(offsets.values())
    integral = all(isinstance(v, int) for v in vals)
    decimals = not integral and all(
        isinstance(v, (int, decimal.Decimal)) for v in vals
    )
    if integral:
        typ, conv = "BIGINT", int
    elif decimals:
        typ, conv = "DECIMAL(38,18)", decimal.Decimal
    else:
        typ, conv = "DOUBLE", float
    return spark.createDataFrame(
        [(int(p), conv(v)) for p, v in offsets.items()],
        f"_pid INT, {name} {typ}",
    )


_INLINE_OFFSET_MAX = 256


def _typed_lit(v) -> Column:
    """Literal with the same type policy as ``_offset_frame``:
    int → BIGINT (exact past 2^53), Decimal → DECIMAL(38,18),
    else DOUBLE."""
    import decimal

    if isinstance(v, bool) or v is None:
        return F.lit(v).cast("double")
    if isinstance(v, int):
        return F.lit(v).cast("bigint")
    if isinstance(v, decimal.Decimal):
        return F.lit(v).cast("decimal(38,18)")
    return F.lit(float(v))


def prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str | list[str],
    out_col: str | list[str] = "cum",
    n_parts: int | None = None,
    grand_total_col: str | list[str] | None = None,
) -> DataFrame:
    """Inclusive running total of ``value_col`` over the total order
    given by ``order_cols`` — distributed.

    ``Window.orderBy`` without ``partitionBy`` funnels every row
    through ONE task; this instead (1) range-repartitions on the
    sort key so each task owns a contiguous key range, (2) computes
    the sequential running sum inside each partition, and (3) adds
    the exclusive prefix of the per-partition totals, which is a
    K-row driver-side scan (K = ``n_parts``) folded back in as a
    literal CASE on the partition id (broadcast-joined instead only
    past ``_INLINE_OFFSET_MAX`` partitions, where a K-branch CASE
    would bloat codegen). Equivalent to
    ``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` but with
    no single-task bottleneck — at 100 TB the widest stage is still
    a full sort-shuffle, the same price as any global ORDER BY.

    ``value_col`` may be a list of columns; all running totals then
    share ONE range shuffle (out_col must be a same-length list).

    ``grand_total_col`` (same shape as ``value_col``) attaches each
    column's GRAND total as a constant column — free, because the
    per-partition totals are already on the driver for the exclusive
    scan; callers that would otherwise re-aggregate the input for
    the total (a second scan + a second action) should take it from
    here instead (e.g. the KS statistic's n1/n2).

    ``order_cols`` must be a total order (include a tiebreaker) or
    the result is nondeterministic.

    Single-JVM heap note (local mode only): the range sort's task
    buffers live in ONE process, so a 100M-row input OOMs the
    default 8 GB driver heap — set ``SPARK_GRAFT_DRIVER_MEM=24g``
    (honored by ``matrixinversion_spark.session.get_spark``) before
    building the session; 24 GB runs 100M rows clean
    (``scripts/exp_100m_scale.py``). On a real cluster the same sort
    spreads across executors and needs no knob.
    """
    if n_parts is None:
        # scale-adaptive default (r13, guide §2.2): the range-
        # partition count follows the session parallelism instead of
        # a local[32] constant — the driver's lower-core bench runs
        # stop paying 32 near-empty range partitions (and their
        # 32-branch offset CASE) on 8 cores. At 32 cores this
        # resolves to the historical 32, so existing plans are
        # byte-identical there; bounded at 256 so a huge cluster's
        # offset CASE stays codegen-friendly (the >256 broadcast
        # fallback below covers wider).
        n_parts = min(
            256, max(8, df.sparkSession.sparkContext.defaultParallelism)
        )
    multi = not isinstance(value_col, str)
    vcols = list(value_col) if multi else [value_col]
    if multi and isinstance(out_col, str):
        raise ValueError(
            "value_col is a list, so out_col must be a same-length "
            "list of names (a plain string would be split into "
            "characters)"
        )
    ocols = list(out_col) if multi else [out_col]
    if len(ocols) != len(vcols):
        raise ValueError("out_col must match value_col length")
    if grand_total_col is not None:
        if multi and isinstance(grand_total_col, str):
            raise ValueError(
                "value_col is a list, so grand_total_col must be a "
                "same-length list of names"
            )
        gcols = (
            list(grand_total_col) if multi else [grand_total_col]
        )
        if len(gcols) != len(vcols):
            raise ValueError(
                "grand_total_col must match value_col length"
            )
    else:
        gcols = None
    # localCheckpoint pins the range boundaries: RangePartitioner
    # SAMPLES its split points, and this frame is executed twice
    # (totals collect + final join) — without materializing, the two
    # executions can sample different boundaries, mis-aligning the
    # offsets with the partitions (caught by a 20M-row smoke where
    # the total drifted by ~0.03%).
    local = _ranged_running(df, order_cols, value_col, n_parts)
    local = local.localCheckpoint(eager=True)
    # K rows on the driver — bounded by n_parts, never by data size.
    total_rows = (
        local.groupBy("_pid")
        .agg(*[F.sum(c).alias(f"t{i}") for i, c in enumerate(vcols)])
        .collect()
    )
    spark = df.sparkSession
    out = local
    local_names = (
        [f"_local_{i}" for i in range(len(vcols))] if multi else ["_local"]
    )
    per_col_offsets: list[dict[int, object]] = []
    grand_totals = []
    for i in range(len(vcols)):
        totals = {r["_pid"]: r[f"t{i}"] for r in total_rows}
        running, offsets = 0, {}
        for pid in sorted(totals):
            offsets[pid] = running
            # F.sum over an all-NULL partition yields None — skip it
            # (contributes nothing to the running total) instead of
            # raising TypeError on the +=.
            if totals[pid] is not None:
                running += totals[pid]
        grand_totals.append(running)
        per_col_offsets.append(offsets)
    if len(total_rows) <= _INLINE_OFFSET_MAX:
        # small partition count: fold the exclusive offsets into the
        # projection as a literal CASE on _pid — zero extra exchanges
        # and zero broadcast jobs in the final stage (measured: the
        # K-row broadcast-join alternative costs ~3 extra Spark jobs
        # per prefix_sum under AQE, pure scheduler latency at scale)
        for i, (oc, lc) in enumerate(zip(ocols, local_names)):
            expr: Column | None = None
            for pid, off in per_col_offsets[i].items():
                branch = (F.col("_pid") == pid, _typed_lit(off))
                expr = (
                    F.when(*branch)
                    if expr is None
                    else expr.when(*branch)
                )
            out = out.withColumn(
                oc,
                F.col(lc)
                + (_typed_lit(0) if expr is None else expr),
            )
    else:
        # very wide partition counts (4k+ tasks at real scale): a
        # 4k-branch CASE would bloat codegen, so fall back to the
        # K-row broadcast join
        off_frames = [
            _offset_frame(spark, per_col_offsets[i], f"_off_{i}")
            for i in range(len(vcols))
        ]
        off_df = off_frames[0]
        for f in off_frames[1:]:
            off_df = off_df.join(f, "_pid")
        out = out.join(F.broadcast(off_df), "_pid")
        for i, (oc, lc) in enumerate(zip(ocols, local_names)):
            out = out.withColumn(oc, F.col(lc) + F.col(f"_off_{i}"))
        out = out.drop(*[f"_off_{i}" for i in range(len(vcols))])
    if gcols is not None:
        for gc, gt in zip(gcols, grand_totals):
            out = out.withColumn(gc, _typed_lit(gt))
    return out.drop("_pid", *local_names)


@query(
    "q_ewma",
    oracle="""
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_used,
           round(sum(power(0.8, rn - 1) * value)
                 / sum(power(0.8, rn - 1)), 6) AS ewma
    FROM r WHERE rn <= 64
    GROUP BY event_type
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=0.2) of ``value``
    per event type, over the most recent K=64 observations with
    explicit normalized weights (1−α)^j — the closed form of the
    recursive EWMA, truncated at K where the dropped tail weight is
    (1−α)^64 ≈ 6e-7 of the total.

    The explicit-weight form is chosen over the recursion because it
    is order-reducible: one row_number window (to pick and index the
    last K per key) plus one ordinary groupBy — no sequential
    dependency, so it parallelizes per key at any scale. K bounds
    the weight dynamic range, so no underflow/overflow games are
    needed.
    """
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wt = F.pow(F.lit(0.8), F.col("rn") - 1)
    return (
        e.select("event_type", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 64)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_used"),
            F.round(
                F.sum(wt * F.col("value")) / F.sum(wt), 6
            ).alias("ewma"),
        )
    )


@query(
    "q_rolling_zscore",
    oracle="""
    WITH s AS (
        SELECT event_type, value,
               avg(value)         OVER w AS mu,
               stddev_samp(value) OVER w AS sd,
               count(value)       OVER w AS n
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(CASE WHEN abs((value - mu) / sd) > 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS anomalies,
           round(max(abs((value - mu) / sd)), 4) AS max_abs_z
    FROM s WHERE n >= 10 AND sd > 1e-9
    GROUP BY event_type
    """,
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event is scored
    against the mean/stddev of the PRECEDING 20 events of its type
    (the trailing frame excludes the current row, so the score is a
    true out-of-sample surprise, not self-referential). Events with
    fewer than 10 predecessors or a degenerate stddev are unscored.

    One window pass (three frame aggregates share the same sort and
    frame, computed in a single WindowExec) and one groupBy on the
    partition key — the exchange is reused. Scale-safe: the frame is
    ROWS-bounded so state per key is O(21) regardless of data size.
    """
    e = read_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        e.select(
            "event_type",
            "value",
            F.avg("value").over(w).alias("mu"),
            F.stddev_samp("value").over(w).alias("sd"),
            F.count("value").over(w).alias("n"),
        )
        .filter((F.col("n") >= 10) & (F.col("sd") > 1e-9))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.sum(
                F.when(F.abs(z) > 3, 1).otherwise(0)
            ).cast("bigint").alias("anomalies"),
            F.round(F.max(F.abs(z)), 4).alias("max_abs_z"),
        )
    )


@query(
    "q_scd2_intervals",
    oracle="""
    WITH chg AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders),
    pts AS (
        SELECT o_custkey, o_orderpriority AS priority,
               o_orderdate AS vf, o_orderkey
        FROM chg WHERE prev IS NULL OR prev <> o_orderpriority)
    SELECT o_custkey, priority,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(vf) OVER (PARTITION BY o_custkey
               ORDER BY vf, o_orderkey),
               '%Y-%m-%d %H:%M:%S') AS valid_to,
           (lead(vf) OVER (PARTITION BY o_custkey
               ORDER BY vf, o_orderkey) IS NULL) AS is_current
    FROM pts
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from a changelog: collapse each
    customer's order stream into validity intervals of
    ``o_orderpriority`` — a row survives only where the tracked
    value CHANGES (lag ≠ current), then ``valid_to`` is the next
    change's ``valid_from`` (NULL ⇒ current version). This is the
    load path a warehouse runs to turn CDC feeds into slowly
    changing dimensions; ``q_latest_per_key`` is its type-1 sibling.

    Two window passes over the SAME partition key (change detection,
    then interval stitching on the filtered survivors) — one
    exchange on o_custkey total; deterministic tiebreak by order key.
    """
    o = read_table(spark, sf_dir, "orders")
    w1 = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    pts = (
        o.select(
            "o_custkey",
            "o_orderpriority",
            "o_orderdate",
            "o_orderkey",
            F.lag("o_orderpriority").over(w1).alias("prev"),
        )
        .filter(
            F.col("prev").isNull()
            | (F.col("prev") != F.col("o_orderpriority"))
        )
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("vf"),
            "o_orderkey",
        )
    )
    w2 = W.partitionBy("o_custkey").orderBy("vf", "o_orderkey")
    nxt = F.lead("vf").over(w2)
    fmt = "yyyy-MM-dd HH:mm:ss"  # stringified: cross-engine ts canon
    return pts.select(
        "o_custkey",
        "priority",
        F.date_format("vf", fmt).alias("valid_from"),
        F.date_format(nxt, fmt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q_mode_deterministic",
    oracle="""
    WITH c AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS pri,
               count(*) AS cnt
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2)
    SELECT seg, pri AS mode_priority, CAST(cnt AS BIGINT) AS n_orders
    FROM (SELECT seg, pri, cnt,
                 row_number() OVER (PARTITION BY seg
                     ORDER BY cnt DESC, pri ASC) AS rn
          FROM c)
    WHERE rn = 1
    """,
)
def q_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the most frequent order priority per
    market segment, ties broken by the smallest value. Built as
    count-then-top-1 rather than the engines' ``mode()`` aggregates
    because BOTH Spark's and DuckDB's native mode leave tie order
    unspecified — the count/row_number form pins identical semantics
    on both sides and is the portable way to get a deterministic
    mode at any scale (the window runs over group cardinality, not
    row count).
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cnt = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("seg").orderBy(F.col("cnt").desc(), F.col("pri").asc())
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "seg",
            F.col("pri").alias("mode_priority"),
            F.col("cnt").cast("bigint").alias("n_orders"),
        )
    )


@query(
    "q_winsorize",
    oracle="""
    WITH t AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.05) AS lo,
               quantile_cont(l_extendedprice, 0.95) AS hi
        FROM lineitem GROUP BY 1)
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high,
           round(min(lo), 4) AS p05,
           round(min(hi), 4) AS p95,
           round(avg(l_extendedprice), 3) AS mean_raw,
           round(avg(CASE WHEN l_extendedprice < lo THEN lo
                          WHEN l_extendedprice > hi THEN hi
                          ELSE l_extendedprice END), 3) AS mean_winsor
    FROM lineitem l JOIN t ON l.l_returnflag = t.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization: clip ``l_extendedprice`` to its
    exact per-group [p05, p95] and report clip counts plus the mean
    before/after — the outlier-robustification step feature
    pipelines apply before normalization. Exact percentiles (both
    engines interpolate at p·(n−1), so the thresholds are
    bit-identical and the clip counts match exactly).

    Plan: one exact-percentile agg over the group key (5 groups →
    tiny), broadcast-joined back onto the fact scan, one final agg —
    the fact table is scanned twice but never shuffled on a new key.
    At 100 TB the exact percentile is the cost driver; the
    documented approximate twin is ``q_approx_percentile``.
    """
    li = read_table(spark, sf_dir, "lineitem")
    t = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    x = F.col("l_extendedprice")
    clip = F.when(x < F.col("lo"), F.col("lo")).when(
        x > F.col("hi"), F.col("hi")
    ).otherwise(x)
    return (
        li.join(F.broadcast(t), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(x < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(x > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
            F.round(F.min("lo"), 4).alias("p05"),
            F.round(F.min("hi"), 4).alias("p95"),
            F.round(F.avg(x), 3).alias("mean_raw"),
            F.round(F.avg(clip), 3).alias("mean_winsor"),
        )
    )


@query(
    "q_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem GROUP BY 1),
    c AS (
        SELECT revenue,
               sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                  ROWS UNBOUNDED PRECEDING)
               / sum(revenue) OVER () AS share
        FROM rev)
    SELECT CASE WHEN share <= 0.80 THEN 'A'
                WHEN share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(revenue), 2) AS class_revenue
    FROM c GROUP BY 1
    """,
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: rank parts by revenue and split
    at 80% / 95% of cumulative share — the inventory-management
    80/15/5 analysis. The cumulative sum runs through
    ``prefix_sum`` (module docstring): range-repartition +
    per-partition scan + K-row offset join, NOT a single-partition
    ``Window.orderBy`` — so the part-level rollup can be 100M+ rows
    and the widest stage is still an ordinary sort-shuffle.
    """
    li = read_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue")
    )
    total = rev.agg(F.sum("revenue")).collect()[0][0]  # scalar, bounded
    cum = prefix_sum(
        rev,
        [F.col("revenue").desc(), F.col("l_partkey").asc()],
        "revenue",
    )
    share = F.col("cum") / F.lit(total)
    return (
        cum.withColumn(
            "abc_class",
            F.when(share <= 0.80, "A")
            .when(share <= 0.95, "B")
            .otherwise("C"),
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.sum("revenue"), 2).alias("class_revenue"),
        )
    )


@query(
    "q_benford",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1)
    SELECT digit, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / sum(n) OVER (), 6) AS obs_share,
           round(log10(1 + 1.0 / digit), 6) AS benford_share
    FROM c
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed leading-
    digit distribution vs the Benford expectation log10(1+1/d) — a
    standard fraud / synthetic-data screen. The leading digit is
    taken from the DECIMAL STRING of floor(x), not from
    floor(x/10^floor(log10 x)): the libm-log10 route misclassifies
    exact powers of ten when log10 rounds just below an integer, and
    the string route is bit-exact on both engines.

    One groupBy over a 9-value key plus a 9-row window for the
    share — trivially scale-safe.
    """
    o = read_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("string"), 1, 1
    ).cast("bigint")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = W.partitionBy()  # 9 rows — fine as a single partition
    return c.select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("obs_share"),
        F.round(F.log10(1 + 1.0 / F.col("digit")), 6).alias(
            "benford_share"
        ),
    )


@query(
    "q_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id, ts AS s,
               ts + INTERVAL 30 MINUTE AS e
        FROM events),
    m AS (
        SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_max
        FROM iv),
    isl AS (
        SELECT user_id, s, e,
               sum(CASE WHEN prev_max IS NULL OR s > prev_max
                        THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS island
        FROM m),
    sp AS (
        SELECT user_id, island, min(s) AS ss, max(e) AS ee
        FROM isl GROUP BY 1, 2)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(floor(sum(epoch_us(ee) - epoch_us(ss)) / 1000000)
                AS BIGINT) AS covered_s
    FROM sp GROUP BY user_id
    """,
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing: give each event a 30-minute activity
    interval, merge overlapping/adjacent-in-overlap intervals per
    user, and report span count + total covered seconds — the
    uptime/coverage computation (and the interval form of
    gaps-and-islands: a new island starts exactly where an
    interval's start clears the running max of all previous ends,
    which handles nested intervals that a simple lag(end) would
    miss).

    Three window passes and two aggregations, ALL keyed on user_id —
    one exchange total, reused across every stage; per-key state in
    each frame is O(1).
    """
    e = read_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    wp = W.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        wp.rowsBetween(W.unboundedPreceding, -1)
    )
    isl = iv.withColumn(
        "island",
        F.sum(
            F.when(
                prev_max.isNull() | (F.col("s") > prev_max), 1
            ).otherwise(0)
        ).over(wp.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    sp = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("ss"), F.max("e").alias("ee")
    )
    return sp.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        # explicit floor: DuckDB's double→BIGINT cast rounds while
        # Spark's truncates, so the sub-second tail must be floored
        # on both sides before the cast
        F.floor(
            F.sum(F.unix_micros("ee") - F.unix_micros("ss")) / 1_000_000
        ).cast("bigint").alias("covered_s"),
    )


@query(
    "q_weighted_median",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_extendedprice AS v,
               sum(l_quantity) OVER (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_quantity
                   ROWS UNBOUNDED PRECEDING) AS cw,
               sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
        FROM lineitem)
    SELECT l_returnflag, round(min(v), 4) AS weighted_median
    FROM c WHERE cw >= tw / 2
    GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median: the smallest price whose cumulative
    quantity weight reaches half the group's total — the
    quantity-weighted "typical price" that the unweighted median
    misstates when cheap items trade in bulk. No engine has a native
    weighted percentile; the cumulative-weight window form is the
    portable definition, and because quantities are small integers
    the running weights are exact in doubles, so the threshold
    comparison is bit-deterministic on both engines.

    The window partitions by the group key — per-group sort, no
    global single-partition window — and the threshold filter + min
    aggregate reuse the same exchange.
    """
    li = read_table(spark, sf_dir, "lineitem")
    wp = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_quantity"
    )
    c = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum("l_quantity")
        .over(wp.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cw"),
        F.sum("l_quantity")
        .over(W.partitionBy("l_returnflag"))
        .alias("tw"),
    )
    return (
        c.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("v"), 4).alias("weighted_median"))
    )


@query(
    "q_drift_psi",
    oracle="""
    WITH b AS (
        SELECT quantile_cont(epoch_us(ts), 0.5) AS mid,
               min(value) AS mn, max(value) AS mx
        FROM events),
    tagged AS (
        SELECT CASE WHEN epoch_us(ts) <= (SELECT mid FROM b)
                    THEN 'ref' ELSE 'cur' END AS half,
               CAST(least(9, floor((value - (SELECT mn FROM b))
                    / ((SELECT mx FROM b) - (SELECT mn FROM b))
                    * 10)) AS BIGINT) AS bucket
        FROM events),
    c AS (
        SELECT bucket,
               sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS nr,
               sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS nc
        FROM tagged GROUP BY 1),
    s AS (
        SELECT bucket, nr, nc,
               (nr + 1e-6) / (sum(nr) OVER () + 1e-5) AS p,
               (nc + 1e-6) / (sum(nc) OVER () + 1e-5) AS q
        FROM c)
    SELECT bucket,
           CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur,
           round((q - p) * ln(q / p), 6) AS psi_contrib
    FROM s
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index (PSI) drift monitor: split the
    event stream at its median timestamp into a reference and a
    current half, bucket ``value`` into 10 equal-width bins over the
    global range, and report each bin's (q−p)·ln(q/p) contribution —
    the standard model-monitoring screen for input drift (sum > 0.2
    conventionally pages someone). Laplace smoothing (1e-6) keeps
    empty bins finite, identically on both engines.

    Two scans: one tiny global agg (median split point + range,
    3 scalars) and one bucketed count — the counts are a 10-key
    groupBy with map-side partials, so the monitor costs one scan
    plus O(1) shuffle at any scale.
    """
    e = read_table(spark, sf_dir, "events")
    b = e.agg(
        F.percentile(F.unix_micros("ts"), F.lit(0.5)).alias("mid"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    ).collect()[0]  # 3 scalars — bounded
    mid, mn, mx = b["mid"], b["mn"], b["mx"]
    half = F.when(
        F.unix_micros("ts") <= F.lit(mid), "ref"
    ).otherwise("cur")
    bucket = F.least(
        F.lit(9),
        F.floor((F.col("value") - F.lit(mn)) / F.lit(mx - mn) * 10),
    ).cast("bigint")
    c = (
        e.select(half.alias("half"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("half") == "ref", 1).otherwise(0)).alias(
                "nr"
            ),
            F.sum(F.when(F.col("half") == "cur", 1).otherwise(0)).alias(
                "nc"
            ),
        )
    )
    tot = W.partitionBy()  # 10 rows
    p = (F.col("nr") + 1e-6) / (F.sum("nr").over(tot) + 1e-5)
    q = (F.col("nc") + 1e-6) / (F.sum("nc").over(tot) + 1e-5)
    return c.select(
        "bucket",
        F.col("nr").cast("bigint").alias("n_ref"),
        F.col("nc").cast("bigint").alias("n_cur"),
        F.round((q - p) * F.log(q / p), 6).alias("psi_contrib"),
    )


@query(
    "q_mad_robust",
    oracle="""
    WITH med AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS m
        FROM lineitem GROUP BY 1),
    dev AS (
        SELECT l.l_returnflag, m,
               abs(l_extendedprice - m) AS d
        FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag)
    SELECT l_returnflag,
           round(min(m), 4) AS median,
           round(quantile_cont(d, 0.5), 4) AS mad,
           round(quantile_cont(d, 0.5) * 1.4826, 4) AS sigma_robust
    FROM dev GROUP BY l_returnflag
    """,
)
def q_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation: the robust scale estimator
    (MAD·1.4826 ≈ σ under normality) that outliers cannot drag the
    way they drag stddev — the robust twin of the winsorize
    operator's clipping. Exact medians on both sides: each engine
    interpolates at 0.5·(n−1), so the per-group median, the
    deviations, and the second-pass median are bit-identical.

    Two passes over the fact table with a broadcast of the 5-row
    median table between them — the unavoidable shape for exact
    nested medians (a one-pass approximate twin would use
    approx_percentile's sketch).
    """
    li = read_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("m")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        "m",
        F.abs(F.col("l_extendedprice") - F.col("m")).alias("d"),
    )
    mad = F.percentile("d", F.lit(0.5))
    return dev.groupBy("l_returnflag").agg(
        F.round(F.min("m"), 4).alias("median"),
        F.round(mad, 4).alias("mad"),
        F.round(mad * 1.4826, 4).alias("sigma_robust"),
    )


@query(
    "q_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_size,
           count(*) < 5 AS at_risk
    FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (nationkey, mktsegment): any equivalence class smaller than
    k=5 is re-identifiable and flagged ``at_risk`` — the
    privacy-governance screen run before releasing a dataset, and
    the decision input for suppression/generalization. One uniform
    groupBy with map-side partials; the flag is a row-local
    expression, so the audit costs exactly one aggregation scan at
    any scale. Complements ``p_pii_scrub`` (which redacts content;
    this measures linkability of the published attributes)."""
    c = read_table(spark, sf_dir, "customer")
    n = F.count(F.lit(1))
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        n.cast("bigint").alias("group_size"),
        (n < 5).alias("at_risk"),
    )


@query(
    "q_join_cardinality",
    oracle="""
    WITH a AS (
        SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1),
    b AS (
        SELECT c_custkey AS k, count(*) AS n FROM customer GROUP BY 1)
    SELECT CAST(sum(a.n * b.n) AS BIGINT) AS join_rows,
           CAST(count(*) AS BIGINT) AS matched_keys,
           CAST(max(a.n * b.n) AS BIGINT) AS hottest_key_rows
    FROM a JOIN b USING (k)
    """,
)
def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality profile WITHOUT executing the join: per-key
    counts on each side, then Σ n_a·n_b over matched keys — the
    exact output size of orders ⋈ customer, plus the hottest key's
    contribution (the skew signal a planner wants before choosing
    broadcast/salting). Two map-side-combined aggregations and a
    key-count join whose input is ALREADY reduced to distinct keys —
    at 100 TB this costs two scans and a dimension-sized shuffle,
    versus materializing a possibly-exploding join to count it.
    Self-use: this is the screen `skew.q_skew_salted_join` assumes
    you ran first."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    a = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    b = c.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    j = a.join(b, "k").select((F.col("na") * F.col("nb")).alias("prod"))
    return j.agg(
        F.sum("prod").cast("bigint").alias("join_rows"),
        F.count(F.lit(1)).cast("bigint").alias("matched_keys"),
        F.max("prod").cast("bigint").alias("hottest_key_rows"),
    )


@query(
    "q_histogram_equi_depth",
    oracle="""
    WITH b AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                   AS bucket
        FROM orders)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM b GROUP BY bucket
    """,
)
def q_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram — the ANALYZE-style
    statistic planners keep per column, and the complement of
    ``q_histogram``'s equi-width bins: 10 buckets of equal row
    count, each reporting its value envelope. ntile carries the
    orderkey tiebreaker so bucket edges are deterministic on both
    engines. The global ntile is a full sort of the column — honest
    at dimension scale; the fact-scale twin is approx_percentile
    cut points + a broadcast bucket join (same trade documented on
    ``q_rfm_segmentation``)."""
    o = read_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    b = o.select(
        "o_totalprice", F.ntile(10).over(w).alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "q_rolling_median",
    oracle="""
    SELECT user_id, event_id,
           round(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND CURRENT ROW
           ), 6) AS med21
    FROM events
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over a trailing 21-row frame per user — the
    robust twin of ``q_rolling_zscore``'s mean/stddev window (one
    wild reading shifts a rolling mean for 21 rows; the median
    shrugs). Exact interpolated percentile as a WINDOW aggregate on
    both engines (same 0.5·(n−1) rule), user-partitioned frame —
    one sort shuffle, O(frame) state per row at any scale."""
    e = read_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias(
            "med21"
        ),
    )


@query(
    "q_outlier_iqr",
    oracle="""
    WITH q AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS q1,
               quantile_cont(l_extendedprice, 0.75) AS q3
        FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_extendedprice < q1 - 1.5 * (q3 - q1)
                           OR l_extendedprice > q3 + 1.5 * (q3 - q1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(q1 - 1.5 * (q3 - q1), 4) AS lo,
           round(q3 + 1.5 * (q3 - q1), 4) AS hi
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag, q1, q3
    """,
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit: per group, count values outside
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR] — the box-plot rule, and the third
    member of the robust-statistics family here (winsorize clips,
    MAD rescales, this one screens). Exact quartiles both engines;
    two passes with a 3-row broadcast between them, identical shape
    to ``q_mad_robust``."""
    li = read_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.25)).alias("q1"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    j = li.join(F.broadcast(q), "l_returnflag")
    out = (
        (F.col("l_extendedprice") < lo)
        | (F.col("l_extendedprice") > hi)
    ).cast("int")
    return j.groupBy("l_returnflag", "q1", "q3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(out).cast("bigint").alias("n_outliers"),
        F.round(F.min(lo), 4).alias("lo"),
        F.round(F.min(hi), 4).alias("hi"),
    ).drop("q1", "q3")


def assign_global_ids(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rid",
    n_parts: int | None = None,
    grand_total_col: str | None = None,
) -> DataFrame:
    """Contiguous 1-based global row ids in ``order_cols`` order —
    the distributed ``row_number() OVER (ORDER BY ...)``.

    Implemented AS ``prefix_sum`` over a column of ones (integer-
    exact: bigint offsets, never doubles — float prefix offsets lose
    exactness past 2^53 rows): range-repartition on the sort key,
    per-partition running count, then add the exclusive prefix of
    per-partition totals (a K-row driver scan, K = n_parts) via a
    broadcast join. The widest stage is the range sort-shuffle — the
    unavoidable price of a total order — with no SinglePartition
    window anywhere.

    ``monotonically_increasing_id`` is the cheaper cousin when ids
    only need to be unique, not contiguous or order-aligned; this is
    the operator for "number the corpus 1..N" (sequence packing,
    stable sampling frames, matrix row indexing).

    ``order_cols`` must be a total order (include a unique
    tiebreaker), else assignment within ties is nondeterministic.
    """
    # row_number == running sum of ones under a total order, so this
    # is exactly prefix_sum's machinery (range repartition, local
    # window, checkpointed boundaries, K-row offset broadcast) — one
    # implementation, one place to maintain the RangePartitioner
    # double-execution fix. The bigint ones column keeps prefix_sum
    # on its integer-exact offset path.
    # grand_total_col (optional) rides prefix_sum's existing
    # partition-totals fold: N arrives as a literal column for free,
    # instead of a second full aggregation pass over the numbered
    # frame (the KS statistic's documented rule)
    return prefix_sum(
        df.withColumn("_ones", F.lit(1).cast("bigint")),
        order_cols,
        "_ones",
        out_col=out_col,
        n_parts=n_parts,
        grand_total_col=grand_total_col,
    ).drop("_ones")


@query(
    "q_global_row_number",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rid
    FROM orders
    """,
)
def q_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous ids over orders by (date, key) — distributed
    two-pass row numbering; oracle is the single-partition ANSI
    window DuckDB runs happily at sf0.01 and Spark must not at
    100 TB."""
    o = read_table(spark, sf_dir, "orders")
    return assign_global_ids(
        o.select("o_orderkey", "o_orderdate"),
        [F.col("o_orderdate"), F.col("o_orderkey")],
        out_col="rid",
    ).select("o_orderkey", "rid")


@query(
    "q_exact_global_median",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(median(l_extendedprice), 6) AS median
    FROM lineitem
    """,
)
def q_exact_global_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median over the whole table with no single-point
    bottleneck: Spark's ``percentile`` aggregate buffers every value
    in the (here: single global) aggregation state, which dies at
    fact-table scale; ``percentile_approx`` is the mergeable-sketch
    answer but is approximate. This is the exact path: number the
    rows with ``assign_global_ids`` (range sort-shuffle + K-row
    offset broadcast — the price of a total order, nothing
    serialized), then pick rank ceil(N/2) / ceil((N+1)/2) and
    average them (even-N interpolation, matching SQL ``median``).
    Selection generalizes to any exact quantile set for the price of
    one sort — the ANALYZE-style twin of q_histogram_equi_depth's
    ntile envelopes.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    n = li.count()
    lo, hi = (n + 1) // 2, (n + 2) // 2
    numbered = assign_global_ids(
        li,
        [
            F.col("l_extendedprice"),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
    )
    return numbered.filter(F.col("rid").isin(int(lo), int(hi))).agg(
        F.lit(n).cast("bigint").alias("n"),
        F.round(F.avg("l_extendedprice"), 6).alias("median"),
    )


_FD_CANDIDATES = [
    # (table, lhs, rhs) — candidate functional dependencies to audit:
    # a PK that must hold, plus three plausible-but-false ones a
    # schema-inference tool would probe.
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
]


@query(
    "q_fd_audit",
    oracle="""
    """
    + "\nUNION ALL\n".join(
        f"""
    SELECT '{t}.{lhs} -> {rhs}' AS fd,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
           round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS violation_rate,
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS nd
          FROM {t} GROUP BY {lhs})
    """
        for t, lhs, rhs in _FD_CANDIDATES
    ),
)
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — for each candidate X → Y, the
    number of X keys mapping to more than one Y value and the
    violation rate. This is the profiling primitive behind schema
    inference, key discovery, and "is this column still a reliable
    join key" data-contract checks (Papenbrock et al., VLDB 2015
    frame FD discovery exactly as this per-candidate violation
    count).

    One uniform groupBy per candidate (map-side partial distinct,
    shuffle bounded by |X| keys), then a 5-scalar fold — exact
    integer arithmetic up to one division. At 100 TB the same shape
    runs with approx_count_distinct as a cheap pre-screen and this
    exact pass only on candidates the sketch says are near-keys;
    candidates on DIFFERENT tables scan independently (no join
    anywhere).

    Engine extension per SURVEY.md §2.3 (reference has no relational
    surface, SURVEY.md §2.2)."""
    parts = []
    for t, lhs, rhs in _FD_CANDIDATES:
        per = (
            read_table(spark, sf_dir, t)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("nd"))
        )
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        parts.append(
            per.agg(
                F.lit(f"{t}.{lhs} -> {rhs}").alias("fd"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                viol.cast("bigint").alias("n_violating"),
                F.round(viol * 1.0 / F.count(F.lit(1)), 6).alias(
                    "violation_rate"
                ),
                (viol == 0).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
