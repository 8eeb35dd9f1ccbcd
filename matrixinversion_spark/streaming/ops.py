"""Structured Streaming surface over the events stream.

The reference is strictly batch (SURVEY.md §2.2 — no streaming of any
kind); this is the mandated capability extension, built on public
Structured Streaming primitives:

- ``read_events_stream`` — file-source stream of the events table
  (schema pinned; nano-timestamps normalized like the batch path).
- ``windowed_counts`` — tumbling event-time window + watermark;
  identical aggregation expression to the batch ``q_events_tumbling``,
  so batch output is the streaming oracle (exercised in tests with
  an availableNow trigger).
- ``sessionized`` — native session windows (30-min gap), the
  streaming twin of batch ``q_events_sessionize``.
- ``running_user_stats`` — custom stateful operator via
  ``applyInPandasWithState`` (GroupState), the escape hatch the
  reference-capability checklist calls "custom stateful streaming".

At scale: watermarks bound state; the shuffle key is (window/user)
which matches the downstream sink partitioning.
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as int64
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table, µs-normalized.

    ``ts`` is read through a pinned LongType schema (valid for both
    TIMESTAMP(NANOS) — via nanosAsLong — and TIMESTAMP(MICROS)
    physical types), so the divisor depends on the file's actual
    unit; probe the parquet footer once driver-side instead of
    guessing (the testdata switched NANOS→MICROS between driver
    rounds — magnitude-sniffing is how that becomes a silent
    19700-era bug)."""
    import pyarrow.parquet as pq

    ts_type = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    unit = getattr(ts_type, "unit", None)
    # to-µs conversion per physical unit; an unknown unit (or a
    # non-timestamp physical type, unit=None) must name itself rather
    # than die in a bare KeyError — 'testdata changed between rounds'
    # is exactly the scenario this probe exists to survive (r4 ADVICE)
    to_micros = {
        "ns": "ts DIV 1000",
        "us": "ts",
        "ms": "ts * 1000",
    }.get(unit)
    if to_micros is None:
        raise ValueError(
            f"events.ts has unsupported parquet type {ts_type!r} "
            f"(unit={unit!r}); expected TIMESTAMP with ns/us/ms unit — "
            "update EVENTS_SCHEMA/read_events_stream for the new layout"
        )
    if unit == "ms":
        # ms doesn't fit the int64-as-nanos read path (nanosAsLong only
        # long-ifies NANOS); Spark reads MILLIS as a native timestamp,
        # so the pinned LongType schema would mis-decode it.
        raise ValueError(
            "events.ts switched to TIMESTAMP(MILLIS): drop the pinned "
            "LongType schema and read it as TimestampType directly"
        )
    # file-source streams take directories; select the events file
    # out of the shared testdata dir with a glob filter
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr(to_micros)))


def windowed_counts(events: DataFrame,
                    window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window agg with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized(events: DataFrame,
                gap: str = "30 minutes",
                watermark: str = "2 hours") -> DataFrame:
    """Native session windows (30-min inactivity gap) per user.

    BATCH-COMPOSITION HAZARD (Spark 4.1.2): when this aggregate is
    evaluated in batch and then semi/anti-joined on
    (user_id, session_start), Catalyst may push the join BELOW the
    MergingSessions operator (the pre-merge per-event window start
    looks like a grouping key but is not stable under merging),
    silently corrupting the sessions. Materialize the result
    (persist + count, or checkpoint) before joining on its keys —
    pinned by tests/test_round13_ops.py
    (test_session_window_join_pushdown_hazard)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


_STATE_SCHEMA = "n long, total double"
_OUT_SCHEMA = (
    "event_type string, n_events long, total_value double"
)


def _update_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """GroupState update: cumulative per-event-type counters that
    survive across micro-batches."""
    (event_type,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [(event_type, n, round(total, 2))],
        columns=["event_type", "n_events", "total_value"],
    )


def running_user_stats(events: DataFrame,
                       watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    running totals per event_type, updated each micro-batch."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_stats,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream: DataFrame, name: str) -> None:
    """Drain a stream into an in-memory table with availableNow
    (test/demo harness; production sinks are kafka/parquet/delta)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _purchase_view_join(events_a: DataFrame, events_b: DataFrame,
                        max_gap: str, how: str) -> DataFrame:
    """Shared body of the inner/left stream-stream interval joins —
    ONE definition of the projections, watermarks, and two-sided
    event-time condition, so the twins cannot drift apart."""
    p = (
        events_a.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    v = (
        events_b.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    return p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_gap}")),
        how,
    ).select("p_user", "purchase_id", "view_id", "p_ts", "v_ts")


def purchase_view_join(events_a: DataFrame, events_b: DataFrame,
                       max_gap: str = "1 hour") -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's views within the preceding ``max_gap``.

    Both sides carry watermarks and the join condition bounds event
    time in both directions — the two requirements that let Spark
    evict join state instead of buffering the streams forever (the
    only viable shape for an unbounded 100 TB/day stream).
    """
    return _purchase_view_join(events_a, events_b, max_gap, "inner")


def purchase_view_left_join(events_a: DataFrame, events_b: DataFrame,
                            max_gap: str = "1 hour") -> DataFrame:
    """LEFT OUTER stream-stream join: every purchase emits — matched
    rows immediately, match-less purchases as a null-padded row once
    the watermark passes their join window and Spark can PROVE no
    view can still arrive. That proof-then-emit is the capability
    the inner join doesn't exercise: outer results are held in the
    state store and flushed by watermark eviction, so correctness
    depends on the same bounds (watermarks on both sides + two-sided
    event-time condition) that bound state size. The last
    ``watermark`` of event time before stream end never flushes —
    by design: those purchases' windows aren't provably closed yet
    (a restart could still deliver a matching view).

    Same scale shape as ``purchase_view_join``: state holds only
    ``max_gap + watermark`` of each side per user-key partition."""
    return _purchase_view_join(events_a, events_b, max_gap, "left_outer")


def purchase_view_full_join(events_a: DataFrame, events_b: DataFrame,
                            max_gap: str = "1 hour") -> DataFrame:
    """FULL OUTER stream-stream join — completes the outer-join
    family: matched rows emit immediately; match-less PURCHASES flush
    null-padded once the watermark proves no view can still arrive
    (the left-join behavior); match-less VIEWS likewise flush
    null-padded once the watermark proves no purchase within
    ``max_gap`` AFTER them can still arrive. Both eviction proofs
    ride the same two-sided event-time bound + dual watermarks, so
    state stays ``max_gap + watermark`` per side per user-key
    partition — the full join costs no more state than the left one,
    it only flushes from both buffers instead of one. Rows inside
    the final unprovable horizon at stream end stay unflushed on
    BOTH sides, by the same restart-safety argument as the left
    join's."""
    return _purchase_view_join(events_a, events_b, max_gap, "full_outer")


def deduped_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps
    state only inside the watermark horizon (bounded memory), vs.
    plain dropDuplicates whose state grows without bound."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


class _RunningStatsProcessor:
    """transformWithState processor: same cumulative per-event-type
    counters as ``_update_stats``, on the Spark 4 arbitrary-state API
    (value state handle, explicit lifecycle)."""

    def init(self, handle) -> None:
        self._agg = handle.getValueState("agg", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._agg.update((n, total))
        yield pd.DataFrame(
            [(key[0], n, round(total, 2))],
            columns=["event_type", "n_events", "total_value"],
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """``running_user_stats`` on ``transformWithStateInPandas`` — the
    Spark 4 replacement for GroupState: typed state handles, timers,
    and state-schema evolution. Same semantics, same oracle (the
    batch per-type totals)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class Proc(_RunningStatsProcessor, StatefulProcessor):
        pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=Proc(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


class IncrementalOLS:
    """Streaming least-squares model maintenance via foreachBatch.

    The TSQR R-factor is a MERGEABLE model summary: RᵀR = AᵀA, so
    folding each micro-batch's distributed R into the running state
    (stack + re-QR of two (p+2)×(p+2) triangles) maintains the exact
    full-history OLS fit with O((p+2)²) state — the streaming twin of
    ``relational.regress.ols_fit``, and commutative/associative in
    the same sense (arrival order changes nothing but last-ulp fp).

    Per micro-batch work: one narrow mapInPandas computing a local R
    per partition, a driver-side stack of (partitions+1) tiny
    triangles, no shuffle at all. Use ``attach`` to wire it to a
    stream; read the fit off ``model()`` any time.
    """

    def __init__(self, y_col: str, x_cols: list[str]) -> None:
        import numpy as np

        self.y_col, self.x_cols = y_col, list(x_cols)
        self.m = len(x_cols) + 2
        self.r: "np.ndarray | None" = None
        self.n = 0

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        import numpy as np

        m, y_col, x_cols = self.m, self.y_col, self.x_cols

        def local_r(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                block = np.column_stack(
                    [np.ones(len(pdf)),
                     pdf[x_cols].to_numpy(dtype=np.float64),
                     pdf[y_col].to_numpy(dtype=np.float64)]
                )
                r = np.linalg.qr(block, mode="r")
                yield pd.DataFrame(
                    {"rdata": [r.ravel()], "bn": [len(pdf)]}
                )

        parts = (
            batch_df.select(*x_cols, y_col)
            .mapInPandas(local_r, "rdata array<double>, bn bigint")
            .collect()
        )
        if not parts:
            return
        stack = [np.asarray(p["rdata"], dtype=np.float64).reshape(-1, m)
                 for p in parts]
        if self.r is not None:
            stack.append(self.r)
        self.r = np.linalg.qr(np.vstack(stack), mode="r")
        self.n += sum(p["bn"] for p in parts)

    def attach(self, stream: DataFrame):
        """availableNow foreachBatch run that drains the stream into
        the model state; returns after the final batch."""
        q = (
            stream.writeStream.foreachBatch(self.update)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="inc_ols_ckpt_"),
            )
            .start()
        )
        q.awaitTermination()
        return q

    def model(self) -> dict:
        """Current fit: {n, coef (intercept first), r2} — same
        R-triangle readout as relational.regress.ols_fit."""
        import numpy as np

        if self.r is None:
            raise ValueError("no data seen yet")
        p = self.m - 2
        r = self.r
        beta = np.linalg.solve(r[: p + 1, : p + 1], r[: p + 1, p + 1])
        sse = float(r[p + 1, p + 1] ** 2)
        tss = float(np.sum(r[1:, p + 1] ** 2))
        return {"n": int(self.n), "coef": beta, "r2": 1.0 - sse / tss}


_ZSCORE_STATE = (
    "vals array<double>, n_scored long, anomalies long, max_abs_z double"
)
_ZSCORE_OUT = (
    "event_type string, n_scored long, anomalies long, max_abs_z double"
)


def _update_zscore(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """GroupState update for rolling z-score anomaly detection.

    State is the ring buffer of the last 20 values per key (plus
    cumulative counters) — O(21) doubles per key, the same bound the
    batch operator's ROWS frame guarantees, so state size is
    independent of stream length.
    """
    import numpy as np

    (event_type,) = key
    vals, n_scored, anomalies, max_z = (
        state.get if state.exists else ([], 0, 0, 0.0)
    )
    buf = [float(v) for v in vals]
    rows = pd.concat(list(pdfs), ignore_index=True)
    # deterministic event-time order inside the micro-batch — the
    # same (ts, event_id) total order the batch twin's window uses
    rows = rows.sort_values(["ts", "event_id"])
    for v in rows["value"].to_numpy(dtype=np.float64):
        if len(buf) >= 10:
            arr = np.asarray(buf[-20:], dtype=np.float64)
            sd = float(arr.std(ddof=1))
            if sd > 1e-9:
                z = abs((float(v) - float(arr.mean())) / sd)
                n_scored += 1
                if z > 3.0:
                    anomalies += 1
                if z > max_z:
                    max_z = z
        buf.append(float(v))
        buf = buf[-20:]
    state.update((buf, int(n_scored), int(anomalies), float(max_z)))
    yield pd.DataFrame(
        [(event_type, int(n_scored), int(anomalies), round(max_z, 4))],
        columns=["event_type", "n_scored", "anomalies", "max_abs_z"],
    )


def rolling_zscore_stream(events: DataFrame,
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``relational.profiling.q_rolling_zscore``:
    each event scored against the mean/stddev of the PRECEDING 20
    events of its type, with cumulative anomaly counters emitted per
    micro-batch (update mode).

    The batch operator's ROWS-bounded window becomes a 20-slot ring
    buffer in GroupState — exactly the state-size argument that makes
    the batch plan scale-safe carries over to unbounded streams.
    Differential pytest: one availableNow pass over the same input
    must reproduce the batch aggregates.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_zscore,
            outputStructType=_ZSCORE_OUT,
            stateStructType=_ZSCORE_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_CDC_STATE_SCHEMA = (
    "last_us long, last_event_id long, last_value double, "
    "tombstone boolean, n_ops long"
)
_CDC_OUT_SCHEMA = (
    "user_id long, last_event_id long, last_value double, "
    "alive boolean, n_ops long"
)


def _update_cdc(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """GroupState update for latest-wins CDC materialization with
    tombstones: track the row with the max (ts, event_id) seen for
    this user — order-insensitive, so late/out-of-order changelog
    arrival cannot corrupt the state — plus the op count. 'error'
    events are delete markers: the key's state survives (so a later
    upsert resurrects the row with history intact) but the emitted
    row flips ``alive`` false, which a downstream sink translates
    to a DELETE."""
    import numpy as np

    (user_id,) = key
    if state.exists:
        last_us, last_eid, last_val, tomb, n_ops = state.get
    else:
        last_us, last_eid, last_val, tomb, n_ops = -1, -1, 0.0, False, 0
    for pdf in pdfs:
        n_ops += len(pdf)
        # pin the epoch unit to µs: pandas delivers ns- or µs-
        # resolution datetimes depending on version, and last_us
        # persists across restarts — mixed units would mis-order
        us = (
            np.asarray(pdf["ts"].values)
            .astype("datetime64[us]")
            .astype("int64")
        )
        eid = pdf["event_id"].to_numpy()
        order = np.lexsort((eid, us))
        top = order[-1]
        if (int(us[top]), int(eid[top])) > (last_us, last_eid):
            last_us = int(us[top])
            last_eid = int(eid[top])
            last_val = float(pdf["value"].to_numpy()[top])
            tomb = bool(pdf["event_type"].to_numpy()[top] == "error")
    state.update((last_us, last_eid, last_val, tomb, n_ops))
    yield pd.DataFrame(
        [(user_id, last_eid, last_val, not tomb, n_ops)],
        columns=[
            "user_id", "last_event_id", "last_value", "alive", "n_ops",
        ],
    )


def cdc_latest_state(events: DataFrame,
                     watermark: str = "2 hours") -> DataFrame:
    """Streaming changelog materialization — the streaming twin of
    ``relational.temporal.q_cdc_apply``: per-user latest state with
    'error' rows treated as tombstones, maintained incrementally
    across micro-batches in O(1) state per key (five scalars — no
    event buffer), emitted in update mode so every micro-batch
    publishes only the keys it touched."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_cdc,
            outputStructType=_CDC_OUT_SCHEMA,
            stateStructType=_CDC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def enriched_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment: join each micro-batch of
    the event stream against a static dimension table.

    The production-default streaming pattern: the static side is
    planned as an ordinary batch relation inside every micro-batch,
    so a small dimension broadcasts (no shuffle of the stream, no
    state store, no watermark needed — unlike stream-stream joins).
    LEFT join on the key: events without a dimension row are kept
    with NULL attributes, so the stream is never silently filtered
    by late dimension loads.

    At scale: the dimension re-broadcasts per micro-batch, which is
    the knob to watch — for a large or slowly-changing dimension the
    upgrade path is Delta/snapshot refresh + foreachBatch, not a
    bigger broadcast.
    """
    d = F.broadcast(dim)
    return events.join(d, events["user_id"] == d["dim_user_id"], "left").drop(
        "dim_user_id"
    )


def drift_psi_stream(
    events: DataFrame,
    baseline: list[float],
    lo: float,
    hi: float,
    window: str = "1 hour",
    watermark: str = "2 hours",
    eps: float = 1e-4,
) -> DataFrame:
    """Streaming drift monitor: Population Stability Index of each
    event-time window's ``value`` distribution against a FIXED
    baseline — the online twin of ``relational.profiling
    q_drift_psi`` ("did the live feature distribution move away from
    what the model was trained on?").

    ``baseline`` is the reference fraction per bin (10 equal-width
    bins over [lo, hi], clamped at the edges — computed ONCE offline
    from the training corpus and shipped as plain literals, the way
    a model's preprocessing constants ship). The whole operator is a
    single windowed aggregation: each bin is a conditional count
    column, so one row per window crosses the state store — PSI then
    folds as a stateless scalar over that row. No second
    aggregation, no stream-stream join, no per-bin state; at 100
    TB/day the state is one 12-column row per open window.

    Laplace-style ``eps`` smoothing on both sides keeps empty bins
    finite (same convention as the batch operator)."""
    n_bins = len(baseline)
    if n_bins < 2:
        raise ValueError("baseline needs at least 2 bins")
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    counts = [
        F.sum(F.when(F.col("bin") == i, 1).otherwise(0)).alias(f"n{i}")
        for i in range(n_bins)
    ]
    agg = (
        # NULL/NaN values would land in no bin but still count in the
        # denominator, deflating every q_i and inflating PSI — a
        # sensor dropout would page as "drift". Exclude them so
        # n_events is exactly the sum of the bin counts (matching the
        # batch twin's bin-count normalization).
        events.withWatermark("ts", watermark)
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(F.col("ts"), b.alias("bin"))
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), *counts)
    )
    tot = F.col("n_events") + F.lit(float(n_bins) * eps)
    psi = None
    for i, p in enumerate(baseline):
        q = (F.col(f"n{i}") + F.lit(eps)) / tot
        pc = F.lit(max(p, 0.0) + eps) / F.lit(1.0 + n_bins * eps)
        term = (q - pc) * F.log(q / pc)
        psi = term if psi is None else psi + term
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("n_events"),
        F.round(psi, 6).alias("psi"),
    )


class WatermarkDropAudit:
    """Late-data observability: a StreamingQueryListener that sums
    ``numRowsDroppedByWatermark`` across a query's stateful
    operators per micro-batch — the metric that tells an operator
    whether its watermark is silently discarding real data (the
    production dial between state size and completeness; rows
    dropped here are rows missing from every downstream aggregate,
    and NOTHING else surfaces that).

    Measured semantics on this engine (Spark 4.1, pinned by the
    paired test): the watermark bounds STATE, not completeness —
    late rows arriving while their window/key state can still be
    (re)created are ADMITTED, in aggregation, dedup, and
    stream-stream-join paths alike ("late data may or may not be
    processed", the documented best-effort contract). The counter
    therefore reads 0 until real eviction pressure builds on a
    long-running stream; a nonzero reading is the signal that the
    watermark delay is too tight for the source's disorder.

    Usage: ``audit = WatermarkDropAudit.attach(spark)`` before
    starting the query, then ``audit.bind(query.id)`` right after
    ``start()`` so the audit tracks THAT query; read
    ``audit.dropped`` after (or between batches);
    ``audit.detach(spark)`` when done. Unbound audits fall back to
    latching the first progress event seen — convenient when the
    session runs a single query, but wrong when another query is
    already running (its progress would be latched instead), which
    is why ``bind`` exists. Listener callbacks are driver-side
    metadata only — zero executor overhead."""

    def __init__(self) -> None:
        self.dropped = 0
        self.batches = 0
        self.query_id = None  # bind()-pinned, else first-event latch
        self._listener = None

    def bind(self, query_id) -> "WatermarkDropAudit":
        """Pin the audit to a specific query id (``query.id`` from
        ``start()``) — the only unambiguous mode when the session
        hosts concurrent streaming queries."""
        self.query_id = str(query_id)
        return self

    @classmethod
    def attach(cls, spark: SparkSession) -> "WatermarkDropAudit":
        from pyspark.sql.streaming import StreamingQueryListener

        audit = cls()

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                # listeners are SESSION-scoped: follow the bind()-ed
                # query if set, else latch the first query seen, so
                # concurrent queries on the same session can't
                # pollute this audit's counts
                if audit.query_id is None:
                    audit.query_id = str(event.progress.id)
                if str(event.progress.id) != audit.query_id:
                    return
                audit.batches += 1
                for op in event.progress.stateOperators:
                    audit.dropped += op.numRowsDroppedByWatermark

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        audit._listener = _L()
        spark.streams.addListener(audit._listener)
        return audit

    def detach(self, spark: SparkSession) -> None:
        if self._listener is not None:
            spark.streams.removeListener(self._listener)
            self._listener = None


def wap_stream_sink(
    stream: DataFrame,
    path: str,
    audits: dict,
    checkpoint_dir: str,
    target_rows_per_file: int = 1_000_000,
    trigger: dict | None = None,
):
    """Audited exactly-once streaming parquet sink: every micro-batch
    lands as its own ``batch=<id>`` subdirectory through
    ``io.write_audit_publish`` — staged, audited on the read-back,
    atomically published — and a batch id that re-fires after a
    restart (foreachBatch's documented at-least-once edge) is
    SKIPPED if its partition was already published, upgrading the
    pipeline to exactly-once without a transactional table format.
    A batch that fails its audits aborts the query with the failing
    audit names; previously published batches stay readable
    throughout (WAP's publish is an atomic symlink flip).

    The replay-skip is only sound when an existing ``batch=<id>``
    really IS a replay of the same stream — i.e. the same
    checkpoint lineage. A ``_sink_metadata.json`` marker in the
    output records the checkpoint at first use, and pointing a
    DIFFERENT checkpoint at the same output raises instead of
    silently treating restarted batch ids as already-done (the
    batch-id-reuse data-loss trap).

    ``trigger`` is passed to ``writeStream.trigger`` (default
    ``{"availableNow": True}`` — drain currently-available input
    and stop; pass ``{"processingTime": "..."}`` for a resident
    query). Readers see ``spark.read.parquet(f"{path}/batch=*")`` —
    only fully-audited batches ever match the glob (staging dirs
    are dot-hidden). Returns the started StreamingQuery."""
    import json as _json
    import os as _os

    from matrixinversion_spark.relational.io import write_audit_publish

    _os.makedirs(path, exist_ok=True)
    ckpt_key = _os.path.abspath(checkpoint_dir)
    marker = _os.path.join(path, "_sink_metadata.json")
    if _os.path.exists(marker):
        with open(marker) as f:
            try:
                recorded = _json.load(f).get("checkpoint")
            except _json.JSONDecodeError as e:
                raise ValueError(
                    f"sink metadata {marker!r} is corrupt ({e}); the "
                    "marker records which checkpoint owns this "
                    "output, so refusing to guess — restore it or "
                    "use a fresh output path."
                ) from e
        if recorded != ckpt_key:
            raise ValueError(
                f"output {path!r} was published from checkpoint "
                f"{recorded!r}; refusing to continue it from "
                f"{ckpt_key!r} — restarted batch ids would collide "
                "with published partitions and be silently skipped. "
                "Use a fresh output path (or the original "
                "checkpoint)."
            )
    else:
        # write-then-rename so a crash mid-write can never leave a
        # truncated marker (which would turn every later start into
        # a JSONDecodeError instead of the designed identity check)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"checkpoint": ckpt_key}, f)
        _os.replace(tmp, marker)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        part = _os.path.join(path, f"batch={batch_id}")
        if _os.path.lexists(part):
            return  # same-checkpoint replay — already published
        write_audit_publish(
            batch_df,
            part,
            audits,
            target_rows_per_file=target_rows_per_file,
        )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()


def quality_gate_stream(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "event_ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming data-quality monitor: per-event-time-window pass
    rates of the composed C4/Gopher quality gate
    (``pipeline.text.quality_gate_frame``) over a document stream —
    the live dashboard a production ingest watches to catch a
    quality regression (a broken extractor, a spam flood) within one
    window instead of at the next offline release report.

    The six rule verdicts are stateless map-side expressions (the
    same single codegen span as the batch operator — no explode, no
    per-doc state), so the ONLY stateful piece is one windowed
    aggregation: state = one 9-column row per open window regardless
    of stream rate. Same composition contract as the batch
    ``p_release_report``: per-rule rates side by side so a moving
    ``rate_pass_all`` is attributable to the rule that moved."""
    from matrixinversion_spark.pipeline.text import (
        _QG_RULES,
        quality_gate_frame,
    )

    g = quality_gate_frame(docs, id_col=time_col, text_col=text_col)
    return (
        g.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            *[
                F.round(F.avg(r), 6).alias(f"rate_{r[2:]}")
                for r in _QG_RULES
            ],
            F.round(F.avg("pass_all"), 6).alias("rate_pass_all"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_docs",
            *[f"rate_{r[2:]}" for r in _QG_RULES],
            "rate_pass_all",
        )
    )


def heavy_hitters_stream(
    toks: DataFrame,
    phi: float = 0.02,
    k: int = 1024,
    window: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "event_ts",
    tok_col: str = "tok",
) -> DataFrame:
    """Streaming heavy hitters: per event-time window, the tokens
    the ``approx_top_k`` sketch retains whose ESTIMATED share
    exceeds ``phi`` — the live "what's flooding the ingest right
    now" monitor (a spam token, a stuck client's user-agent), and
    the streaming half of the ``p_heavy_hitters_exact`` lambda
    pair.

    The decisive property is state size: a windowed
    ``groupBy(window, tok).count()`` keeps one state row per
    DISTINCT TOKEN per open window — vocabulary-sized, unbounded on
    adversarial input — while the sketch keeps ONE mergeable
    k-entry buffer per open window, rate-independent. The price is
    the Misra-Gries contract, stated honestly: a retained token's
    estimate can deviate from its true count by up to
    n/maxItemsTracked = n/(2k) IN EITHER DIRECTION (the classic
    Misra-Gries decrement under-counts; Spark does not document an
    over-estimate guarantee, so none is assumed — ADVICE r10), and
    retention itself holds for true share > 1.5/k (enforced via
    phi > 1.5/k — the displacement-safe bound derived in the batch
    ``heavy_hitters_exact`` docstring). The alert filter therefore
    compares the estimate against phi*n − n/(2k), the slack that
    makes a true > phi flood pass even when its estimate
    under-counts by the full n/(2k) bound: the alert list can
    include borderline extras (anything above phi − 1/k true
    share) but never misses a true > phi flood. Exact counts come
    from replaying the flagged window through the batch
    ``heavy_hitters_exact``."""
    if phi <= 1.5 / k:
        raise ValueError(
            f"heavy_hitters_stream: phi={phi} <= 1.5/k={1.5 / k:g} — "
            "the top-k sketch could displace a true heavy hitter "
            "(heavy_hitters_exact docstring has the bound); raise k"
        )
    agg = (
        toks.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"))
        .agg(
            F.expr(
                f"approx_top_k({tok_col}, {k}, {2 * k}) AS tk"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_window"),
        )
    )
    e = agg.select(
        F.col("w.start").alias("window_start"),
        "n_window",
        F.explode("tk").alias("e"),
    )
    # phi*n − n/(2k): absorb the sketch's worst-case under-count so
    # the no-false-negative property holds without assuming Spark's
    # estimates are upper bounds (ADVICE r10). phi > 1.5/k keeps the
    # slack strictly positive-sized (phi − 1/(2k) > 1/k > 0).
    return e.filter(
        F.col("e.count")
        > (phi - 1.0 / (2 * k)) * F.col("n_window")
    ).select(
        "window_start",
        F.col("e.item").alias(tok_col),
        F.col("e.count").cast("bigint").alias("est_count"),
        "n_window",
    )
