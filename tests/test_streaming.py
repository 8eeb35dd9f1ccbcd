"""Structured Streaming tests: the batch queries are the oracle —
drain the stream with availableNow, compare against the same
aggregation computed in batch."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from matrixinversion_spark.session import read_table
from matrixinversion_spark.streaming import ops as sops
from tests.conftest import SF_DIR


def test_windowed_counts_matches_batch(spark):
    stream = sops.read_events_stream(spark, SF_DIR)
    sops.run_to_memory(sops.windowed_counts(stream), "win_counts")
    got = spark.sql(
        "SELECT * FROM win_counts ORDER BY window_start, event_type"
    ).toPandas()

    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    assert got.reset_index(drop=True).equals(batch.reset_index(drop=True))


def test_sessionized_runs(spark):
    stream = sops.read_events_stream(spark, SF_DIR)
    sops.run_to_memory(sops.sessionized(stream), "sessions")
    pdf = spark.sql("SELECT * FROM sessions").toPandas()
    assert len(pdf) > 0
    assert (pdf["session_end"] >= pdf["session_start"]).all()
    assert (pdf["n_events"] >= 1).all()


def test_stateful_running_stats(spark):
    stream = sops.read_events_stream(spark, SF_DIR)
    q = (
        sops.running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM running_stats").toPandas()

    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .toPandas()
    )
    merged = got.merge(batch, on="event_type", suffixes=("_s", "_b"))
    assert len(merged) == len(batch)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    # totals accumulated in a different order — compare with tolerance
    assert (
        (merged["total_value_s"] - merged["total_value_b"]).abs() < 0.05
    ).all()


def test_stream_stream_join_matches_batch(spark):
    a = sops.read_events_stream(spark, SF_DIR)
    b = sops.read_events_stream(spark, SF_DIR)
    q = (
        sops.purchase_view_join(a, b)
        .writeStream.format("memory")
        .queryName("pv_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT p_user, purchase_id, view_id FROM pv_join "
        "ORDER BY purchase_id, view_id"
    ).toPandas()

    e = read_table(spark, SF_DIR, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    batch = (
        p.join(
            v,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
        )
        .select("p_user", "purchase_id", "view_id")
        .orderBy("purchase_id", "view_id")
        .toPandas()
    )
    assert len(got) > 0
    assert got.reset_index(drop=True).equals(batch.reset_index(drop=True))


def test_streaming_dedup(spark):
    # duplicate the stream by unioning it with itself, then dedup
    dup = sops.read_events_stream(spark, SF_DIR).unionAll(
        sops.read_events_stream(spark, SF_DIR)
    )
    q = (
        sops.deduped_stream(dup)
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.sql("SELECT count(*) AS n FROM deduped").collect()[0]["n"]
    n_distinct = (
        read_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    )
    assert n == n_distinct


def test_stateful_transform_with_state(spark):
    """transformWithStateInPandas twin must converge to the batch
    per-type totals (last update per key wins).

    Gated on protobuf: the transformWithState state-server protocol
    needs google.protobuf, which this container does not ship. The
    operator itself is plain public PySpark and runs wherever
    pyspark's [connect] extra (protobuf) is installed; GroupState
    coverage of the same semantics runs above unconditionally."""
    pytest.importorskip("google.protobuf")
    stream = sops.read_events_stream(spark, SF_DIR)
    q = (
        sops.running_user_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("running_stats_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql(
            """
            SELECT event_type, n_events, total_value FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY event_type ORDER BY n_events DESC
                ) AS rn FROM running_stats_tws
            ) WHERE rn = 1
            """
        )
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
        .toPandas()
        .reset_index(drop=True)
    )
    assert got.equals(batch)


def test_incremental_ols_matches_batch(spark):
    """Streaming model maintenance: drain the events stream through
    IncrementalOLS and compare the final fit with the batch
    grouped-TSQR fit on the same table — the R-factor is a mergeable
    summary, so the two must agree to fp round-off."""
    import numpy as np

    from matrixinversion_spark.relational.regress import ols_fit

    stream = sops.read_events_stream(spark, SF_DIR).select(
        F.col("value").alias("y"),
        (F.col("user_id") % 97).cast("double").alias("x1"),
    )
    inc = sops.IncrementalOLS(y_col="y", x_cols=["x1"])
    inc.attach(stream)
    got = inc.model()

    batch = read_table(spark, SF_DIR, "events").select(
        F.col("value").alias("y"),
        (F.col("user_id") % 97).cast("double").alias("x1"),
        F.lit(1).alias("g"),
    )
    want = ols_fit(batch, y_col="y", x_cols=["x1"],
                   group_cols=["g"]).collect()[0]
    assert got["n"] == want["n"]
    assert np.allclose(got["coef"], np.asarray(want["coef"]), atol=1e-9)
    assert abs(got["r2"] - want["r2"]) < 1e-9


def test_rolling_zscore_stream_matches_batch(spark):
    """One availableNow pass of the streaming z-score must reproduce
    the batch operator's per-type aggregates (counts exactly, max|z|
    to the emitted rounding)."""
    from matrixinversion_spark.relational.profiling import q_rolling_zscore

    stream = sops.rolling_zscore_stream(
        sops.read_events_stream(spark, SF_DIR)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("zscore_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode: keep the LAST emitted row per key
    got = {
        r["event_type"]: r
        for r in spark.sql(
            "SELECT * FROM zscore_stream"
        ).collect()
    }
    want = {r["event_type"]: r for r in q_rolling_zscore(spark, SF_DIR).collect()}
    assert set(got) >= set(want)
    for k, w in want.items():
        g = got[k]
        assert g["n_scored"] == w["n_scored"], k
        assert g["anomalies"] == w["anomalies"], k
        assert abs(g["max_abs_z"] - w["max_abs_z"]) <= 2e-4, k


def test_cdc_latest_state_stream_matches_batch(spark):
    """One availableNow pass of the streaming CDC materialization
    must agree with the batch q_cdc_apply: same surviving users,
    same last event/value, same op counts; tombstoned users appear
    with alive=false."""
    import matrixinversion_spark.relational.temporal  # noqa: F401
    from matrixinversion_spark.registry import QUERIES

    stream = sops.cdc_latest_state(sops.read_events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: r for r in spark.sql("SELECT * FROM cdc_stream").collect()
    }
    want = {
        r["user_id"]: r
        for r in QUERIES["q_cdc_apply"](spark, SF_DIR).collect()
    }
    # batch result contains exactly the alive users
    assert {u for u, r in got.items() if r["alive"]} == set(want)
    for u, w in want.items():
        g = got[u]
        assert g["last_event_id"] == w["last_event_id"], u
        assert abs(g["last_value"] - w["last_value"]) < 1e-12, u
        assert g["n_ops"] == w["n_ops"], u


def test_stream_static_enrichment_matches_batch(spark):
    """Stream-static left broadcast join == the same join in batch;
    users missing from the dim survive with NULL tier."""
    dim = spark.createDataFrame(
        [(i, "gold" if i % 3 == 0 else "basic") for i in range(0, 50, 2)],
        "dim_user_id bigint, tier string",
    )
    stream = sops.read_events_stream(spark, SF_DIR)
    sops.run_to_memory(
        sops.enriched_stream(stream, dim)
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n")),
        "enriched",
    )
    got = {
        (r["tier"], r["n"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    batch = (
        read_table(spark, SF_DIR, "events")
        .join(
            F.broadcast(dim),
            F.col("user_id") == F.col("dim_user_id"),
            "left",
        )
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["tier"], r["n"]) for r in batch.collect()}
    assert got == want
    assert None in {t for t, _ in want}  # unmatched users kept as NULL


def test_stream_stream_left_join_matches_batch(spark):
    a = sops.read_events_stream(spark, SF_DIR)
    b = sops.read_events_stream(spark, SF_DIR)
    q = (
        sops.purchase_view_left_join(a, b)
        .writeStream.format("memory")
        .queryName("pv_left_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT p_user, purchase_id, view_id, p_ts FROM pv_left_join"
    ).toPandas()

    e = read_table(spark, SF_DIR, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    batch = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
        "left_outer",
    ).select("purchase_id", "view_id", "p_ts").toPandas()

    # matched rows must agree exactly with the batch twin
    got_m = set(
        map(tuple, got.dropna(subset=["view_id"])[
            ["purchase_id", "view_id"]].astype("int64").values)
    )
    batch_m = set(
        map(tuple, batch.dropna(subset=["view_id"])[
            ["purchase_id", "view_id"]].astype("int64").values)
    )
    assert got_m == batch_m

    # null-padded rows: only genuinely match-less purchases, and every
    # match-less purchase whose join window is provably closed (2h
    # watermark behind the stream's max event time) must have emitted
    matchless = set(
        batch[batch["view_id"].isna()]["purchase_id"].astype("int64")
    )
    got_null = got[got["view_id"].isna()]
    assert set(got_null["purchase_id"].astype("int64")) <= matchless
    assert len(got_null) > 0
    import pandas as pd

    wm = e.agg(F.max("ts")).collect()[0][0] - pd.Timedelta(hours=2)
    flushed_due = set(
        batch[
            batch["view_id"].isna()
            & (batch["p_ts"] < wm - pd.Timedelta(hours=1))
        ]["purchase_id"].astype("int64")
    )
    assert flushed_due <= set(got_null["purchase_id"].astype("int64"))


def test_stream_stream_full_join_matches_batch(spark):
    """FULL OUTER interval join vs its batch twin: matched pairs
    exact; each null side a subset of the batch's match-less rows;
    provably-closed match-less rows on BOTH sides flushed."""
    import pandas as pd

    a = sops.read_events_stream(spark, SF_DIR)
    b = sops.read_events_stream(spark, SF_DIR)
    q = (
        sops.purchase_view_full_join(a, b)
        .writeStream.format("memory")
        .queryName("pv_full_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT p_user, purchase_id, view_id, p_ts, v_ts FROM pv_full_join"
    ).toPandas()

    e = read_table(spark, SF_DIR, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    batch = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
        "full_outer",
    ).select("purchase_id", "view_id", "p_ts", "v_ts").toPandas()

    # matched pairs agree exactly with the batch twin
    got_m = set(
        map(tuple, got.dropna(subset=["purchase_id", "view_id"])[
            ["purchase_id", "view_id"]].astype("int64").values)
    )
    batch_m = set(
        map(tuple, batch.dropna(subset=["purchase_id", "view_id"])[
            ["purchase_id", "view_id"]].astype("int64").values)
    )
    assert got_m == batch_m

    # null-view rows (match-less purchases): subset of batch's, and
    # the provably-closed ones must have flushed
    matchless_p = set(
        batch[batch["view_id"].isna()]["purchase_id"].astype("int64")
    )
    got_null_v = got[got["view_id"].isna()]
    assert set(got_null_v["purchase_id"].astype("int64")) <= matchless_p
    assert len(got_null_v) > 0

    # null-purchase rows (match-less views) — the capability the left
    # join does not exercise
    matchless_v = set(
        batch[batch["purchase_id"].isna()]["view_id"].astype("int64")
    )
    got_null_p = got[got["purchase_id"].isna()]
    assert set(got_null_p["view_id"].astype("int64")) <= matchless_v
    assert len(got_null_p) > 0

    wm = e.agg(F.max("ts")).collect()[0][0] - pd.Timedelta(hours=2)
    # purchases are provably closed 1h (max_gap) behind the watermark
    flushed_due_p = set(
        batch[
            batch["view_id"].isna()
            & (batch["p_ts"] < wm - pd.Timedelta(hours=1))
        ]["purchase_id"].astype("int64")
    )
    assert flushed_due_p <= set(got_null_v["purchase_id"].astype("int64"))
    # views are provably closed once no purchase up to max_gap AFTER
    # them can arrive, i.e. v_ts + 1h < watermark
    flushed_due_v = set(
        batch[
            batch["purchase_id"].isna()
            & (batch["v_ts"] < wm - pd.Timedelta(hours=1))
        ]["view_id"].astype("int64")
    )
    assert flushed_due_v <= set(got_null_p["view_id"].astype("int64"))


def test_drift_psi_stream_matches_batch(spark):
    e = read_table(spark, SF_DIR, "events")
    lo, hi, n_bins, eps = 0.0, 100.0, 10, 1e-4
    # offline baseline: the value distribution of the first half of
    # the data by time (what "training data" would have been)
    mid = e.agg(
        F.expr("percentile(cast(ts as double), 0.5)")
    ).collect()[0][0]
    base = (
        e.filter(F.col("ts").cast("double") <= mid)
        .select(
            F.least(
                F.greatest(
                    F.floor((F.col("value") - lo) / ((hi - lo) / n_bins)),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .count()
        .collect()
    )
    tot = sum(r["count"] for r in base)
    fr = {r["bin"]: r["count"] / tot for r in base}
    baseline = [fr.get(i, 0.0) for i in range(n_bins)]

    stream = sops.read_events_stream(spark, SF_DIR)
    q = (
        sops.drift_psi_stream(stream, baseline, lo, hi)
        .writeStream.format("memory")
        .queryName("drift_psi")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["window_start"]: (r["n_events"], r["psi"])
        for r in spark.sql("SELECT * FROM drift_psi").collect()
    }

    # batch twin over the same tumbling windows
    import math

    rows = (
        e.select(
            F.window("ts", "1 hour").alias("w"),
            F.least(
                F.greatest(
                    F.floor((F.col("value") - lo) / ((hi - lo) / n_bins)),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            ).alias("bin"),
        )
        .groupBy(F.col("w.start").alias("ws"), "bin")
        .count()
        .collect()
    )
    byw: dict = {}
    for r in rows:
        byw.setdefault(r["ws"], {})[r["bin"]] = r["count"]
    assert set(got) == set(byw)
    for ws, bins in byw.items():
        n = sum(bins.values())
        psi = 0.0
        for i in range(n_bins):
            q_i = (bins.get(i, 0) + eps) / (n + n_bins * eps)
            p_i = (max(baseline[i], 0.0) + eps) / (1.0 + n_bins * eps)
            psi += (q_i - p_i) * math.log(q_i / p_i)
        gn, gp = got[ws]
        assert gn == n
        assert abs(gp - round(psi, 6)) < 1e-5
    # sanity: PSI is non-negative and small for in-distribution hours
    assert all(p >= 0 for _, p in got.values())


def test_watermark_semantics_state_bound_not_completeness(spark, tmp_path):
    """Pins the engine's late-data contract: a second micro-batch
    whose rows sit 3 hours BEHIND the watermark is still admitted
    (watermark bounds state, not completeness — the documented
    best-effort semantics), and the WatermarkDropAudit listener
    wiring reports the per-batch drop counter (0 here; nonzero only
    under real eviction pressure on long-running streams)."""
    import time as _time

    import pandas as pd

    src_dir = str(tmp_path / "late_src")
    base = pd.Timestamp("2024-06-01 12:00:00")
    on_time = pd.DataFrame(
        {
            "event_id": range(100),
            "ts": [base + pd.Timedelta(minutes=i % 10) for i in range(100)],
            "user_id": [i % 7 for i in range(100)],
        }
    )
    late = pd.DataFrame(
        {
            "event_id": range(100, 150),
            "ts": [base - pd.Timedelta(hours=3)] * 50,
            "user_id": [i % 7 for i in range(50)],
        }
    )
    spark.createDataFrame(on_time).coalesce(1).write.parquet(
        src_dir + "/f1"
    )
    _time.sleep(1.1)
    spark.createDataFrame(late).coalesce(1).write.parquet(
        src_dir + "/f2"
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir + "/*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    audit = sops.WatermarkDropAudit.attach(spark)
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName("late_audit")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        # bind to THIS query id — the session may have run other
        # streaming queries whose progress would otherwise latch first
        audit.bind(q.id)
        q.awaitTermination()
        deadline = _time.time() + 30
        while audit.batches < 2 and _time.time() < deadline:
            _time.sleep(0.5)
    finally:
        audit.detach(spark)
    assert audit.batches >= 2  # the two files became two batches
    # watermark advanced past the late window, yet the rows were
    # ADMITTED — state-bound, not completeness-bound
    got = {
        r["ws"]: r["n"]
        for r in spark.sql("SELECT * FROM late_audit").collect()
    }
    assert sum(got.values()) == 150
    late_ws = (base - pd.Timedelta(hours=3)).to_pydatetime()
    assert got[late_ws] == 50
    assert audit.dropped == 0  # no eviction pressure in 2 batches


def test_quality_gate_stream_matches_batch(spark, tmp_path):
    """Per-window quality-gate pass rates over a 2-batch doc stream
    must equal the batch computation over the same files — planted
    per-window pass/fail mixes make the expected rates closed-form."""
    import datetime as dt

    from matrixinversion_spark.pipeline.text import quality_gate_frame

    good = (
        "the quick brown vulpine jumps over lazy canines near "
        "riverbank marker stones"
    )
    bad = "it aa bb cc dd ee"  # fails r_min_len only
    h1 = dt.datetime(2024, 1, 1, 10, 0, 0)
    h2 = dt.datetime(2024, 1, 1, 11, 0, 0)
    batch1 = [(h1, good)] * 3 + [(h1, bad)]          # hour 1: 3/4 pass
    batch2 = [(h2, good)] * 1 + [(h2, bad)] * 3      # hour 2: 1/4 pass
    schema = "event_ts timestamp, text string"
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(src / "b2.parquet")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        sops.quality_gate_stream(stream)
        .writeStream.format("memory")
        .queryName("qgate")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["window_start"]: (r["n_docs"], r["rate_pass_all"])
        for r in spark.sql("SELECT * FROM qgate").collect()
    }
    assert got == {h1: (4, 0.75), h2: (4, 0.25)}

    # full-row differential vs the batch twin over the same files
    batch = (
        spark.read.option("recursiveFileLookup", "true")
        .schema(schema)
        .parquet(str(src))
    )
    want = {
        tuple(r)
        for r in quality_gate_frame(batch, id_col="event_ts")
        .groupBy(F.window("event_ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("pass_all"), 6).alias("rate_pass_all"),
        )
        .select(F.col("w.start").alias("window_start"), "n_docs",
                "rate_pass_all")
        .collect()
    }
    stream_rows = {
        (r["window_start"], r["n_docs"], r["rate_pass_all"])
        for r in spark.sql(
            "SELECT window_start, n_docs, rate_pass_all FROM qgate"
        ).collect()
    }
    assert stream_rows == want


def test_heavy_hitters_stream_planted_windows(spark, tmp_path):
    """Planted per-window floods: hour 1 is flooded by 'spam'
    (50% share) over a quiet tail, hour 2 by 'bot' (40%); each
    window's alert list must contain exactly its own flood token
    (tail tokens hold <= 4% each, far under the slacked threshold
    phi − 1/(2k) ≈ 0.192). The test vocabulary fits the sketch, so
    the estimated counts are exact here; at real cardinality they
    can deviate by up to n/(2k) either way, which is exactly the
    slack the alert filter absorbs (heavy_hitters_stream
    docstring)."""
    import datetime as dt

    h1 = dt.datetime(2024, 1, 1, 10, 0, 0)
    h2 = dt.datetime(2024, 1, 1, 11, 0, 0)
    rows = (
        [(h1, "spam")] * 25
        + [(h1, f"t{i % 25}") for i in range(25)]
        + [(h2, "bot")] * 20
        + [(h2, f"t{i % 30}") for i in range(30)]
    )
    schema = "event_ts timestamp, tok string"
    src = tmp_path / "toks"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        sops.heavy_hitters_stream(stream, phi=0.2, k=64)
        .writeStream.format("memory")
        .queryName("hh_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["tok"]): (r["est_count"], r["n_window"])
        for r in spark.sql("SELECT * FROM hh_stream").collect()
    }
    assert got == {(h1, "spam"): (25, 50), (h2, "bot"): (20, 50)}


def test_heavy_hitters_stream_rejects_uncovered_phi(spark):
    import pytest as _pytest

    df = spark.readStream.format("rate").load()
    with _pytest.raises(ValueError, match="phi"):
        sops.heavy_hitters_stream(df, phi=0.001, k=64)
