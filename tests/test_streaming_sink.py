"""Streaming sink coverage: foreachBatch writing micro-batches to
parquet — batch read-back must equal the batch twin."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from matrixinversion_spark.session import read_table
from matrixinversion_spark.streaming import ops as sops
from tests.conftest import SF_DIR


def test_foreachbatch_parquet_sink(spark):
    out_dir = tempfile.mkdtemp(prefix="stream_sink_")
    try:
        stream = sops.read_events_stream(spark, SF_DIR)
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )

        def write_batch(batch_df, batch_id):  # noqa: ANN001
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch={batch_id}"
            )

        q = (
            agg.writeStream.foreachBatch(write_batch)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        got = (
            spark.read.parquet(f"{out_dir}/batch=0")
            .orderBy("event_type")
            .collect()
        )
        want = (
            read_table(spark, SF_DIR, "events")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .orderBy("event_type")
            .collect()
        )
        assert [r.asDict() for r in got] == [r.asDict() for r in want]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_checkpoint_restart_processes_each_file_exactly_once(spark):
    """Fault-tolerance contract: a file-source stream with a
    checkpointLocation, drained with availableNow, restarted after
    new data lands, must process the new file ONLY — the checkpoint
    (source offsets + sink commit log) is what makes Structured
    Streaming exactly-once at the source level, and is the property
    a 100 TB ingestion pipeline restarts rely on."""
    base = tempfile.mkdtemp(prefix="stream_ckpt_")
    in_dir, out_dir, ckpt = (
        f"{base}/in", f"{base}/out", f"{base}/ckpt"
    )
    try:
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        first = ev.filter(F.col("event_id") % 2 == 0)
        second = ev.filter(F.col("event_id") % 2 == 1)
        import glob
        import os

        def land(df, name):
            # the file source watches FLAT files in in_dir; a
            # .write.parquet() output is a directory, so stage it
            # and move the single part file in
            stage = f"{base}/stage_{name}"
            df.coalesce(1).write.parquet(stage)
            os.makedirs(in_dir, exist_ok=True)
            part = glob.glob(f"{stage}/part-*.parquet")[0]
            shutil.move(part, f"{in_dir}/{name}.parquet")

        land(first, "f1")

        def run_once():
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(in_dir)
            )

            def sink(batch_df, batch_id):  # noqa: ANN001
                batch_df.select("event_id").write.mode("append").parquet(
                    out_dir
                )

            q = (
                stream.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        n1 = spark.read.parquet(out_dir).count()
        assert n1 == first.count()

        land(second, "f2")
        run_once()  # restart from checkpoint: must see ONLY f2

        got = spark.read.parquet(out_dir)
        assert got.count() == ev.count()  # no double-processing
        assert got.distinct().count() == ev.count()  # each id once
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_wap_stream_sink_audits_and_is_idempotent(spark, tmp_path):
    import os

    from matrixinversion_spark.streaming import ops as sops
    from matrixinversion_spark.session import read_table

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    e = read_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    # deterministic disjoint slices by event_id range (limit() order
    # is not stable across evaluations)
    e.filter(F.col("event_id") < 200).coalesce(1).write.parquet(
        src + "/f1"
    )
    import time

    time.sleep(1.1)
    e.filter(
        (F.col("event_id") >= 200) & (F.col("event_id") < 500)
    ).coalesce(1).write.parquet(src + "/f2")
    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    audits = {
        "nonempty": lambda d: d.count() > 0,
        "ids_not_null": lambda d: d.filter(
            F.col("event_id").isNull()
        ).count()
        == 0,
    }
    q = sops.wap_stream_sink(stream, out, audits, ckpt)
    q.awaitTermination()
    batches = sorted(
        p for p in os.listdir(out) if p.startswith("batch=")
    )
    assert len(batches) == 2
    total = spark.read.parquet(out + "/batch=*").count()
    assert total == 500

    # restart with the SAME checkpoint and a THIRD file; pre-create
    # the upcoming batch's partition so foreachBatch genuinely FIRES
    # for an already-published id — the replay-skip path itself
    time.sleep(1.1)
    e.filter(
        (F.col("event_id") >= 500) & (F.col("event_id") < 600)
    ).coalesce(1).write.parquet(src + "/f3")
    sentinel_dir = out + "/batch=2"
    e.filter(F.col("event_id") < 7).coalesce(1).write.parquet(
        sentinel_dir
    )
    sentinel_files = sorted(os.listdir(sentinel_dir))
    q2 = sops.wap_stream_sink(stream, out, audits, ckpt)
    q2.awaitTermination()
    # the guard skipped the publish: the sentinel partition is
    # byte-untouched (crash-between-publish-and-commit semantics)
    assert sorted(os.listdir(sentinel_dir)) == sentinel_files
    assert spark.read.parquet(sentinel_dir).count() == 7

    # batch-id-reuse protection: a DIFFERENT checkpoint against the
    # same output must refuse loudly instead of silently skipping
    import pytest as _pytest

    with _pytest.raises(ValueError, match="refusing"):
        sops.wap_stream_sink(
            stream, out, audits, str(tmp_path / "other_ckpt")
        )
