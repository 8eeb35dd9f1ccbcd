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
