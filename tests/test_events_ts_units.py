"""Pin events.ts normalization across parquet physical types.

The driver regenerates /root/testdata between rounds and the ts
column has already switched TIMESTAMP(NANOS) → TIMESTAMP(MICROS)
once (round 3→4), which broke bench and the streaming twins. These
tests build tiny events files in BOTH units and assert that the
batch reader and the streaming source agree on the same instants.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from matrixinversion_spark.session import read_table
from matrixinversion_spark.streaming import ops as sops

_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 1, 0, 59, 59),
    datetime.datetime(2024, 1, 2, 12, 30, 0),
]


def _write_events(path: str, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, path, use_deprecated_int96_timestamps=False)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_read_table_normalizes_both_units(spark, tmp_path, unit):
    _write_events(str(tmp_path / "events.parquet"), unit)
    df = read_table(spark, str(tmp_path), "events")
    got = sorted(
        r["ts"].replace(tzinfo=None)
        for r in df.select("ts").collect()
    )
    assert got == _TS
    # must be a plain TIMESTAMP (unix_micros-compatible), never NTZ
    assert df.schema["ts"].dataType.typeName() == "timestamp"


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_stream_source_agrees_with_batch(spark, tmp_path, unit):
    _write_events(str(tmp_path / "events.parquet"), unit)
    batch = {
        r["event_id"]: r["ts"]
        for r in read_table(spark, str(tmp_path), "events").collect()
    }
    stream = sops.read_events_stream(spark, str(tmp_path))
    q = (
        stream.writeStream.format("memory")
        .queryName(f"ts_unit_{unit}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["ts"]
        for r in spark.sql(f"SELECT * FROM ts_unit_{unit}").collect()
    }
    assert got == batch
