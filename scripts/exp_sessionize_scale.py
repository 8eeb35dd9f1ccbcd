"""Sessionization smoke at 10M events with closed-form sessions.

10,000 users x 1,000 events each: within a user, consecutive events
are 60 s apart except every 100th, which jumps an extra hour — so
with the registered 30-minute gap rule every user has EXACTLY 10
sessions of EXACTLY 100 events, each with session_value 100.0
(value = 1.0 per event). Lands the table as events.parquet and runs
the REGISTERED q_events_sessionize unchanged; any boundary
off-by-one, timestamp-unit slip, or window mispartitioning breaks
the exact counts.

Usage: python scripts/exp_sessionize_scale.py [n_users] [events_per]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401 — populates the registry
from matrixinversion_spark.registry import QUERIES
from matrixinversion_spark.session import get_spark

U = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
E = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
SESS_PER_USER, SESS_LEN = E // 100, 100

spark = get_spark("sessionize-scale")

u = F.pmod(F.col("id"), U)
j = (F.col("id") / U).cast("long")
ts_us = (
    F.lit(1_600_000_000_000_000)
    + u * 1_000_000
    + j * 60_000_000
    + (j / 100).cast("long") * 3_600_000_000
)
events = spark.range(U * E).select(
    F.col("id").alias("event_id"),
    F.timestamp_micros(ts_us).alias("ts"),
    u.alias("user_id"),
    F.lit("view").alias("event_type"),
    F.lit(1.0).alias("value"),
    F.lit("{}").alias("props"),
)

tmp = tempfile.mkdtemp(prefix="sessionize_scale_")
try:
    events.write.parquet(f"{tmp}/events.parquet")
    t0 = time.time()
    out = QUERIES["q_events_sessionize"](spark, tmp)
    stats = out.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.min("n_events").alias("min_e"),
        F.max("n_events").alias("max_e"),
        F.min("session_value").alias("min_v"),
        F.max("session_value").alias("max_v"),
    ).collect()[0]
    wall = time.time() - t0
    ok = (
        stats["n_sessions"] == U * SESS_PER_USER
        and stats["min_e"] == stats["max_e"] == SESS_LEN
        and stats["min_v"] == stats["max_v"] == float(SESS_LEN)
    )
    print(
        f"events={U * E} sessions={stats['n_sessions']}/{U * SESS_PER_USER} "
        f"len={stats['min_e']}..{stats['max_e']} wall={wall:.1f}s"
    )
    print(f"ok={ok}")
    if not ok:
        sys.exit(1)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
