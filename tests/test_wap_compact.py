"""Write-Audit-Publish sink and small-files compaction."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from matrixinversion_spark.relational.io import (
    compact_parquet_dir,
    write_audit_publish,
)
from matrixinversion_spark.session import read_table

from .conftest import SF_DIR


def _visible(parent: str) -> list[str]:
    return sorted(p for p in os.listdir(parent) if not p.startswith("."))


def _hidden(parent: str) -> list[str]:
    # version dirs only — the .gc-prev grace pointer is a permanent
    # one-file fixture of the layout, not a leftover
    return sorted(
        p
        for p in os.listdir(parent)
        if p.startswith(".") and ".gc-prev" not in p
    )


def test_wap_publishes_when_audits_pass(spark):
    d = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    n = d.count()
    parent = tempfile.mkdtemp()
    path = os.path.join(parent, "orders_out")
    results = write_audit_publish(
        d,
        path,
        {
            "row_count": lambda s: s.count() == n,
            "no_null_keys": lambda s: s.filter(
                F.col("o_orderkey").isNull()
            ).count()
            == 0,
        },
        target_rows_per_file=5000,
    )
    assert results == {"row_count": True, "no_null_keys": True}
    assert spark.read.parquet(path).count() == n
    # published path is an atomic symlink to ONE hidden version dir;
    # nothing else (staging, tmp links) is left behind
    assert os.path.islink(path)
    assert _visible(parent) == ["orders_out"]
    hidden = _hidden(parent)
    assert len(hidden) == 1 and ".v-" in hidden[0]

    # republish: still readable; the PRIOR version survives one
    # publish cycle (grace period for in-flight readers that resolved
    # the old symlink target before the flip) — so 2 hidden versions
    first_version = os.path.realpath(path)
    write_audit_publish(
        d.limit(100),
        path,
        {"ok": lambda s: s.count() == 100},
        target_rows_per_file=5000,
    )
    assert spark.read.parquet(path).count() == 100
    assert len(_hidden(parent)) == 2
    assert os.path.isdir(first_version)  # in-flight readers unharmed

    # a third publish reclaims the oldest generation: still 2 hidden
    write_audit_publish(
        d.limit(10),
        path,
        {"ok": lambda s: s.count() == 10},
        target_rows_per_file=5000,
    )
    assert spark.read.parquet(path).count() == 10
    assert len(_hidden(parent)) == 2
    assert not os.path.exists(first_version)  # two generations old: GC'd


def test_wap_failure_keeps_prior_publish_intact(spark):
    d = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    parent = tempfile.mkdtemp()
    path = os.path.join(parent, "orders_out")
    write_audit_publish(
        d, path, {"ok": lambda s: True}, target_rows_per_file=100000
    )
    prior_files = sorted(spark.read.parquet(path).inputFiles())
    prior_listing = (_visible(parent), _hidden(parent))
    n = d.count()
    with pytest.raises(ValueError, match="bad_audit"):
        write_audit_publish(
            d.limit(10),
            path,
            {"bad_audit": lambda s: s.count() == n},  # fails on limit
            target_rows_per_file=100000,
        )
    # an audit that RAISES must also clean up and keep the publish
    with pytest.raises(Exception, match="nope"):
        write_audit_publish(
            d.limit(10),
            path,
            {"boom": lambda s: (_ for _ in ()).throw(RuntimeError("nope"))},
            target_rows_per_file=100000,
        )
    assert sorted(spark.read.parquet(path).inputFiles()) == prior_files
    assert (_visible(parent), _hidden(parent)) == prior_listing


def test_wap_takes_over_pre_existing_real_directory(spark):
    d = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    parent = tempfile.mkdtemp()
    path = os.path.join(parent, "orders_out")
    d.limit(50).write.parquet(path)  # plain pre-WAP directory
    assert not os.path.islink(path)
    n = d.count()
    write_audit_publish(
        d,
        path,
        {"row_count": lambda s: s.count() == n},
        target_rows_per_file=100000,
    )
    assert os.path.islink(path)  # managed from now on
    assert spark.read.parquet(path).count() == n
    assert _visible(parent) == ["orders_out"]
    assert len(_hidden(parent)) == 1


def test_compaction_reduces_files_and_preserves_rows(spark):
    d = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    parent = tempfile.mkdtemp()
    path = os.path.join(parent, "li")
    # simulate a micro-batch-accreted directory: 40 tiny files
    d.repartition(40).write.parquet(path)
    n = spark.read.parquet(path).count()
    before, after = compact_parquet_dir(
        spark, path, target_rows_per_file=max(1, n // 3)
    )
    assert before == 40
    assert after < before and 3 <= after <= 8
    out = spark.read.parquet(path)
    assert out.count() == n
    # content identical, not just counts
    assert (
        out.exceptAll(d).count() == 0 and d.exceptAll(out).count() == 0
    )


def test_wap_concurrent_staging_dir_does_not_consume_grace_slot(spark):
    """ADVICE r9: a concurrent publisher's in-progress .v-* dir
    (newest mtime, unmarked) must neither consume the one-publish
    grace slot — which would rmtree the immediately-previous
    published version under in-flight readers — nor be deleted out
    from under its writer."""
    d = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    parent = tempfile.mkdtemp()
    path = os.path.join(parent, "orders_out")
    write_audit_publish(
        d.limit(100), path, {"ok": lambda s: True},
        target_rows_per_file=100000,
    )
    first_version = os.path.realpath(path)
    # simulate another publisher mid-write: a fresh unmarked staging
    # dir with the newest mtime
    in_progress = os.path.join(parent, ".orders_out.v-concurrent000")
    os.makedirs(in_progress)
    with open(os.path.join(in_progress, "part-00000.parquet"), "wb") as fh:
        fh.write(b"partial")
    write_audit_publish(
        d.limit(10), path, {"ok": lambda s: True},
        target_rows_per_file=100000,
    )
    # prior published version survives its grace cycle even though
    # the unmarked dir is newer...
    assert os.path.isdir(first_version)
    # ...and the in-progress dir is untouched
    assert os.path.isdir(in_progress)
    # one more publish: first_version is now two publishes old -> GC;
    # the unmarked dir STILL survives (not old enough to be a crash
    # leftover)
    write_audit_publish(
        d.limit(5), path, {"ok": lambda s: True},
        target_rows_per_file=100000,
    )
    assert not os.path.exists(first_version)
    assert os.path.isdir(in_progress)
    # aged-out unmarked dirs are swept as crash leftovers
    old = os.path.getmtime(in_progress) - 2 * 24 * 3600
    os.utime(in_progress, (old, old))
    write_audit_publish(
        d.limit(3), path, {"ok": lambda s: True},
        target_rows_per_file=100000,
    )
    assert not os.path.exists(in_progress)


def test_gc_grace_is_the_recorded_prev_not_mtime(spark):
    """A marked-but-never-current crash leftover (or any newer-mtime
    dir) must NOT displace the version in-flight readers may still be
    scanning: the grace slot is the explicit .gc-prev pointer."""
    import time as _time

    d = spark.range(5).select(F.col("id").alias("k"))
    parent = tempfile.mkdtemp()
    path = os.path.join(parent, "t")
    write_audit_publish(d, path, {}, target_rows_per_file=100)
    v1 = os.path.realpath(path)
    write_audit_publish(d, path, {}, target_rows_per_file=100)
    v2 = os.path.realpath(path)
    # plant a MARKED dir that was never the symlink target, with the
    # newest mtime — under mtime ranking it would steal the grace slot
    fake = os.path.join(parent, ".t.v-deadbeef0000")
    os.makedirs(fake)
    with open(os.path.join(fake, "_PUBLISHED"), "w") as fh:
        fh.write("deadbeef0000")
    _time.sleep(0.05)
    write_audit_publish(d, path, {}, target_rows_per_file=100)
    # v2 (the true previous target) survives; the fake marked dir and
    # v1 (two publishes old) are reclaimed
    assert os.path.isdir(v2)
    assert not os.path.exists(fake)
    assert not os.path.exists(v1)
    assert spark.read.parquet(path).count() == 5


def test_gc_protects_unmarked_prev_from_stale_sweep(spark):
    """A pre-marker-era published version (unmarked, old mtime) that
    is the recorded previous target must survive the stale-staging
    sweep — the next publish's readers may still be on it."""
    import time as _time

    d = spark.range(3).select(F.col("id").alias("k"))
    parent = tempfile.mkdtemp()
    path = os.path.join(parent, "t")
    write_audit_publish(d, path, {}, target_rows_per_file=100)
    v1 = os.path.realpath(path)
    # simulate a pre-marker layout: strip the marker, age the dir
    os.remove(os.path.join(v1, "_PUBLISHED"))
    old = _time.time() - 3 * 24 * 3600
    os.utime(v1, (old, old))
    write_audit_publish(d, path, {}, target_rows_per_file=100)
    assert os.path.isdir(v1)  # protected as the recorded prev
    assert spark.read.parquet(path).count() == 3
