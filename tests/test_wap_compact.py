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


def test_wap_publishes_when_audits_pass(spark):
    d = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    n = d.count()
    path = os.path.join(tempfile.mkdtemp(), "orders_out")
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
    # no staging/replaced leftovers beside the published dir
    parent = os.path.dirname(path)
    assert os.listdir(parent) == [os.path.basename(path)]


def test_wap_failure_keeps_prior_publish_intact(spark):
    d = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = os.path.join(tempfile.mkdtemp(), "orders_out")
    write_audit_publish(
        d, path, {"ok": lambda s: True}, target_rows_per_file=100000
    )
    prior_files = sorted(spark.read.parquet(path).inputFiles())
    n = d.count()
    with pytest.raises(ValueError, match="bad_audit"):
        write_audit_publish(
            d.limit(10),
            path,
            {"bad_audit": lambda s: s.count() == n},  # fails on limit
            target_rows_per_file=100000,
        )
    # previously published data untouched, staging cleaned up
    assert sorted(spark.read.parquet(path).inputFiles()) == prior_files
    parent = os.path.dirname(path)
    assert os.listdir(parent) == [os.path.basename(path)]


def test_compaction_reduces_files_and_preserves_rows(spark):
    d = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    path = os.path.join(tempfile.mkdtemp(), "li")
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
