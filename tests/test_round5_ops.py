"""Property tests for the round-5 operator additions.

The oracle gate proves value-level equivalence vs DuckDB at sf0.01;
these pin the *semantic invariants* that survive testdata regens
(the r3 lesson: environment/data deltas, not logic, break rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401  (populates the query registry)

SF = "/root/testdata/sf0.001"


def test_pagerank_is_a_distribution_modulo_dangling(spark):
    """Ranks are positive; total mass ≤ 1 (dangling mass is dropped,
    never redistributed — the documented semantics); every nation
    node appears exactly once."""
    from matrixinversion_spark.registry import QUERIES
    rows = QUERIES["q_pagerank"](spark, SF).collect()
    n_nations = spark.read.parquet(f"{SF}/nation.parquet").count()
    assert len(rows) == n_nations
    ranks = [r["pagerank_r6"] for r in rows]
    assert all(r > 0 for r in ranks)
    assert sum(ranks) <= 1.0 + 1e-6


def test_gaps_islands_streaks_are_maximal_runs(spark):
    """Every streak: start ≤ end, length = day-span + 1 (consecutive
    by construction), and no two islands of one customer overlap."""
    from matrixinversion_spark.registry import QUERIES
    df = QUERIES["q_gaps_islands"](spark, SF)
    bad_span = df.filter(
        F.datediff(
            F.to_date("streak_end"), F.to_date("streak_start")
        ) != F.col("streak_days") - 1
    ).count()
    assert bad_span == 0
    # islands per customer must be disjoint: sorting by start, each
    # start must be > the previous end (a gap of ≥ 2 days — a gap of
    # exactly 1 day would have merged the islands)
    rows = df.orderBy("custkey", "streak_start").collect()
    prev = {}
    for r in rows:
        k = r["custkey"]
        if k in prev:
            assert r["streak_start"] > prev[k], r
        prev[k] = r["streak_end"]


def test_hash_split_is_a_partition(spark):
    """Splits are disjoint, exhaustive, and deterministic across
    re-runs (the whole point vs randomSplit)."""
    from matrixinversion_spark.registry import QUERIES
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    rows = {
        r["split"]: r["n_docs"]
        for r in QUERIES["p_hash_split"](spark, SF).collect()
    }
    assert sum(rows.values()) == total
    rows2 = {
        r["split"]: r["n_docs"]
        for r in QUERIES["p_hash_split"](spark, SF).collect()
    }
    assert rows == rows2


def test_incremental_agg_matches_direct(spark):
    """The base⊕delta merge must equal a direct one-pass aggregate
    (the operator's entire claim), on integer counts exactly."""
    from matrixinversion_spark.registry import QUERIES
    inc = {
        r["custkey"]: r["n_orders"]
        for r in QUERIES["q_incremental_agg"](spark, SF).collect()
    }
    o = spark.read.parquet(f"{SF}/orders.parquet")
    direct = {
        r["o_custkey"]: r["n"]
        for r in o.groupBy("o_custkey").agg(F.count("*").alias("n")).collect()
    }
    assert inc == direct


def test_hash_sample_per_group_sizes_and_determinism(spark):
    from matrixinversion_spark.registry import QUERIES
    df = QUERIES["p_hash_sample_per_group"](spark, SF)
    sizes = {
        r["lang"]: r["n"]
        for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    d = spark.read.parquet(f"{SF}/documents.parquet")
    avail = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert n == min(10, avail[lang])
    ids1 = {r["doc_id"] for r in df.collect()}
    ids2 = {r["doc_id"] for r in df.collect()}
    assert ids1 == ids2


def test_ngram_counts_threshold(spark):
    from matrixinversion_spark.registry import QUERIES
    df = QUERIES["p_ngram_counts"](spark, SF)
    assert df.filter(F.col("cnt") < 5).count() == 0
    # every bigram is two space-joined tokens
    assert df.filter(F.size(F.split("bigram", " ")) != 2).count() == 0
