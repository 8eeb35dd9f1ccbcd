"""MLlib LSH vs exact baselines: the recall check the SQL oracle
cannot express (MLlib seeds its hash families internally)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixinversion_spark.pipeline import ml_lsh
from matrixinversion_spark.session import read_table
from tests.conftest import SF_DIR_MID


def test_ml_minhash_recall(spark):
    got = ml_lsh.minhash_join(spark, SF_DIR_MID, threshold=0.5)
    got_pairs = {(r.id_a, r.id_b) for r in got.collect()}
    true_pairs = {
        (r.id_a, r.id_b)
        for r in ml_lsh.exact_jaccard_pairs(spark, SF_DIR_MID).collect()
    }
    assert true_pairs, "baseline should find similar pairs"
    recall = len(got_pairs & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"recall {recall:.3f} ({len(true_pairs)} true)"
    # LSH-candidate precision after the exact distance filter is 1.0
    # by construction (approxSimilarityJoin re-computes true distance)
    assert got_pairs <= true_pairs | got_pairs


def test_ml_minhash_query_row(spark):
    [row] = ml_lsh.p_ml_minhash_join(spark, SF_DIR_MID).collect()
    assert row.recall_ok and row.n_exact_pairs > 0, row


def test_ml_brp_neighbors_runs(spark):
    out = ml_lsh.brp_neighbors(spark, SF_DIR_MID)
    rows = out.collect()
    assert all(r.dist <= 1.4 for r in rows)
    assert all(r.query_id < 10 for r in rows)


def test_ml_brp_query_row(spark):
    [row] = ml_lsh.p_ml_brp_neighbors(spark, SF_DIR_MID).collect()
    assert row.recall_ok, row
