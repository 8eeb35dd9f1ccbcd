"""MLlib LSH vs exact baselines: the recall check the SQL oracle
cannot express (MLlib seeds its hash families internally)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixinversion_spark.pipeline import ml_lsh
from matrixinversion_spark.session import read_table
from tests.conftest import SF_DIR_MID


def _exact_jaccard_pairs(spark, threshold=0.5):
    d = read_table(spark, SF_DIR_MID, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("t"),
    )
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(b, (F.col("a.t") == F.col("b.t"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"),
                 F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sza = sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    szb = sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sza, "id_a").join(szb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b")
    )


def test_ml_minhash_recall(spark):
    got = ml_lsh.minhash_join(spark, SF_DIR_MID, threshold=0.5)
    got_pairs = {(r.id_a, r.id_b) for r in got.collect()}
    true_pairs = {
        (r.id_a, r.id_b) for r in _exact_jaccard_pairs(spark).collect()
    }
    assert true_pairs, "baseline should find similar pairs"
    recall = len(got_pairs & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"recall {recall:.3f} ({len(true_pairs)} true)"
    # LSH-candidate precision after the exact distance filter is 1.0
    # by construction (approxSimilarityJoin re-computes true distance)
    assert got_pairs <= true_pairs | got_pairs


def test_ml_brp_neighbors_runs(spark):
    out = ml_lsh.p_ml_brp_neighbors(spark, SF_DIR_MID)
    rows = out.collect()
    assert all(r.dist <= 1.4 for r in rows)
    assert all(r.query_id < 10 for r in rows)
