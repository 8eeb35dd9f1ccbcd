"""MLlib LSH operators — the library path beside the hand-rolled one.

``pipeline.dedup`` implements MinHash/LSH with engine-portable hashing
so it can be oracle-checked against DuckDB. These entries use the
public MLlib estimators instead (SURVEY.md §2.3 item 3 names them):

- ``p_ml_minhash_join``  — MinHashLSH.approxSimilarityJoin over token
  sets (HashingTF sparse vectors).
- ``p_ml_brp_neighbors`` — BucketedRandomProjectionLSH approximate
  neighbors over the embeddings table.

MLlib seeds its hash families internally, so these are rows-only for
the driver; tests assert recall against the exact baselines instead
(the cross-implementation check the oracle can't do).
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    HashingTF,
    MinHashLSH,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


def minhash_join(spark: SparkSession, sf_dir: str,
                 threshold: float = 0.5) -> DataFrame:
    """MinHashLSH approx similarity join on token-set vectors.

    Jaccard distance threshold 0.5 ⇒ similarity ≥ 0.5. HashingTF with
    2^18 features keeps collisions negligible at corpus scale while
    the vector stays sparse (distinct tokens per doc)."""
    d = read_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tokens")
    )
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=1 << 18,
        binary=True,
    )
    feat = tf.transform(docs).filter(
        F.size("tokens") > 0
    )
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    )
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(
        feat, feat, threshold, distCol="jaccard_dist"
    )
    return (
        pairs.filter(
            F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
        )
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round(1 - F.col("jaccard_dist"), 6).alias("jaccard_sim"),
        )
    )


def exact_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        threshold: float = 0.5,
                        audit_mod: int | None = None) -> DataFrame:
    """Exact token-set Jaccard pairs ≥ threshold via an inverted-index
    self-join (the oracle-adjacent baseline for the LSH recall
    checks — never the scale path; the LSH join is). ``audit_mod``
    restricts both sides to the deterministic doc_id % audit_mod == 0
    stratum so the quadratic baseline stays bounded at scale."""
    d = read_table(spark, sf_dir, "documents")
    if audit_mod is not None:
        d = d.filter(F.col("doc_id") % audit_mod == 0)
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
    jac = F.col("i").cast("double") / (
        F.col("na") + F.col("nb") - F.col("i")
    )
    return (
        inter.join(sza, "id_a").join(szb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b")
    )


@query(
    "p_ml_minhash_join",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
        FROM documents WHERE doc_id % 10 = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, TRUE AS recall_ok
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
          / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
          >= 0.5
    """,
)
def p_ml_minhash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH similarity join, self-verified: MLlib seeds
    its hash family internally (no cross-engine signature oracle), so
    the row carries the EXACT count of Jaccard≥0.5 pairs among a
    deterministic 10% audit stratum (doc_id % 10 == 0 — recomputable
    in SQL) plus a ``recall_ok`` boolean asserting the LSH join (run
    over the FULL corpus) recovered ≥90% of them. The stratum bounds
    the quadratic exact baseline at any scale — the production path
    stays the LSH join; the all-pairs check never grows past the
    audit subset."""
    lsh_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_join(spark, sf_dir, threshold=0.5)
        .filter((F.col("id_a") % 10 == 0) & (F.col("id_b") % 10 == 0))
        .collect()
    }
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in exact_jaccard_pairs(
            spark, sf_dir, 0.5, audit_mod=10
        ).collect()
    }
    recall = (
        len(lsh_pairs & true_pairs) / len(true_pairs) if true_pairs else 1.0
    )
    return spark.createDataFrame(
        [(len(true_pairs), bool(recall >= 0.9))],
        "n_exact_pairs bigint, recall_ok boolean",
    )


def brp_neighbors(spark: SparkSession, sf_dir: str,
                  radius: float = 1.4) -> DataFrame:
    """BucketedRandomProjectionLSH: approx neighbors within euclidean
    distance ``radius`` of the first embedding vectors (vec_id<10)."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        ),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", numHashTables=4,
        bucketLength=2.0, seed=42,
    )
    model = lsh.fit(v)
    q = v.filter(F.col("vec_id") < 10)
    pairs = model.approxSimilarityJoin(q, v, radius, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.round("dist", 6).alias("dist"),
        )
    )


@query(
    "p_ml_brp_neighbors",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, TRUE AS recall_ok
    FROM embeddings q JOIN embeddings v
      ON q.vec_id < 10 AND q.vec_id != v.vec_id
    WHERE sqrt(list_sum(list_transform(
              generate_series(1, len(q.embedding)),
              i -> (CAST(q.embedding[i] AS DOUBLE)
                    - CAST(v.embedding[i] AS DOUBLE))
                   * (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(v.embedding[i] AS DOUBLE))
          ))) <= 1.4
    """,
)
def p_ml_brp_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH neighbors, self-verified:
    the row carries the EXACT count of L2≤1.4 pairs from the query
    set (recomputable in SQL over the embeddings) plus a
    ``recall_ok`` boolean asserting the LSH join recovered ≥90% —
    upgrading the old rows-only check to a hash-checkable recall
    property."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    d2 = F.aggregate(
        F.zip_with("qe", "e", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = (
        q.crossJoin(emb)
        .filter(F.col("query_id") != F.col("vec_id"))
        .filter(F.sqrt(d2) <= 1.4)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    true_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    got_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in brp_neighbors(spark, sf_dir, 1.4).collect()
    }
    recall = (
        len(got_pairs & true_pairs) / len(true_pairs) if true_pairs else 1.0
    )
    return spark.createDataFrame(
        [(len(true_pairs), bool(recall >= 0.9))],
        "n_exact_pairs bigint, recall_ok boolean",
    )
