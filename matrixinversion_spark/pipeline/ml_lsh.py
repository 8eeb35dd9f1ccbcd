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


@query("p_ml_minhash_join")
def p_ml_minhash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_join(spark, sf_dir)


@query("p_ml_brp_neighbors")
def p_ml_brp_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH: approx neighbors within euclidean
    distance 1.0 of the first embedding vectors (query set vec_id<10)."""
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
    pairs = model.approxSimilarityJoin(q, v, 1.4, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.round("dist", 6).alias("dist"),
        )
    )
