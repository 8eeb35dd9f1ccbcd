"""Similarity search over embedding columns.

- ``p_knn_bruteforce``: exact cosine top-k — the correctness baseline.
- ``p_ann_ivf_topk``: IVF-style approximate search — assign every
  vector to its nearest coarse centroid (one broadcast join), then
  search only within the query's cluster. The 100 TB plan: the
  centroid table is tiny and broadcast; candidate scoring touches
  1/n_clusters of the data per query; everything stays JVM-side
  (``zip_with``/``aggregate`` dot products over array columns).
- ``p_embedding_stats``: per-label norm/centroid statistics.

Cosines are computed in float64 on both engines and rounded before
ranking, so Spark and the DuckDB oracle produce identical rankings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table

N_QUERIES = 10   # vec_id < 10 are the demo query vectors
N_CENTROIDS = 8  # vec_id < 8 double as IVF coarse centroids
TOP_K = 3


def dot(x: Column, y: Column) -> Column:
    """float64 dot product of two array columns, JVM-side."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    return v.withColumn("nrm", F.sqrt(dot(F.col("e"), F.col("e"))))


_VEC_CTE = """
v AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
), n AS (
    SELECT vec_id, label, e,
           sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
    FROM v
)"""


@query(
    "p_knn_bruteforce",
    oracle=f"""
    WITH {_VEC_CTE},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cos
        FROM n q JOIN n c ON q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ), ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def p_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the demo query set.

    Query side is tiny → broadcast; scoring is a single pass over the
    corpus with codegen'd array math; top-k per query is a window over
    the (small) scored set. At scale, cap the scored set per query
    with a coarse filter (see p_ann_ivf_topk).
    """
    n = _vectors(spark, sf_dir)
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        F.broadcast(q)
        .join(n, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


@query(
    "p_ann_ivf_topk",
    oracle=f"""
    WITH {_VEC_CTE},
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM n
             WHERE vec_id < {N_CENTROIDS}),
    assign AS (
        SELECT vec_id, label, e, nrm, cid FROM (
            SELECT x.vec_id, x.label, x.e, x.nrm, cent.cid,
                   row_number() OVER (
                       PARTITION BY x.vec_id
                       ORDER BY round(list_dot_product(x.e, cent.ce)
                                      / (x.nrm * cent.cn), 6) DESC, cent.cid
                   ) AS arnk
            FROM n x CROSS JOIN cent
        ) WHERE arnk = 1
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cos
        FROM assign q JOIN assign c
          ON q.cid = c.cid AND q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, cos, rnk FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def p_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (coarse-quantize, search in-cell).

    Assignment joins every vector against the broadcast centroid
    table (tiny); the search join is co-partitioned on the cluster id
    — the shuffle is on ``cid``, and each query scores only its own
    cell instead of the full corpus. Recall < 1 by design (IVF with
    nprobe=1); the brute-force twin measures the gap.
    """
    n = _vectors(spark, sf_dir)
    cent = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    acos = F.round(
        dot(F.col("e"), F.col("ce")) / (F.col("nrm") * F.col("cn")), 6
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("acos"), F.asc("cid"))
    assign = (
        n.crossJoin(F.broadcast(cent))
        .withColumn("acos", acos)
        .withColumn("arnk", F.row_number().over(aw))
        .filter(F.col("arnk") == 1)
        .select("vec_id", "label", "e", "nrm", "cid")
    )
    q = assign.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        "cid",
    )
    scored = q.join(
        assign, (q.cid == assign.cid) & (F.col("query_id") != F.col("vec_id"))
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


@query(
    "p_embedding_stats",
    oracle=f"""
    WITH {_VEC_CTE}
    SELECT label,
           count(*) AS n_vectors,
           round(avg(nrm), 6) AS avg_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm,
           round(avg(e[1]), 6) AS avg_dim0
    FROM n GROUP BY label
    """,
)
def p_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics (norms + first-dim mean)."""
    n = _vectors(spark, sf_dir)
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("nrm"), 6).alias("avg_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.round(F.avg(F.element_at("e", 1)), 6).alias("avg_dim0"),
    )


@query(
    "p_embedding_quantize",
    oracle="""
    WITH norms AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding,
                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS l2
        FROM embeddings
    )
    SELECT vec_id, round(l2, 5) AS l2_norm,
           array_to_string(list_transform(embedding,
                v -> CAST(floor(CAST(v AS DOUBLE) / l2 * 127.0 + 0.5) AS INT)
           ), ',') AS q_int8_csv
    FROM norms
    """,
)
def p_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize + symmetric int8 quantization of the embedding
    column — the storage-shrink step ANN indexes run before bucketing
    (4x smaller vectors, dot products in integer SIMD). Row-local JVM
    array expressions: no shuffle, no UDF; floor(x+0.5) rounding keeps
    the oracle engine-portable (SQL round() half-rounding differs
    between engines). The quantized vector is emitted joined into one
    CSV string — same content, but a scalar column — because the
    driver's compare sorts result rows by every column and raw
    array cells are unsortable/unhashable there."""
    e = read_table(spark, sf_dir, "embeddings")
    v64 = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    l2 = F.sqrt(
        F.aggregate(v64, F.lit(0.0), lambda a, v: a + v * v)
    )
    return e.select(
        "vec_id",
        F.round(l2, 5).alias("l2_norm"),
        F.array_join(
            F.transform(
                v64, lambda v: F.floor(v / l2 * 127.0 + 0.5).cast("int")
            ),
            ",",
        ).alias("q_int8_csv"),
    )


EMB_DIM = 64  # TESTDATA embedding width


def _partial_gram(mean):
    """Closure factory: per-Arrow-batch centered partial Gram.

    Each batch contributes Xc.T @ Xc as 4096 (i, j, s) rows plus one
    (-1, -1, n) count row — the map-side combine that keeps a 100 TB
    covariance at shuffle volume O(batches x d^2), independent of row
    count. ``mean`` is a collected 64-float numpy vector (driver
    constant in the task closure; the two-pass centered form is the
    numerically stable one)."""
    import numpy as np
    import pandas as pd

    def gram(batches):
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xc = x - mean
            s = xc.T @ xc
            d = s.shape[0]
            i = np.repeat(np.arange(d), d)
            j = np.tile(np.arange(d), d)
            out = pd.DataFrame(
                {"i": i, "j": j, "s": s.ravel()}
            )
            out.loc[len(out)] = {"i": -1, "j": -1, "s": float(len(x))}
            yield out

    return gram


def covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance of the embedding columns as (i, j, cov)."""
    e = read_table(spark, sf_dir, "embeddings").select("embedding")
    # pass 1: mean vector via per-batch partial column sums
    import numpy as np
    import pandas as pd

    def colsums(batches):
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out = pd.DataFrame(
                {"i": np.arange(x.shape[1]), "s": x.sum(axis=0)}
            )
            out.loc[len(out)] = {"i": -1, "s": float(len(x))}
            yield out

    sums = (
        e.mapInPandas(colsums, "i int, s double")
        .groupBy("i")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    n = next(r["s"] for r in sums if r["i"] == -1)
    mean = np.zeros(EMB_DIM)
    for r in sums:
        if r["i"] >= 0:
            mean[r["i"]] = r["s"] / n

    # pass 2: centered partial Gram, one shuffle on (i, j)
    agg = (
        e.mapInPandas(_partial_gram(mean), "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .filter(F.col("i") >= 0)
    )
    return agg.select(
        "i", "j", (F.col("s") / F.lit(float(n))).alias("cov")
    )


@query(
    "p_embedding_covariance",
    oracle=f"""
    WITH vals AS (
        SELECT vec_id, u.i - 1 AS i, CAST(embedding[u.i] AS DOUBLE) AS v
        FROM embeddings,
             LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    means AS (SELECT i, avg(v) AS m FROM vals GROUP BY i)
    SELECT a.i AS i, b.i AS j,
           round(avg(a.v * b.v) - ma.m * mb.m, 6) + 0.0 AS cov
    FROM vals a
    JOIN vals b USING (vec_id)
    JOIN means ma ON ma.i = a.i
    JOIN means mb ON mb.i = b.i
    GROUP BY a.i, b.i, ma.m, mb.m
    """,
)
def p_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed feature covariance of the embedding column — the
    Gram-matrix pattern (PCA/whitening prep): per-batch centered
    partial products map-side, one (i, j) shuffle of d^2-sized
    partials, never an explode of N x d^2 rows. Oracle recomputes it
    relationally (avg(vi*vj) - mi*mj). The ``+ 0.0`` on both sides
    canonicalizes IEEE negative zero: near-zero covariances round to
    -0.0 on DuckDB but 0.0 on Spark (BigDecimal HALF_UP drops the
    sign), and a bitwise value-hash distinguishes them."""
    return covariance_matrix(spark, sf_dir).select(
        "i", "j", (F.round("cov", 6) + F.lit(0.0)).alias("cov")
    )


def pca_top_components(spark: SparkSession, sf_dir: str, k: int = 5):
    """Top-k PCA eigenvalues/vectors: distribute the covariance,
    localize the d x d eigendecomposition (numpy eigh on 64x64 —
    the standard split: N scales out, d stays tiny)."""
    import numpy as np

    rows = covariance_matrix(spark, sf_dir).collect()
    cov = np.zeros((EMB_DIM, EMB_DIM))
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return w[order], v[:, order]


@query(
    "p_embedding_pca_variance",
    oracle="""
    SELECT CAST(range AS INTEGER) AS component, TRUE AS matches_numpy
    FROM range(5)
    """,
)
def p_embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 PCA via distributed partial-Gram covariance + local eigh,
    differentialed IN-QUERY against full numpy PCA on the raw
    embeddings (no SQL engine can eigendecompose, but the boolean
    outcome of the cross-implementation comparison is hash-checkable).
    The collect here is the verification twin only — the production
    path (pca_top_components) never moves N rows to the driver."""
    import numpy as np

    w, _ = pca_top_components(spark, sf_dir, k=5)
    rows = covariance_matrix(spark, sf_dir).filter("i = j").collect()
    total = float(sum(r["cov"] for r in rows))
    ratios = np.asarray(w, dtype=np.float64) / total

    x = np.stack(
        read_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    cov_np = np.cov(x, rowvar=False, bias=True)
    w_np = np.sort(np.linalg.eigvalsh(cov_np))[::-1][:5]
    ratios_np = w_np / float(np.trace(cov_np))

    return spark.createDataFrame(
        [
            (int(i), bool(abs(ratios[i] - ratios_np[i]) < 1e-8))
            for i in range(5)
        ],
        "component int, matches_numpy boolean",
    )


def kmeans_lloyd(spark: SparkSession, sf_dir: str, k: int = 8,
                 iters: int = 3):
    """Lloyd's k-means over the embedding column, deterministic init
    (the k lowest vec_ids). Returns (centroids ndarray, inertia).

    Scale shape per iteration: centroids ship in the task closure
    (k x d = 512 doubles); each Arrow batch emits k partial rows
    (cluster, count, sum-vector) — the treeAggregate pattern — so
    driver traffic is O(batches x k x d), independent of N. The
    assignment never materializes an N x k distance matrix in the
    plan."""
    import numpy as np
    import pandas as pd

    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    init_rows = (
        e.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    )
    centroids = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in init_rows]
    )

    def partials_for(cents):
        def partials(batches):
            for pdf in batches:
                x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                d2 = (
                    (x ** 2).sum(1)[:, None]
                    - 2.0 * x @ cents.T
                    + (cents ** 2).sum(1)[None, :]
                )
                assign = d2.argmin(1)
                rows = []
                for c in range(len(cents)):
                    mask = assign == c
                    rows.append(
                        (
                            c,
                            int(mask.sum()),
                            x[mask].sum(0).tolist(),
                            float(d2[mask, c].sum()),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=["cluster", "n", "sums", "sq"]
                )

        return partials

    schema = "cluster int, n long, sums array<double>, sq double"
    inertia = float("nan")
    for _ in range(iters):
        parts = e.mapInPandas(partials_for(centroids), schema).collect()
        counts = np.zeros(k)
        sums = np.zeros_like(centroids)
        inertia = 0.0
        for r in parts:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["sums"])
            inertia += r["sq"]
        nonzero = counts > 0
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
    return centroids, inertia


@query(
    "p_kmeans_clusters",
    oracle="""
    SELECT 8 AS k, CAST(count(*) AS BIGINT) AS n_points,
           TRUE AS matches_numpy
    FROM embeddings
    """,
)
def p_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (3 iterations, k=8, deterministic
    init), differentialed IN-QUERY against a numpy replay with the
    same init and iteration count (iterative — no SQL oracle exists,
    but the boolean outcome is hash-checkable and the point count is
    exact SQL). The collect is the verification twin; the production
    path (kmeans_lloyd) moves only O(batches·k·d) partials."""
    import numpy as np

    centroids, inertia = kmeans_lloyd(spark, sf_dir, k=8, iters=3)

    rows = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    x = np.stack(rows["embedding"].to_numpy()).astype(np.float64)
    k, iters = 8, 3
    cents = x[:k].copy()
    inertia_np = float("nan")
    for _ in range(iters):
        d2 = ((x ** 2).sum(1)[:, None] - 2.0 * x @ cents.T
              + (cents ** 2).sum(1)[None, :])
        assign = d2.argmin(1)
        inertia_np = float(d2[np.arange(len(x)), assign].sum())
        for c in range(k):
            if (assign == c).any():
                cents[c] = x[assign == c].mean(0)

    ok = bool(
        np.max(np.abs(centroids - cents)) < 1e-9
        and abs(inertia - inertia_np) < 1e-6 * max(1.0, inertia_np)
    )
    return spark.createDataFrame(
        [(k, int(len(x)), ok)],
        "k int, n_points bigint, matches_numpy boolean",
    )


SEMDEDUP_TAU = 0.38  # demo-corpus threshold; production runs ~0.95+


def assign_cells(n: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-coarse-centroid assignment against an arbitrary
    centroid frame ``cent`` (cid, ce, cn). Broadcast centroid cross
    join + per-vector argmax — the corpus never shuffles for the
    assignment itself; ties break on the smaller cid."""
    acos = F.round(
        dot(F.col("e"), F.col("ce")) / (F.col("nrm") * F.col("cn")), 6
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("acos"), F.asc("cid"))
    return (
        n.crossJoin(F.broadcast(cent))
        .withColumn("acos", acos)
        .withColumn("arnk", F.row_number().over(aw))
        .filter(F.col("arnk") == 1)
        .select("vec_id", "label", "e", "nrm", "cid")
    )


def semantic_dedup(
    n: DataFrame, cent: DataFrame, tau: float
) -> DataFrame:
    """Library core of ``p_semantic_dedup``: assign to cells, then a
    cid-partitioned pair join marks every vector with an earlier
    same-cell vector at cosine >= tau. Returns one verdict row per
    vector: (vec_id, cid, keep, dup_of)."""
    assign = assign_cells(n, cent)
    a = assign.select(
        F.col("cid").alias("acid"),
        F.col("vec_id").alias("i"),
        F.col("e").alias("ae"),
        F.col("nrm").alias("an"),
    )
    b = assign.select("cid", F.col("vec_id").alias("j"), "e", "nrm")
    cos = F.round(
        dot(F.col("ae"), F.col("e")) / (F.col("an") * F.col("nrm")), 6
    )
    dups = (
        a.join(b, (F.col("acid") == F.col("cid")) & (F.col("i") < F.col("j")))
        .filter(cos >= tau)
        .groupBy("j")
        .agg(F.min("i").alias("dup_of"))
    )
    return (
        assign.join(dups, assign.vec_id == dups.j, "left")
        .select(
            "vec_id",
            "cid",
            F.when(F.col("dup_of").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("keep"),
            "dup_of",
        )
    )


def _ivf_assign(n: DataFrame) -> DataFrame:
    """Nearest-coarse-centroid assignment (same deterministic
    centroid set as ``p_ann_ivf_topk``: vec_id < N_CENTROIDS, nprobe
    = 1)."""
    cent = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    return assign_cells(n, cent)


@query(
    "p_semantic_dedup",
    oracle=f"""
    WITH {_VEC_CTE},
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM n
             WHERE vec_id < {N_CENTROIDS}),
    assign AS (
        SELECT vec_id, e, nrm, cid FROM (
            SELECT x.vec_id, x.e, x.nrm, cent.cid,
                   row_number() OVER (
                       PARTITION BY x.vec_id
                       ORDER BY round(list_dot_product(x.e, cent.ce)
                                      / (x.nrm * cent.cn), 6) DESC, cent.cid
                   ) AS arnk
            FROM n x CROSS JOIN cent
        ) WHERE arnk = 1
    ),
    dups AS (
        SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
        FROM assign a JOIN assign b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)
              >= {SEMDEDUP_TAU}
        GROUP BY b.vec_id
    )
    SELECT s.vec_id, s.cid,
           CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS INT) AS keep,
           d.dup_of
    FROM assign s LEFT JOIN dups d ON s.vec_id = d.vec_id
    """,
)
def p_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    coarse-cluster the embedding space, then drop any vector whose
    cosine to an EARLIER vector in the same cluster exceeds tau —
    near-duplicate *meaning*, not near-duplicate *bytes*, which
    MinHash/SimHash (`dedup.py`) cannot see across paraphrases.

    Deterministic demo variant: clusters are the same fixed coarse
    centroids as ``p_ann_ivf_topk`` (first N_CENTROIDS vectors,
    nprobe = 1) so the DuckDB oracle replicates assignment exactly,
    and the keep rule is greedy min-id (a vector survives iff no
    smaller-id same-cluster vector is within tau). tau = 0.38 is
    demo-scale for the synthetic corpus (max pairwise cos ~0.51);
    production semantic dedup runs ~0.95.

    100 TB shape: assignment is a broadcast cross join (centroid
    table is tiny) — the corpus's ONE shuffle is on ``cid`` for the
    in-cluster pair join, and pair volume is bounded per-cluster,
    never global. At real scale the guard is cluster size: k-means
    with enough centroids keeps cells ~|corpus|/k, and oversized
    cells re-split with a second-level codebook (IVF-style) before
    pairing; the greedy min-id rule needs no iteration, so the whole
    operator is two joins deep."""
    n = _vectors(spark, sf_dir)
    cent = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    return semantic_dedup(n, cent, SEMDEDUP_TAU)


PQ_M = 8       # subspaces
PQ_DSUB = 8    # dims per subspace (EMB_DIM = PQ_M * PQ_DSUB)
PQ_K = 8       # codewords per subspace (vec_id < PQ_K slices)
IVFPQ_NPROBE = 2  # cells probed per query in the IVF-PQ composition

# Shared PQ CTEs (subspace slices, deterministic codebook, encoding,
# per-query LUT) — used verbatim by the PQ-ADC oracle and the IVF-PQ
# composition's oracle.
_PQ_CTES = f"""
    sub AS (
        SELECT vec_id, m, e[m * {PQ_DSUB} + 1 : (m + 1) * {PQ_DSUB}] AS xs
        FROM n CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m)
    ),
    cb AS (SELECT m, vec_id AS k, xs AS cs FROM sub
           WHERE vec_id < {PQ_K}),
    enc AS (
        SELECT vec_id, m, k FROM (
            SELECT s.vec_id, s.m, c.k,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY round(list_sum(list_transform(
                                    range(1, {PQ_DSUB} + 1),
                                    i -> (s.xs[i] - c.cs[i])
                                         * (s.xs[i] - c.cs[i]))), 6),
                                c.k
                   ) AS rn
            FROM sub s JOIN cb c ON s.m = c.m
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT q.vec_id AS query_id, c.m, c.k,
               list_dot_product(q.xs, c.cs) AS ip
        FROM sub q JOIN cb c ON q.m = c.m
        WHERE q.vec_id < {N_QUERIES}
    )"""


def _pq_parts(n: DataFrame, pq_k: int = PQ_K
              ) -> tuple[DataFrame, DataFrame]:
    """Subspace slices (vec_id, m, xs) and the deterministic
    codebook (cm, k, cs): sub-slices of the first ``pq_k`` vectors."""
    ms = F.explode(
        F.array(*[F.lit(m) for m in range(PQ_M)])
    ).alias("m")
    sub = n.select("vec_id", ms, "e").select(
        "vec_id",
        "m",
        F.expr(f"slice(e, m * {PQ_DSUB} + 1, {PQ_DSUB})").alias("xs"),
    )
    cb = sub.filter(F.col("vec_id") < pq_k).select(
        F.col("m").alias("cm"),
        F.col("vec_id").alias("k"),
        F.col("xs").alias("cs"),
    )
    return sub, cb


def _pq_encode(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest-codeword code per (vec_id, m): broadcast codebook join
    folded into a min(struct(dist², k)) hash aggregate."""
    dist2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("xs"), F.col("cs"), lambda x, c: (x - c) * (x - c)
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        ),
        6,
    )
    return (
        sub.join(F.broadcast(cb), F.col("m") == F.col("cm"))
        .select("vec_id", "m", F.struct(dist2.alias("d"), "k").alias("dk"))
        .groupBy("vec_id", "m")
        .agg(F.min("dk")["k"].alias("k"))
    )


def _pq_lut(sub: DataFrame, cb: DataFrame,
            n_queries: int = N_QUERIES) -> DataFrame:
    """Per-query inner-product lookup table (query_id, m, k, ip)."""
    return (
        sub.filter(F.col("vec_id") < n_queries)
        .join(F.broadcast(cb), F.col("m") == F.col("cm"))
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "k",
            dot(F.col("xs"), F.col("cs")).alias("ip"),
        )
    )


@query(
    "p_ann_pq_adc",
    oracle=f"""
    WITH {_VEC_CTE},{_PQ_CTES},
    score AS (
        SELECT l.query_id, x.vec_id AS neighbor_id,
               round(sum(l.ip), 6) AS adc_ip
        FROM enc x JOIN lut l ON x.m = l.m AND x.k = l.k
        WHERE l.query_id != x.vec_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_ip, rnk FROM (
        SELECT query_id, neighbor_id, adc_ip,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_ip DESC, neighbor_id) AS rnk
        FROM score
    ) WHERE rnk <= {TOP_K}
    """,
)
def p_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jegou et al. 2011): split each vector into M subspaces, quantize
    every subspace to its nearest codeword (one byte per subspace at
    real K=256), and score queries against the CODES via a per-query
    lookup table — the memory tier between brute force (full floats)
    and IVF cell-probing, and the standard composition partner of
    both (IVF-PQ).

    Deterministic demo variant: the codebook per subspace is the
    sub-slices of the first PQ_K vectors (same fixed-seed trick as
    the IVF centroids) so the DuckDB oracle replicates encoding
    exactly; encoding ties break on round(dist², 6) then codeword id.

    100 TB shape, stage by stage: the codebook is M*K tiny rows —
    broadcast; ENCODING is a broadcast join + `min(struct(dist, k))`
    hash aggregate (map-side combinable, ONE corpus-sized shuffle on
    (vec_id, m) — and at real scale you fold argmin into the explode
    with a zero-shuffle `array_sort(transform(...))[0]` over a
    codebook literal); the query LUT is Q*M*K rows — broadcast; ADC
    scoring joins CODES (M small ints per vector, 32x smaller than
    the float vectors) against the LUT and sums M lookups per
    (query, vector) — the whole corpus is scanned per query batch at
    byte-width, which is the PQ trade: O(N*M) table-lookup adds
    instead of O(N*D) float multiplies over 32x the bytes. Recall
    gap vs exact is measured by the `p_knn_bruteforce` twin; compose
    with `p_ann_ivf_topk`'s cells to cut N to N/n_cells (IVF-PQ)."""
    n = _vectors(spark, sf_dir)
    sub, cb = _pq_parts(n)
    enc = _pq_encode(sub, cb)
    lut = _pq_lut(sub, cb)
    score = (
        enc.join(
            F.broadcast(lut),
            (enc.m == lut.m) & (enc.k == lut.k)
            & (F.col("query_id") != F.col("vec_id")),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("ip"), 6).alias("adc_ip"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_ip"), F.asc("neighbor_id")
    )
    return (
        score.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "adc_ip", "rnk")
    )


_IVFPQ_ORACLE_CORE = f"""
    WITH {_VEC_CTE},
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM n
             WHERE vec_id < {N_CENTROIDS}),
    arnks AS (
        SELECT x.vec_id, cent.cid,
               row_number() OVER (
                   PARTITION BY x.vec_id
                   ORDER BY round(list_dot_product(x.e, cent.ce)
                                  / (x.nrm * cent.cn), 6) DESC, cent.cid
               ) AS arnk
        FROM n x CROSS JOIN cent
    ),
    assign AS (SELECT vec_id, cid FROM arnks WHERE arnk = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM arnks
               WHERE arnk <= {IVFPQ_NPROBE} AND vec_id < {N_QUERIES}),{_PQ_CTES},
    lut_p AS (
        SELECT p.query_id, p.cid, l.m, l.k, l.ip
        FROM probes p JOIN lut l USING (query_id)
    ),
    score AS (
        SELECT l.query_id, x.vec_id AS neighbor_id,
               round(sum(l.ip), 6) AS adc_ip
        FROM (SELECT e.vec_id, a.cid, e.m, e.k
              FROM enc e JOIN assign a USING (vec_id)) x
        JOIN lut_p l ON x.cid = l.cid AND x.m = l.m AND x.k = l.k
        WHERE l.query_id != x.vec_id
        GROUP BY 1, 2
    ),
    adc_ranked AS (
        SELECT query_id, neighbor_id, adc_ip,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_ip DESC, neighbor_id) AS rnk
        FROM score
    )"""


@query(
    "p_ann_ivfpq_topk",
    oracle=_IVFPQ_ORACLE_CORE + f"""
    SELECT query_id, neighbor_id, adc_ip, rnk FROM adc_ranked
    WHERE rnk <= {TOP_K}
    """,
)
def p_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (the FAISS IVFADC layout, Jegou et al.
    2011 §V): coarse-quantize the corpus into IVF cells, PQ-encode
    every vector, and answer each query by probing its IVFPQ_NPROBE
    nearest cells and ADC-scoring ONLY the codes stored in those
    cells — the billion-scale design where neither the float vectors
    (PQ solves memory) nor the full corpus per query (IVF solves
    compute) is ever touched.

    Composition of the two registered building blocks, sharing their
    deterministic demo codebooks/centroids so the DuckDB oracle
    replays encoding and probing exactly. Demo simplification,
    documented: codes quantize the RAW vectors with one global
    codebook, where production IVFADC quantizes per-cell RESIDUALS
    (x - centroid) — same plan shape, different codebook training.

    100 TB shape: centroid table and codebook broadcast; the
    cell-assign and encode shuffles happen ONCE at index-build time
    (in production the codes table is written partitioned BY cid, so
    probing is partition pruning on the parquet scan); the per-query
    work is a broadcast of Q*nprobe*M*K LUT rows onto the byte-width
    code table with the cid filter applied BEFORE the M-way lookup
    aggregate — candidate volume is nprobe/n_cells of the corpus,
    at 32x-compressed width. Recall vs `p_knn_bruteforce` is the
    measured gap; raise IVFPQ_NPROBE to trade latency for recall
    (measured at 200k vectors by scripts/exp_ivfpq_recall.py —
    recall@10 vs brute force over the full query set per nprobe,
    numbers in BENCH_NOTES)."""
    n = _vectors(spark, sf_dir)
    return ivfpq_topk(n)


def ivfpq_topk(
    n: DataFrame,
    n_centroids: int = N_CENTROIDS,
    n_queries: int = N_QUERIES,
    nprobe: int = IVFPQ_NPROBE,
    top_k: int = TOP_K,
    pq_k: int = PQ_K,
) -> DataFrame:
    """Parameterized IVF-PQ top-k over a normalized vector frame
    (vec_id, e, nrm) — the body of ``p_ann_ivfpq_topk`` with the
    index geometry exposed, so the recall sweep
    (scripts/exp_ivfpq_recall.py) can scale cells/probes/queries
    without touching the oracle-pinned registered query."""
    cent = n.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    acos = F.round(
        dot(F.col("e"), F.col("ce")) / (F.col("nrm") * F.col("cn")), 6
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("acos"), F.asc("cid"))
    arnks = (
        n.crossJoin(F.broadcast(cent))
        .withColumn("acos", acos)
        .withColumn("arnk", F.row_number().over(aw))
    )
    assign = arnks.filter(F.col("arnk") == 1).select("vec_id", "cid")
    probes = (
        arnks.filter(
            (F.col("arnk") <= nprobe)
            & (F.col("vec_id") < n_queries)
        )
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    sub, cb = _pq_parts(n, pq_k)
    codes = _pq_encode(sub, cb).join(assign, "vec_id")
    lut_p = probes.join(_pq_lut(sub, cb, n_queries), "query_id").select(
        "query_id", F.col("cid").alias("pcid"), F.col("m").alias("pm"),
        F.col("k").alias("pk"), "ip",
    )
    score = (
        codes.join(
            F.broadcast(lut_p),
            (F.col("cid") == F.col("pcid"))
            & (F.col("m") == F.col("pm"))
            & (F.col("k") == F.col("pk"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("ip"), 6).alias("adc_ip"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_ip"), F.asc("neighbor_id")
    )
    return (
        score.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "neighbor_id", "adc_ip", "rnk")
    )


ANN_REFINE = 3  # exact re-rank of the ADC top-(TOP_K * ANN_REFINE)


@query(
    "p_ann_ivfpq_refined",
    oracle=_IVFPQ_ORACLE_CORE + f"""
    SELECT query_id, neighbor_id, cos, rnk FROM (
        SELECT a.query_id, a.neighbor_id,
               round(list_dot_product(q.e, x.e) / (q.nrm * x.nrm), 6)
                   AS cos,
               row_number() OVER (
                   PARTITION BY a.query_id
                   ORDER BY round(list_dot_product(q.e, x.e)
                                  / (q.nrm * x.nrm), 6) DESC,
                            a.neighbor_id
               ) AS rnk
        FROM adc_ranked a
        JOIN n q ON q.vec_id = a.query_id
        JOIN n x ON x.vec_id = a.neighbor_id
        WHERE a.rnk <= {TOP_K * ANN_REFINE}
    ) WHERE rnk <= {TOP_K}
    """,
)
def p_ann_ivfpq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + refine: the full production retrieval stack (FAISS
    IndexRefine over IVFADC; Jegou et al. 2011 §VI report the same
    two-stage design). The ADC stage over-estimates some candidates
    (a mix of per-subspace codewords can align with the query better
    than any real vector — measured in scripts/exp_ivfpq_recall.py:
    raw ADC recall@10 ~0.49 at 200k vectors, refined 0.99), so the
    deployment answer is: ADC produces a small over-fetched
    candidate list (TOP_K * ANN_REFINE per query), and EXACT cosine
    over just those candidates produces the final ranking.

    100 TB shape: the refine join touches TOP_K * ANN_REFINE rows
    per query — a constant amount of float work per query regardless
    of corpus size — and joins the float vectors of candidates only
    (point lookups by vec_id; in production a stored-vector side
    table partition-pruned by id range). Everything before it is the
    registered IVF-PQ plan unchanged.
    """
    n = _vectors(spark, sf_dir)
    cand = ivfpq_topk(n, top_k=TOP_K * ANN_REFINE)
    # Broadcast ONLY the query vectors (vec_id < N_QUERIES) — cand's
    # query_id is < N_QUERIES by construction, so the filter is
    # semantics-preserving, and the broadcast payload stays O(queries)
    # instead of O(corpus) (a full-table broadcast would materialize
    # every embedding on the driver and each executor at scale).
    qv = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    xv = n.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("xe"),
        F.col("nrm").alias("xn"),
    )
    cos = F.round(
        dot(F.col("qe"), F.col("xe")) / (F.col("qn") * F.col("xn")), 6
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        cand.join(xv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion
# ---------------------------------------------------------------------------

RRF_K = 60      # Cormack et al. 2009's smoothing constant
RRF_POOL = 20   # per-ranker candidate pool fed into the fusion
RRF_TOP = 10    # fused results returned per query

_RRF_SQL = f"""
WITH {_VEC_CTE},
qz AS (
    SELECT vec_id, e,
           list_transform(e, x -> round(x * 127)) AS z
    FROM n),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_dot_product(q.e, c.e), 6) AS cos,
           list_dot_product(q.z, c.z) AS qdot
    FROM qz q JOIN qz c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {N_QUERIES}),
re AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS r
    FROM pairs),
rq AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY qdot DESC, neighbor_id) AS r
    FROM pairs),
fused AS (
    SELECT coalesce(re.query_id, rq.query_id) AS query_id,
           coalesce(re.neighbor_id, rq.neighbor_id) AS neighbor_id,
           coalesce(1.0 / ({RRF_K} + re.r), 0)
               + coalesce(1.0 / ({RRF_K} + rq.r), 0) AS rrf
    FROM (SELECT * FROM re WHERE r <= {RRF_POOL}) re
    FULL OUTER JOIN (SELECT * FROM rq WHERE r <= {RRF_POOL}) rq
      ON re.query_id = rq.query_id
     AND re.neighbor_id = rq.neighbor_id),
top AS (
    SELECT query_id, neighbor_id, rrf,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rrf DESC, neighbor_id) AS rnk
    FROM fused)
SELECT query_id, neighbor_id, round(rrf, 6) AS rrf_score, rnk
FROM top WHERE rnk <= {RRF_TOP}
"""


@query("p_rrf_fusion", oracle=_RRF_SQL)
def p_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    two retrieval rankers: the exact float cosine ranking and an
    int8-quantized dot-product ranking (`round(x*127)` components —
    the memory-bound ranking a compressed index serves). RRF is THE
    standard way hybrid search merges rankers without score
    calibration: score = Σ_rankers 1/(k + rank), k=60, over each
    ranker's top-``RRF_POOL`` pool.

    The embeddings are unit-norm, so the quantized ranking agrees
    with the exact one except where quantization noise reorders
    near-ties — exactly the disagreement RRF exists to arbitrate.

    Scale shape: fusion itself only ever touches the rankers'
    BOUNDED top-pool lists (2·POOL rows per query — a full outer
    join on (query, neighbor) + one TakeOrdered); at 100 TB the
    pools come from the ANN family (`p_ann_ivfpq_refined` etc.),
    not a rescan. The demo pools here come from one broadcast-query
    corpus pass shared by both rankers (the quantized vector is a
    projection of the same row — no second scan). Cross-engine
    determinism: the exact ranker orders by the ROUNDED cosine (the
    `p_knn_bruteforce` rule), the quantized dot is integer-exact,
    and RRF scores are rationals of small integers — bit-identical
    in both engines."""
    n = _vectors(spark, sf_dir).select(
        "vec_id",
        "e",
        F.transform(
            "e", lambda x: F.round(x * 127, 0)
        ).alias("z"),
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("z").alias("qz"),
    )
    # Both rankers read `pairs`, so pin it — otherwise Catalyst
    # re-derives the broadcast-join + dot-product subtree once per
    # window branch and the corpus is scored twice (the same
    # multi-reference trap link_prediction_scores barriers).
    from matrixinversion_spark.pipeline.curation import (
        _fresh_stats_barrier,
    )

    pairs = _fresh_stats_barrier(
        F.broadcast(q)
        .join(n, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qe"), F.col("e")), 6).alias("cos"),
            dot(F.col("qz"), F.col("z")).alias("qdot"),
        )
    )

    def top_pool(score_col: str) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.desc(score_col), F.asc("neighbor_id")
        )
        return (
            pairs.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= RRF_POOL)
            .select("query_id", "neighbor_id", "r")
        )

    re_ = top_pool("cos").withColumnRenamed("r", "re")
    rq_ = top_pool("qdot").withColumnRenamed("r", "rq")
    fused = re_.join(
        rq_, ["query_id", "neighbor_id"], "full_outer"
    ).select(
        "query_id",
        "neighbor_id",
        (
            F.coalesce(1.0 / (RRF_K + F.col("re")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rq")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= RRF_TOP)
        .select(
            "query_id",
            "neighbor_id",
            F.round("rrf", 6).alias("rrf_score"),
            "rnk",
        )
    )
