"""IVF-PQ global recall sweep vs brute force (round-9, VERDICT #6).

The registered ``p_ann_ivfpq_topk`` smoke asserted in-cluster top-3
recall only; this script measures GLOBAL recall against the exact
brute-force answer over the full query set at 200k vectors, sweeping
nprobe in {1, 2, 4} — the recall/probe trade-off curve an index
deployment tunes (Jegou et al. 2011 §V report the same recall@R
methodology for IVFADC).

Corpus (200k x 64, PQ geometry M=8 x dsub=8), designed so the
metric exercises BOTH index stages:
- ids 0..C-1: C=64 hash-uniform cluster centers (double as the IVF
  coarse centroids);
- ids C..NQ-1: BOUNDARY queries — blends (1-t)*cA + t*cB between
  two centers with t uniform in [0, 0.5) plus small noise, so the
  query's nearest cells are genuinely ambiguous (this is what makes
  nprobe matter: the true neighbor's cell is not always the query's
  rank-1 cell);
- ids NQ..N-NQ-1: cluster members (center + 0.6 noise);
- ids N-NQ..N-1: PLANTED PARTNERS — id i copies vector i-(N-NQ)
  plus 0.05 noise, making every query's true cosine 1-NN
  unambiguous and PQ-resolvable (partner codes ~= query codes).
- codebook: pq_k=256 (slices of the first 256 vectors = centers +
  every query), so codes VARY within a cell and each query's own
  slices are codewords — the demo geometry's pq_k=8 quantizes every
  member to its center's code, which is fine for the oracle-pinned
  sf-scale query but resolves nothing at 200k.

Metrics per nprobe, over all NQ queries:
- adc recall1@10 — fraction of queries whose TRUE cosine 1-NN
  (brute force over all 200k, query excluded) appears in the raw
  ADC top-10 (Jegou's recall@R). Raw ADC under-performs when the
  1-NN margin is inside the quantization error: codeword mixes can
  OVERESTIMATE a candidate's similarity (scores > 1.0 on unit
  vectors), displacing the true neighbor — measured here, reported
  honestly;
- refined recall1@10 — the production answer (FAISS IndexRefine):
  take ADC top-(10*REFINE), re-rank those candidates with EXACT
  cosine (a per-query constant amount of float work — 10*REFINE
  dots per query at any corpus size), emit top-10;
- overlap@10 — mean |approx top-10 / exact top-10| / 10 for the
  refined list.

Asserts: refined recall1@10 is non-decreasing in nprobe and >= 0.9
at nprobe=4.

The fixture builder (``planted_corpus``) and the measurement loop
(``measure_recall``) are importable: ``tests/test_round11_ops.py``
runs them at n=20k as the per-round recall@10 regression gate
(VERDICT r10 #3 — a deliberate nprobe/codebook degradation must trip
a test, not just this opt-in script).

Usage: python scripts/exp_ivfpq_recall.py [n_vectors]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")
# 200k x 64 with a 256-codeword encode join wants more than the
# default 8g single-JVM heap (driver hosts all 32 executor threads
# in local mode)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from matrixinversion_spark.pipeline.similarity import (
    _vectors,
    dot,
    ivfpq_topk,
)
from matrixinversion_spark.session import get_spark

DIM = 64
C = 64          # clusters = IVF cells
NQ = 256        # queries: all vec_id < NQ (64 centers + 192 blends)
NOISE = 0.6
PARTNER_EPS = 0.05
# pq_k = NQ: every query's own sub-slices ARE codewords, so a planted
# partner (query + eps) quantizes to the query's own code and ADC
# ranks it first in any probed cell — recall then measures the IVF
# probe stage cleanly. 256 codewords also keeps the encode join's
# streamed volume (1.6M sub-rows x 256) inside the single-JVM heap;
# 2048 codewords OOM'd it (measured).
PQ_CODEBOOK = 256
TOP_K = 10
REFINE = 20  # re-rank ADC top-200 with exact cosine


def u(seed_col, j, salt):  # hash-uniform in [-1, 1]
    return (
        F.pmod(F.xxhash64(seed_col, F.lit(j), F.lit(salt)), 10_000)
        / 5_000.0
        - 1.0
    )


def planted_corpus(spark, n: int):
    """The deterministic (hash-seeded, no RNG state) planted corpus
    described in the module docstring, as an
    ``(vec_id, embedding, label)`` DataFrame of n unit vectors."""
    # src: partners replay the coords of their source id; everything
    # else is its own source
    src = F.when(
        F.col("id") >= n - NQ, F.col("id") - (n - NQ)
    ).otherwise(F.col("id"))
    ca = src % C
    cb = (src + 1) % C
    # blend weight for boundary queries: t in [0, 0.5)
    t = (F.pmod(F.xxhash64(src, F.lit("t")), 10_000) / 20_000.0)

    def base(j):
        center = u(ca, j, "c")
        blend = (1 - t) * u(ca, j, "c") + t * u(cb, j, "c")
        return (
            F.when(src < C, center)                       # pure centers
            .when(src < NQ, blend + 0.1 * u(src, j, "q"))  # boundary queries
            .otherwise(center + NOISE * u(src, j, "n"))    # members
        )

    coord = lambda j: F.when(  # noqa: E731
        F.col("id") >= n - NQ,
        base(j) + PARTNER_EPS * u(F.col("id"), j, "p"),
    ).otherwise(base(j))
    # UNIT-NORMALIZE: the ADC stage ranks by (approximate) inner
    # product while the ground truth ranks by cosine — on unit
    # vectors the two orders coincide (exactly how FAISS serves
    # cosine with METRIC_INNER_PRODUCT). Unnormalized blends have
    # smaller norms than the centers, making ip(q, centerCode) beat
    # ip(q, q) and the recall metric measure the norm mismatch
    # instead of the index (measured: recall collapsed to 0.008).
    raw = F.array(*[coord(j) for j in range(DIM)])
    nrm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x)
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(raw, lambda x: (x / nrm).cast("float")).alias(
            "embedding"
        ),
        ca.cast("int").alias("label"),
    )


def measure_recall(
    spark,
    sf_dir: str,
    n: int,
    nprobes=(1, 2, 4),
    pq_k: int = PQ_CODEBOOK,
) -> dict[int, dict]:
    """Brute-force ground truth + the per-nprobe sweep over a
    planted corpus already written to ``sf_dir/embeddings.parquet``.
    Returns {nprobe: {"adc": r1, "refined": r1, "overlap": ov,
    "wall": sec}}."""
    nn_df = _vectors(spark, sf_dir).persist()
    nn_df.count()

    # exact brute-force top-10 for the NQ queries over all n
    q = nn_df.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    cos = dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    t0 = time.time()
    exact = (
        nn_df.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "rnk")
        .collect()
    )
    bf_wall = time.time() - t0
    exact_top = {}
    true_nn = {}
    for r in exact:
        exact_top.setdefault(r.query_id, set()).add(r.vec_id)
        if r.rnk == 1:
            true_nn[r.query_id] = r.vec_id
    print(
        f"brute force: {len(true_nn)} queries x {n:,} vectors, "
        f"wall={bf_wall:.1f}s"
    )

    out: dict[int, dict] = {}
    for nprobe in nprobes:
        t0 = time.time()
        cand = ivfpq_topk(
            nn_df, n_centroids=C, n_queries=NQ, nprobe=nprobe,
            top_k=TOP_K * REFINE, pq_k=pq_k,
        )
        # refine: exact cosine over the bounded candidate list
        # (TOP_K*REFINE rows per query — constant per-query work)
        rcos = dot(F.col("qe"), F.col("e")) / (
            F.col("qn") * F.col("nrm")
        )
        rw = Window.partitionBy("query_id").orderBy(
            F.desc("rcos"), F.asc("neighbor_id")
        )
        refined = (
            cand.join(
                nn_df.select(
                    F.col("vec_id").alias("neighbor_id"), "e", "nrm"
                ),
                "neighbor_id",
            )
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id", "neighbor_id", "rnk",
                rcos.alias("rcos"),
            )
            .withColumn("rrnk", F.row_number().over(rw))
            .collect()
        )
        wall = time.time() - t0
        adc10, ref10 = {}, {}
        for r in refined:
            if r.rnk <= TOP_K:
                adc10.setdefault(r.query_id, set()).add(r.neighbor_id)
            if r.rrnk <= TOP_K:
                ref10.setdefault(r.query_id, set()).add(r.neighbor_id)
        r1_adc = sum(
            1 for qid, nn in true_nn.items() if nn in adc10.get(qid, ())
        ) / len(true_nn)
        r1_ref = sum(
            1 for qid, nn in true_nn.items() if nn in ref10.get(qid, ())
        ) / len(true_nn)
        ov = sum(
            len(ref10.get(qid, set()) & s) / TOP_K
            for qid, s in exact_top.items()
        ) / len(exact_top)
        out[nprobe] = {
            "adc": r1_adc, "refined": r1_ref,
            "overlap": ov, "wall": wall,
        }
        print(
            f"nprobe={nprobe}: adc_recall1@10={r1_adc:.3f} "
            f"refined_recall1@10={r1_ref:.3f} "
            f"overlap@10={ov:.3f} wall={wall:.1f}s"
        )
    nn_df.unpersist()
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("exp_ivfpq_recall")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ivfpq_recall_")
    try:
        planted_corpus(spark, n).write.parquet(
            f"{tmp}/embeddings.parquet"
        )
        res = measure_recall(spark, tmp, n)
        prev = -1.0
        for nprobe in sorted(res):
            assert res[nprobe]["refined"] >= prev - 1e-9, \
                "refined recall must not decrease with nprobe"
            prev = res[nprobe]["refined"]
        ok = res[4]["refined"] >= 0.9
        print(f"ok={ok}")
        if not ok:
            sys.exit(1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
