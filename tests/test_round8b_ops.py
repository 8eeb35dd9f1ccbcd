"""Round-8 second-wave operators: sorted-neighborhood ER blocking,
SemDeDup-style semantic dedup, and BPE merge-pair counting."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from matrixinversion_spark.pipeline.corpus import p_bpe_pair_counts
from matrixinversion_spark.pipeline.similarity import (
    SEMDEDUP_TAU,
    _ivf_assign,
    _vectors,
    p_semantic_dedup,
)
from matrixinversion_spark.relational.mining import (
    SN_MAX_DIST,
    SN_WINDOW,
    q_sorted_neighborhood_er,
)
from matrixinversion_spark.session import read_table

from .conftest import SF_DIR


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_matches_bruteforce_window(spark):
    got = {
        (r["k1"], r["k2"], r["gap"], r["dist"])
        for r in q_sorted_neighborhood_er(spark, SF_DIR).collect()
    }
    rows = sorted(
        read_table(spark, SF_DIR, "customer")
        .select("c_custkey", "c_name")
        .collect(),
        key=lambda r: (r["c_name"], r["c_custkey"]),
    )
    exp = set()
    for i, a in enumerate(rows):
        for gap in range(1, SN_WINDOW + 1):
            if i + gap >= len(rows):
                continue
            b = rows[i + gap]
            d = _lev(a["c_name"], b["c_name"])
            if d <= SN_MAX_DIST:
                exp.add((a["c_custkey"], b["c_custkey"], gap, d))
    assert got == exp
    assert exp  # the demo corpus must actually produce candidates
    # blocking bound: every pair is within the window by construction
    assert all(1 <= g <= SN_WINDOW for (_, _, g, _) in got)


def test_semantic_dedup_keep_semantics(spark):
    out = p_semantic_dedup(spark, SF_DIR).collect()
    n_total = _vectors(spark, SF_DIR).count()
    assert len(out) == n_total  # one verdict per vector
    # dup_of must point at an earlier vector in the SAME cluster with
    # cosine >= tau; keep <=> no such vector exists
    assign = {
        r["vec_id"]: (r["cid"], r["e"], r["nrm"])
        for r in _ivf_assign(_vectors(spark, SF_DIR)).collect()
    }

    def cos(i, j):
        _, ei, ni = assign[i]
        _, ej, nj = assign[j]
        return round(
            sum(a * b for a, b in zip(ei, ej)) / (ni * nj), 6
        )

    for r in out:
        vid, cid = r["vec_id"], r["cid"]
        assert assign[vid][0] == cid
        earlier = [
            j
            for j, (cj, _, _) in assign.items()
            if cj == cid and j < vid and cos(j, vid) >= SEMDEDUP_TAU
        ]
        if r["keep"] == 1:
            assert r["dup_of"] is None and not earlier
        else:
            assert earlier and r["dup_of"] == min(earlier)
    # survivors of each cluster are mutually non-duplicate
    kept = [r["vec_id"] for r in out if r["keep"] == 1]
    assert kept
    for i in kept:
        for j in kept:
            if i < j and assign[i][0] == assign[j][0]:
                assert cos(i, j) < SEMDEDUP_TAU


def test_bpe_pair_counts_match_python_recount(spark):
    got = {r["pair"]: r["cnt"] for r in p_bpe_pair_counts(spark, SF_DIR).collect()}
    texts = [
        r["text"]
        for r in read_table(spark, SF_DIR, "documents").select("text").collect()
    ]
    vocab: Counter[str] = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    pairs: Counter[str] = Counter()
    for w, wf in vocab.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += wf
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert got == dict(top)
    # top-k must lower to per-partition heaps, not a global sort
    plan = p_bpe_pair_counts(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pq_adc_matches_python_replication(spark):
    from matrixinversion_spark.pipeline.similarity import (
        N_QUERIES,
        PQ_DSUB,
        PQ_K,
        PQ_M,
        TOP_K,
        p_ann_pq_adc,
    )

    vecs = {
        r["vec_id"]: r["e"] for r in _vectors(spark, SF_DIR).collect()
    }
    # codebook = sub-slices of the first PQ_K vectors
    cb = {
        (m, k): vecs[k][m * PQ_DSUB : (m + 1) * PQ_DSUB]
        for m in range(PQ_M)
        for k in range(PQ_K)
    }

    def code(vid, m):
        xs = vecs[vid][m * PQ_DSUB : (m + 1) * PQ_DSUB]
        return min(
            range(PQ_K),
            key=lambda k: (
                round(sum((x - c) ** 2 for x, c in zip(xs, cb[(m, k)])), 6),
                k,
            ),
        )

    def adc(qid, vid):
        s = 0.0
        for m in range(PQ_M):
            qs = vecs[qid][m * PQ_DSUB : (m + 1) * PQ_DSUB]
            cs = cb[(m, code(vid, m))]
            s += sum(a * b for a, b in zip(qs, cs))
        return round(s, 6)

    exp = set()
    for q in range(N_QUERIES):
        scored = sorted(
            ((adc(q, v), v) for v in vecs if v != q),
            key=lambda t: (-t[0], t[1]),
        )
        for rnk, (s, v) in enumerate(scored[:TOP_K], 1):
            exp.add((q, v, s, rnk))

    got = {
        (r["query_id"], r["neighbor_id"], r["adc_ip"], r["rnk"])
        for r in p_ann_pq_adc(spark, SF_DIR).collect()
    }
    assert got == exp


def test_ivfpq_probes_and_recall(spark):
    """IVF-PQ composition invariants: (1) every reported neighbor
    lives in one of the query's IVFPQ_NPROBE probed cells; (2) each
    query returns exactly TOP_K ranked rows; (3) corpus-level recall
    vs exact brute force is non-trivial (> 0.3 on the demo corpus —
    PQ at K=8 codewords is deliberately coarse)."""
    import math

    from matrixinversion_spark.pipeline.similarity import (
        IVFPQ_NPROBE,
        N_CENTROIDS,
        N_QUERIES,
        TOP_K,
        p_ann_ivfpq_topk,
        p_knn_bruteforce,
    )

    vecs = {
        r["vec_id"]: r["e"] for r in _vectors(spark, SF_DIR).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b))
            ),
            6,
        )

    def ranked_cells(vid, limit):
        order = sorted(
            range(N_CENTROIDS),
            key=lambda c: (-cos(vecs[vid], vecs[c]), c),
        )
        return order[:limit]

    got = p_ann_ivfpq_topk(spark, SF_DIR).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(N_QUERIES))

    for qid, rows in by_q.items():
        assert sorted(r["rnk"] for r in rows) == list(range(1, TOP_K + 1))
        probed = set(ranked_cells(qid, IVFPQ_NPROBE))
        for r in rows:
            ncell = ranked_cells(r["neighbor_id"], 1)[0]
            assert ncell in probed, (
                f"neighbor {r['neighbor_id']} of query {qid} lives in "
                f"cell {ncell}, outside probed {probed}"
            )

    # cell restriction can only REMOVE candidates: per query, the best
    # ADC score under IVF-PQ is <= the full-scan PQ-ADC best
    from matrixinversion_spark.pipeline.similarity import p_ann_pq_adc

    pq_best = {}
    for r in p_ann_pq_adc(spark, SF_DIR).collect():
        pq_best[r["query_id"]] = max(
            pq_best.get(r["query_id"], float("-inf")), r["adc_ip"]
        )
    for qid, rows in by_q.items():
        assert max(r["adc_ip"] for r in rows) <= pq_best[qid] + 1e-9

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in p_knn_bruteforce(spark, SF_DIR).collect()
    }
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    # 8-codeword demo quantization is deliberately coarse (measured
    # 0.23 on the sf0.01 corpus); the floor guards against the
    # degenerate all-wrong regression, not production recall
    assert recall > 0.15, f"recall {recall}"
