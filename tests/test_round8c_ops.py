"""Round-8 third-wave operators: distributed ROC AUC, Poisson
bootstrap CI, CUSUM change-point, FD audit, JS divergence, KMV
sketch, and Cohen's kappa for the lang-id heuristic."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from matrixinversion_spark.pipeline.corpus import (
    _KMV_K,
    p_js_divergence,
    p_kmv_distinct,
)
from matrixinversion_spark.pipeline.text import p_langid_kappa, p_text_lang_id
from matrixinversion_spark.relational.infostats import (
    q_auc_roc,
    q_cusum_changepoint,
    q_poisson_bootstrap_ci,
)
from matrixinversion_spark.relational.profiling import q_fd_audit
from matrixinversion_spark.session import read_table

from .conftest import SF_DIR


def test_auc_matches_bruteforce_pair_count(spark):
    row = q_auc_roc(spark, SF_DIR).collect()[0]
    rows = (
        read_table(spark, SF_DIR, "events")
        .select("event_type", "value")
        .collect()
    )
    pos = sorted(r["value"] for r in rows if r["event_type"] == "purchase")
    neg = sorted(r["value"] for r in rows if r["event_type"] != "purchase")
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    import bisect

    # AUC = (#(pos>neg) + 0.5·#(pos==neg)) / (n_pos·n_neg) via binary
    # search over the sorted negatives — O((n₁+n₀)·log n₀).
    wins = ties = 0
    for v in pos:
        lo = bisect.bisect_left(neg, v)
        hi = bisect.bisect_right(neg, v)
        wins += lo
        ties += hi - lo
    exp = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(row["auc"] - exp) < 1e-6
    assert 0.0 <= row["auc"] <= 1.0


def test_poisson_bootstrap_ci_brackets_sample_mean(spark):
    row = q_poisson_bootstrap_ci(spark, SF_DIR).collect()[0]
    assert row["n_replicates"] == 64
    assert row["ci_lo"] <= row["boot_mean"] <= row["ci_hi"]
    mean = (
        read_table(spark, SF_DIR, "orders")
        .agg(F.avg("o_totalprice"))
        .collect()[0][0]
    )
    # Poisson-bootstrap replicate means center on the sample mean;
    # the 95% interval must bracket it and be meaningfully tight.
    assert row["ci_lo"] < mean < row["ci_hi"]
    assert (row["ci_hi"] - row["ci_lo"]) < 0.5 * mean


def test_cusum_matches_sequential_replay(spark):
    row = q_cusum_changepoint(spark, SF_DIR).collect()[0]
    daily = sorted(
        read_table(spark, SF_DIR, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("bigint")
            .alias("c")
        )
        .collect(),
        key=lambda r: r["o_orderdate"],
    )
    cents = [r["c"] for r in daily]
    xbar = sum(cents) * 1.0 / len(cents)
    best = None
    cum = 0
    for t, (r, c) in enumerate(zip(daily, cents), start=1):
        cum += c
        s = cum - t * xbar
        key = (abs(s), -t)  # max |s|, earliest date on ties
        if best is None or key > best[0]:
            best = (key, r["o_orderdate"], s)
    assert row["n_days"] == len(daily)
    assert row["cp_date"] == best[1].strftime("%Y-%m-%d")
    assert abs(row["cusum_dollars"] - best[2] / 100.0) < 1e-4


def test_fd_audit_pk_holds_and_rates_consistent(spark):
    rows = {r["fd"]: r for r in q_fd_audit(spark, SF_DIR).collect()}
    pk = rows["orders.o_orderkey -> o_custkey"]
    assert pk["holds"] and pk["n_violating"] == 0
    for r in rows.values():
        assert 0 <= r["n_violating"] <= r["n_keys"]
        assert abs(
            r["violation_rate"] - round(r["n_violating"] / r["n_keys"], 6)
        ) < 1e-9
        assert r["holds"] == (r["n_violating"] == 0)


def test_js_divergence_bounds_and_self_zero(spark):
    row = p_js_divergence(spark, SF_DIR).collect()[0]
    assert 0.0 <= row["jsd_nats"] <= math.log(2.0) + 1e-9
    assert abs(row["jsd_bits"] - row["jsd_nats"] / math.log(2.0)) < 1e-5
    # identical distributions → JSD exactly 0: replay the aggregation
    # with the two count columns equal.
    d = read_table(spark, SF_DIR, "documents")
    g = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
        .withColumn("cv", F.col("ct"))
    )
    tot = g.agg(F.sum("ct").alias("nt"), F.sum("cv").alias("nv"))
    t = g.crossJoin(F.broadcast(tot))
    p = F.col("ct") * 1.0 / F.col("nt")
    q = F.col("cv") * 1.0 / F.col("nv")
    m = (p + q) / 2
    term = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    self_jsd = t.agg(F.sum(term)).collect()[0][0]
    assert abs(self_jsd) < 1e-12


def test_kmv_estimate_within_bound_of_exact(spark):
    rows = p_kmv_distinct(spark, SF_DIR).collect()
    exact = {
        r["source"]: r["d"]
        for r in read_table(spark, SF_DIR, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("d"))
        .collect()
    }
    assert {r["source"] for r in rows} == set(exact)
    for r in rows:
        d = exact[r["source"]]
        if r["n_sketch"] < _KMV_K:
            assert r["est_distinct"] == d  # sub-k sketch is exact
        else:
            # KMV relative error ~ 1/sqrt(k) ≈ 6.3% at k=256; allow 4σ
            assert abs(r["est_distinct"] - d) / d < 4 / math.sqrt(_KMV_K)


def test_langid_kappa_consistent_with_confusion(spark):
    row = p_langid_kappa(spark, SF_DIR).collect()[0]
    conf = p_text_lang_id(spark, SF_DIR).collect()
    n = sum(r["n_docs"] for r in conf)
    diag = sum(r["n_docs"] for r in conf if r["lang"] == r["lang_pred"])
    rm: dict[str, int] = {}
    cm: dict[str, int] = {}
    for r in conf:
        rm[r["lang"]] = rm.get(r["lang"], 0) + r["n_docs"]
        cm[r["lang_pred"]] = cm.get(r["lang_pred"], 0) + r["n_docs"]
    pe = sum(
        rm.get(c, 0) * cm.get(c, 0) for c in set(rm) | set(cm)
    ) / (n * n)
    po = diag / n
    assert row["n_docs"] == n
    assert abs(row["p_observed"] - po) < 1e-6
    assert abs(row["p_expected"] - pe) < 1e-6
    assert abs(row["kappa"] - (po - pe) / (1 - pe)) < 1e-5
    assert -1.0 <= row["kappa"] <= 1.0


def test_bicgstab_matches_numpy_solve(spark):
    import numpy as np

    from matrixinversion_spark.matrix import ops
    from matrixinversion_spark.matrix.cg import bicgstab_solve
    from matrixinversion_spark.matrix.core import BlockMatrixFrame

    rng = np.random.default_rng(7)
    n = 96
    a_np = rng.uniform(size=(n, n)) + n * np.eye(n)  # nonsymmetric
    b_np = rng.uniform(size=(n, 1))
    a = BlockMatrixFrame.from_numpy(spark, a_np, block_size=32)
    b = BlockMatrixFrame.from_numpy(spark, b_np, block_size=32)
    x, iters, resid = bicgstab_solve(a, b, tol=1e-12)
    x_np = x.to_numpy()
    exact = np.linalg.solve(a_np, b_np)
    assert np.abs(x_np - exact).max() < 1e-8
    assert resid <= 1e-12 * np.linalg.norm(b_np) * 1.01
    assert 0 < iters < 60
    # residual consistency with a recomputed A·x − b
    ax = ops.multiply(a, x).to_numpy()
    assert np.abs(ax - b_np).max() < 1e-8


def test_seasonal_dow_index_averages_to_one(spark):
    from matrixinversion_spark.relational.infostats import (
        q_seasonal_dow_index,
    )

    rows = q_seasonal_dow_index(spark, SF_DIR).collect()
    assert {r["dow"] for r in rows} <= set(range(7))
    # day-weighted mean of the indices is exactly 1 by construction
    num = sum(r["seasonal_index"] * r["n_days"] for r in rows)
    den = sum(r["n_days"] for r in rows)
    assert abs(num / den - 1.0) < 1e-4
    for r in rows:
        assert r["seasonal_index"] > 0 and r["avg_daily_rev"] > 0


def test_kmv_source_jaccard_matches_exact_within_bound(spark):
    from matrixinversion_spark.pipeline.corpus import p_kmv_source_jaccard

    rows = p_kmv_source_jaccard(spark, SF_DIR).collect()
    toks = (
        read_table(spark, SF_DIR, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
        .collect()
    )
    vocab: dict[str, set] = {}
    for r in toks:
        vocab.setdefault(r["source"], set()).add(r["tok"])
    srcs = sorted(vocab)
    assert {(r["s1"], r["s2"]) for r in rows} == {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
    }
    for r in rows:
        a, b = vocab[r["s1"]], vocab[r["s2"]]
        exact = len(a & b) / len(a | b)
        # bottom-k Jaccard: ±4σ with σ ≈ sqrt(J(1−J)/k), floor 4/k
        sigma = max(
            (exact * (1 - exact) / _KMV_K) ** 0.5, 1.0 / _KMV_K
        )
        assert abs(r["jaccard_est"] - exact) < 4 * sigma + 1e-9
        assert r["n_both"] <= r["n_union_sketch"] <= _KMV_K


def test_bpe_train_merges_matches_sequential_replay(spark):
    import re
    from collections import Counter

    from matrixinversion_spark.pipeline.corpus import (
        _BPE_MERGE_ROUNDS,
        p_bpe_train_merges,
    )

    got = [
        (r["step"], r["sym_a"], r["sym_b"], r["cnt"])
        for r in sorted(
            p_bpe_train_merges(spark, SF_DIR).collect(),
            key=lambda r: r["step"],
        )
    ]

    # sequential reference: textbook BPE on the same vocab
    texts = [
        r["text"]
        for r in read_table(spark, SF_DIR, "documents")
        .select("text")
        .collect()
    ]
    vocab: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    exp = []
    for step in range(1, _BPE_MERGE_ROUNDS + 1):
        pc: Counter = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[w]
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )
        exp.append((step, a, b, cnt))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    assert got == exp
    assert len(got) == _BPE_MERGE_ROUNDS


def test_bpe_encode_stats_consistency(spark):
    from matrixinversion_spark.pipeline.corpus import p_bpe_encode_stats

    rows = p_bpe_encode_stats(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        # merges only ever shrink the segmentation, and a word has at
        # least one subword
        assert r["n_words"] <= r["n_subwords"] <= r["n_chars"]
        assert 0 < r["subwords_per_char"] <= 1.0
    # five merges must compress SOMETHING overall
    tot_sub = sum(r["n_subwords"] for r in rows)
    tot_char = sum(r["n_chars"] for r in rows)
    assert tot_sub < tot_char


def test_label_propagation_matches_sequential_replay(spark):
    from matrixinversion_spark.relational.mining import (
        q_label_propagation,
    )

    got = {
        r["node"]: r["community"]
        for r in q_label_propagation(spark, SF_DIR).collect()
    }

    # rebuild the same sparsified undirected graph and replay 3
    # synchronous rounds sequentially
    li = read_table(spark, SF_DIR, "lineitem")
    o = read_table(spark, SF_DIR, "orders")
    c = read_table(spark, SF_DIR, "customer")
    s = read_table(spark, SF_DIR, "supplier")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("src"),
            F.col("s_nationkey").cast("bigint").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .orderBy(F.desc("w"), "src", "dst")
        .limit(150)
        .collect()
    )
    und: dict = {}
    nodes = set()
    for r in e0:
        und[(r["src"], r["dst"])] = und.get((r["src"], r["dst"]), 0) + r["w"]
        und[(r["dst"], r["src"])] = und.get((r["dst"], r["src"]), 0) + r["w"]
        nodes |= {r["src"], r["dst"]}
    all_nodes = {
        r["n_nationkey"]
        for r in read_table(spark, SF_DIR, "nation")
        .select("n_nationkey")
        .collect()
    }
    lab = {v: v for v in all_nodes}
    for _ in range(3):
        nxt = dict(lab)
        per_node: dict = {}
        for (a, b), w in und.items():
            per_node.setdefault(a, {}).setdefault(lab[b], 0)
            per_node[a][lab[b]] += w
        for v, cnts in per_node.items():
            nxt[v] = min(
                (l for l, c in cnts.items()
                 if c == max(cnts.values()))
            )
        lab = nxt
    assert got == lab
    # communities actually formed: fewer distinct labels than nodes
    assert len(set(got.values())) < len(got)


def test_semantic_decontaminate_matches_bruteforce(spark):
    import numpy as np

    from matrixinversion_spark.pipeline.curation import (
        _SEMDECON_MOD,
        _SEMDECON_TAU,
        p_semantic_decontaminate,
    )

    got = {
        r["label"]: (r["n_corpus"], r["n_flagged"])
        for r in p_semantic_decontaminate(spark, SF_DIR).collect()
    }
    rows = (
        read_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ev = [
        np.asarray(r["embedding"], dtype=np.float64)
        for r in rows
        if r["vec_id"] % _SEMDECON_MOD == 0
    ]
    evm = np.stack(ev)
    evn = np.linalg.norm(evm, axis=1)
    exp: dict = {}
    for r in rows:
        if r["vec_id"] % _SEMDECON_MOD == 0:
            continue
        e = np.asarray(r["embedding"], dtype=np.float64)
        cos = (evm @ e) / (evn * np.linalg.norm(e))
        n_c, n_f = exp.get(r["label"], (0, 0))
        exp[r["label"]] = (
            n_c + 1,
            n_f + (1 if (cos >= _SEMDECON_TAU - 1e-12).any() else 0),
        )
    assert got == exp
    # corpus fully partitioned into the per-label rows (the τ gate's
    # liveness is covered by the sf0.01 oracle run, where flags > 0)
    n_eval = len(ev)
    assert sum(c for c, _ in got.values()) == len(rows) - n_eval


def test_bpe_apply_merge_hypothesis_parity(spark):
    """Random small vocabularies (including same-symbol runs, the
    parity-rule case) — the distributed merge application must equal
    the sequential leftmost-nonoverlapping scan."""
    import random

    from matrixinversion_spark.pipeline.corpus import _bpe_apply_merge

    rng = random.Random(11)
    words = set()
    # bias toward 'aa'/'ab' adjacency runs
    for _ in range(60):
        words.add(
            "".join(rng.choice("aab") for _ in range(rng.randint(2, 9)))
        )
    vocab = spark.createDataFrame(
        [(w, 1) for w in sorted(words)], "w string, wf long"
    ).selectExpr(
        "w",
        "wf",
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        " AS syms",
    )
    for a, b in [("a", "a"), ("a", "b"), ("b", "a")]:
        got = {
            r["w"]: list(r["syms"])
            for r in _bpe_apply_merge(vocab, a, b).collect()
        }
        for w in words:
            syms, out, i = list(w), [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            assert got[w] == out, (w, a, b, got[w], out)


def test_kaplan_meier_matches_sequential_replay(spark):
    from matrixinversion_spark.relational.temporal import q_kaplan_meier

    got = {
        r["dur_hours"]: (
            r["n_risk"],
            r["d_conv"],
            r["n_censored"],
            r["survival"],
        )
        for r in q_kaplan_meier(spark, SF_DIR).collect()
    }
    e = read_table(spark, SF_DIR, "events")
    rows = e.select("user_id", "event_type", "ts").collect()
    mx = max(r["ts"] for r in rows)
    s: dict = {}
    for r in rows:
        if r["event_type"] == "signup":
            u = r["user_id"]
            if u not in s or r["ts"] < s[u]:
                s[u] = r["ts"]
    conv: dict = {}
    for r in rows:
        if r["event_type"] == "purchase" and r["user_id"] in s:
            if r["ts"] >= s[r["user_id"]]:
                u = r["user_id"]
                if u not in conv or r["ts"] < conv[u]:
                    conv[u] = r["ts"]
    import math
    from collections import Counter

    d_at: Counter = Counter()
    c_at: Counter = Counter()
    for u, s_ts in s.items():
        end = conv.get(u, mx)
        dur = int(
            (end - s_ts).total_seconds() * 1e6 // 3_600_000_000
        )
        (d_at if u in conv else c_at)[dur] += 1
    n = len(s)
    surv, at_risk = 1.0, n
    exp = {}
    for dur in sorted(set(d_at) | set(c_at)):
        d, c = d_at[dur], c_at[dur]
        if d > 0:
            surv = 0.0 if d == at_risk else surv * (1 - d / at_risk)
            exp[dur] = (at_risk, d, c, round(surv, 6))
        at_risk -= d + c
    assert set(got) == set(exp)
    for dur, (nr, d, c, sv) in exp.items():
        gnr, gd, gc, gsv = got[dur]
        assert (gnr, gd, gc) == (nr, d, c)
        assert abs(gsv - sv) < 2e-6
    # survival is non-increasing along the curve
    vals = [got[k][3] for k in sorted(got)]
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))


def test_anova_matches_sequential_replay(spark):
    from collections import defaultdict

    from matrixinversion_spark.relational.infostats import q_anova_oneway

    row = q_anova_oneway(spark, SF_DIR).collect()[0]
    rows = (
        read_table(spark, SF_DIR, "events")
        .select("event_type", "value")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        if r["value"] is not None:
            groups[r["event_type"]].append(r["value"])
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    st = sum(sum(v) for v in groups.values())
    sb = sum(sum(v) ** 2 / len(v) for v in groups.values())
    sst = sum(x * x for v in groups.values() for x in v)
    msb = (sb - st * st / nn) / (k - 1)
    msw = (sst - sb) / (nn - k)
    assert row["k"] == k and row["nn"] == nn
    assert abs(row["ms_between"] - msb) < 1e-3 * max(abs(msb), 1)
    assert abs(row["ms_within"] - msw) < 1e-3 * max(abs(msw), 1)
    assert abs(row["f_stat"] - msb / msw) < 1e-4 * max(abs(msb / msw), 1)
    assert row["ms_within"] > 0
