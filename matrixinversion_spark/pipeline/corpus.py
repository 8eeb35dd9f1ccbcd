"""Corpus governance operators: split-leakage auditing, sequential
Poisson weighted sampling, and bigram conditional probabilities.

The dataset-release layer of a training-data pipeline, extending the
round-5 governance ops in ``text.py`` (``p_hash_split``,
``p_pii_scrub``, ``p_weighted_sample``, ``p_ngram_counts``) with the
release-gate pieces they stop short of: an exact-hash leakage audit
ACROSS the hash split's boundaries, a weighted sampler whose ranking
key is ulp-exact cross-engine (sequential Poisson, vs A-ES's
log-key), and the conditional-probability table on top of the raw
bigram counts.

Reference provenance: the reference is a matrix engine with no text
surface (SURVEY.md §2.2); these extend the pipeline layer mandated
by SURVEY.md §2.3 item 3.

Every operator is pure JVM expression work (split/regexp/hash/
arithmetic — whole-stage codegen, no Python UDFs); the only
Python-side bytes are bounded driver scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from matrixinversion_spark.pipeline.dedup import _hash32_sql, hash32
from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table


def split_bucket(id_col: str = "doc_id"):
    """Deterministic 0-99 split bucket of a doc id (hash32 mod 100) —
    the ONE definition of the corpus's 90/5/5 boundary hashing."""
    return hash32(F.col(id_col).cast("string")) % 100


def split_col(id_col: str = "doc_id"):
    """The registered 90/5/5 train/validation/test assignment — every
    operator that references the split derives it from here, so the
    ratios and hash input can never drift between the split itself
    and its downstream audits (leakage, release report, quotas)."""
    b = split_bucket(id_col)
    return (
        F.when(b < 90, "train")
        .when(b < 95, "validation")
        .otherwise("test")
    )

# -- sequential Poisson sampling -------------------------------------------

_SPS_K = 100

_SPS_SQL = f"""
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           (({_hash32_sql("CAST(doc_id AS VARCHAR) || ':sps'")} + 1)
            / 4294967296.0) / n_chars AS xi
    FROM documents WHERE n_chars > 0)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM keyed ORDER BY xi, doc_id LIMIT {_SPS_K}
"""


@query("p_weighted_sample_sps", oracle=_SPS_SQL)
def p_weighted_sample_sps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample of 100 documents by sequential
    Poisson sampling (Ohlsson): rank every document by xi = u/w with
    u a deterministic per-doc uniform and w = n_chars, keep the k
    smallest — inclusion probability approximately proportional to
    length, the standard size-biased corpus subsample.

    Companion to ``text.p_weighted_sample`` (Efraimidis-Spirakis,
    key = ln(u)/w): SPS is chosen here because xi = u/w is ONE IEEE
    division of exactly-representable operands, so both engines
    compute bit-identical keys and the top-k is deterministic
    cross-engine; A-ES's log keys are only faithfully-rounded and
    can in principle flip ranks in the last ulp. The
    top-k runs as TakeOrdered (per-partition heaps + driver merge of
    k-row partials) — no global sort, no single-task window; the
    ANSI ORDER BY ... LIMIT oracle is the semantic twin the
    optimizer reduces to the same thing at sf0.01."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        hash32(F.concat(F.col("doc_id").cast("string"), F.lit(":sps")))
        + 1
    ) / F.lit(4294967296.0)
    keyed = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (u / F.col("n_chars")).alias("xi"),
    )
    return (
        keyed.orderBy(F.col("xi"), F.col("doc_id"))
        .limit(_SPS_K)
        .drop("xi")
    )


# -- bigram LM statistics ---------------------------------------------------

_BIGRAM_K = 50

_BIGRAM_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents),
bg AS (
    SELECT a.w AS w1, b.w AS w2, count(*) AS c
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY 1, 2),
m AS (
    SELECT w1, sum(c) AS c1 FROM bg GROUP BY 1)
SELECT bg.w1, bg.w2, CAST(c AS BIGINT) AS c,
       round(c * 1.0 / c1, 6) AS cond_p
FROM bg JOIN m USING (w1)
ORDER BY c DESC, bg.w1, bg.w2 LIMIT {_BIGRAM_K}
"""


@query("p_bigram_lm", oracle=_BIGRAM_SQL)
def p_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus bigrams with conditional probability
    P(w2|w1) = c(w1,w2) / c(w1,·) — the table behind bigram LM
    scoring, collocation mining, and boilerplate detection. Builds
    ON what ``text.p_ngram_counts`` stops at: that op emits raw
    thresholded bigram counts; this one adds the left-marginal
    normalization (the actual LM probabilities) and a
    deterministic top-k.

    Tokens come from one split + posexplode; bigrams pair each
    token with its successor via lead() partitioned BY DOCUMENT
    (thousands of independent partitions — never a global window).
    The bigram count groupBy map-side combines, the w1 marginal is
    a window over the already-aggregated bigram frame (vocab-
    bounded, not corpus-bounded), and the final top-k is TakeOrdered
    with a total-order tiebreak. c/c1 is one integer IEEE division —
    bit-identical across engines."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w"),
    )
    nxt = F.lead("w").over(W.partitionBy("doc_id").orderBy("pos"))
    bg = (
        tok.withColumn("w2", nxt)
        .filter(F.col("w2").isNotNull())
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count("*").alias("c"))
    )
    c1 = F.sum("c").over(W.partitionBy("w1"))
    return (
        bg.withColumn("cond_p", F.round(F.col("c") * 1.0 / c1, 6))
        .select(
            "w1", "w2", F.col("c").cast("bigint").alias("c"), "cond_p"
        )
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(_BIGRAM_K)
    )


# -- split leakage audit ----------------------------------------------------

_LEAK_SQL = f"""
WITH h AS (
    SELECT doc_id,
           md5(text) AS th,
           CASE WHEN {_hash32_sql("CAST(doc_id AS VARCHAR)")}
                     % 100 < 90 THEN 'train'
                WHEN {_hash32_sql("CAST(doc_id AS VARCHAR)")}
                     % 100 < 95 THEN 'validation'
                ELSE 'test' END AS split
    FROM documents),
tr AS (SELECT DISTINCT th FROM h WHERE split = 'train'),
ev AS (SELECT * FROM h WHERE split <> 'train')
SELECT ev.split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN tr.th IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaked
FROM ev LEFT JOIN tr ON ev.th = tr.th
GROUP BY ev.split
"""


@query("p_split_leakage_audit", oracle=_LEAK_SQL)
def p_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: how many validation/test documents share
    an EXACT text hash with any train document — the release gate
    that catches evaluation contamination introduced by duplicates
    crossing the split boundary. Audits the ACTUAL registered split
    (``text.p_hash_split``'s 90/5/5 md5-bucket assignment, same hash
    same thresholds): the split is per-doc-id, so two copies of the
    same text can land in different splits; this op quantifies
    exactly that.

    The train fingerprint set is md5-distinct (one uniform shuffle,
    map-side combined), then the held-out side LEFT-joins it on the
    16-byte hash — at 100 TB the train-hash frame is still orders
    smaller than the corpus and hash-partitions evenly; near-dup
    leakage (not just exact) composes this same shape with the
    MinHash signatures from p_dedup_minhash_lsh instead of md5.
    Complements p_decontaminate (train vs EXTERNAL benchmark) by
    auditing leakage INTERNAL to the corpus release."""
    d = read_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.md5("text").alias("th"),
        split_col().alias("split"),
    )
    tr = h.filter(F.col("split") == "train").select("th").distinct()
    ev = h.filter(F.col("split") != "train")
    return (
        ev.join(
            tr.withColumnRenamed("th", "tr_th"),
            ev["th"] == F.col("tr_th"),
            "left",
        )
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("tr_th").isNotNull().cast("long"))
            .cast("bigint")
            .alias("n_leaked"),
        )
    )


# -- NEAR-DUP split leakage audit -------------------------------------------

_NEARDUP_TAU = 0.8


def near_dup_leakage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    tau: float = _NEARDUP_TAU,
    sig: DataFrame | None = None,
    max_bucket: int | None = None,
    with_report: bool = False,
):
    """Per held-out split: how many docs are a NEAR-duplicate of any
    train doc — LSH band buckets (MinHash 16, 4×4 — the exact
    machinery of ``dedup.p_dedup_minhash_lsh``) generate candidates
    across the split boundary, then each candidate pair is verified
    with the EXACT distinct-shingle Jaccard ≥ tau. The bucket gate is
    part of the operator's declared semantics (it is what makes the
    audit run at corpus scale: candidates shuffle on (band, bkey),
    never all-pairs), and the verification being exact means every
    reported leak is real.

    ``sig`` optionally supplies a precomputed
    ``dedup.minhash_signatures`` frame with (id_col, split_col,
    mh0..mh15) — e.g. the shared per-corpus persisted cache — so the
    md5-over-shingles payload is paid once per corpus instead of once
    per operator. ``max_bucket`` opts into the
    ``dedup.lsh_bucket_guard`` skew cap (dropped buckets are the
    pathological identical-doc clusters exact dedup should have
    collapsed first; off by default for oracle exactness).

    Returns (split, n_docs, n_leaked) for each non-train split.
    ``with_report=True`` returns ``(out, refused)`` where ``refused``
    is the guard's (band_id, bkey, n_members) frame of dropped
    buckets (empty when ``max_bucket`` is None) — an audit whose
    candidate gate silently refused clusters would be an audit that
    under-reports leakage, so the refusals travel with the result.
    """
    from matrixinversion_spark.pipeline.dedup import (
        lsh_bands,
        lsh_bucket_guard,
        minhash_signatures,
        shingles_from_tokens,
    )

    sh = docs.select(
        id_col,
        split_col,
        F.split(text_col, " ").alias("_ts"),
    ).select(
        id_col,
        split_col,
        shingles_from_tokens(F.col("_ts")).alias("_sh"),
    )
    # NOT persisted: shingle arrays are 3-5× the text size, so at
    # corpus scale caching them is a memory cliff; the two consumers
    # (signatures over all docs, verification over candidate docs
    # only) each rescan instead — CPU duplication, no storage leak.
    if sig is None:
        sig = minhash_signatures(
            docs, id_col=id_col, text_col=text_col, extra_cols=(split_col,)
        )
    bands = lsh_bands(sig, id_col)
    bands, oversized = lsh_bucket_guard(bands, max_bucket, id_col)
    splits = sig.select(id_col, split_col)
    tr_b = (
        bands.join(splits, id_col)
        .filter(F.col(split_col) == "train")
        .select(F.col(id_col).alias("tr_id"), "band_id", "bkey")
    )
    ev_b = (
        bands.join(splits, id_col)
        .filter(F.col(split_col) != "train")
        .select(F.col(id_col).alias("ev_id"), "band_id", "bkey")
    )
    cand = (
        ev_b.join(tr_b, ["band_id", "bkey"])
        .select("ev_id", "tr_id")
        .distinct()
    )
    sh_ev = sh.select(F.col(id_col).alias("ev_id"), F.col("_sh").alias("_sa"))
    sh_tr = sh.select(F.col(id_col).alias("tr_id"), F.col("_sh").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - inter
    leaked = (
        cand.join(sh_ev, "ev_id")
        .join(sh_tr, "tr_id")
        .filter(inter.cast("double") / union >= tau)
        .select("ev_id")
        .distinct()
        .withColumn("_leak", F.lit(1))
    )
    ev_docs = docs.filter(F.col(split_col) != "train").select(
        F.col(id_col).alias("ev_id"), split_col
    )
    out = (
        ev_docs.join(leaked, "ev_id", "left")
        .groupBy(split_col)
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.coalesce(F.col("_leak"), F.lit(0)))
            .cast("bigint")
            .alias("n_leaked"),
        )
    )
    if with_report:
        return out, oversized
    return out


def _neardup_leak_sql() -> str:
    from matrixinversion_spark.pipeline.dedup import (
        _band_sql,
        _minhash_sig_cte,
        _shingles_sql,
        N_BANDS,
    )

    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {_band_sql(b)} AS bkey FROM sigs"
        for b in range(N_BANDS)
    )
    return f"""
WITH spl AS (
    SELECT doc_id,
           CASE WHEN {_hash32_sql("CAST(doc_id AS VARCHAR)")}
                     % 100 < 90 THEN 'train'
                WHEN {_hash32_sql("CAST(doc_id AS VARCHAR)")}
                     % 100 < 95 THEN 'validation'
                ELSE 'test' END AS split
    FROM documents),
shs AS (
    SELECT doc_id, {_shingles_sql()} AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
{_minhash_sig_cte("sigs").strip()},
bands AS ({bands_union}),
cand AS (
    SELECT DISTINCT e.doc_id AS ev_id, t.doc_id AS tr_id
    FROM bands e
    JOIN spl se ON se.doc_id = e.doc_id AND se.split <> 'train'
    JOIN bands t ON e.band_id = t.band_id AND e.bkey = t.bkey
    JOIN spl st ON st.doc_id = t.doc_id AND st.split = 'train'),
leaked AS (
    SELECT DISTINCT c.ev_id
    FROM cand c
    JOIN shs a ON a.doc_id = c.ev_id
    JOIN shs b ON b.doc_id = c.tr_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
          >= {_NEARDUP_TAU})
SELECT s.split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN l.ev_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaked
FROM spl s LEFT JOIN leaked l ON s.doc_id = l.ev_id
WHERE s.split <> 'train'
GROUP BY s.split
"""


@query("p_split_leakage_neardup", oracle=_neardup_leak_sql())
def p_split_leakage_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup split-leakage audit over the registered 90/5/5 hash
    split: exact-hash leakage (``p_split_leakage_audit``) misses
    paraphrase contamination — a val doc that shares 80%+ of its
    shingles with a train doc without being byte-identical. This is
    the composition the exact audit's docstring promises: the same
    cross-boundary LEFT-join shape, with MinHash+LSH band buckets as
    the candidate gate and exact shingle-Jaccard verification.

    100 TB path: signatures are per-doc JVM array expressions (no
    shuffle), candidates shuffle once on (band, bkey) with the train
    side restricted to the bucketed candidates, verification joins
    shingle sets only for candidate pairs. The corpus never takes an
    all-pairs join."""
    from matrixinversion_spark.pipeline.dedup import shared_doc_signatures

    d = read_table(spark, sf_dir, "documents")
    split_expr = split_col()
    docs = d.select("doc_id", "text", split_expr.alias("split"))
    # signatures ride the shared per-(session, sf_dir) cache — the
    # split column is a pure function of doc_id, so it re-derives on
    # top of the cached frame instead of forcing a second hashing pass
    sig = shared_doc_signatures(spark, sf_dir).withColumn(
        "split", split_expr
    )
    return near_dup_leakage(docs, sig=sig)


# -- dataset release report -------------------------------------------------

# per-rule quality pass rates (C4/Gopher gate, text.p_quality_gate)
# joined into the per-split release row — the "rule-rate columns" a
# dataset card publishes next to the counts
_RATE_COLS = (
    "rate_min_len", "rate_stopword", "rate_word_len",
    "rate_top_frac", "rate_distinct", "rate_punct", "rate_pass_all",
)


def _release_sql() -> str:
    from matrixinversion_spark.pipeline.text import _QUALITY_GATE_SQL

    rate_exprs = ",\n           ".join(
        f"round(avg(q.r_{c[5:]}), 6) AS {c}"
        for c in _RATE_COLS[:-1]
    ) + ",\n           round(avg(q.pass_all), 6) AS rate_pass_all"
    return f"""
WITH h AS (
    SELECT doc_id, text, lang,
           md5(text) AS th,
           CASE WHEN {_hash32_sql("CAST(doc_id AS VARCHAR)")}
                     % 100 < 90 THEN 'train'
                WHEN {_hash32_sql("CAST(doc_id AS VARCHAR)")}
                     % 100 < 95 THEN 'validation'
                ELSE 'test' END AS split
    FROM documents),
tr AS (SELECT DISTINCT th FROM h WHERE split = 'train'),
leak AS (
    SELECT h.split, count(*) AS n_leaked
    FROM h JOIN tr ON h.th = tr.th
    WHERE h.split <> 'train'
    GROUP BY h.split),
base AS (
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS n_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(*) - count(DISTINCT th) AS BIGINT)
               AS n_dup_docs
    FROM h GROUP BY split),
qr AS (
    SELECT h.split,
           {rate_exprs}
    FROM ({_QUALITY_GATE_SQL}) q JOIN h ON q.doc_id = h.doc_id
    GROUP BY h.split)
SELECT b.split, b.n_docs, b.n_chars, b.n_tokens, b.n_langs,
       b.n_dup_docs,
       CAST(coalesce(l.n_leaked, 0) AS BIGINT) AS n_leaked_exact,
       qr.rate_min_len, qr.rate_stopword, qr.rate_word_len,
       qr.rate_top_frac, qr.rate_distinct, qr.rate_punct,
       qr.rate_pass_all
FROM base b
LEFT JOIN leak l ON b.split = l.split
JOIN qr ON b.split = qr.split
"""


@query("p_release_report", oracle=_release_sql())
def p_release_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card release report: one row per split of the
    registered 90/5/5 hash split with the numbers a corpus release
    publishes — doc/char/token counts, language count, WITHIN-split
    exact-duplicate count, and cross-boundary exact-hash leakage
    (train rows report 0 by definition). The governance capstone:
    every column is the output of an operator this engine registers
    individually (hash split, token stats, exact dedup, leakage
    audit), composed into the single frame a release pipeline gates
    on.

    Round 10 adds the composed C4/Gopher quality gate's per-rule
    pass rates (``text.p_quality_gate``) per split — the rule-rate
    columns a dataset card publishes next to the counts, so a
    regression in any single filter (stop-word band, repetition cap,
    …) is attributable from the release row alone.

    Plan: one groupBy(split) aggregation with map-side partials over
    a single scan (counts, sums, two count-distincts), plus the
    md5-distinct train-fingerprint join for leakage, plus the quality
    gate's map-side rule pass and its own groupBy(split) — three
    bounded aggregations over two scans of the same table; nothing
    data-sized reaches the driver."""
    from matrixinversion_spark.pipeline.text import quality_gate_frame

    d = read_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        "text",
        "lang",
        F.md5("text").alias("th"),
        split_col().alias("split"),
    )
    tr = (
        h.filter(F.col("split") == "train")
        .select(F.col("th").alias("tr_th"))
        .distinct()
    )
    leak = (
        h.filter(F.col("split") != "train")
        .join(tr, F.col("th") == F.col("tr_th"))
        .groupBy("split")
        .agg(F.count("*").alias("n_leaked"))
    )
    base = h.groupBy("split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.sum(F.size(F.split("text", " ")))
        .cast("bigint")
        .alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        (F.count("*") - F.countDistinct("th"))
        .cast("bigint")
        .alias("n_dup_docs"),
    )
    q = quality_gate_frame(d)
    rates = (
        h.select("doc_id", "split")
        .join(q, "doc_id")
        .groupBy("split")
        .agg(
            *[
                F.round(F.avg(f"r_{c[5:]}"), 6).alias(c)
                for c in _RATE_COLS[:-1]
            ],
            F.round(F.avg("pass_all"), 6).alias("rate_pass_all"),
        )
    )
    return (
        base.join(leak, "split", "left")
        .join(rates, "split")
        .select(
            "split",
            "n_docs",
            "n_chars",
            "n_tokens",
            "n_langs",
            "n_dup_docs",
            F.coalesce(F.col("n_leaked"), F.lit(0))
            .cast("bigint")
            .alias("n_leaked_exact"),
            *_RATE_COLS,
        )
    )


def guarded_release_report(
    spark: SparkSession,
    sf_dir: str,
    max_bucket: int,
):
    """``p_release_report`` plus the near-dup candidate gate's
    refusal audit — the composition a production release run gates
    on when the LSH mega-bucket guard is armed.

    Returns ``(report, refused)``:

    - ``report``: the registered release report's per-split row with
      one extra column ``n_neardup_refused_docs`` — how many of the
      split's documents sit in at least one band bucket the guard
      refused (those docs' near-dup candidates were suppressed in
      that band, so the dataset card must disclose them);
    - ``refused``: the raw (band_id, bkey, n_members) frame of every
      refused bucket, for drill-down.

    Plan shape: the guard's aggregation runs on the same (band_id,
    bkey) keys the candidate join shuffles on; the refused-key frame
    is tiny by construction (≤ n_docs·N_BANDS / max_bucket rows) and
    broadcasts back onto the band frame; membership resolves to a
    distinct doc set and one more groupBy(split). Nothing here adds
    a data-sized shuffle beyond what the near-dup audit already pays.
    """
    from matrixinversion_spark.pipeline.dedup import (
        lsh_bands,
        lsh_bucket_guard,
        shared_doc_signatures,
    )

    base = p_release_report(spark, sf_dir)
    sig = shared_doc_signatures(spark, sf_dir)
    bands = lsh_bands(sig)
    _kept, refused = lsh_bucket_guard(bands, max_bucket)
    refused_per_split = (
        bands.join(
            F.broadcast(refused.select("band_id", "bkey")),
            ["band_id", "bkey"],
        )
        .select("doc_id")
        .distinct()
        .select(split_col().alias("split"))
        .groupBy("split")
        .agg(F.count("*").cast("bigint").alias("_n_refused"))
    )
    report = base.join(refused_per_split, "split", "left").withColumn(
        "n_neardup_refused_docs",
        F.coalesce(F.col("_n_refused"), F.lit(0)).cast("bigint"),
    ).drop("_n_refused")
    return report, refused


# -- BPE merge-pair counting -----------------------------------------------

_BPE_TOP_K = 20


@query(
    "p_bpe_pair_counts",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents
    ), vocab AS (
        SELECT w, count(*) AS wf FROM tok WHERE length(w) >= 2 GROUP BY w
    ), pairs AS (
        SELECT unnest(list_transform(range(1, length(w)),
                                     i -> substring(w, i, 2))) AS pair,
               wf
        FROM vocab
    )
    SELECT pair, CAST(sum(wf) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT {_BPE_TOP_K}
    """,
)
def p_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE tokenizer training at corpus scale (Sennrich
    2016): count adjacent-symbol pairs weighted by word frequency and
    surface the top merge candidates — the inner loop every
    subword-tokenizer build runs over the training corpus.

    The scale insight is WHERE the pair explosion runs: the corpus's
    one shuffle builds the word-frequency VOCAB (hash groupBy with
    map-side combine — shuffle volume is distinct words per
    partition, not corpus tokens); the quadratic-ish symbol-pair
    explode then runs over the vocab only, which Heaps' law keeps
    sublinear in corpus size (~K * N^0.5). Top-k lowers to
    TakeOrderedAndProject (per-partition heaps — no global sort).
    Later merge rounds re-segment words against the growing merge
    table and re-count — each round the same two-shuffle shape over
    the (cached) vocab, never re-reading the corpus.

    Tokens are lowercased [a-z]+ runs of length >= 2, so the symbol
    alphabet is engine-portable ASCII and the initial symbol
    inventory is single characters (the classic BPE start state);
    pairs at this round are therefore exactly character bigrams
    within words, weighted by word frequency."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.lower(F.col("text")).alias("t")
    )
    vocab = (
        docs.select(F.explode(F.split("t", "[^a-z]+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair"),
        "wf",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(_BPE_TOP_K)
    )


_LN2 = 0.6931471805599453


@query(
    "p_js_divergence",
    oracle=f"""
    WITH b AS (
        SELECT CASE WHEN {_hash32_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
                    THEN 'train' ELSE 'validation' END AS split,
               text
        FROM documents
        WHERE {_hash32_sql("CAST(doc_id AS VARCHAR)")} % 100 < 95),
    toks AS (
        SELECT split, unnest(string_split(text, ' ')) AS tok FROM b),
    g AS (
        SELECT tok,
               CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ct,
               CAST(sum(CASE WHEN split = 'validation' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cv
        FROM toks GROUP BY tok),
    t AS (SELECT sum(ct) AS nt, sum(cv) AS nv FROM g),
    terms AS (
        SELECT ct, cv, nt, nv,
               ct * 1.0 / nt AS p, cv * 1.0 / nv AS q
        FROM g CROSS JOIN t)
    SELECT CAST(max(nt) AS BIGINT) AS n_train_toks,
           CAST(max(nv) AS BIGINT) AS n_val_toks,
           CAST(count(*) AS BIGINT) AS vocab_union,
           round(sum(
               0.5 * (CASE WHEN ct > 0
                           THEN p * ln(p / ((p + q) / 2)) ELSE 0 END)
             + 0.5 * (CASE WHEN cv > 0
                           THEN q * ln(q / ((p + q) / 2)) ELSE 0 END)
           ), 6) AS jsd_nats,
           round(sum(
               0.5 * (CASE WHEN ct > 0
                           THEN p * ln(p / ((p + q) / 2)) ELSE 0 END)
             + 0.5 * (CASE WHEN cv > 0
                           THEN q * ln(q / ((p + q) / 2)) ELSE 0 END)
           ) / {_LN2!r}, 6) AS jsd_bits
    FROM terms
    """,
)
def p_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the TRAIN and VALIDATION
    token distributions of ``p_hash_split``'s boundaries — the
    distribution-shift release gate ("is my held-out split actually
    drawn from the same corpus?") that complements the leakage
    audits: leakage checks for too-similar DOCUMENTS, JSD checks for
    too-different DISTRIBUTIONS. Symmetric, bounded by ln 2, no
    smoothing needed (terms where one side is 0 contribute only the
    other side's mass against M = (P+Q)/2 > 0).

    One token explode → one vocab-bounded groupBy (map-side
    combine); grand token totals ride a broadcast crossJoin of the
    1-row totals aggregate, never a driver collect. Every per-token
    term is one scalar expression over exact integer counts —
    identical fp both engines; only the vocab-sized final sum
    reorders, ~1e-14 against the 6-dp round.

    Scale: the widest exchange carries one row per distinct token
    (Heaps-law sublinear in corpus size) — same story as
    ``p_token_entropy``/``p_bpe_pair_counts``."""
    d = read_table(spark, sf_dir, "documents")
    bucket = split_bucket()
    b = d.where(bucket < 95).select(
        F.when(bucket < 90, F.lit("train"))
        .otherwise(F.lit("validation"))
        .alias("split"),
        "text",
    )
    g = (
        b.select("split", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
            .cast("bigint")
            .alias("ct"),
            F.sum(F.when(F.col("split") == "validation", 1).otherwise(0))
            .cast("bigint")
            .alias("cv"),
        )
    )
    tot = g.agg(F.sum("ct").alias("nt"), F.sum("cv").alias("nv"))
    terms = g.crossJoin(F.broadcast(tot))
    p = F.col("ct") * 1.0 / F.col("nt")
    q = F.col("cv") * 1.0 / F.col("nv")
    m = (p + q) / 2
    term = 0.5 * F.when(F.col("ct") > 0, p * F.log(p / m)).otherwise(
        0.0
    ) + 0.5 * F.when(F.col("cv") > 0, q * F.log(q / m)).otherwise(0.0)
    return terms.agg(
        F.max("nt").cast("bigint").alias("n_train_toks"),
        F.max("nv").cast("bigint").alias("n_val_toks"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_union"),
        F.round(F.sum(term), 6).alias("jsd_nats"),
        F.round(F.sum(term) / F.lit(_LN2), 6).alias("jsd_bits"),
    )


_KMV_K = 256


def _kmv_ranked(d: DataFrame) -> DataFrame:
    """Per-source bottom-k rank frame (source, tok, u, rn), rn <= k —
    the single sketch construction both KMV operators build from
    (same tokenization, hash, and tie-break)."""
    toks = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
        .withColumn("u", hash32(F.col("tok")))
    )
    w = W.partitionBy("source").orderBy(
        F.col("u").asc(), F.col("tok").asc()
    )
    return toks.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= _KMV_K
    )


@query(
    "p_kmv_distinct",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    h AS (
        SELECT source, tok,
               {_hash32_sql("tok")} AS u
        FROM toks),
    r AS (
        SELECT source, u,
               row_number() OVER (PARTITION BY source
                                  ORDER BY u, tok) AS rn
        FROM h),
    sk AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_sketch,
               max(CASE WHEN rn = {_KMV_K} THEN u END) AS kth
        FROM r WHERE rn <= {_KMV_K} GROUP BY source)
    SELECT source, n_sketch,
           round(CASE WHEN n_sketch < {_KMV_K}
                      THEN n_sketch * 1.0
                      ELSE ({_KMV_K} - 1) * 4294967297.0 / (kth + 1.0)
                 END, 4) AS est_distinct
    FROM sk
    """,
)
def p_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token estimate via the KMV (k-minimum-
    values / bottom-k) sketch (Bar-Yossef et al. 2002; Beyer et al.
    SIGMOD 2007): keep the k smallest hash values of the distinct
    set; D̂ = (k−1)/u₍k₎ with hashes scaled to (0,1). Unlike HLL
    (already covered by ``q_hll_mergeable``), bottom-k sketches also
    support set INTERSECTION/Jaccard estimates by comparing sketch
    membership — the building block behind sketch-based
    decontamination-at-scale — and, being actual hash samples, are
    auditable row-by-row, which is why the DuckDB oracle can verify
    the sketch content bit-for-bit rather than just a bound.

    The md5-prefix hash makes sketch membership deterministic
    cross-engine; everything up to the one final division is exact
    integer arithmetic. Scale: one (source, token) distinct shuffle
    (vocab-bounded per source, Heaps-law sublinear), then a bottom-k
    rank per source over the DISTINCT vocab — the same vocab-side
    justification as ``p_bpe_pair_counts``; the sketch itself (k
    rows per source) is trivially mergeable across shards by
    re-ranking unioned sketches."""
    d = read_table(spark, sf_dir, "documents")
    sk = (
        _kmv_ranked(d)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
            F.max(
                F.when(F.col("rn") == _KMV_K, F.col("u"))
            ).alias("kth"),
        )
    )
    est = F.when(
        F.col("n_sketch") < _KMV_K, F.col("n_sketch") * 1.0
    ).otherwise(
        (_KMV_K - 1) * 4294967297.0 / (F.col("kth") + 1.0)
    )
    return sk.select(
        "source", "n_sketch", F.round(est, 4).alias("est_distinct")
    )


@query(
    "p_kmv_source_jaccard",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    h AS (
        SELECT source, tok, {_hash32_sql("tok")} AS u FROM toks),
    sk AS (
        SELECT source, u FROM (
            SELECT source, u,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY u, tok) AS rn
            FROM h) WHERE rn <= {_KMV_K}),
    pairs AS (
        SELECT a.source AS s1, b.source AS s2
        FROM (SELECT DISTINCT source FROM sk) a
        JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
    e AS (
        SELECT p.s1, p.s2, sk.u,
               CAST(sk.source = p.s1 AS INT) AS i1,
               CAST(sk.source = p.s2 AS INT) AS i2
        FROM pairs p JOIN sk ON sk.source = p.s1
        UNION ALL
        SELECT p.s1, p.s2, sk.u,
               CAST(sk.source = p.s1 AS INT) AS i1,
               CAST(sk.source = p.s2 AS INT) AS i2
        FROM pairs p JOIN sk ON sk.source = p.s2),
    g AS (
        SELECT s1, s2, u, max(i1) AS in1, max(i2) AS in2
        FROM e GROUP BY s1, s2, u),
    r AS (
        SELECT s1, s2, in1, in2,
               row_number() OVER (PARTITION BY s1, s2 ORDER BY u) AS rn
        FROM g)
    SELECT s1, s2,
           CAST(count(*) AS BIGINT) AS n_union_sketch,
           CAST(sum(in1 * in2) AS BIGINT) AS n_both,
           round(sum(in1 * in2) * 1.0 / count(*), 6) AS jaccard_est
    FROM r WHERE rn <= {_KMV_K}
    GROUP BY s1, s2
    """,
)
def p_kmv_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary-Jaccard matrix between sources, estimated
    ENTIRELY from the per-source KMV sketches of ``p_kmv_distinct``
    — the "which sources duplicate each other" governance view, and
    the operation bottom-k sketches exist for that HLL cannot do:
    the bottom-k of a UNION of sketches is the sketch of the union,
    so J(A,B) ≈ |{h ∈ sketch(A∪B) : h ∈ A's sketch ∧ h ∈ B's
    sketch}| / k (Beyer et al., SIGMOD 2007). At 100 TB the corpus
    is touched ONCE to build |sources| k-row sketches; every
    pairwise estimate after that is arithmetic on k·|sources| rows —
    adding a source to the matrix never rescans the others.

    The md5 hash makes every sketch membership deterministic, so the
    oracle verifies the full estimate bit-for-bit. Pair volume is
    |sources|² (dimension-bounded); the per-pair union re-rank runs
    on ≤ 2k rows per pair.

    The sketch frame is pinned through ``_fresh_stats_barrier`` (r13,
    guide §2.4): it is referenced three times (source list + both
    pair legs) and two of those references sit under
    BroadcastExchange boundaries, across which AQE stage reuse does
    not fire — unpinned, the corpus-sized explode+distinct+bottom-k
    pipeline executed SIX times per run (plan census; the dsir
    lesson). The pinned frame is ≤ k·|sources| rows — metadata-sized
    next to the corpus, so the docstring's "corpus touched once"
    contract now holds in the physical plan too. Same-session A/B at
    sf0.1: min 0.836 → 0.757 s, jobs 6 → 9 (checkpoint round-trips),
    rows identical."""
    from .curation import _fresh_stats_barrier

    d = read_table(spark, sf_dir, "documents")
    sk = _fresh_stats_barrier(_kmv_ranked(d).select("source", "u"))
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("s1"))
        .join(
            srcs.select(F.col("source").alias("s2")),
            F.col("s1") < F.col("s2"),
        )
    )
    def _leg(side: str) -> DataFrame:
        skl = sk.select(
            F.col("source").alias("sk_src"), F.col("u")
        )
        return pairs.join(
            skl, F.col("sk_src") == F.col(side), "inner"
        ).select(
            "s1",
            "s2",
            "u",
            (F.col("sk_src") == F.col("s1")).cast("int").alias("i1"),
            (F.col("sk_src") == F.col("s2")).cast("int").alias("i2"),
        )

    e = _leg("s1").unionAll(_leg("s2"))
    g = e.groupBy("s1", "s2", "u").agg(
        F.max("i1").alias("in1"), F.max("i2").alias("in2")
    )
    wp = W.partitionBy("s1", "s2").orderBy(F.col("u").asc())
    r = g.withColumn("rn", F.row_number().over(wp)).where(
        F.col("rn") <= _KMV_K
    )
    return r.groupBy("s1", "s2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union_sketch"),
        F.sum(F.col("in1") * F.col("in2"))
        .cast("bigint")
        .alias("n_both"),
        F.round(
            F.sum(F.col("in1") * F.col("in2")) * 1.0 / F.count(F.lit(1)),
            6,
        ).alias("jaccard_est"),
    )


_BPE_MERGE_ROUNDS = 5


def _bpe_round_sql(i: int) -> str:
    """One BPE training round as DuckDB CTEs: pair counts from the
    current segmentation (e{i}), the argmax merge (m{i}), and the
    re-segmented vocabulary (v{i+1}) applying that merge with
    textbook leftmost-nonoverlapping semantics (parity rule within
    runs of consecutive matches — only reachable when sym_a =
    sym_b, since (a,b) matches at adjacent positions require a=b)."""
    return f"""
    e{i} AS MATERIALIZED (
        SELECT w, wf,
               unnest(syms) AS s,
               unnest(range(1, len(syms) + 1)) AS pos
        FROM v{i}),
    l{i} AS MATERIALIZED (
        SELECT w, wf, pos, s,
               lead(s) OVER (PARTITION BY w ORDER BY pos) AS nxt
        FROM e{i}),
    m{i} AS MATERIALIZED (
        SELECT s AS sym_a, nxt AS sym_b, CAST(sum(wf) AS BIGINT) AS cnt
        FROM l{i} WHERE nxt IS NOT NULL
        GROUP BY s, nxt
        ORDER BY cnt DESC, sym_a, sym_b LIMIT 1),
    k{i} AS MATERIALIZED (
        SELECT w, wf, pos, s, nxt,
               (s = (SELECT sym_a FROM m{i})
                AND nxt IS NOT DISTINCT FROM (SELECT sym_b FROM m{i}))
                   AS m
        FROM l{i}),
    g{i} AS MATERIALIZED (
        SELECT *, CASE WHEN m THEN pos -
                   sum(CASE WHEN m THEN 1 ELSE 0 END)
                       OVER (PARTITION BY w ORDER BY pos) END AS grp
        FROM k{i}),
    f{i} AS MATERIALIZED (
        SELECT *, m AND (row_number()
                   OVER (PARTITION BY w, grp ORDER BY pos) % 2 = 1)
                   AS keep
        FROM g{i}),
    v{i + 1} AS MATERIALIZED (
        SELECT w, wf, list(emit ORDER BY pos) AS syms FROM (
            SELECT w, wf, pos,
                   CASE WHEN keep THEN s || nxt
                        WHEN coalesce(lag(keep) OVER
                                 (PARTITION BY w ORDER BY pos), false)
                        THEN NULL ELSE s END AS emit
            FROM f{i})
        WHERE emit IS NOT NULL
        GROUP BY w, wf)"""


def _bpe_sql_ctes(rounds: int) -> str:
    """The shared CTE chain (tokenize → v0 → ``rounds`` merge rounds
    ending at vocabulary v{rounds}) that both the trainer oracle and
    the encoder oracle build on — returned WITHOUT a final SELECT so
    each caller composes its own tail (`_bpe_train_sql` selects the
    merge table, `_bpe_encode_sql` joins the final vocabulary)."""
    head = """
    WITH tok AS MATERIALIZED (
        SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents),
    v0 AS MATERIALIZED (
        SELECT w, wf,
               list_transform(range(1, length(w) + 1),
                              i -> substr(w, i, 1)) AS syms
        FROM (SELECT w, count(*) AS wf FROM tok
              WHERE length(w) >= 2 GROUP BY w)),"""
    return head + ",".join(_bpe_round_sql(i) for i in range(rounds))


def _bpe_train_sql(rounds: int) -> str:
    tail = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS step, sym_a, sym_b, cnt FROM m{i}"
        for i in range(rounds)
    )
    return _bpe_sql_ctes(rounds) + "\n" + tail


def _bpe_apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge rule (a, b) to a (w, wf, syms) vocabulary with
    textbook leftmost-nonoverlapping BPE semantics."""
    win = W.partitionBy("w").orderBy("pos")
    e = vocab.select(
        "w", "wf", F.posexplode("syms").alias("pos", "s")
    ).withColumn("nxt", F.lead("s").over(win))
    m = F.coalesce(
        (F.col("s") == a) & (F.col("nxt") == b), F.lit(False)
    )
    e = e.withColumn("m", m)
    rn_m = F.sum(F.when(F.col("m"), 1).otherwise(0)).over(win)
    e = e.withColumn("grp", F.when(F.col("m"), F.col("pos") - rn_m))
    keep = F.col("m") & (
        F.row_number().over(
            W.partitionBy("w", "grp").orderBy("pos")
        )
        % 2
        == 1
    )
    e = e.withColumn("keep", keep)
    emit = (
        F.when(F.col("keep"), F.concat(F.col("s"), F.col("nxt")))
        .when(
            F.coalesce(F.lag("keep").over(win), F.lit(False)),
            F.lit(None),
        )
        .otherwise(F.col("s"))
    )
    return (
        e.select("w", "wf", "pos", emit.alias("emit"))
        .filter(F.col("emit").isNotNull())
        .groupBy("w", "wf")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "emit"))
            ).alias("pe")
        )
        .select(
            "w",
            "wf",
            F.expr("transform(pe, x -> x.emit)").alias("syms"),
        )
    )


def _bpe_top_pair(vocab: DataFrame):
    """Most frequent adjacent symbol pair (ties: lexicographic)."""
    win = W.partitionBy("w").orderBy("pos")
    return (
        vocab.select(
            "w", "wf", F.posexplode("syms").alias("pos", "s")
        )
        .withColumn("nxt", F.lead("s").over(win))
        .filter(F.col("nxt").isNotNull())
        .groupBy("s", "nxt")
        .agg(F.sum("wf").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("s"), F.asc("nxt"))
        .limit(1)
        .collect()
    )



def _bpe_vocab(docs: DataFrame) -> DataFrame:
    """Word-frequency vocabulary with character-level start
    segmentation — the single definition both the trainer and the
    encoder build from (same tokenization, same filter)."""
    return (
        docs.select(F.explode(F.split("t", "[^a-z]+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
        .select(
            "w",
            "wf",
            F.expr(
                "transform(sequence(1, length(w)), "
                "i -> substring(w, i, 1))"
            ).alias("syms"),
        )
        .localCheckpoint(eager=True)
    )


def _bpe_learn(
    vocab: DataFrame, rounds: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run ``rounds`` merge rounds; returns (merge table, final
    re-segmented vocabulary). One bounded driver collect per round."""
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, rounds + 1):
        top = _bpe_top_pair(vocab)
        if not top:
            break
        a, b, cnt = top[0]["s"], top[0]["nxt"], top[0]["cnt"]
        merges.append((step, a, b, int(cnt)))
        vocab = _bpe_apply_merge(vocab, a, b).localCheckpoint(
            eager=True
        )
    return merges, vocab


@query("p_bpe_train_merges", oracle=_bpe_train_sql(_BPE_MERGE_ROUNDS))
def p_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL iterative BPE tokenizer training (Sennrich et al., ACL
    2016), five merge rounds: each round counts adjacent symbol
    pairs over the current vocabulary segmentation, adopts the most
    frequent pair as a merge rule (ties lexicographic), and
    re-segments the vocabulary by applying the rule with textbook
    leftmost-nonoverlapping semantics — the complete training loop
    that ``p_bpe_pair_counts`` runs one round of.

    Merge application is exact reference BPE: all (a,b) adjacencies
    merge left-to-right without overlap; the only overlap hazard is
    a = b inside a same-symbol run, resolved by the parity rule
    (keep every other match within a run of consecutive match
    positions), which is what a sequential scan would do. Both
    engines implement the identical window/parity formulation, so
    the learned merge table is bit-exact cross-engine.

    Scale: the corpus is scanned ONCE into the word-frequency
    vocabulary; all five rounds run vocab-side (Heaps-law sublinear
    in corpus size) as per-word windows over the posexploded symbol
    table — bounded by total vocab characters, never corpus tokens.
    Each round's argmax is a bounded 1-row driver collect (the
    leaf-LU / connected-components coordination pattern), and the
    evolving vocabulary is lineage-pinned per round."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.lower(F.col("text")).alias("t")
    )
    merges, _ = _bpe_learn(_bpe_vocab(docs), _BPE_MERGE_ROUNDS)
    return spark.createDataFrame(
        merges, "step int, sym_a string, sym_b string, cnt bigint"
    )


def _bpe_encode_sql(rounds: int) -> str:
    # the same CTE chain the trainer oracle uses, composed from the
    # shared builder (no string surgery on the trainer's tail)
    return (
        _bpe_sql_ctes(rounds)
        + f""",
    wl AS MATERIALIZED (
        SELECT w, len(syms) AS n_sub FROM v{rounds}),
    dtok AS (
        SELECT lang,
               unnest(regexp_split_to_array(lower(text), '[^a-z]+'))
                   AS w
        FROM documents),
    j AS (
        SELECT lang, length(w) AS n_char, wl.n_sub
        FROM dtok JOIN wl USING (w)
        WHERE length(w) >= 2)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_char) AS BIGINT) AS n_chars,
           CAST(sum(n_sub) AS BIGINT) AS n_subwords,
           round(sum(n_sub) * 1.0 / sum(n_char), 6)
               AS subwords_per_char
    FROM j GROUP BY lang
    """
    )


@query("p_bpe_encode_stats", oracle=_bpe_encode_sql(_BPE_MERGE_ROUNDS))
def p_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE side of the BPE story: apply the 5 learned merges
    (``p_bpe_train_merges``) to the corpus and report per-language
    subword counts and the compression ratio (subwords per
    character; 1.0 = no merges applied, lower = more compression) —
    the acceptance metric a tokenizer build signs off on ("how many
    tokens does this vocab spend per language?"), and the fertility
    imbalance audit multilingual tokenizers run per language.

    Encoding never touches documents word-by-word: the corpus
    explodes once into (lang, word) tokens, and the segmentation
    arrives by JOINING the already-re-segmented VOCABULARY (each
    distinct word carries its subword count) — the join is
    vocab-vs-tokens on the word hash, map-side combinable after.
    Same scale story as training: all merge applications run
    vocab-side; the corpus pays one explode + one uniform hash
    join."""
    docs = read_table(spark, sf_dir, "documents").select(
        "lang", F.lower(F.col("text")).alias("t")
    )
    _, vocab = _bpe_learn(_bpe_vocab(docs), _BPE_MERGE_ROUNDS)
    wl = vocab.select("w", F.size("syms").alias("n_sub"))
    dtok = docs.select(
        "lang", F.explode(F.split("t", "[^a-z]+")).alias("w")
    ).filter(F.length("w") >= 2)
    j = dtok.join(wl, "w").select(
        "lang", F.length("w").alias("n_char"), "n_sub"
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("n_char").cast("bigint").alias("n_chars"),
        F.sum("n_sub").cast("bigint").alias("n_subwords"),
        F.round(
            F.sum("n_sub") * 1.0 / F.sum("n_char"), 6
        ).alias("subwords_per_char"),
    )


# ---------------------------------------------------------------------------
# Token-budget data selection
# ---------------------------------------------------------------------------

TB_BUDGET = 5_000  # tokens — scale-independent so every sf exercises the cut


_TOKEN_BUDGET_SQL = f"""
WITH t AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS ratio
    FROM documents),
c AS (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (
               ORDER BY ratio DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
    FROM t)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens
FROM c WHERE cum <= {TB_BUDGET}
"""


@query("p_token_budget_select", oracle=_TOKEN_BUDGET_SQL)
def p_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection under a token budget: rank every doc by a
    quality proxy (distinct-token ratio, doc_id tiebreak) and keep
    the best docs whose INCLUSIVE running token total still fits
    ``TB_BUDGET`` — the greedy knapsack relaxation every
    budget-capped training run executes ("fill the budget with the
    highest-quality tokens first").

    Scale shape: the score is a map-side expression; the running
    total rides ``prefix_sum``'s range shuffle (never a
    single-partition global window), so the selection costs exactly
    one sort-shuffle — the same bill as any global ORDER BY — and
    the budget predicate is a filter on the running column. At
    100 TB swap the ratio for any model-based quality score column;
    the plan is unchanged."""
    from matrixinversion_spark.relational.profiling import prefix_sum

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    t = d.select(
        "doc_id",
        F.size("ts").cast("bigint").alias("n_tokens"),
        (
            F.size(F.array_distinct("ts")).cast("double") / F.size("ts")
        ).alias("ratio"),
    )
    cum = prefix_sum(
        t,
        [F.col("ratio").desc(), F.col("doc_id").asc()],
        "n_tokens",
        out_col="cum_tokens",
    )
    return cum.filter(F.col("cum_tokens") <= TB_BUDGET).select(
        "doc_id",
        "n_tokens",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    )
