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
    bucket = hash32(F.col("doc_id").cast("string")) % 100
    h = d.select(
        "doc_id",
        F.md5("text").alias("th"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "validation")
        .otherwise("test")
        .alias("split"),
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
) -> DataFrame:
    """Per held-out split: how many docs are a NEAR-duplicate of any
    train doc — LSH band buckets (MinHash 16, 4×4 — the exact
    machinery of ``dedup.p_dedup_minhash_lsh``) generate candidates
    across the split boundary, then each candidate pair is verified
    with the EXACT distinct-shingle Jaccard ≥ tau. The bucket gate is
    part of the operator's declared semantics (it is what makes the
    audit run at corpus scale: candidates shuffle on (band, bkey),
    never all-pairs), and the verification being exact means every
    reported leak is real.

    Returns (split, n_docs, n_leaked) for each non-train split.
    """
    from matrixinversion_spark.pipeline.dedup import (
        base_hashes,
        lsh_bands,
        minhash_signature,
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
    sig = (
        sh.filter(F.size("_sh") > 0)
        .select(id_col, split_col, base_hashes(F.col("_sh")).alias("_hb"))
        .select(id_col, split_col, *minhash_signature(F.col("_hb")))
    )
    bands = lsh_bands(sig, id_col)
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
    d = read_table(spark, sf_dir, "documents")
    bucket = hash32(F.col("doc_id").cast("string")) % 100
    docs = d.select(
        "doc_id",
        "text",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "validation")
        .otherwise("test")
        .alias("split"),
    )
    return near_dup_leakage(docs)


# -- dataset release report -------------------------------------------------

_RELEASE_SQL = f"""
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
    FROM h GROUP BY split)
SELECT b.split, b.n_docs, b.n_chars, b.n_tokens, b.n_langs,
       b.n_dup_docs,
       CAST(coalesce(l.n_leaked, 0) AS BIGINT) AS n_leaked_exact
FROM base b LEFT JOIN leak l ON b.split = l.split
"""


@query("p_release_report", oracle=_RELEASE_SQL)
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

    Plan: one groupBy(split) aggregation with map-side partials over
    a single scan (counts, sums, two count-distincts), plus the
    md5-distinct train-fingerprint join for leakage — the same
    bounded shapes as the constituent operators; nothing data-sized
    reaches the driver."""
    d = read_table(spark, sf_dir, "documents")
    bucket = hash32(F.col("doc_id").cast("string")) % 100
    h = d.select(
        "doc_id",
        "text",
        "lang",
        F.md5("text").alias("th"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "validation")
        .otherwise("test")
        .alias("split"),
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
    return (
        base.join(leak, "split", "left")
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
        )
    )


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
