"""Text-analysis operators for training-data pipelines.

Language-ID (marker-token scoring), quality scoring (length/punct/
stopword ratios), token counting (whitespace + regex), and document
fingerprinting (md5 full-hash + 32-bit rolling-style prefix hash).

All operators are pure ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage-codegen'd, no Python in the hot path — so they
scale linearly over a 100 TB documents table. Each has an exact
DuckDB oracle built from the same constants.

Reference: the reference repo has no text surface (SURVEY.md §2.2);
these are the mandated training-pipeline extensions (§2.3 item 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table

# Shared constants — embedded in BOTH the Spark expressions and the
# oracle SQL so the two sides compute identical values.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
PUNCT_CLASS = "[.,!?;:]"
# marker tokens per language for the heuristic scorer (argmax count,
# ties broken by list order). On TESTDATA's synthetic corpus every
# doc shares one vocabulary, so predictions collapse to 'en' — the
# operator's value here is its (oracle-checked) shape, not accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "zh": ("de5", "le5", "shi4"),  # romanized placeholders
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (split on single space)."""
    return F.split(col, " ")


def token_count_regex(col: Column) -> Column:
    """BPE-ish token estimate: punctuation split off as own tokens.

    RE2 (DuckDB) has no lookahead, so both sides use the portable
    form: space out punctuation, split on whitespace, drop empties.
    """
    spaced = F.regexp_replace(col, "([.,!?;:])", " $1")
    return F.size(
        F.filter(F.split(spaced, r"\s+"), lambda t: F.length(t) > 0)
    )


def stopword_count(col: Column) -> Column:
    toks = tokens(col)
    return F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, PUNCT_CLASS, ""))


def _isin(markers: tuple[str, ...]):
    # closure factory — default-arg lambdas break HOF arg counting
    return lambda t: t.isin(*markers)


def lang_scores(col: Column) -> dict[str, Column]:
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, _isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_predict(col: Column) -> Column:
    """argmax marker count; ties break by LANG_MARKERS order."""
    scores = lang_scores(col)
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        better = scores[lang] > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    return best


# ---------------------------------------------------------------------------
# queries()/oracle_sql() entries
# ---------------------------------------------------------------------------

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "p_text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' '))                    AS n_tokens,
           len(list_distinct(string_split(text, ' ')))     AS n_distinct_tokens,
           length(text)                                    AS n_chars,
           len(list_filter(string_split(text, ' '),
                           t -> t IN ({_STOP_SQL})))       AS n_stopwords
    FROM documents
    """,
)
def p_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (whitespace tokenizer)."""
    d = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars"),
        stopword_count(F.col("text")).alias("n_stopwords"),
    )


@query(
    "p_text_quality",
    oracle=f"""
    SELECT doc_id,
           round(CAST(length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g'))
                 AS DOUBLE) / length(text), 6)     AS punct_ratio,
           round(CAST(len(list_filter(string_split(text, ' '),
                                      t -> t IN ({_STOP_SQL}))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS ttr,
           CASE WHEN length(text) >= 50
                 AND len(string_split(text, ' ')) >= 10
                 AND CAST(len(list_filter(string_split(text, ' '),
                                          t -> t IN ({_STOP_SQL}))) AS DOUBLE)
                     / len(string_split(text, ' ')) BETWEEN 0.01 AND 0.6
                THEN 1 ELSE 0 END                  AS quality_ok
    FROM documents
    """,
)
def p_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: punctuation/stopword ratios, type-token ratio,
    and a boolean keep-gate — the standard pretraining-corpus filters."""
    d = read_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_toks = F.size(tokens(F.col("text")))
    sw_ratio = stopword_count(F.col("text")).cast("double") / n_toks
    return d.select(
        "doc_id",
        F.round(punct_count(F.col("text")).cast("double") / n_chars, 6).alias(
            "punct_ratio"
        ),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(
            F.size(F.array_distinct(tokens(F.col("text")))).cast("double") / n_toks,
            6,
        ).alias("ttr"),
        F.when(
            (n_chars >= 50)
            & (n_toks >= 10)
            & (sw_ratio >= 0.01)
            & (sw_ratio <= 0.6),
            1,
        )
        .otherwise(0)
        .alias("quality_ok"),
    )


def _lang_case_sql() -> str:
    """Build the SQL twin of ``lang_predict`` (same fold order)."""
    def score(lang: str) -> str:
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return (f"len(list_filter(string_split(text, ' '), "
                f"t -> t IN ({markers})))")

    langs = list(LANG_MARKERS)
    best, best_score = f"'{langs[0]}'", score(langs[0])
    for lang in langs[1:]:
        s = score(lang)
        best = f"CASE WHEN {s} > {best_score} THEN '{lang}' ELSE {best} END"
        best_score = f"CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END"
    return best


@query(
    "p_text_lang_id",
    oracle=f"""
    SELECT lang, lang_pred, count(*) AS n_docs
    FROM (SELECT lang, {_lang_case_sql()} AS lang_pred FROM documents)
    GROUP BY lang, lang_pred
    """,
)
def p_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (marker-token argmax) — confusion counts
    against the labeled ``lang`` column."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_predict(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "p_text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS fp_md5,
           CAST(('0x' || substr(md5(lower(trim(text))), 1, 8)) AS UBIGINT)::BIGINT
               AS fp32
    FROM documents
    """,
)
def p_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: normalized md5 + 32-bit prefix hash
    (the cross-engine base hash used by MinHash/SimHash dedup)."""
    d = read_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return d.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.conv(F.substring(F.md5(norm), 1, 8), 16, 10).cast("bigint").alias("fp32"),
    )


@query(
    "p_text_token_regex",
    oracle=r"""
    SELECT doc_id,
           len(list_filter(
               string_split_regex(
                   regexp_replace(text, '([.,!?;:])', ' \1', 'g'), '\s+'),
               t -> length(t) > 0)) AS n_regex_tokens
    FROM documents
    """,
)
def p_text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex (BPE-ish) token count: words split, punctuation split off."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", token_count_regex(F.col("text")).alias("n_regex_tokens")
    )


@query(
    "p_tfidf_keywords",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dfreq AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    )
    SELECT doc_id, token,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
    FROM (
        SELECT tf.doc_id, tf.token, tf.tf, dfreq.df, n.n_docs,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df)
                            DESC, tf.token) AS rn
        FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ) ranked
    WHERE rn <= 3
    """,
)
def p_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 keywords by TF-IDF.

    All-DataFrame: token explode → per-doc term frequencies → corpus
    document frequencies (broadcast — vocabulary ≪ corpus) → scores →
    per-doc top-k window. The two aggregations are partial+final;
    the only wide shuffle is on token for the DF count. Scales to a
    100 TB corpus because the vocabulary table (distinct tokens) is
    what gets broadcast, never the corpus.
    """
    from pyspark.sql.window import Window

    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    score = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("_score"), F.asc("token"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("_score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", F.round("_score", 6).alias("score"))
    )


@query(
    "p_text_repetition",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    counts AS (
        SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS top_count
        FROM counts GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
           round(CAST(top_count AS DOUBLE) / n_tokens, 6) AS top_word_frac
    FROM per_doc
    """,
)
def p_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: distinct-token ratio and
    top-token fraction per document (high top-word fraction / low
    distinct ratio flag boilerplate and degenerate pages).

    Computed entirely with JVM array expressions, O(n log n) per row:
    sort the token array once, find run boundaries (positions where
    the sorted value changes), and read distinct count / max run
    length off the boundary positions. No explode, no shuffle, no
    per-token map rebuild: a 100 TB corpus streams through map-side
    only.

    The sorted array and the boundary list are MATERIALIZED as
    projection columns before the per-element lambdas read them:
    passing the ``array_sort(...)`` expression object straight into
    the ``element_at`` lambda inlines it per element — the document
    re-sorts once per token, O(n² log n) per row (measured: 39 s at
    sf0.1 inlined vs ~1 s materialized; same trap as
    ``dedup.shingles_from_tokens``). An alias referenced repeatedly
    by a non-cheap expression is exactly what CollapseProject
    refuses to merge, so the two-step projection stays materialized
    in the physical plan."""
    d = read_table(spark, sf_dir, "documents")
    sorted_ts = d.select(
        "doc_id", F.array_sort(tokens(F.col("text"))).alias("ts")
    )
    ts = F.col("ts")
    n = F.size(ts)
    # 1-indexed positions where a new run of equal tokens starts
    starts_expr = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1) | (F.element_at(ts, i) != F.element_at(ts, i - 1)),
    )
    with_starts = sorted_ts.select(
        "doc_id", "ts", starts_expr.alias("starts")
    )
    # run length = gap to the next start (sentinel n+1 closes the last)
    run_lens = F.zip_with(
        F.col("starts"),
        F.concat(
            F.slice(F.col("starts"), 2, F.size("starts")),
            F.array(n + 1),
        ),
        lambda a, b: b - a,
    )
    return with_starts.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.round(F.size("starts").cast("double") / n, 6).alias(
            "distinct_ratio"
        ),
        F.round(F.array_max(run_lens).cast("double") / n, 6).alias(
            "top_word_frac"
        ),
    )


# redaction patterns (RE2-safe: no lookahead — DuckDB oracle parity)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
LONGNUM_RE = "[0-9]{4,}"


@query(
    "p_text_normalize",
    oracle=f"""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(lower(text), '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{LONGNUM_RE}', '<NUM>', 'g'),
               '\\s+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def p_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus canonicalization + PII-style redaction: lowercase,
    replace e-mail addresses and long digit runs with typed
    placeholders, collapse whitespace. Pure regexp_replace chain —
    JVM-side, one codegen span, embarrassingly parallel at 100 TB
    (the synthetic corpus contains no e-mails, so those patterns are
    exercised as no-ops while the case/whitespace normalization does
    real work — both sides of the oracle agree either way)."""
    d = read_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), EMAIL_RE, "<EMAIL>"),
                LONGNUM_RE,
                "<NUM>",
            ),
            "\\s+",
            " ",
        )
    )
    return d.select("doc_id", norm.alias("norm_text"))


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@query(
    "p_doc_chunking",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    spans AS (
        SELECT doc_id, ts,
               unnest(generate_series(
                   1, greatest(len(ts) - {CHUNK_TOKENS - CHUNK_STRIDE}, 1),
                   {CHUNK_STRIDE})) AS start
        FROM tok
    )
    SELECT doc_id,
           CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           array_to_string(ts[start:start + {CHUNK_TOKENS - 1}], ' ')
               AS chunk_text,
           CAST(least({CHUNK_TOKENS}, len(ts) - start + 1) AS INT)
               AS n_tokens
    FROM spans
    """,
)
def p_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: fixed token windows
    (CHUNK_TOKENS) advancing by CHUNK_STRIDE, overlap retained for
    training-context continuity — the standard pre-training prep step
    between curation and tokenization.

    Shape: tokenize once per row, posexplode the window starts
    (sequence with step), slice per start — all JVM array expressions;
    the explode multiplies rows ~n_tokens/stride x but involves no
    shuffle, so it streams at scan parallelism over 100 TB. The final
    chunk keeps its natural (shorter) tail; a doc shorter than one
    window yields a single chunk."""
    d = read_table(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(ts) - (CHUNK_TOKENS - CHUNK_STRIDE), F.lit(1)),
        F.lit(CHUNK_STRIDE),
    )
    return (
        d.select("doc_id", ts.alias("ts"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint").alias(
                "chunk_id"
            ),
            F.array_join(
                F.slice(F.col("ts"), F.col("start"), CHUNK_TOKENS), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(CHUNK_TOKENS), F.size("ts") - F.col("start") + 1
            ).alias("n_tokens"),
        )
    )


SEQ_LEN = 256  # token budget per packed training sequence


@query(
    "p_sequence_pack",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    placed AS (
        SELECT source, doc_id, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM toks
    )
    SELECT source,
           CAST((cum - n_tokens) // {SEQ_LEN} AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM placed
    GROUP BY source, seq_id
    """,
)
def p_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget
    training sequences by cumulative offset, sharded by ``source``.

    Each doc lands in the sequence where its start offset falls
    (contiguous packing — docs may straddle a boundary; the
    tokenizer's truncate/pad step resolves that downstream). The
    window partitions by source shard, so the cumulative sum is a
    per-shard scan, not a global single-partition sort — the layout a
    100 TB corpus already has (one shard ≈ one dump/crawl slice).
    One shuffle on source, then one partial+final agg."""
    d = read_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    n_tok = F.size(tokens(F.col("text"))).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = d.select(
        "source", "doc_id", n_tok.alias("n_tokens")
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return (
        placed.groupBy(
            "source",
            F.floor((F.col("cum") - F.col("n_tokens")) / SEQ_LEN)
            .cast("bigint")
            .alias("seq_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@query(
    "p_vocab_topk",
    oracle="""
    SELECT tok AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS tok
          FROM documents)
    WHERE tok != ''
    GROUP BY tok
    """,
)
def p_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary frequencies via the Spark 4 ``approx_top_k``
    frequent-items sketch — the one-pass, mergeable way to get "what
    are the top tokens" at 100 TB (a full GROUP BY shuffles every
    distinct token; the sketch is one aggregation buffer of
    maxItemsTracked entries per partition, merged on the driver side
    of the final agg). k and capacity are set far above the test
    corpus's vocabulary (~31 tokens), where the sketch is provably
    exact, so the oracle is the plain exact histogram — at real
    vocabulary sizes the same call returns approximate heavy
    hitters. Top-k MEMBERSHIP under count ties is engine-arbitrary,
    which is the other reason the query returns the full (exact)
    histogram rather than a boundary-sensitive k-subset.

    Self-verifying (r4 VERDICT item 2): the exact regime only holds
    while the vocabulary fits inside k — a TESTDATA regeneration that
    grows the corpus past that would silently truncate the sketch and
    flip the row red by hash mismatch. ``size(tk) < k`` is a
    sufficient zero-cost witness (any vocabulary > k returns exactly
    k entries, and any vocabulary ≤ k < maxItemsTracked is tracked
    exactly), asserted in-query so the failure mode is a labeled
    runtime error naming the cause, not an opaque hash delta."""
    _K = 1000
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    sketch = toks.selectExpr(f"approx_top_k(tok, {_K}, 10000) AS tk")
    # coalesce the (always-null-on-success) assertion into cnt so
    # column pruning cannot drop the check
    guard = F.assert_true(
        F.size("tk") < _K,
        F.concat(
            F.lit(
                "p_vocab_topk: corpus vocabulary reached the sketch "
                f"k={_K} — exact-regime oracle no longer sound; "
                "raise k/maxItemsTracked or regenerate expectations"
            ),
        ),
    )
    return sketch.select(
        F.explode("tk").alias("e"), guard.alias("_g")
    ).select(
        F.col("e.item").alias("item"),
        F.coalesce(
            F.col("_g").cast("bigint"), F.col("e.count").cast("bigint")
        ).alias("cnt"),
    )


@query(
    "p_dedup_lines",
    oracle="""
    WITH chunks AS (
        SELECT doc_id, g AS chunk_no,
               array_to_string(list_slice(ts, g * 32 + 1, g * 32 + 32),
                               ' ') AS chunk
        FROM (SELECT doc_id, string_split(text, ' ') AS ts
              FROM documents),
             LATERAL unnest(generate_series(
                 0, CAST(ceil(len(ts) / 32.0) AS BIGINT) - 1)) AS u(g)
    ),
    keep AS (
        SELECT doc_id, chunk_no, chunk,
               min(doc_id * 1000000 + chunk_no)
                   OVER (PARTITION BY md5(chunk)) AS first_slot
        FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks_kept,
           CAST(sum(length(chunk)) AS BIGINT) AS chars_kept
    FROM keep
    WHERE doc_id * 1000000 + chunk_no = first_slot
    GROUP BY doc_id
    """,
)
def p_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span removal (C4/RefinedWeb-style "dedup repeated
    lines", adapted to the corpus's unstructured text): documents
    split into fixed 32-token chunks, and every chunk whose exact
    content appears earlier in the corpus (first (doc_id, chunk_no)
    slot wins) is dropped; emits per-doc surviving-chunk counts +
    char checksum. Unlike doc-level dedup (p_dedup_exact) this
    removes partial overlap between otherwise-distinct documents.
    One shuffle on the chunk hash (uniform md5 key — no skew); the
    min-slot window is the standard keep-first tiebreak and
    re-aggregates per doc without a second wide exchange (same
    (doc_id)-keyed agg the chunker already produces)."""
    from pyspark.sql.window import Window

    d = read_table(spark, sf_dir, "documents")
    ts = d.select("doc_id", F.split("text", " ").alias("ts"))
    chunks = ts.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("ts") / F.lit(32.0)).cast("int") - 1,
                ),
                lambda g: F.struct(
                    g.alias("chunk_no"),
                    F.concat_ws(
                        " ", F.slice("ts", g * 32 + 1, 32)
                    ).alias("chunk"),
                ),
            )
        ).alias("c"),
    ).select(
        "doc_id", F.col("c.chunk_no").alias("chunk_no"),
        F.col("c.chunk").alias("chunk"),
    )
    w = Window.partitionBy(F.md5("chunk"))
    slot = F.col("doc_id") * 1000000 + F.col("chunk_no")
    keep = chunks.withColumn("first_slot", F.min(slot).over(w)).filter(
        slot == F.col("first_slot")
    )
    return keep.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks_kept"),
        F.sum(F.length("chunk")).cast("bigint").alias("chars_kept"),
    )


@query(
    "p_bm25_score",
    oracle="""
    WITH q AS (SELECT unnest(['spark', 'join', 'hash']) AS term),
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        FROM toks GROUP BY doc_id
    ),
    stats AS (
        SELECT avg(dl) AS avgdl,
               (SELECT CAST(count(*) AS BIGINT) FROM dl) AS n_docs
        FROM dl
    ),
    dfreq AS (
        SELECT token AS term, count(DISTINCT doc_id) AS df
        FROM toks JOIN q ON toks.token = q.term
        GROUP BY token
    ),
    tf AS (
        SELECT doc_id, token AS term, CAST(count(*) AS BIGINT) AS tf
        FROM toks JOIN q ON toks.token = q.term
        GROUP BY doc_id, token
    )
    SELECT tf.doc_id, tf.term,
           round(
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * tf * (1.2 + 1.0)
             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)),
             6) AS bm25
    FROM tf
    JOIN dfreq USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
    """,
)
def p_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring (Okapi, k1=1.2, b=0.75) of every
    document against a fixed query-term set — the classic sparse
    retrieval scorer an LLM-data pipeline uses for quality-aware
    corpus search and hard-negative mining.

    Plan shape mirrors ``p_tfidf_keywords``: one explode, a per-doc
    doc-length agg, a term-restricted document-frequency agg (the
    query vocabulary is tiny, so df and the corpus stats broadcast),
    and row-local JVM arithmetic. One shuffle on doc_id for tf/dl;
    everything joined to it broadcasts. Scores are emitted PER TERM
    (not summed) so every output value is a deterministic product of
    exact counts — a cross-engine float sum over ≥3 terms would be
    addition-order-sensitive in the last ulp; callers sum client-side
    or with a follow-up groupBy."""
    terms = ["spark", "join", "hash"]
    k1, b = 1.2, 0.75
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    stats = dl.agg(
        F.avg("dl").alias("avgdl"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    qtoks = toks.filter(F.col("token").isin(terms))
    dfreq = qtoks.groupBy(F.col("token").alias("term")).agg(
        F.countDistinct("doc_id").alias("df")
    )
    tf = qtoks.groupBy("doc_id", F.col("token").alias("term")).agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.round(idf * F.col("tf") * (k1 + 1.0) / norm, 6).alias(
                "bm25"
            ),
        )
    )


@query(
    "p_hash_split",
    oracle="""
    WITH b AS (
        SELECT CASE
                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS UBIGINT) % 100 < 90 THEN 'train'
                 WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS UBIGINT) % 100 < 95 THEN 'validation'
                 ELSE 'test'
               END AS split,
               n_chars
        FROM documents
    )
    SELECT split, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM b GROUP BY split
    """,
)
def p_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/validation/test split by content-
    independent key hash — the reproducible-split primitive every
    training-data pipeline needs (re-running on a grown corpus keeps
    every previously-assigned document in its split, unlike
    randomSplit whose assignment depends on partitioning).

    md5(doc_id) % 100 buckets; the md5-prefix trick (dedup.hash32)
    makes the assignment bit-identical in DuckDB, so the oracle
    checks the actual per-split membership, not just proportions.
    Scale plan: a stateless per-row expression (no shuffle at all
    until the audit aggregation) — at 100 TB the split is a free
    narrow map; the per-split histogram here is one uniform 3-key
    aggregation."""
    from matrixinversion_spark.pipeline.dedup import hash32

    d = read_table(spark, sf_dir, "documents")
    bucket = hash32(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@query(
    "p_ngram_counts",
    oracle="""
    WITH tok AS (
        SELECT string_split(text, ' ') AS ts FROM documents
    ),
    bg AS (
        SELECT ts[i] || ' ' || ts[i + 1] AS bigram
        FROM tok, UNNEST(range(1, len(ts))) AS t(i)
        WHERE len(ts) >= 2
    )
    SELECT bigram, count(*) AS cnt
    FROM bg GROUP BY bigram HAVING count(*) >= 5
    """,
)
def p_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts with a min-count threshold — the n-gram
    language-model / collocation statistic (and the building block of
    count-based tokenizer training). Companion of p_vocab_topk
    (unigrams via sketch) — this is the exact path for n > 1.

    Adjacent-token pairs are formed inside the array with a JVM
    ``transform`` over ``sequence`` (no posexplode self-join, which
    would shuffle the exploded corpus twice), then one explode +
    one hash aggregation. Scale plan: a single shuffle keyed on the
    bigram string with map-side partial counts; the HAVING filter
    prunes the long tail after the partial agg, exactly where a
    count-min/TopK sketch would slot in if the full tail were not
    needed."""
    d = read_table(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    bigrams = F.expr(
        "transform(sequence(1, size(ts) - 1), "
        "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
    )
    return (
        d.select(ts.alias("ts"))
        .filter(F.size("ts") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


@query(
    "p_domain_mix",
    oracle="""
    WITH per AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_tokens) AS t, count(*) AS k FROM per)
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / (SELECT t FROM tot), 6)
               AS token_share_r6,
           round((1.0 / (SELECT k FROM tot))
                 / (CAST(n_tokens AS DOUBLE) / (SELECT t FROM tot)), 4)
               AS uniform_resample_factor_r4
    FROM per
    """,
)
def p_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/domain mixture audit: per-source document and token
    counts, token share of the corpus, and the resampling factor that
    would rebalance to a uniform source mix — the bookkeeping behind
    pretraining data-mixture weighting (domain up/down-sampling).

    Scale plan: one aggregation keyed on source (map-side partial
    sums of a JVM ``size(split(...))`` expression — tokens are
    counted without materializing token rows), then a broadcast of
    the source-cardinality totals back onto the per-source rows.
    At 100 TB the only shuffle is |sources| keys wide; skew in
    source sizes affects the partial-agg stage only, which is
    skew-immune (combiner output is one row per source per task)."""
    d = read_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("t"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    share = F.col("n_tokens") / F.col("t")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share_r6"),
        F.round((F.lit(1.0) / F.col("k")) / share, 4).alias(
            "uniform_resample_factor_r4"
        ),
    )


@query(
    "p_unigram_lm_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    cnt AS (
        SELECT tok, CAST(count(*) AS DOUBLE) AS c
        FROM toks GROUP BY tok
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks)
    SELECT doc_id,
           CAST(count(*) AS BIGINT)     AS n_toks,
           round(avg(ln(c / t)), 6)     AS avg_logp
    FROM toks JOIN cnt USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def p_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-score language-model quality filter (the CCNet/
    RedPajama perplexity-proxy pattern): pass 1 estimates a unigram
    LM over the whole corpus (token → relative frequency), pass 2
    scores every document by its mean token log-probability — docs
    full of corpus-rare tokens score low and get filtered.

    Plan, 100 TB honest: one explode + one shuffle on token for the
    LM (mergeable partial counts), the corpus total as a broadcast
    scalar, then one shuffle join of tokens against the LM (token key
    — vocabulary-bounded, uniform) and a final doc_id agg that reuses
    the explode. No driver materialization of the vocabulary; if the
    LM is known-small it could broadcast, but the shuffle join is the
    plan that survives an open vocabulary.

    avg() of logs is cross-engine fp-stable at 6 decimals: per-token
    ln differs by ≤1 ulp between libm implementations, so the mean
    over ~1e2 tokens carries ~1e-15 spread vs the 1e-6 granularity.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = cnt.agg(F.sum("c").alias("t"))
    return (
        toks.join(cnt, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.round(F.avg(F.log(F.col("c") / F.col("t"))), 6).alias(
                "avg_logp"
            ),
        )
    )


@query(
    "p_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) + 1.0) / 4294967297.0) / n_chars AS k
        FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, round(k, 9) AS key
    FROM keyed ORDER BY k DESC LIMIT 50
    """,
)
def p_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=50, weight ∝ doc
    length — the Efraimidis–Spirakis A-ES scheme (IPL 97(5), 2006):
    each row gets key = ln(u)/w for u ∈ (0,1) and the k LARGEST keys
    are the sample (equivalent to max u^(1/w)). u comes from the
    md5-prefix hash (dedup.hash32), not a RNG, so the sample is
    deterministic, reproducible under re-runs and corpus growth, and
    bit-matched by the DuckDB oracle.

    Scale plan: key assignment is a stateless narrow map; selection
    is a top-k (TakeOrdered partial per partition + driver merge of
    k-element heaps — no global sort, no shuffle of the data). The
    same two-line pattern gives per-stratum weighted samples by
    swapping the top-k for a row_number window over the stratum."""
    from matrixinversion_spark.pipeline.dedup import hash32

    d = read_table(spark, sf_dir, "documents")
    u = (hash32(F.col("doc_id").cast("string")) + F.lit(1.0)) / F.lit(
        4294967297.0
    )
    keyed = d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (F.log(u) / F.col("n_chars")).alias("k"),
    )
    return (
        keyed.orderBy(F.desc("k"))
        .limit(50)
        .select("doc_id", "n_chars", F.round("k", 9).alias("key"))
    )


@query(
    "p_token_entropy",
    oracle="""
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    cnt AS (
        SELECT lang, tok, CAST(count(*) AS DOUBLE) AS c
        FROM toks GROUP BY lang, tok
    ),
    tot AS (
        SELECT lang, sum(c) AS t, CAST(count(*) AS BIGINT) AS vocab
        FROM cnt GROUP BY lang
    )
    SELECT cnt.lang,
           tot.vocab                                    AS vocab,
           CAST(tot.t AS BIGINT)                        AS n_toks,
           round(-sum((c / t) * ln(c / t)), 6)          AS entropy
    FROM cnt JOIN tot ON cnt.lang = tot.lang
    GROUP BY cnt.lang, tot.vocab, tot.t
    """,
)
def p_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token Shannon entropy + vocabulary size — the
    lexical-diversity audit a corpus pipeline runs per shard/language
    to spot template spam (low entropy) or tokenizer damage (entropy
    spikes). Two uniform aggregations (lang,token → counts; lang →
    entropy fold); the entropy sum runs over the vocabulary, not the
    corpus, so the second stage is cardinality-bounded at any data
    size."""
    d = read_table(spark, sf_dir, "documents")
    cnt = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    tot = cnt.groupBy("lang").agg(
        F.sum("c").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    p = F.col("c") / F.col("t")
    return (
        cnt.join(tot, "lang")
        .groupBy("lang", "vocab", "t")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
        .select(
            "lang", "vocab",
            F.col("t").cast("bigint").alias("n_toks"), "entropy",
        )
    )


_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
_PHONE_RE = "\\+1-[0-9]{3}-[0-9]{4}"


@query(
    "p_pii_scrub",
    oracle=f"""
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@corp.example or +1-'
                    || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                    || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>',
                                             'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g'))
               AS scrubbed_md5
    FROM enriched
    """,
)
def p_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails, phone numbers) — the compliance scrub
    every LLM training pipeline runs before tokenization. The corpus
    is synthetic and PII-free, so each document is first ENRICHED
    with a deterministic doc_id-derived email + phone; the oracle
    then hash-checks the fully scrubbed text (md5), i.e. the actual
    replacement output, not just match counts. Both regexes stay in
    the Java∩RE2 common subset so Spark and DuckDB match identically.

    Scale plan: stateless JVM ``regexp_replace``/``regexp_count``
    narrow maps — zero shuffles, pure whole-stage-codegen; at 100 TB
    this runs at scan speed."""
    d = read_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@corp.example or +1-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PHONE_RE), F.lit("<PHONE>"),
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), F.lit(0)))
            .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), F.lit(0)))
            .cast("bigint").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@query(
    "p_langid_kappa",
    oracle=f"""
    WITH conf AS (
        SELECT lang, {_lang_case_sql()} AS pred,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2),
    tot AS (
        SELECT sum(n) AS nn,
               sum(CASE WHEN lang = pred THEN n ELSE 0 END) AS diag
        FROM conf),
    rm AS (SELECT lang AS cls, sum(n) AS r FROM conf GROUP BY 1),
    cm AS (SELECT pred AS cls, sum(n) AS c FROM conf GROUP BY 1),
    pe AS (
        SELECT sum(coalesce(r, 0) * coalesce(c, 0)) AS pe_num
        FROM rm FULL OUTER JOIN cm USING (cls))
    SELECT CAST(nn AS BIGINT) AS n_docs,
           round(diag * 1.0 / nn, 6) AS p_observed,
           round(pe_num * 1.0 / (nn * nn), 6) AS p_expected,
           round((diag * 1.0 / nn - pe_num * 1.0 / (nn * nn))
                 / (1 - pe_num * 1.0 / (nn * nn)), 6) AS kappa
    FROM tot CROSS JOIN pe
    """,
)
def p_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the heuristic language-ID prediction and
    the gold ``lang`` label — chance-corrected agreement, the
    standard acceptance metric for any auto-labeler (lang-id,
    quality classifier, toxicity tagger) before its labels gate a
    corpus: raw accuracy (``p_text_lang_id``'s confusion diagonal)
    over-credits skewed label distributions; κ = (p₀−p_e)/(1−p_e)
    does not.

    Everything happens on the |langs|² confusion frame: one
    label-bounded groupBy off the doc scan, then marginal row/column
    sums full-outer-joined on class (a predicted class may never
    appear as gold) and a broadcast crossJoin of two 1-row frames —
    no driver collect, exact integer arithmetic up to three
    divisions. Scale: identical to ``p_text_lang_id`` — the widest
    exchange is |langs|² rows regardless of corpus size."""
    d = read_table(spark, sf_dir, "documents")
    conf = (
        d.select("lang", lang_predict(F.col("text")).alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = conf.agg(
        F.sum("n").alias("nn"),
        F.sum(
            F.when(F.col("lang") == F.col("pred"), F.col("n")).otherwise(
                0
            )
        ).alias("diag"),
    )
    rm = conf.groupBy(F.col("lang").alias("cls")).agg(
        F.sum("n").alias("r")
    )
    cm = conf.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("n").alias("c")
    )
    pe = (
        rm.join(cm, "cls", "full_outer")
        .agg(
            F.sum(
                F.coalesce(F.col("r"), F.lit(0))
                * F.coalesce(F.col("c"), F.lit(0))
            ).alias("pe_num")
        )
    )
    po = F.col("diag") * 1.0 / F.col("nn")
    pexp = F.col("pe_num") * 1.0 / (F.col("nn") * F.col("nn"))
    return (
        tot.crossJoin(F.broadcast(pe))
        .select(
            F.col("nn").cast("bigint").alias("n_docs"),
            F.round(po, 6).alias("p_observed"),
            F.round(pexp, 6).alias("p_expected"),
            F.round((po - pexp) / (1 - pexp), 6).alias("kappa"),
        )
    )


# ---------------------------------------------------------------------------
# Composed quality-rule release gate (C4 / Gopher public rules)
# ---------------------------------------------------------------------------

# Thresholds from the published filter sets — C4 (Raffel et al. 2020
# §2.2) and Gopher (Rae et al. 2021 table A1) — scaled to this
# corpus's short synthetic docs where noted. Shared verbatim by the
# Spark expressions and the DuckDB oracle.
QG_MIN_CHARS = 50      # C4: drop too-short pages
QG_MIN_TOKENS = 10     # Gopher: 50 words, scaled to the test corpus
QG_SW_LO, QG_SW_HI = 0.01, 0.6   # Gopher: stop-word sanity band
QG_WL_LO, QG_WL_HI = 2.0, 10.0   # Gopher: mean word length 3-10 (lo
#                                  relaxed: synthetic vocab is short)
QG_TOP_MAX = 0.2       # Gopher: top word <= 20% of the doc
QG_DIST_MIN = 0.3      # degenerate-page floor on distinct ratio
QG_PUNCT_MAX = 0.2     # C4-style symbol-mass cap

_QG_RULES = (
    "r_min_len", "r_stopword", "r_word_len",
    "r_top_frac", "r_distinct", "r_punct",
)

_QUALITY_GATE_SQL = f"""
WITH base AS (
    SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents
),
words AS (SELECT doc_id, unnest(ts) AS w FROM base),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
rep AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)   AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(c) AS BIGINT)   AS top_c
    FROM wc GROUP BY doc_id
),
rules AS (
    SELECT b.doc_id,
        CASE WHEN length(b.text) >= {QG_MIN_CHARS}
              AND r.n_tokens >= {QG_MIN_TOKENS} THEN 1 ELSE 0 END
            AS r_min_len,
        CASE WHEN CAST(len(list_filter(b.ts,
                     t -> t IN ({_STOP_SQL}))) AS DOUBLE) / len(b.ts)
                  BETWEEN {QG_SW_LO} AND {QG_SW_HI} THEN 1 ELSE 0 END
            AS r_stopword,
        CASE WHEN CAST(list_sum(list_transform(b.ts,
                     t -> length(t))) AS DOUBLE) / len(b.ts)
                  BETWEEN {QG_WL_LO} AND {QG_WL_HI} THEN 1 ELSE 0 END
            AS r_word_len,
        CASE WHEN CAST(r.top_c AS DOUBLE) / r.n_tokens
                  <= {QG_TOP_MAX} THEN 1 ELSE 0 END
            AS r_top_frac,
        CASE WHEN CAST(r.n_distinct AS DOUBLE) / r.n_tokens
                  >= {QG_DIST_MIN} THEN 1 ELSE 0 END
            AS r_distinct,
        CASE WHEN CAST(length(b.text) - length(regexp_replace(
                     b.text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)
                  / length(b.text) <= {QG_PUNCT_MAX} THEN 1 ELSE 0 END
            AS r_punct
    FROM base b JOIN rep r USING (doc_id)
)
SELECT doc_id, r_min_len, r_stopword, r_word_len, r_top_frac,
       r_distinct, r_punct,
       r_min_len * r_stopword * r_word_len * r_top_frac
           * r_distinct * r_punct AS pass_all
FROM rules
"""


def quality_gate_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc pass/fail (1/0) for each public C4/Gopher quality
    rule, plus ``pass_all`` — the composed keep-gate a release
    pipeline applies before publishing a corpus.

    The individual signals exist as separate operators
    (``p_text_quality``, ``p_text_repetition``, ``p_token_entropy``);
    a production run wants ONE frame with the verdicts side by side
    so per-rule kill rates are attributable. Everything is computed
    in a single map-side pass: the token array is sorted once per
    doc and distinct count / top-run length read off the run
    boundaries (same O(n log n) array trick as ``p_text_repetition``
    — no explode, no shuffle, so a 100 TB corpus streams through
    whole-stage codegen and the only exchange is whatever the caller
    aggregates afterwards)."""
    t = F.col("_t")
    d = docs.select(
        id_col,
        F.col(text_col).alias("_t"),
        F.array_sort(tokens(F.col(text_col))).alias("_toks"),
    )
    ts = F.col("_toks")
    n = F.size(ts)
    # materialized projection stage: starts must be a column BEFORE
    # per-element lambdas read it (alias-inlining trap, see
    # p_text_repetition). Internal aliases are underscored so a
    # caller's own "ts"/"starts" column (e.g. the streaming monitor's
    # event-time) can never collide.
    starts_expr = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1) | (F.element_at(ts, i) != F.element_at(ts, i - 1)),
    )
    w = d.select(id_col, "_t", "_toks", starts_expr.alias("_starts"))
    run_lens = F.zip_with(
        F.col("_starts"),
        F.concat(
            F.slice(F.col("_starts"), 2, F.size("_starts")),
            F.array(n + 1),
        ),
        lambda a, b: b - a,
    )
    n_chars = F.length(t)
    sw_ratio = F.size(
        F.filter(ts, lambda x: x.isin(*STOPWORDS))
    ).cast("double") / n
    wl = F.aggregate(
        ts, F.lit(0), lambda acc, x: acc + F.length(x)
    ).cast("double") / n
    top_frac = F.array_max(run_lens).cast("double") / n
    dist_ratio = F.size("_starts").cast("double") / n
    punct_ratio = punct_count(t).cast("double") / n_chars
    rules = {
        "r_min_len": (n_chars >= QG_MIN_CHARS) & (n >= QG_MIN_TOKENS),
        "r_stopword": (sw_ratio >= QG_SW_LO) & (sw_ratio <= QG_SW_HI),
        "r_word_len": (wl >= QG_WL_LO) & (wl <= QG_WL_HI),
        "r_top_frac": top_frac <= QG_TOP_MAX,
        "r_distinct": dist_ratio >= QG_DIST_MIN,
        "r_punct": punct_ratio <= QG_PUNCT_MAX,
    }
    out = w.select(
        id_col,
        *[
            F.when(cond, 1).otherwise(0).alias(name)
            for name, cond in rules.items()
        ],
    )
    pass_all = F.col(_QG_RULES[0])
    for r in _QG_RULES[1:]:
        pass_all = pass_all * F.col(r)
    return out.withColumn("pass_all", pass_all)


@query("p_quality_gate", oracle=_QUALITY_GATE_SQL)
def p_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed C4/Gopher quality release gate over ``documents`` —
    see ``quality_gate_frame``. Corpus-level rule rates compose into
    the dataset release report (``corpus.quality_rates`` /
    ``corpus.guarded_release_report``)."""
    return quality_gate_frame(read_table(spark, sf_dir, "documents"))


# Heavy-hitter contract: report every token whose corpus share
# exceeds HH_PHI, with EXACT counts. The sketch phase is complete
# for phi > 1.5/k (tracking + top-k displacement bound, see
# heavy_hitters_exact), so k = 1024 gives a 13x margin at phi=0.02.
HH_PHI = 0.02
HH_K = 1024


@query(
    "p_heavy_hitters_exact",
    oracle=f"""
    WITH t AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    f AS (SELECT tok FROM t WHERE tok != ''),
    tot AS (SELECT count(*) AS n FROM f)
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
           round(count(*) * 1.0 / (SELECT n FROM tot), 6) AS share
    FROM f
    GROUP BY tok
    HAVING count(*) > {HH_PHI} * (SELECT n FROM tot)
    """,
)
def p_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase exact heavy hitters: tokens holding > ``HH_PHI`` of
    the corpus, with EXACT counts — the contract ``p_vocab_topk``'s
    one-pass sketch cannot give (its counts are estimates outside
    the exact regime, and top-k membership under ties is
    engine-arbitrary; a share threshold is tie-stable).

    The classic candidate-then-verify plan (Misra-Gries candidates +
    exact count of candidates only): phase 1 runs the mergeable
    ``approx_top_k`` frequent-items sketch — one aggregation buffer
    of k entries per partition, NO token-keyed shuffle — which
    retains every token with share > 1.5/k (tracking bound 1/(2k)
    at maxItemsTracked = 2k, tightened for top-k displacement —
    derivation in ``heavy_hitters_exact``; Spark's implementation additionally
    post-filters to confidently-frequent survivors, returning far
    FEWER than k on long-tailed data — 10 candidates out of a 1M-key
    vocabulary in the 20M-token smoke, and still every planted item
    down to share 0.9/k in the boundary probe); phase 2
    re-scans and exact-counts ONLY the candidate tokens (broadcast
    semi-join, then a groupBy whose key cardinality is ≤ k, not
    |vocab|). At 100 TB the verify shuffle moves k counters per
    partition instead of the full vocabulary — that is the entire
    point — and the phi > 1.5/k completeness bound means no false
    negatives, ever. The planted-zipf pytest exercises the regime
    where the sketch genuinely prunes (vocab ≫ k); on TESTDATA's
    31-token vocabulary the candidate set is the whole vocabulary
    and the threshold does the filtering."""
    toks = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    return heavy_hitters_exact(toks, "tok", HH_PHI, k=HH_K)


def heavy_hitters_exact(
    df: DataFrame, col: str, phi: float, k: int = 1024
) -> DataFrame:
    """See ``p_heavy_hitters_exact``. Requires phi > 1.5/k.

    Why 1.5/k and not the tracking bound 1/(2k): the sketch TRACKS
    2k counters but RETURNS only the top k by estimated count, so a
    true > phi item must also survive displacement. If it is pushed
    out, ≥ k items carry estimates ≥ (phi − 1/(2k))·n; whether the
    sketch under-counts (Misra-Gries) or over-counts by ≤ n/(2k)
    (SpaceSaving), each such item has TRUE count ≥ (phi − 1/k)·n,
    and k of them plus the item itself need total mass
    > k·(phi − 1/k)·n ≥ n once phi > 2/k… tightening through the
    ±n/(2k) error band gives the binding constraint k·phi ≤ 3/2,
    i.e. displacement is impossible for phi > 1.5/k under either
    sketch family. (The original phi > 1/k guard covered tracking
    but left a silent false-negative window (1/k, 1.5/k] — caught
    in review.)"""
    if phi <= 1.5 / k:
        raise ValueError(
            f"heavy_hitters_exact: phi={phi} <= 1.5/k={1.5 / k:g} — "
            "the top-k candidate phase could displace a true heavy "
            "hitter (see docstring); raise k"
        )
    # ONE pass computes the sketch AND the grand total (a third
    # full scan just for count(*) is pure waste at scale); the
    # 1-row result is pinned so both downstream uses read the same
    # materialization instead of re-scanning.
    sk = df.selectExpr(
        f"approx_top_k({col}, {k}, {2 * k}) AS tk",
        "CAST(count(1) AS BIGINT) AS n",
    ).localCheckpoint(eager=True)
    cand = sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias(col)
    )
    exact = (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(sk.select("n")))
        .filter(F.col("cnt") > phi * F.col("n"))
        .select(
            col,
            "cnt",
            F.round(F.col("cnt") / F.col("n"), 6).alias("share"),
        )
    )


@query(
    "p_ccnet_buckets",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    cnt AS (
        SELECT tok, CAST(count(*) AS DOUBLE) AS c
        FROM toks GROUP BY tok),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks),
    scored AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
               round(avg(ln(c / t)), 6) AS avg_logp
        FROM toks JOIN cnt USING (tok) CROSS JOIN tot
        GROUP BY doc_id),
    b AS (
        SELECT d.lang, s.n_toks, s.avg_logp,
               ntile(3) OVER (PARTITION BY d.lang
                              ORDER BY s.avg_logp DESC, s.doc_id)
                   AS nt
        FROM scored s JOIN documents d USING (doc_id))
    SELECT lang,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           round(avg(avg_logp), 6) AS mean_logp
    FROM b GROUP BY lang, nt
    """,
)
def p_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split
    each language's documents into head/middle/tail thirds by their
    LM quality score (best scores = head) and report each bucket's
    doc/token mass — the selection recipe behind CCNet/RedPajama-V2
    ("train on head+middle, inspect tail"), composing the
    ``p_unigram_lm_score`` filter into the decision a curation run
    actually takes.

    The LM passes are the data-sized stages (same plan as the score
    operator); the per-lang ntile runs on the DOC-level scored frame
    — languages parallelize, and the ordering key is the ROUNDED
    score + doc_id, so tertile membership is deterministic
    cross-engine (unrounded LM sums differ by ulps). At 100 TB the
    per-lang sort becomes two broadcast approx-percentile boundaries
    per language (the ``q_histogram_equi_depth`` twin) with bucket
    assignment as a stateless CASE — same output contract."""
    scored = p_unigram_lm_score(spark, sf_dir)
    langs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    from pyspark.sql.window import Window

    j = scored.join(langs, "doc_id")
    nt = F.ntile(3).over(
        Window.partitionBy("lang").orderBy(
            F.col("avg_logp").desc(), F.col("doc_id")
        )
    )
    b = j.select("lang", "n_toks", "avg_logp", nt.alias("nt"))
    return (
        b.groupBy("lang", "nt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.round(F.avg("avg_logp"), 6).alias("mean_logp"),
        )
        .select(
            "lang",
            F.when(F.col("nt") == 1, "head")
            .when(F.col("nt") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            "n_docs",
            "n_tokens",
            "mean_logp",
        )
    )
