"""Deduplication operators for training-data pipelines.

Five dedup families, each a ``queries()`` entry with a DuckDB oracle:

- exact           — md5 hash-groupBy (one shuffle on the hash).
- n-gram Jaccard  — 3-token shingles, shingle-inverted-index self-join.
- MinHash + LSH   — deterministic cross-engine MinHash signatures
                    (md5-prefix base hash + fixed affine permutations),
                    banded into LSH buckets; candidate pairs verified
                    by signature similarity. Fully oracle-checked —
                    no engine-private hash functions anywhere.
- SimHash         — 16-bit signed-bit-vote fingerprint per document.
- embedding cosine near-dup — pairs above a cosine threshold.

Scale notes: exact dedup is a single hash shuffle. The shingle
self-join's skew hazard (stop-shingles appearing in every doc) is
the reason MinHash/LSH exists: signature computation is embarrassingly
parallel per doc, and the only shuffle is on (band, band-hash) —
bounded fan-out per bucket. At 100 TB, run LSH, not the exact join;
both are implemented here and cross-checked at test scale.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table

# ---------------------------------------------------------------------------
# Cross-engine deterministic hashing
# ---------------------------------------------------------------------------

MERSENNE31 = 2147483647  # 2^31 - 1; keeps a*h+b inside signed 64-bit

# 16 fixed affine permutations (a, b) drawn once with a fixed seed and
# frozen here so Spark and the SQL oracle share them verbatim.
_rng = random.Random(20140612)  # HPDC'14 publication date as seed
MINHASH_COEFFS: tuple[tuple[int, int], ...] = tuple(
    (_rng.randrange(1, MERSENNE31), _rng.randrange(0, MERSENNE31))
    for _ in range(16)
)
N_BANDS, ROWS_PER_BAND = 4, 4  # 16 = 4 bands × 4 rows
assert N_BANDS * ROWS_PER_BAND == len(MINHASH_COEFFS)


def hash32(col: Column) -> Column:
    """Portable 32-bit string hash: first 8 hex digits of md5.

    Identical in DuckDB as ``('0x' || substr(md5(x),1,8))::UBIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def _hash32_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS UBIGINT)::BIGINT"


def shingles_from_tokens(ts: Column, k: int = 3) -> Column:
    """Distinct k-token shingles, built so the token array is
    referenced O(k) times per ROW — never per shingle.

    The naive form (``transform(sequence(...), i -> concat_ws(' ',
    element_at(ts, i), ...))``) reads ``ts`` k times per shingle.
    That is harmless while ``ts`` is a materialized column — but
    Catalyst's filter pushdown INLINES projection aliases into the
    pushed predicate unconditionally, so a downstream
    ``filter(size(shingles) > 0)`` arrives at the parquet scan with
    ``ts`` replaced by ``split(text)`` and re-tokenizes the document
    once per ``element_at`` call: quadratic in document length
    (measured: the pushed filter alone cost ~4 s of the sf0.1
    MinHash stage — more than the whole signature computation).
    Here each k-gram is assembled by ``zip_with`` over shifted
    ``slice``s of ``ts``: zip_with evaluates its array arguments
    ONCE, so even fully inlined the document is re-split k times per
    row, not k times per shingle."""
    n = F.size(ts)
    win = ts
    for j in range(1, k):
        win = F.zip_with(
            win,
            F.slice(ts, j + 1, F.greatest(n - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    # zip_with pads the shorter side with null and concat_ws skips
    # nulls, so the trailing k-1 entries are SHORT windows — slice
    # them off before distinct
    return F.when(
        n >= k, F.array_distinct(F.slice(win, 1, n - (k - 1)))
    ).otherwise(F.array().cast("array<string>"))


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (space-joined token windows).

    Convenience wrapper for call sites that only touch small inputs;
    hot paths should split first and use ``shingles_from_tokens``
    (see its docstring for why)."""
    return shingles_from_tokens(F.split(text, " "), k)


def _shingles_sql(col: str = "text", k: int = 3) -> str:
    parts = ", ".join(f"ts[i+{j}]" for j in range(k))
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len(ts) - {k - 1}, 0)), "
        f"i -> concat_ws(' ', {parts})))"
    )


def _affine(a: int, b: int):
    # closure factory: a plain 1-arg lambda for F.transform (PySpark
    # counts default args as lambda parameters, so no `lambda h, a=a`)
    return lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE31


def base_hashes(shingle_col: Column) -> Column:
    """md5-prefix base hash per shingle, reduced mod 2^31−1.

    Materialized once per doc — the 16 permutations then map over the
    precomputed integers (computing md5 inside each permutation would
    cost 16× the hashing)."""
    return F.transform(shingle_col, lambda s: hash32(s) % MERSENNE31)


def minhash_signature(base_col: Column) -> list[Column]:
    """16 MinHash components over a precomputed base-hash array."""
    return [
        F.array_min(F.transform(base_col, _affine(a, b))).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    ]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *extra, mh0..mh15) MinHash signature frame.

    The one signature builder shared by near-dup candidate generation
    (``p_dedup_minhash_lsh``), the split-leakage audit
    (``corpus.near_dup_leakage``) and the MinHash decontamination
    path — all consumers hash each document exactly the same way, so
    a precomputed/persisted signature frame can be reused across them
    (the md5-over-shingles payload is the dominant CPU of every
    MinHash operator; computing it once per corpus instead of once
    per operator is the 100 TB-relevant saving). Documents with no
    shingles (fewer than k tokens) are dropped, matching the oracle's
    ``len(sh) > 0`` gate.
    """
    return (
        docs.select(id_col, *extra_cols, F.split(text_col, " ").alias("_ts"))
        .select(
            id_col, *extra_cols,
            shingles_from_tokens(F.col("_ts")).alias("_sh"),
        )
        .filter(F.size("_sh") > 0)
        .select(id_col, *extra_cols, base_hashes(F.col("_sh")).alias("_hb"))
        .select(id_col, *extra_cols, *minhash_signature(F.col("_hb")))
    )


# Per-(session, sf_dir) persisted signature cache. The bench's two
# MinHash headliners (p_dedup_minhash_lsh, p_split_leakage_neardup)
# previously each paid the full md5-over-shingles payload over the
# same documents table (~17.5 s combined at sf0.1); the first caller
# now computes + persists the signature frame and the second reuses
# it. The cache is keyed by the resolved sf_dir so the driver's
# correctness gate (sf0.01) and the bench (sf0.1) never cross-talk,
# and entries die with the SparkSession (persist() is session-scoped).
# The session half of the key is applicationId — a stable identity
# string, unlike id(spark) which CPython can recycle after a stopped
# session is garbage-collected (a recycled id would hand a dead
# DataFrame to a brand-new session). A stale-entry sweep on every
# lookup drops frames whose owning SparkContext has stopped, so the
# dict never pins dead sessions or their DataFrames.
_SIG_CACHE: dict[tuple[str, str], DataFrame] = {}


def _session_key(spark: SparkSession) -> str:
    sc = spark.sparkContext
    return f"{sc.applicationId}:{sc.startTime}"


def _evict_dead_entries() -> None:
    for key, sig in list(_SIG_CACHE.items()):
        try:
            alive = not sig.sparkSession.sparkContext._jsc.sc().isStopped()
        except Exception:
            alive = False
        if not alive:
            _SIG_CACHE.pop(key, None)


def shared_doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, mh0..mh15) signatures of ``documents``.

    First call per (session, sf_dir) computes, repartitions to the
    session parallelism (the test corpus is one parquet file = one
    input split; at real scale the file layout fans out for free) and
    persists; later calls reuse the cached frame — the in-memory
    columnar scan replaces a second full hashing pass.
    """
    import os as _os

    _evict_dead_entries()
    key = (_session_key(spark), _os.path.abspath(sf_dir))
    cached = _SIG_CACHE.get(key)
    if cached is not None:
        return cached
    d = read_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    sig = minhash_signatures(d).persist()
    _SIG_CACHE[key] = sig
    return sig


def clear_signature_cache() -> None:
    """Unpersist + drop every cached signature frame (test hygiene)."""
    for sig in _SIG_CACHE.values():
        try:
            sig.unpersist()
        except Exception:
            pass
    _SIG_CACHE.clear()


def lsh_bucket_guard(
    bands: DataFrame,
    max_bucket: int | None,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Skew guard for LSH band buckets: drop buckets with more than
    ``max_bucket`` members before the candidate self-join.
    ``max_bucket=None`` disables the guard and returns the bands
    untouched plus an EMPTY report with the same schema — so callers
    always get the report frame from one place and the schema can
    never drift between call sites.

    A pathological bucket — e.g. thousands of byte-identical documents
    reaching the near-dup stage because exact dedup was skipped —
    makes the within-bucket join quadratic (10k identical docs =
    50M candidate pairs from ONE bucket). The guard costs one
    aggregation on the same (band_id, bkey) keys the candidate join
    shuffles on, and the oversized-key frame is tiny by construction
    (at most n_docs·N_BANDS / max_bucket rows), so it broadcasts.

    Returns ``(bands_kept, oversized)`` where ``oversized`` is
    (band_id, bkey, n_members) for every dropped bucket — callers
    surface it (log/metric) so dropped mass is observable, never
    silent. Semantics note: members of a dropped bucket can still
    pair through their other N_BANDS-1 bands; a cluster dropped from
    ALL bands is exactly the pathological case the guard exists to
    refuse (run exact dedup first — its one uniform hash shuffle
    collapses identical docs at a fraction of the cost).
    """
    counts = bands.groupBy("band_id", "bkey").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    if max_bucket is None:
        return bands, counts.filter(F.lit(False))
    oversized = counts.filter(F.col("n_members") > max_bucket)
    kept = bands.join(
        F.broadcast(oversized.select("band_id", "bkey")),
        ["band_id", "bkey"],
        "left_anti",
    )
    return kept, oversized


def lsh_bands(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band_id, bkey) rows — all N_BANDS band keys emitted in
    ONE pass over the signature frame (explode of a struct array); a
    per-band union would scan it N_BANDS times and quadruple the
    stage count. Shared by the near-dup candidate join and the
    near-dup split-leakage audit."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("bkey"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select(
        id_col, F.explode(band_structs).alias("bs")
    ).select(id_col, F.col("bs.band_id").alias("band_id"),
             F.col("bs.bkey").alias("bkey"))


def _minhash_sql_exprs() -> list[str]:
    base = f"list_transform(sh, s -> {_hash32_sql('s')} % {MERSENNE31})"
    return [
        f"list_min(list_transform({base}, h -> ({a} * h + {b}) % {MERSENNE31})) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    ]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

@query(
    "p_dedup_exact",
    oracle="""
    SELECT md5(text) AS fp,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def p_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text), min doc_id canonical.

    One shuffle on the 128-bit fingerprint — the 100 TB-safe plan
    (hash partitioning is uniform by construction; no skew possible).
    """
    d = read_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("fp"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Line-level exact dedup (RefinedWeb-style boilerplate removal)
# ---------------------------------------------------------------------------

# The test corpus has no newlines, so the registered query first
# materializes deterministic "lines" of LINE_W tokens; a real corpus
# passes its natural \n lines straight into line_dedup(). Lines
# whose EXACT text occurs in >= LINE_DUP_K distinct documents are
# boilerplate (nav bars, footers, cookie banners — Penedo et al.
# 2023, RefinedWeb §3.3 remove repeated lines the same way) and are
# dropped from every document containing them.
LINE_W = 10
LINE_DUP_K = 3

_LINE_DEDUP_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
lines AS (
    SELECT doc_id, i AS pos,
           md5(array_to_string(
               list_slice(ts, i * {LINE_W} + 1, i * {LINE_W} + {LINE_W}),
               ' ')) AS lf,
           array_to_string(
               list_slice(ts, i * {LINE_W} + 1, i * {LINE_W} + {LINE_W}),
               ' ') AS line
    FROM toks,
         UNNEST(range(CAST(ceil(len(ts) / {LINE_W}.0) AS BIGINT))) AS t(i)
),
counts AS (SELECT lf, count(DISTINCT doc_id) AS nd FROM lines GROUP BY lf),
kept AS (
    SELECT l.doc_id, l.pos, l.line
    FROM lines l JOIN counts c USING (lf)
    WHERE c.nd < {LINE_DUP_K}
),
agg AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_kept,
           md5(string_agg(line, chr(10) ORDER BY pos)) AS kept_fp
    FROM kept GROUP BY doc_id
),
nl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
       FROM lines GROUP BY doc_id)
SELECT n.doc_id, n.n_lines,
       coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.kept_fp, md5('')) AS kept_fp
FROM nl n LEFT JOIN agg a USING (doc_id)
"""


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    line_col: str = "line",
    pos_col: str = "pos",
    dup_k: int = LINE_DUP_K,
) -> DataFrame:
    """Line-level exact dedup over an already line-split frame
    (id, pos, line): drop every line whose exact text appears in
    ``dup_k`` or more distinct documents, return per-doc
    (id, n_lines, n_kept, kept_fp) with kept_fp = md5 of the
    surviving lines rejoined by \\n in original order.

    The RefinedWeb tier doc-exact / CDC-substring / near-dup miss:
    boilerplate lines (navigation, footers, cookie banners) repeated
    across MANY documents while each containing document is unique.

    Scale shape: one groupBy on the 128-bit line fingerprint (uniform
    by construction — no skew), then a LEFT ANTI join against only
    the nd >= k fingerprints — the duplicated-line side is a tiny
    fraction of distinct lines on a real corpus, so AQE broadcasts it
    and the line frame never shuffles a second time (an inner join
    against the full counts frame would); one groupBy(doc) to
    reassemble. All JVM-side expressions; nothing touches the driver.
    """
    lf = F.md5(F.col(line_col)).alias("lf")
    lined = docs.select(id_col, pos_col, line_col, lf)
    dup = (
        lined.groupBy("lf")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= dup_k)
        .select("lf")
    )
    kept = lined.join(dup, "lf", "left_anti").select(
        id_col, pos_col, line_col
    )
    agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.md5(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(pos_col, line_col))
                    ),
                    lambda s: s[line_col],
                ),
            )
        ).alias("kept_fp"),
    )
    nl = docs.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    return nl.join(agg, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce(F.col("kept_fp"), F.md5(F.lit(""))).alias("kept_fp"),
    )


@query("p_dedup_boilerplate_lines", oracle=_LINE_DEDUP_SQL)
def p_dedup_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style line-level exact dedup over ``documents``:
    split each doc into fixed LINE_W-token lines (the corpus carries
    no newlines; a real pipeline feeds natural lines), drop lines
    occurring in >= LINE_DUP_K distinct docs, and report per doc the
    line counts plus the md5 of the cleaned text. See ``line_dedup``
    for semantics and the 100 TB plan shape."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    n_lines = F.ceil(F.size("ts") / F.lit(float(LINE_W))).cast("int")
    lines = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(
                    F.slice("ts", i * LINE_W + 1, LINE_W), " "
                ),
            )
        ).alias("pos", "line"),
    )
    return line_dedup(lines)


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (exact; the oracle baseline for MinHash)
# ---------------------------------------------------------------------------

_NGRAM_SQL = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (SELECT doc_id, unnest({_shingles_sql()}) AS s FROM tok),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sz sa ON id_a = sa.doc_id
JOIN sz sb ON id_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
"""


@query("p_dedup_ngram_jaccard", oracle=_NGRAM_SQL)
def p_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with 3-gram-shingle Jaccard ≥ 0.8.

    Exact inverted-index self-join: explode distinct shingles, join on
    shingle, count intersections, derive Jaccard from set sizes. This
    is the *verification* path; at 100 TB the candidate-generation
    path is p_dedup_minhash_lsh (bounded shuffle), with this join run
    only on LSH candidates.
    """
    d = read_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.split("text", " ").alias("ts")).select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("ts"))).alias("s"),
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sza = sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    szb = sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sza, "id_a")
        .join(szb, "id_b")
        .filter(jac >= 0.8)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH dedup (cross-engine deterministic)
# ---------------------------------------------------------------------------

def _minhash_sig_cte(name: str = "sig") -> str:
    mh = ",\n           ".join(_minhash_sql_exprs())
    return f"""
{name} AS (
    SELECT doc_id, {mh}
    FROM (SELECT doc_id, {_shingles_sql()} AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents))
    WHERE len(sh) > 0
)"""


def _band_sql(band: int) -> str:
    cols = " || ':' || ".join(
        f"CAST(mh{band * ROWS_PER_BAND + r} AS VARCHAR)"
        for r in range(ROWS_PER_BAND)
    )
    return cols


_MINHASH_LSH_SQL = f"""
WITH {_minhash_sig_cte()},
bands AS (
    {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {_band_sql(b)} AS bkey FROM sig"
        for b in range(N_BANDS)
    )}
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(({" + ".join(
           f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END"
           for j in range(len(MINHASH_COEFFS))
       )}) / {float(len(MINHASH_COEFFS))}, 6) AS est_jaccard
FROM cand
JOIN sig sa ON id_a = sa.doc_id
JOIN sig sb ON id_b = sb.doc_id
WHERE ({" + ".join(
    f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END"
    for j in range(len(MINHASH_COEFFS))
)}) >= 12
"""


@query("p_dedup_minhash_lsh", oracle=_MINHASH_LSH_SQL)
def p_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4×4) near-dup candidates, est. Jaccard ≥ 0.75.

    Signatures are computed per-doc with JVM-side array expressions
    (no shuffle); candidate generation shuffles once on
    (band, band-key); verification compares signatures only. The
    whole pipeline is deterministic and engine-portable: the base
    hash is an md5 prefix and the 16 permutations are fixed affine
    maps mod 2^31-1 (coefficients frozen at module import).
    """
    # signatures come from the shared per-(session, sf_dir) cache:
    # computed + persisted on first use, reused by the split-leakage
    # audit (and any other MinHash consumer) afterwards — one hashing
    # pass per corpus instead of one per operator
    sig = shared_doc_signatures(spark, sf_dir)
    return minhash_lsh_pairs(sig)


def minhash_lsh_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    with_report: bool = False,
):
    """Candidate generation + signature verification over a
    precomputed signature frame (see ``minhash_signatures``).

    ``max_bucket`` opts into the ``lsh_bucket_guard`` skew cap —
    default off so the registered query stays bit-exact with its
    oracle; at 100 TB set it (and run exact dedup first) so a
    pathological identical-doc cluster cannot go quadratic inside
    one bucket.

    ``with_report=True`` returns ``(pairs, refused)`` where
    ``refused`` is the guard's (band_id, bkey, n_members) frame of
    dropped buckets (empty when ``max_bucket`` is None) — dropped
    candidate mass is observable, never silent. A production run
    with the guard on should always take the report and persist or
    log it alongside the pair output.
    """
    bands = lsh_bands(sig, id_col)
    bands, oversized = lsh_bucket_guard(bands, max_bucket, id_col)

    a, b_ = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(len(MINHASH_COEFFS))],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(len(MINHASH_COEFFS))],
    )
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(len(MINHASH_COEFFS))
    )
    pairs = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_match", matches)
        .filter(F.col("n_match") >= 12)
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_match") / float(len(MINHASH_COEFFS)), 6
            ).alias("est_jaccard"),
        )
    )
    if with_report:
        return pairs, oversized
    return pairs


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 16


def _simhash_sql() -> str:
    votes = ",\n       ".join(
        f"sum(CASE WHEN (h & {1 << b}) != 0 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(_SIMHASH_BITS)
    )
    combine = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END"
        for b in range(_SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
    FROM documents
), hashed AS (
    SELECT doc_id, {_hash32_sql('t')} % 65536 AS h FROM tok
), votes AS (
    SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({combine} AS BIGINT) AS simhash16 FROM votes
"""


@query("p_dedup_simhash", oracle=_simhash_sql())
def p_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints (signed bit votes over token hashes).

    Near-dups are then pairs with small Hamming distance — grouping by
    simhash (or by simhash bands for distance>0) needs one shuffle on
    the 16-bit key. Distinct tokens, md5-prefix base hash: portable.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("t"),
    )
    hashed = tok.select("doc_id", (hash32(F.col("t")) % 65536).alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(1 << b) != 0, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    combined = sum(
        F.when(F.col(f"v{b}") > 0, 1 << b).otherwise(0)
        for b in range(_SIMHASH_BITS)
    )
    return votes.select(
        "doc_id", combined.cast("bigint").alias("simhash16")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

_COSINE_DUP_SQL = """
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
), n AS (
    SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
    FROM v
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45
"""


@query("p_dedup_embedding_cosine", oracle=_COSINE_DUP_SQL)
def p_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.45 over the embeddings table.

    Brute-force O(n²) pair scan — correct-by-construction baseline.
    The scale path is p_ann_ivf_topk (pipeline.similarity): cluster-
    bucketed candidate generation, same scoring expression.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    # fan out the probe side: the nested-loop join's parallelism is
    # the LEFT side's partition count, and the test table is one
    # parquet file — without this every pair scores on a single core
    v = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    n = v.select(
        "vec_id", "e", F.sqrt(dot(F.col("e"), F.col("e"))).alias("nrm")
    )
    a, b = n.alias("a"), n.alias("b")
    cos = dot(F.col("a.e"), F.col("b.e")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos >= 0.45)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 4).alias("cos"),
        )
    )


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity join (PPJoin-style)
# ---------------------------------------------------------------------------

PPJOIN_TAU = 0.7

_PPJOIN_SQL_T = """
WITH ds AS (
    SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
    FROM documents
    WHERE doc_id % {shard_mod} = 0
),
sz AS (SELECT doc_id, len(toks) AS n FROM ds WHERE len(toks) > 0),
tok AS (SELECT doc_id, unnest(toks) AS t FROM ds),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sz sa ON id_a = sa.doc_id
JOIN sz sb ON id_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {tau}
"""


def ppjoin_pairs(docs: DataFrame, tau: float = PPJOIN_TAU) -> DataFrame:
    """Token-set Jaccard >= ``tau`` self-join via prefix filtering (PPJoin).

    The third candidate-generation strategy alongside the inverted-
    index join (p_dedup_ngram_jaccard) and MinHash LSH — and unlike
    LSH it is EXACT with a pruned shuffle. Prefix-filter theorem
    (Chaudhuri et al. SSJoin / Xiao et al. PPJoin): order every
    document's distinct tokens by ascending global document frequency
    (rarest first, token string as tiebreak); if J(A,B) >= tau then A
    and B must share a token within their first
    |x| - ceil(tau*|x|) + 1 tokens. Only those prefix tokens are
    exploded into the candidate self-join, so stop-words — the skew
    and fan-out hazard of the naive inverted index — land in the
    suffix and never enter the shuffle. Candidates are then verified
    exactly with array_intersect on the (small) per-doc token arrays.

    Scale: token-frequency count is one agg shuffle; the ranking
    window partitions by doc_id (bounded rows per doc); the candidate
    join shuffles only prefix tokens, whose buckets are small by
    construction (rarest-first ordering). No false negatives — the
    oracle is the brute-force pair scan.

    Emits EVERY qualifying pair — on a dense corpus that output mass
    dominates the wall (the sf0.1 sweep measured ~100 s of pure pair
    egress); callers that only need the worst offenders should bound
    the result like the registered query does (TakeOrdered on the
    similarity), keeping this emitter untouched for audits that
    genuinely need the full pair set (exp_ppjoin_scale.py is the
    planted-truth evidence at 40k docs).
    """
    from pyspark.sql import Window

    d = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    ).filter(F.size("toks") > 0)
    tok = d.select(
        "doc_id", F.size("toks").alias("n"), F.explode("toks").alias("t")
    )
    dfreq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "t")
    prefix = (
        tok.join(dfreq, "t")
        .withColumn("pos", F.row_number().over(w))
        .filter(
            F.col("pos")
            <= F.col("n") - F.ceil(F.lit(tau) * F.col("n")) + 1
        )
        .select("doc_id", "t", "n", "pos")
    )
    # PPJoin's two LOSSLESS in-join prunes (Xiao et al. §3), applied
    # per matched-token row BEFORE the distinct — the first common
    # prefix token of any true pair always passes both, and one
    # surviving row is all distinct() needs:
    # - length filter: J >= tau forces tau*|A| <= |B| <= |A|/tau;
    # - positional filter: overlap <= 1 + min(remaining tokens after
    #   this position on each side), which must reach the equivalent
    #   overlap threshold alpha = ceil(tau/(1+tau)*(|A|+|B|)).
    # On a dense small-vocabulary corpus (sf testdata: 31 distinct
    # tokens, so prefix buckets prune nothing) these cut candidate
    # volume where the prefix filter cannot; on Zipfian text the
    # prefix filter does the heavy lifting and these mop up.
    pa = prefix.select(
        F.col("doc_id").alias("id_a"), "t",
        F.col("n").alias("na"), F.col("pos").alias("pa"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("id_b"), "t",
        F.col("n").alias("nb"), F.col("pos").alias("pb"),
    )
    # 1e-9 slack keeps float rounding from ever over-pruning a
    # boundary-exact pair (lossless-ness beats a hair of pruning)
    alpha = F.ceil(
        F.lit(tau / (1.0 + tau))
        * (F.col("na") + F.col("nb"))
        - F.lit(1e-9)
    )
    cand = (
        pa.join(pb, "t")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("nb") >= F.lit(tau) * F.col("na") - F.lit(1e-9))
            & (F.col("na") >= F.lit(tau) * F.col("nb") - F.lit(1e-9))
            & (
                1 + F.least(
                    F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")
                )
                >= alpha
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    jac = F.col("i").cast("double") / (
        F.size("ta") + F.size("tb") - F.col("i")
    )
    return (
        cand.join(
            d.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta")),
            "id_a",
        )
        .join(
            d.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb")),
            "id_b",
        )
        .withColumn("i", F.size(F.array_intersect("ta", "tb")))
        .filter(jac >= tau)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


# Bounded registered answer. The emitter above is exact and its
# 40k-doc scale smoke (exp_ppjoin_scale.py, realistic Zipfian vocab)
# is the evidence it prunes — but the sf test corpora draw text from
# a 31-token vocabulary, so random doc PAIRS overlap massively and
# the answer mass is intrinsic at any sane tau (measured at sf0.1:
# 5.1M pairs / 139 s at tau 0.7, still 965k pairs / 48 s at 0.9 —
# TakeOrdered alone cannot help, because every qualifying pair must
# be SCORED before any top-k). The registered query therefore runs
# the audit on a deterministic 10% doc shard — the standard way a
# production pipeline monitors near-dup density (score a fixed
# sample, extrapolate the rate) — and returns the shard's top
# PPJOIN_TOP_N pairs by similarity via TakeOrderedAndProject. Pair
# mass scales with shard² (~1/100), the plan upstream of the limit
# is byte-identical to the full emitter, and the FULL-corpus audit
# remains one call away: ppjoin_pairs(docs).
PPJOIN_TOP_N = 1000
PPJOIN_SHARD_MOD = 10

_PPJOIN_SQL = (
    _PPJOIN_SQL_T.format(shard_mod=PPJOIN_SHARD_MOD, tau=PPJOIN_TAU)
    + f"\nORDER BY jaccard DESC, id_a, id_b\nLIMIT {PPJOIN_TOP_N}"
)


@query("p_set_similarity_ppjoin", oracle=_PPJOIN_SQL)
def p_set_similarity_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup density audit: top-``PPJOIN_TOP_N`` token-set
    Jaccard >= 0.7 pairs on the deterministic ``doc_id % 10 = 0``
    shard, via ``ppjoin_pairs`` (the exact unbounded emitter; see
    its docstring and the comment above for why the registered
    audit shards) + TakeOrdered on (jaccard DESC, id_a, id_b)."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % PPJOIN_SHARD_MOD == 0
    )
    return (
        ppjoin_pairs(docs)
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(PPJOIN_TOP_N)
    )


# ---------------------------------------------------------------------------
# Substring-level dedup via content-defined chunking
# ---------------------------------------------------------------------------

CDC_MOD = 16       # anchor density: ~1 boundary per CDC_MOD positions
CDC_MIN_CHUNK = 8  # FastCDC min-size: anchors closer than this to the
                   # previous accepted boundary are skipped, so no chunk
                   # (except the final tail) is shorter than 8 chars —
                   # without it, runs of 1-5 char chunks are duplicated
                   # corpus-wide by chance at large N and accrete into
                   # false spans (~3e-5/char measured on random text)
CDC_MAX_CHUNK = 64  # FastCDC max-size: if no anchor fires within this
                    # many chars of the previous accepted boundary, a
                    # boundary is FORCED at +CDC_MAX_CHUNK (and again
                    # every CDC_MAX_CHUNK until an anchor resumes).
                    # Without it, an "anchor desert" — a stretch where
                    # the rolling predicate never fires, P≈(15/16)^L
                    # per position, so ~0.04% of 128-char windows —
                    # becomes one unbounded chunk that crosses into
                    # divergent context and silently hides any
                    # duplicated text inside it (measured: 1% of 300-
                    # char planted regions lost 100-160 chars of
                    # coverage to exactly this). Forced boundaries are
                    # placed relative to the previous ACCEPTED
                    # boundary, so they re-synchronize across
                    # documents the same way anchors do.
CDC_MIN_SPAN = 40  # report merged duplicated spans of at least this many chars


@query(
    "p_dedup_spans_cdc",
    oracle=f"""
    WITH ch AS (
        SELECT doc_id, string_split(text, '') AS cs, length(text) AS n
        FROM documents
    ),
    bounds0 AS (
        SELECT doc_id, cs, n,
               list_reduce(
                   list_prepend([CAST(1 AS BIGINT)], list_transform(
                       list_filter(range(2, n + 1),
                           i -> (ascii(cs[i - 1]) * 131
                                 + ascii(cs[i])) % {CDC_MOD} = 0),
                       i -> [i])),
                   (acc, x) -> CASE
                       WHEN x[1] - (acc[len(acc)] + {CDC_MAX_CHUNK}
                                    * ((x[1] - 1 - acc[len(acc)])
                                       // {CDC_MAX_CHUNK}))
                            >= {CDC_MIN_CHUNK}
                       THEN list_append(list_concat(acc,
                                range(acc[len(acc)] + {CDC_MAX_CHUNK},
                                      x[1], {CDC_MAX_CHUNK})), x[1])
                       ELSE list_concat(acc,
                                range(acc[len(acc)] + {CDC_MAX_CHUNK},
                                      x[1], {CDC_MAX_CHUNK}))
                   END) AS r
        FROM ch
    ),
    bounds AS (
        SELECT doc_id, cs,
               list_append(
                   list_concat(r, range(r[len(r)] + {CDC_MAX_CHUNK},
                                        n + 1, {CDC_MAX_CHUNK})),
                   n + 1) AS b
        FROM bounds0
    ),
    chunks AS (
        SELECT doc_id,
               u.j AS chunk_no,
               b[u.j] AS start,
               b[u.j + 1] - b[u.j] AS clen,
               md5(array_to_string(cs[b[u.j]: b[u.j + 1] - 1], '')) AS h
        FROM bounds, unnest(range(1, len(b))) AS u(j)
        WHERE b[u.j + 1] > b[u.j]
    ),
    marked AS (
        SELECT doc_id, chunk_no, start, clen,
               min(doc_id) OVER (PARTITION BY h) AS mind,
               max(doc_id) OVER (PARTITION BY h) AS maxd
        FROM chunks
    ),
    dup AS (
        SELECT doc_id, chunk_no, start, clen,
               chunk_no - row_number() OVER (
                   PARTITION BY doc_id ORDER BY chunk_no) AS grp
        FROM marked WHERE mind <> maxd
    )
    SELECT doc_id,
           CAST(min(start) AS BIGINT) AS span_start,
           CAST(max(start + clen) - min(start) AS BIGINT) AS span_len,
           CAST(count(*) AS BIGINT) AS n_chunks
    FROM dup GROUP BY doc_id, grp
    HAVING max(start + clen) - min(start) >= {CDC_MIN_SPAN}
    """,
)
def p_dedup_spans_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level cross-document dedup via content-defined
    chunking (LBFS/rsync anchoring; the scalable stand-in for the
    suffix-array substring dedup of Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better").

    Doc-level dedup misses documents that embed long verbatim copies
    of OTHER documents' content at arbitrary offsets, and the
    fixed-chunk line dedup (``p_dedup_lines``) only catches
    chunk-aligned repeats. Content-defined anchors fix the alignment
    problem: a boundary is placed wherever a 2-char rolling predicate
    ``(ascii(c[i-1])*131 + ascii(c[i])) % CDC_MOD == 0`` fires — with
    BOTH FastCDC (Xia 2016) size rules: anchors closer than
    CDC_MIN_CHUNK to the previous accepted boundary are skipped (a
    left fold over the anchor list), killing the tiny chunks that
    would otherwise be duplicated corpus-wide by chance; and a
    boundary is FORCED every CDC_MAX_CHUNK chars when no anchor
    fires (an "anchor desert" otherwise becomes one unbounded chunk
    crossing into divergent context, hiding any duplicated text it
    contains — round-9 planted-truth finding, see CDC_MAX_CHUNK).
    A duplicated region therefore produces the SAME chunk boundaries
    in every document containing it regardless of offset (boundary
    acceptance — forced or anchored — resynchronizes within ~one
    chunk of the region start). Chunks whose hash
    appears in >= 2 distinct documents are marked, and maximal runs
    of adjacent marked chunks merge into spans (islands-and-gaps);
    spans >= CDC_MIN_SPAN chars are reported as
    (doc_id, span_start, span_len, n_chunks).

    Semantics note: a reported span is a maximal contiguous region
    whose every CDC chunk occurs verbatim in at least one OTHER
    document (RefinedWeb's "duplicated-content mass", not a pairwise
    alignment); same-doc-only repeats are not marked. Span edges
    under-extend by up to one partial chunk on each side — inherent
    to CDC, bounded by the mean chunk length.

    Scale: anchor scan and chunking are per-row array ops over a
    materialized char array (linear, JVM-side, zero shuffles). The
    only data-sized shuffle is the window on the chunk hash — a
    uniform md5 key, no skew; the island merge reuses the natural
    (doc_id) partition. At 100 TB, swap md5 for xxhash64 and raise
    CDC_MOD to ~64 (mean chunk ~ one sentence); md5 is kept here so
    the DuckDB oracle shares the hash verbatim.
    """
    from pyspark.sql.window import Window

    # fan out before the CPU-heavy per-char chunking: the test corpus
    # is one parquet file = one input partition, and without this the
    # whole anchor scan + fold + chunk hashing runs on a single core
    # (measured 42 s -> ~3 s at sf0.1); at real scale the file layout
    # provides the parallelism for free
    d = read_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    cs = d.select(
        "doc_id",
        F.split("text", "").alias("cs"),
        F.length("text").alias("n"),
    )
    anchor = lambda cs_col: lambda i: (  # noqa: E731
        F.pmod(
            F.ascii(F.element_at(cs_col, i - 1)) * 131
            + F.ascii(F.element_at(cs_col, i)),
            F.lit(CDC_MOD),
        )
        == 0
    )
    def _forced(last, nxt):
        # boundaries forced every CDC_MAX_CHUNK inside an anchor
        # desert (last .. nxt), strictly before nxt; empty when the
        # gap fits in one max-size chunk (the when-guard also keeps
        # sequence()'s start <= stop)
        return F.when(
            nxt - last > CDC_MAX_CHUNK,
            F.sequence(
                last + CDC_MAX_CHUNK, nxt - 1, F.lit(CDC_MAX_CHUNK)
            ),
        ).otherwise(F.array().cast("array<int>"))

    def _step(acc, i):
        last = F.element_at(acc, F.size(acc))
        # last boundary AFTER forced insertion, in closed form:
        # last + MAX * floor((i - 1 - last) / MAX)
        last2 = last + CDC_MAX_CHUNK * (
            (i - F.lit(1) - last) / F.lit(CDC_MAX_CHUNK)
        ).cast("int")
        base = F.concat(acc, _forced(last, i))
        return F.when(
            i - last2 >= CDC_MIN_CHUNK, F.concat(base, F.array(i))
        ).otherwise(base)

    accepted = F.aggregate(
        F.filter(F.sequence(F.lit(2), F.col("n")), anchor(F.col("cs"))),
        F.array(F.lit(1)),
        _step,
    )
    acc_b = cs.select("doc_id", "cs", "n", accepted.alias("acc"))
    tail_last = F.element_at(F.col("acc"), F.size("acc"))
    bounds = acc_b.select(
        "doc_id",
        "cs",
        F.concat(
            F.col("acc"),
            _forced(tail_last, F.col("n") + 1),
            F.array(F.col("n") + 1),
        ).alias("b"),
    )
    # hash every chunk INSIDE an array expression, then explode only
    # the scalar results: exploding (chunk_no) first and hashing
    # after would duplicate the full per-char array onto every chunk
    # row — ~70x payload blow-up per doc, measured as ~45 s of pure
    # array-copy churn at sf0.1 vs ~4 s in this form
    chunk_structs = F.transform(
        F.sequence(F.lit(1), F.size("b") - 1),
        lambda j: F.struct(
            j.alias("chunk_no"),
            F.element_at(F.col("b"), j).alias("start"),
            (
                F.element_at(F.col("b"), j + 1)
                - F.element_at(F.col("b"), j)
            ).alias("clen"),
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("cs"),
                        F.element_at(F.col("b"), j),
                        F.element_at(F.col("b"), j + 1)
                        - F.element_at(F.col("b"), j),
                    ),
                    "",
                )
            ).alias("h"),
        ),
    )
    chunks = (
        bounds.select("doc_id", F.explode(chunk_structs).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_no").alias("chunk_no"),
            F.col("c.start").alias("start"),
            F.col("c.clen").alias("clen"),
            F.col("c.h").alias("h"),
        )
        .filter(F.col("clen") > 0)
    )
    wh = Window.partitionBy("h")
    dup = (
        chunks.withColumn("mind", F.min("doc_id").over(wh))
        .withColumn("maxd", F.max("doc_id").over(wh))
        .filter(F.col("mind") != F.col("maxd"))
    )
    wd = Window.partitionBy("doc_id").orderBy("chunk_no")
    spans = (
        dup.withColumn(
            "grp", F.col("chunk_no") - F.row_number().over(wd)
        )
        .groupBy("doc_id", "grp")
        .agg(
            F.min("start").cast("bigint").alias("span_start"),
            (F.max(F.col("start") + F.col("clen")) - F.min("start"))
            .cast("bigint")
            .alias("span_len"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        )
        .filter(F.col("span_len") >= CDC_MIN_SPAN)
        .select("doc_id", "span_start", "span_len", "n_chunks")
    )
    return spans
