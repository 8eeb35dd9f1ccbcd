"""Content-defined-chunking substring dedup (p_dedup_spans_cdc):
planted-truth tests for arbitrary-offset detection — the property
fixed-chunk line dedup cannot provide."""

from __future__ import annotations

import random
import string
import tempfile

from matrixinversion_spark.pipeline.dedup import (
    CDC_MIN_CHUNK,
    CDC_MIN_SPAN,
    CDC_MOD,
    p_dedup_spans_cdc,
)


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(
        rng.choice(string.ascii_lowercase + " ") for _ in range(n)
    )


def _mean_chunk(text: str) -> float:
    """Replays the anchor scan + FastCDC min-size fold."""
    last, n_bounds = 1, 1
    for i in range(2, len(text) + 1):
        if (ord(text[i - 2]) * 131 + ord(text[i - 1])) % CDC_MOD == 0:
            if i - last >= CDC_MIN_CHUNK:
                last, n_bounds = i, n_bounds + 1
    return len(text) / n_bounds


def test_cdc_detects_offset_shifted_copy(spark):
    """A 400-char region copied into another doc at a DIFFERENT
    offset must be reported as a duplicated span in both docs,
    covering the region up to one partial chunk per edge."""
    rng = random.Random(7)
    shared = _rand_text(rng, 400)
    doc_a = _rand_text(rng, 120) + shared + _rand_text(rng, 90)
    doc_b = _rand_text(rng, 37) + shared + _rand_text(rng, 250)
    # distinct random docs: no cross-doc content
    noise = [(100 + i, _rand_text(rng, 300)) for i in range(6)]
    rows = [(0, doc_a), (1, doc_b)] + noise

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
            f"{td}/documents.parquet"
        )
        spans = p_dedup_spans_cdc(spark, td).collect()

    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)

    # slack: CDC span edges under-extend by up to one chunk per side
    slack = 4 * _mean_chunk(shared)
    for doc_id, off in ((0, 120), (1, 37)):
        assert doc_id in by_doc, f"doc {doc_id}: shared region missed"
        best = max(by_doc[doc_id], key=lambda r: r["span_len"])
        assert best["span_len"] >= 400 - slack
        assert best["span_start"] >= off + 1 - slack
        assert best["span_start"] + best["span_len"] <= off + 400 + slack

    # random noise docs must not produce >= CDC_MIN_SPAN spans
    for r in spans:
        assert r["doc_id"] in (0, 1), f"false positive in doc {r['doc_id']}"


def test_cdc_ignores_within_doc_repeats_and_short_overlap(spark):
    """Same-doc-only repeats are not cross-doc duplicates; overlaps
    shorter than CDC_MIN_SPAN are suppressed."""
    rng = random.Random(11)
    phrase = _rand_text(rng, 150)
    self_repeater = phrase + _rand_text(rng, 40) + phrase
    short = _rand_text(rng, 12)  # < CDC_MIN_SPAN even fully chunked
    doc_c = _rand_text(rng, 200) + short + _rand_text(rng, 200)
    doc_d = _rand_text(rng, 150) + short + _rand_text(rng, 260)
    rows = [(0, self_repeater), (1, doc_c), (2, doc_d)]

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
            f"{td}/documents.parquet"
        )
        spans = p_dedup_spans_cdc(spark, td).collect()

    assert spans == [], [tuple(r) for r in spans]
    assert CDC_MIN_SPAN > 12


def test_cdc_max_size_rule_recovers_anchor_deserts(spark):
    """FastCDC max-size rule (round 9): a shared region whose TAIL is
    an anchor desert (a char run where the rolling predicate never
    fires) must still be detected past the desert — without forced
    boundaries the desert joins one unbounded chunk that crosses into
    divergent context and its duplicated text silently vanishes."""
    from matrixinversion_spark.pipeline.dedup import CDC_MAX_CHUNK

    # 'q' never anchors against itself: (ord('q')*131 + ord('q')) % 16
    # != 0 — a 'q'-run of any length contains no interior anchor
    assert (ord("q") * 131 + ord("q")) % CDC_MOD != 0

    rng = random.Random(99)
    # region: 100 anchored chars, then a 200-char desert
    region = _rand_text(rng, 100) + "q" * 200
    doc_a = _rand_text(rng, 150) + region + _rand_text(rng, 150)
    doc_b = _rand_text(rng, 310) + region + _rand_text(rng, 60)
    rows = [(0, doc_a), (1, doc_b)] + [
        (i, _rand_text(rng, 400)) for i in range(2, 10)
    ]

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
            f"{td}/documents.parquet"
        )
        spans = p_dedup_spans_cdc(spark, td).collect()

    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # both docs report a span reaching deep into the desert: at least
    # region_len - CDC_MAX_CHUNK (the final fragment before the
    # region edge can still merge with divergent context)
    for doc_id, off in ((0, 150), (1, 310)):
        assert doc_id in by_doc, f"doc {doc_id}: desert region missed"
        end = max(
            r["span_start"] - 1 + r["span_len"] for r in by_doc[doc_id]
        )
        assert end >= off + 300 - CDC_MAX_CHUNK, (doc_id, end)
    # noise docs stay clean
    assert set(by_doc) == {0, 1}
