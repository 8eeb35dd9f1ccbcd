"""Round-10 extension operators: Spearman rank correlation,
Adamic-Adar link prediction, two-phase exact heavy hitters, and
DSIR-style importance selection.

Each test plants a tiny dataset whose answer is computable by hand
(or by an independent pandas/numpy formulation), so the operators are
verified against ground truth independent of the DuckDB oracle gate.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# q_spearman_corr
# ---------------------------------------------------------------------------


def test_spearman_matches_pandas_midranks(spark, tmp_path):
    """The REGISTERED query (driven on a planted lineitem parquet,
    ties included) == pandas rank(method='average') + Pearson on the
    ranks — scipy's spearmanr definition."""
    rows = [
        ("g1", 1.0, 10.0), ("g1", 2.0, 9.0), ("g1", 2.0, 8.0),
        ("g1", 3.0, 8.0), ("g1", 5.0, 1.0), ("g1", 5.0, 2.0),
        ("g2", 1.0, 1.0), ("g2", 2.0, 4.0), ("g2", 3.0, 9.0),
        ("g2", 4.0, 16.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    exp = {}
    for g, sub in pdf.groupby("l_returnflag"):
        rx = sub["l_quantity"].rank(method="average")
        ry = sub["l_extendedprice"].rank(method="average")
        exp[g] = rx.corr(ry)  # Pearson on midranks == Spearman

    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf}/lineitem.parquet")
    from matrixinversion_spark.relational.infostats import (
        q_spearman_corr,
    )

    got = {r.flag: r for r in q_spearman_corr(spark, sf).collect()}
    assert set(got) == set(exp)
    for g, r in got.items():
        assert r.n == len(pdf[pdf.l_returnflag == g])
        assert r.rho == pytest.approx(exp[g], abs=1e-6)


def test_spearman_registered_query_bounds(spark):
    from matrixinversion_spark.relational.infostats import (
        q_spearman_corr,
    )

    out = q_spearman_corr(spark, SF_DIR).collect()
    assert len(out) == 3  # A/N/R return flags
    # rho is NULL for a degenerate (constant-x or constant-y) group —
    # assert that case explicitly instead of letting the comparison
    # raise TypeError (ADVICE r10), mirroring the hypothesis test's
    # degenerate-group handling; and require at least one real rho so
    # an all-NULL regression can't pass vacuously.
    non_null = [r for r in out if r.rho is not None]
    assert non_null, "every return-flag group degenerate — unexpected"
    for r in non_null:
        assert -1.0 <= r.rho <= 1.0
    # group sizes cover the whole table exactly once
    from matrixinversion_spark.session import read_table

    total = read_table(spark, SF_DIR, "lineitem").count()
    assert sum(r.n for r in out) == total


# ---------------------------------------------------------------------------
# q_link_prediction
# ---------------------------------------------------------------------------


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["u", "v"])
    )


def test_link_prediction_hand_graph(spark):
    """Square 1-2-4-3-1 plus center 5 adjacent to all four corners.

    Non-adjacent corner pairs (1,4) and (2,3) each share two corner
    neighbors plus the center: cn=3, aa = 2/ln(3) + 1/ln(4)
    (corner degree 3, center degree 4)."""
    from matrixinversion_spark.relational.mining import (
        link_prediction_scores,
    )

    edges = _edges_df(
        spark,
        [(1, 2), (3, 4), (1, 3), (2, 4),
         (1, 5), (2, 5), (3, 5), (4, 5)],
    )
    out = {
        (r.u, r.v): r
        for r in link_prediction_scores(edges, min_common=1).collect()
    }
    assert set(out) == {(1, 4), (2, 3)}
    expect_aa = round(2 / math.log(3) + 1 / math.log(4), 6)
    for key in out:
        assert out[key].common_neighbors == 3
        assert out[key].adamic_adar == pytest.approx(
            expect_aa, abs=1e-6
        )


def test_link_prediction_max_degree_guard(spark):
    """Star graph: every wedge passes through the hub. Capping the
    hub's degree removes all candidates — the skew guard's bound in
    action (no middle above the cap contributes wedges)."""
    from matrixinversion_spark.relational.mining import (
        link_prediction_scores,
    )

    star = _edges_df(spark, [(0, i) for i in range(1, 8)])
    full = link_prediction_scores(star, min_common=1).collect()
    assert len(full) == 7 * 6 // 2  # all leaf pairs via the hub
    guarded = link_prediction_scores(
        star, min_common=1, max_degree=3
    ).collect()
    assert guarded == []


def test_link_prediction_excludes_existing_edges(spark):
    """Triangle + pendant: (1,2),(2,3),(1,3),(3,4). The only
    ≥1-common-neighbor non-adjacent pairs are (1,4) and (2,4)
    through 3; adjacent pairs never appear."""
    from matrixinversion_spark.relational.mining import (
        link_prediction_scores,
    )

    edges = _edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    out = link_prediction_scores(edges, min_common=1).collect()
    assert {(r.u, r.v) for r in out} == {(1, 4), (2, 4)}


# ---------------------------------------------------------------------------
# p_heavy_hitters_exact
# ---------------------------------------------------------------------------


def test_heavy_hitters_planted_zipf(spark):
    """Vocabulary (3000 distinct) far exceeds the sketch size
    (k=64), so the candidate phase genuinely prunes — and the
    phi > 1/k completeness bound still surfaces every planted heavy
    token with its EXACT count."""
    from matrixinversion_spark.pipeline.text import (
        heavy_hitters_exact,
    )

    heavy = {"alpha": 900, "beta": 500, "gamma": 300}
    rows = [(t,) for t, c in heavy.items() for _ in range(c)]
    rows += [(f"tail{i}",) for i in range(3000) for _ in range(2)]
    n = len(rows)
    df = spark.createDataFrame(rows, ["tok"]).repartition(8)
    out = {
        r.tok: (r.cnt, r.share)
        for r in heavy_hitters_exact(df, "tok", 0.03, k=64).collect()
    }
    expect = {t: c for t, c in heavy.items() if c > 0.03 * n}
    assert {t: c for t, (c, _) in out.items()} == expect
    for t, (c, share) in out.items():
        assert share == pytest.approx(c / n, abs=1e-6)


def test_heavy_hitters_rejects_uncovered_phi(spark):
    from matrixinversion_spark.pipeline.text import (
        heavy_hitters_exact,
    )

    df = spark.createDataFrame([("a",)], ["tok"])
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters_exact(df, "tok", 0.001, k=64)


# ---------------------------------------------------------------------------
# p_dsir_select
# ---------------------------------------------------------------------------


def test_dsir_selects_target_like_docs(spark, tmp_path):
    """Planted corpus: target-language docs use one vocabulary,
    off-target docs another, and two off-target docs WRITTEN in the
    target's vocabulary. DSIR must rank every target-vocab doc
    (whatever its label) above every off-vocab doc — the whole point
    of importance weighting is scoring CONTENT, not labels."""
    import matrixinversion_spark.pipeline.curation as cur

    tgt_text = "high quality prose reads like this every time"
    off_text = "spam spam noise noise junk junk filler filler pad"
    rows = []
    for i in range(20):
        rows.append((i, tgt_text, "en", "s", len(tgt_text)))
    for i in range(20, 40):
        rows.append((i, off_text, "zh", "s", len(off_text)))
    # mislabeled: target-like content, off-target label
    rows.append((98, tgt_text, "zh", "s", len(tgt_text)))
    rows.append((99, tgt_text, "zh", "s", len(tgt_text)))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf}/documents.parquet")
    out = cur.p_dsir_select(spark, sf).collect()
    assert len(out) == cur.DSIR_TOP_K
    selected = {r.doc_id for r in out}
    # all 22 target-vocab docs (including both mislabeled ones)
    # outrank every off-vocab doc
    assert {98, 99} <= selected
    tgt_vocab_ids = set(range(20)) | {98, 99}
    off_ranks = [
        i for i, r in enumerate(out) if r.doc_id not in tgt_vocab_ids
    ]
    tgt_ranks = [
        i for i, r in enumerate(out) if r.doc_id in tgt_vocab_ids
    ]
    assert max(tgt_ranks) < min(off_ranks or [len(out)])


def test_dsir_weight_sign_on_registry_data(spark):
    """On TESTDATA the selected docs skew toward the target lang
    (their feature mix looks more like the en slice than the
    corpus average)."""
    import matrixinversion_spark.pipeline.curation as cur

    out = cur.p_dsir_select(spark, SF_DIR).collect()
    assert len(out) == cur.DSIR_TOP_K
    n_en = sum(1 for r in out if r.lang == "en")
    # compute the en base rate from the table at test time instead of
    # hardcoding the current fixture's ~0.44 (ADVICE r10): a fixture
    # regeneration shifts the rate without a real operator regression
    from matrixinversion_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents")
    base_rate = (
        docs.filter(docs.lang == "en").count() / docs.count()
    )
    assert n_en > base_rate * len(out)
