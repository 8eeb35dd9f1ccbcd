"""Property-based fuzzing of three long-standing core operators
against independent sequential references on RANDOM inputs — the
operators' fixture tests pin hand-picked cases; these pin the algebra
for arbitrary data (the round-10 fuzz suite caught one real bug this
way, so the older operator tiers earn the same treatment).

Targets chosen for subtle boundary semantics that fixtures
under-sample:
- ``asof_join`` vs ``pandas.merge_asof`` (exact-ts inclusivity,
  no-match NULL rows, interleaved keys);
- ``prefix_sum`` vs a pandas cumsum (partition-boundary offsets,
  multi-column sharing one shuffle, grand totals);
- ``connected_components`` vs a pure-Python union-find (pointer
  jumping on random — not chain-shaped — graphs).

Spark round-trips cost ~1 s per example, so example counts are small
(5-6 distributed examples per property).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SPARK_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# asof_join vs pandas.merge_asof
# ---------------------------------------------------------------------------


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_left=st.integers(min_value=1, max_value=60),
    n_right=st.integers(min_value=0, max_value=60),
    n_keys=st.integers(min_value=1, max_value=5),
)
def test_asof_join_matches_pandas_merge_asof(
    spark, seed, n_left, n_right, n_keys
):
    """Backward inclusive as-of: for every left row, the matched
    right payload equals pandas ``merge_asof(by=key,
    direction='backward')`` — including exact-timestamp matches and
    NULLs for match-less rows. Right (key, ts) pairs are unique
    (both engines' tie order among equal right timestamps is
    unspecified otherwise)."""
    from matrixinversion_spark.relational.asof import asof_join

    rng = np.random.default_rng(seed)
    left_pd = pd.DataFrame(
        {
            "lid": np.arange(n_left, dtype=np.int64),
            "k": rng.integers(0, n_keys, n_left).astype(np.int64),
            "ts": rng.integers(0, 40, n_left).astype(np.int64),
        }
    )
    right_pd = (
        pd.DataFrame(
            {
                "k": rng.integers(0, n_keys, n_right).astype(np.int64),
                "ts": rng.integers(0, 40, n_right).astype(np.int64),
            }
        )
        .drop_duplicates(["k", "ts"])
        .reset_index(drop=True)
    )
    # payload globally unique so the expected matched-ts lookup below
    # (by payload) is unambiguous — a random payload could collide
    # within a key and flag a CORRECT asof result as wrong
    right_pd["payload"] = np.arange(len(right_pd), dtype=np.int64) + 100

    left = spark.createDataFrame(left_pd)
    # explicit schema: an empty right frame (a legal as-of input —
    # every left row must come back NULL-matched) has no rows to
    # infer from
    right = spark.createDataFrame(
        right_pd, "k long, ts long, payload long"
    )
    got = {
        r.lid: (r.payload_right, r.ts_right)
        for r in asof_join(left, right, on=["k"], ts="ts").collect()
    }

    expect_pd = pd.merge_asof(
        left_pd.sort_values(["ts", "lid"], kind="stable"),
        right_pd.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
        suffixes=("", "_right"),
    )
    assert len(got) == n_left  # LEFT OUTER: every left row present
    for row in expect_pd.itertuples():
        g_payload, g_ts = got[row.lid]
        if pd.isna(row.payload):
            assert g_payload is None and g_ts is None
        else:
            assert g_payload == int(row.payload)
            # matched right ts: payloads are globally unique, so this
            # reconstruction is exact
            m = right_pd[right_pd.payload == int(row.payload)]
            assert g_ts == int(m.ts.iloc[0])


# ---------------------------------------------------------------------------
# prefix_sum vs pandas cumsum
# ---------------------------------------------------------------------------


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n=st.integers(min_value=1, max_value=200),
    n_parts=st.integers(min_value=1, max_value=8),
)
def test_prefix_sum_matches_pandas_cumsum(spark, seed, n, n_parts):
    """The distributed running total (range repartition + in-partition
    scan + driver-folded partition offsets) equals a sequential
    cumsum for ANY partition count, including n_parts > n and
    negative values; the multi-column form shares the shuffle, and
    grand_total_col equals the plain sum."""
    from matrixinversion_spark.relational.profiling import prefix_sum

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "a": rng.integers(-50, 50, n).astype(np.int64),
            "b": rng.integers(-5, 5, n).astype(np.int64),
        }
    )
    # scatter the input across tasks so the range shuffle does work
    df = spark.createDataFrame(pdf).repartition(4)
    out = prefix_sum(
        df,
        order_cols=[F.col("id")],
        value_col=["a", "b"],
        out_col=["cum_a", "cum_b"],
        n_parts=n_parts,
        grand_total_col=["tot_a", "tot_b"],
    )
    got = {r.id: r for r in out.collect()}
    ref = pdf.sort_values("id")
    ca, cb = ref.a.cumsum(), ref.b.cumsum()
    for i, rid in enumerate(ref.id):
        assert got[rid].cum_a == ca.iloc[i]
        assert got[rid].cum_b == cb.iloc[i]
        assert got[rid].tot_a == int(pdf.a.sum())
        assert got[rid].tot_b == int(pdf.b.sum())


# ---------------------------------------------------------------------------
# connected_components vs union-find
# ---------------------------------------------------------------------------


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    groups: dict[int, set[int]] = {}
    touched = {u for e in edges for u in e}
    for x in touched:
        groups.setdefault(find(x), set()).add(x)
    return groups


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_nodes=st.integers(min_value=2, max_value=40),
    n_edges=st.integers(min_value=1, max_value=80),
)
def test_connected_components_matches_union_find(
    spark, seed, n_nodes, n_edges
):
    """Min-label CC with pointer jumping on RANDOM graphs (the
    fixture tests use chains): every vertex's label equals the
    minimum vertex id of its union-find component."""
    from matrixinversion_spark.pipeline.curation import (
        connected_components,
    )

    rng = np.random.default_rng(seed)
    pairs = [
        (int(u), int(v))
        for u, v in zip(
            rng.integers(0, n_nodes, n_edges),
            rng.integers(0, n_nodes, n_edges),
        )
        if u != v
    ]
    if not pairs:
        pairs = [(0, 1)]
    e = spark.createDataFrame(pairs, "u long, v long")
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels, _rounds = connected_components(sym)
    got = {r.doc_id: r.label for r in labels.collect()}
    expect = {
        x: min(grp)
        for root, grp in _uf_components(n_nodes, pairs).items()
        for x in grp
    }
    assert got == expect


# ---------------------------------------------------------------------------
# PPJoin vs brute-force all-pairs Jaccard
# ---------------------------------------------------------------------------


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_docs=st.integers(min_value=2, max_value=30),
    vocab=st.integers(min_value=3, max_value=25),
    tau=st.sampled_from([0.5, 0.7, 0.8, 0.9]),
)
def test_ppjoin_matches_bruteforce_jaccard(
    spark, seed, n_docs, vocab, tau
):
    """The prefix-filtered exact set-similarity join must emit
    EXACTLY the brute-force pairs with J >= tau — the prefix-filter
    theorem plus the two in-join prunes are lossless, so any missing
    pair is a real bug (an over-pruned boundary case), and any extra
    pair a verification bug. Random small-vocab corpora maximize
    boundary-exact Jaccards (e.g. 2/3, 3/4) where float pruning
    slack matters."""
    from matrixinversion_spark.pipeline.dedup import ppjoin_pairs

    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        k = int(rng.integers(1, min(vocab, 8) + 1))
        toks = sorted(
            rng.choice(vocab, size=k, replace=False).tolist()
        )
        docs.append((i, " ".join(f"w{t}" for t in toks)))
    sets = {i: set(text.split()) for i, text in docs}
    expect = {}
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            j = inter / uni
            if j >= tau:
                expect[(a, b)] = round(j, 6)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ppjoin_pairs(df, tau=tau).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# merge_upsert vs a sequential dict replay (both strategies)
# ---------------------------------------------------------------------------


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_target=st.integers(min_value=0, max_value=40),
    n_source=st.integers(min_value=0, max_value=20),
    strategy=st.sampled_from(["full_outer", "broadcast"]),
)
def test_merge_upsert_matches_dict_replay(
    spark, seed, n_target, n_source, strategy
):
    """MERGE (update / insert / delete-when / keep) equals a plain
    Python dict replay, for BOTH physical strategies — the
    broadcast plan's three-join decomposition must be semantically
    indistinguishable from the full-outer plan."""
    from matrixinversion_spark.relational.merge import merge_upsert

    rng = np.random.default_rng(seed)
    tgt_rows = [
        (int(k), int(v))
        for k, v in zip(
            rng.choice(60, size=n_target, replace=False),
            rng.integers(-100, 100, n_target),
        )
    ]
    src_rows = [
        (int(k), int(v))
        for k, v in zip(
            rng.choice(60, size=n_source, replace=False),
            rng.integers(-100, 100, n_source),
        )
    ]
    target = spark.createDataFrame(tgt_rows, "k long, v long")
    source = spark.createDataFrame(src_rows, "k long, v long")
    out = merge_upsert(
        target,
        source,
        on="k",
        update_set={"v": F.col("t.v") + F.col("s.v")},
        insert_values={"v": F.col("s.v")},
        delete_when=F.col("s.v") < -50,
        strategy=strategy,
    )
    got = {r.k: (r.v, r.action) for r in out.collect()}

    state = dict(tgt_rows)
    expect = {k: (v, "keep") for k, v in state.items()}
    for k, v in src_rows:
        if k in state:
            if v < -50:
                expect.pop(k)
            else:
                expect[k] = (state[k] + v, "update")
        else:
            expect[k] = (v, "insert")
    assert got == expect


# ---------------------------------------------------------------------------
# grid_distance_join vs brute-force pair scan
# ---------------------------------------------------------------------------


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_pts=st.integers(min_value=2, max_value=50),
    r=st.integers(min_value=1, max_value=7),
    lo=st.integers(min_value=-30, max_value=0),
)
def test_grid_distance_join_matches_bruteforce(
    spark, seed, n_pts, r, lo
):
    """The 3x3 grid-replication join must find EXACTLY the pairs
    with squared distance <= r² — once each. Random points over a
    range including NEGATIVE coordinates (the floor-division cell
    math's hot spot) and a small radius so boundary-exact distances
    (d² == r²) occur often."""
    from matrixinversion_spark.relational.spatial import (
        grid_distance_join,
    )

    rng = np.random.default_rng(seed)
    pts = [
        (i, int(x), int(y))
        for i, (x, y) in enumerate(
            zip(
                rng.integers(lo, lo + 25, n_pts),
                rng.integers(lo, lo + 25, n_pts),
            )
        )
    ]
    expect = {}
    for a in range(n_pts):
        for b in range(a + 1, n_pts):
            d2 = (pts[a][1] - pts[b][1]) ** 2 + (
                pts[a][2] - pts[b][2]
            ) ** 2
            if d2 <= r * r:
                expect[(a, b)] = d2
    df = spark.createDataFrame(pts, "id long, xi long, yi long")
    rows = grid_distance_join(df, r).collect()
    got = {(r_.id_a, r_.id_b): r_.dist_sq for r_ in rows}
    assert len(rows) == len(got)  # each unordered pair exactly once
    assert got == expect
