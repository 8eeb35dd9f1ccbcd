"""Round-12 operator tests: weighted SSSP (Bellman-Ford), real PNG
pixel decode, the public-API stats barrier, and the session-window
streaming differential."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# weighted SSSP
# ---------------------------------------------------------------------------


def test_sssp_weighted_differs_from_hop_shortest(spark):
    """Planted graph where the weighted answer and the hop answer
    genuinely disagree: 0->1 is ONE hop at cost 10, but the detour
    0->2->3->1 is THREE hops at total cost 3. Hop-BFS must report
    dist(1)=1; weighted SSSP must report cost(1)=3."""
    from matrixinversion_spark.relational.mining import sssp_weighted

    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 3, 1), (3, 1, 1)],
        "src bigint, dst bigint, cost bigint",
    )
    got = {
        r["node"]: r["cost"]
        for r in sssp_weighted(edges, source=0, rounds=4).collect()
    }
    assert got == {0: 0, 1: 3, 2: 1, 3: 2}
    # one relaxation round = the hop-BFS horizon: only the expensive
    # direct edge is reachable, so the bounded-horizon contract holds
    one = {
        r["node"]: r["cost"]
        for r in sssp_weighted(edges, source=0, rounds=1).collect()
    }
    assert one[1] == 10


def test_sssp_weighted_horizon_is_exact_min_over_bounded_walks(spark):
    """After k rounds the frame holds the exact min over walks of
    <= k edges — checked against a brute-force enumeration on a
    graph WITH a cycle (cycles must never lower a bounded min)."""
    from itertools import product

    from matrixinversion_spark.relational.mining import sssp_weighted

    raw = [(0, 1, 4), (1, 2, 1), (2, 0, 1), (0, 2, 9), (2, 3, 2),
           (1, 3, 8)]
    adj = {}
    for s, d, c in raw:
        adj.setdefault(s, []).append((d, c))

    def brute(rounds):
        best = {0: 0}
        paths = [(0, 0)]
        for _ in range(rounds):
            nxt = []
            for node, cost in paths:
                for d, c in adj.get(node, []):
                    nxt.append((d, cost + c))
                    if cost + c < best.get(d, 1 << 60):
                        best[d] = cost + c
            paths = nxt
        return best

    edges = spark.createDataFrame(
        raw, "src bigint, dst bigint, cost bigint"
    )
    for rounds in (1, 2, 3, 4):
        got = {
            r["node"]: r["cost"]
            for r in sssp_weighted(edges, 0, rounds=rounds).collect()
        }
        assert got == brute(rounds), f"rounds={rounds}"


def test_sssp_weighted_registered_query_runs(spark):
    from matrixinversion_spark.relational.mining import q_sssp_weighted

    rows = q_sssp_weighted(spark, SF_DIR).collect()
    got = {r["node"]: r["cost"] for r in rows}
    assert got[0] == 0
    assert all(c >= 0 for c in got.values())
    # the trade graph is sparse but connected enough that the source
    # reaches other nations within the horizon
    assert len(got) > 1
