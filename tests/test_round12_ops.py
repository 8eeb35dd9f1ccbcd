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


# ---------------------------------------------------------------------------
# real PNG pixel decode
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(filt):
    """Every RFC 2083 filter type, forced on every scanline, must
    round-trip bit-exactly — gray and RGB."""
    import numpy as np

    from matrixinversion_spark.pipeline.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.default_rng(1000 + filt)
    for shape in [(19, 27), (1, 1), (2, 3, 3), (13, 8, 3)]:
        px = rng.integers(0, 256, size=shape).astype(np.uint8)
        got = decode_png_pixels(
            encode_png(px, filters=[filt] * shape[0])
        )
        assert got.shape == px.shape
        assert (got == px).all()


def test_png_decode_verifies_crc_and_structure():
    import numpy as np

    from matrixinversion_spark.pipeline.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    px = np.arange(25, dtype=np.uint8).reshape(5, 5)
    enc = bytearray(encode_png(px))
    # flip one IDAT byte: the chunk CRC must catch it
    enc[len(enc) - 20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|truncated"):
        decode_png_pixels(bytes(enc))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_pixels(b"GIF89a" + bytes(20))
    # unsupported shapes fail loudly, naming the field
    from matrixinversion_spark.pipeline.multimodal import (
        PNG_SIG,
        _png_chunk,
    )

    ihdr16 = (
        (2).to_bytes(4, "big") + (2).to_bytes(4, "big")
        + bytes([16, 0, 0, 0, 0])
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png_pixels(
            PNG_SIG + _png_chunk(b"IHDR", ihdr16)
            + _png_chunk(b"IDAT", b"x")
        )


def test_png_paeth_predictor_spec_cases():
    """Paeth tie-breaks are left, then up, then up-left (RFC 2083
    §6.6) — the classic silent-corruption spot in hand-rolled
    decoders."""
    from matrixinversion_spark.pipeline.multimodal import _paeth

    assert _paeth(1, 1, 1) == 1          # all equal -> left
    assert _paeth(5, 5, 0) == 5          # pa == pb -> left
    # p = 0+4-2 = 2; pa=|2-0|=2, pb=|2-4|=2, pc=|2-2|=0 -> up-left
    assert _paeth(0, 4, 2) == 2
    assert _paeth(10, 0, 5) == 5         # p=5: pa=5 pb=5 pc=0 -> c
    assert _paeth(3, 9, 9) == 3          # p=3: pa=0 -> left wins


def test_decode_image_real_decodes_png_without_pil():
    """The engine's declared decode stub no longer covers PNG: real
    pixels come back pure-stdlib regardless of PIL."""
    import numpy as np

    from matrixinversion_spark.pipeline.multimodal import (
        decode_image_real,
        encode_png,
    )

    px = np.zeros((7, 11), dtype=np.uint8)
    assert decode_image_real(encode_png(px)) == (11, 7, 1)


def test_png_real_query_matches_plant(spark):
    """End-to-end: the registered query's decoded pixel sums equal
    the plant formula recomputed in plain Python."""
    from matrixinversion_spark.pipeline.multimodal import (
        _PNG_H_MIN,
        _PNG_H_MOD,
        _PNG_W_MIN,
        _PNG_W_MOD,
        p_multimodal_decode_png_real,
    )

    rows = p_multimodal_decode_png_real(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows[:50]:
        i = r["doc_id"]
        w = i % _PNG_W_MOD + _PNG_W_MIN
        h = i % _PNG_H_MOD + _PNG_H_MIN
        want = sum(
            (i * 31 + 7 * rr + 13 * cc) % 256
            for rr in range(h)
            for cc in range(w)
        )
        assert (r["width"], r["height"], r["n_px"]) == (w, h, w * h)
        assert r["sum_px"] == want


# ---------------------------------------------------------------------------
# public-API stats barrier
# ---------------------------------------------------------------------------


def test_parquet_barrier_mode_is_correct_and_public_only(
    spark, monkeypatch
):
    """SPARK_GRAFT_BARRIER=parquet routes every barrier through the
    public write/read round-trip — the internal JVM API must never
    be touched, and iterative operators stay correct."""
    from matrixinversion_spark.pipeline import curation

    monkeypatch.setenv("SPARK_GRAFT_BARRIER", "parquet")

    def boom(_):
        raise AssertionError(
            "internal API reached in parquet barrier mode"
        )

    monkeypatch.setattr(curation, "_rebuild_without_stats", boom)

    # barrier preserves content + schema through the round-trip
    df = spark.createDataFrame(
        [(1, "a", [1.5, 2.5]), (2, None, [])],
        "id bigint, s string, v array<double>",
    )
    got = curation._fresh_stats_barrier(df)
    assert sorted(
        (r["id"], r["s"], tuple(r["v"])) for r in got.collect()
    ) == [(1, "a", (1.5, 2.5)), (2, None, ())]

    # an iterative operator (3 barriered rounds/loop) stays exact:
    # weighted SSSP on the planted detour graph
    from matrixinversion_spark.relational.mining import sssp_weighted

    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 3, 1), (3, 1, 1)],
        "src bigint, dst bigint, cost bigint",
    )
    res = {
        r["node"]: r["cost"]
        for r in sssp_weighted(edges, source=0, rounds=4).collect()
    }
    assert res == {0: 0, 1: 3, 2: 1, 3: 2}

    # connected components (barrier-per-round consumer) on a chain
    from matrixinversion_spark.pipeline.curation import (
        connected_components,
    )

    # connected_components wants a SYMMETRIC edge list
    fwd = [(i, i + 1) for i in range(9)] + [(20, 21)]
    chain = spark.createDataFrame(
        fwd + [(v, u) for u, v in fwd],
        "u bigint, v bigint",
    )
    labels, _ = connected_components(chain)
    got = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert all(got[i] == 0 for i in range(10))
    assert got[20] == got[21] == 20
