"""Round-13 pins.

ADVICE r12 hardening: forged codec headers must die as loud
``ValueError`` (the contract ``decode_image_real``'s PIL fallback and
the batch error handling key on), never ``ZeroDivisionError`` or
``MemoryError``; the AVI decoder's idx1 cross-check now covers the
per-entry sizes it always claimed to.
"""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# ADVICE r12 item 1: JPEG SOF sampling factors outside T.81 B.2.2's
# 1..4 range raised ZeroDivisionError at the MCU-grid computation
# ---------------------------------------------------------------------------


def _sof0(fh, fw, comps):
    body = bytes([8]) + fh.to_bytes(2, "big") + fw.to_bytes(2, "big")
    body += bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body


def test_jpeg_rejects_out_of_range_sampling_factors():
    from matrixinversion_spark.pipeline.multimodal import (
        decode_jpeg_pixels,
    )

    # the advisor's exact shape: 3-component SOF, all factors 0
    payload = b"\xff\xd8" + _sof0(
        8, 8, [(1, 0, 0, 0), (2, 0, 0, 0), (3, 0, 0, 0)]
    )
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg_pixels(payload)
    # a >4 factor is equally illegal per T.81 B.2.2
    payload = b"\xff\xd8" + _sof0(
        8, 8, [(1, 5, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    )
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg_pixels(payload)
    # mixed: one zero among legal ones
    payload = b"\xff\xd8" + _sof0(
        8, 8, [(1, 2, 2, 0), (2, 1, 0, 1), (3, 1, 1, 1)]
    )
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg_pixels(payload)


# ---------------------------------------------------------------------------
# ADVICE r12 item 2: forged SOF dimensions allocated tens-of-GiB
# planes before any entropy data was read -> MemoryError
# ---------------------------------------------------------------------------


def test_jpeg_rejects_forged_frame_dimensions():
    from matrixinversion_spark.pipeline.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    enc = bytearray(encode_jpeg(img))
    # SOF0 layout: FF C0 len(2) prec(1) h(2) w(2) ...; SOF precedes
    # SOS so the first FFC0 is the real frame header
    k = enc.index(b"\xff\xc0")
    enc[k + 5:k + 9] = (65535).to_bytes(2, "big") * 2
    with pytest.raises(ValueError, match="entropy-coded data budget"):
        decode_jpeg_pixels(bytes(enc))
    # a real-but-patched moderate forgery dies the same way
    enc[k + 5:k + 9] = (4096).to_bytes(2, "big") * 2
    with pytest.raises(ValueError, match="entropy-coded data budget"):
        decode_jpeg_pixels(bytes(enc))
    # the unpatched payload still decodes (guard has headroom on
    # legitimate geometry)
    assert decode_jpeg_pixels(encode_jpeg(img)).shape == (16, 16)


# ---------------------------------------------------------------------------
# ADVICE r12 item 3: GIF logical-screen canvas was allocated straight
# from the 13-byte header -> 12.9 GiB MemoryError on a 22-byte forgery
# ---------------------------------------------------------------------------


def test_gif_frames_rejects_forged_logical_screen():
    from matrixinversion_spark.pipeline.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )

    # the advisor's exact shape: tiny payload claiming 60000x60000
    payload = (
        b"GIF89a"
        + (60000).to_bytes(2, "little")
        + (60000).to_bytes(2, "little")
        + b"\x00\x00\x00"
        + b"\x00" * 9
    )
    with pytest.raises(ValueError, match="LZW expansion"):
        decode_gif_frames(payload)

    # a legitimate animation still decodes: the 64 MiB small-canvas
    # allowance plus the LZW-expansion bound must not reject real
    # payloads
    frames = [
        np.full((4, 6), i, dtype=int) % 4 for i in range(3)
    ]
    pal = [(0, 0, 0), (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    enc = encode_gif_animation(frames, pal)
    assert decode_gif_frames(enc).shape == (3, 4, 6, 3)


# ---------------------------------------------------------------------------
# ADVICE r12 item 4: decode_avi_frames claimed to cross-check idx1
# entry sizes but only compared the entry count
# ---------------------------------------------------------------------------


def test_avi_idx1_entry_size_mismatch_is_loud():
    from matrixinversion_spark.pipeline.multimodal import (
        decode_avi_frames,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    img = np.full((8, 8), 120, dtype=np.uint8)
    jpg = encode_jpeg(img)
    enc = bytearray(encode_avi_mjpeg([jpg], 8, 8))
    assert decode_avi_frames(bytes(enc)).shape == (1, 8, 8)
    # idx1 entry layout: ckid(4) flags(4) offset(4) size(4)
    k = enc.index(b"idx1")
    size_off = k + 8 + 12
    declared = int.from_bytes(enc[size_off:size_off + 4], "little")
    assert declared == len(jpg)
    enc[size_off:size_off + 4] = (declared + 1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="idx1 entry 0"):
        decode_avi_frames(bytes(enc))


# ---------------------------------------------------------------------------
# VERDICT r12 items 4 + 7: third-party JPEG assets. The container's
# jars carry no JPEGs, but Spark's own distribution ships real
# camera JPEGs (SPARK_HOME/data/mllib/images — 4:2:0 baseline from
# real-world encoders) and the base image carries progressive (SOF2)
# assets — foreign entropy streams our synthesis twins can't fake.
# ---------------------------------------------------------------------------

import glob as _glob
import os as _os

_SPARK_HOME = _os.environ.get("SPARK_HOME", "/opt/spark")
_BASELINE_JPEGS = sorted(
    _glob.glob(f"{_SPARK_HOME}/data/mllib/images/**/*.jpg",
               recursive=True)
)
_PROGRESSIVE_JPEGS = [
    p for p in [
        "/usr/share/doc/nodejs/thin-white-stripe.jpg",
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
    ] if _os.path.exists(p)
]
_PYTEST_PIN_JPEG = next(
    (p for p in _glob.glob(
        _os.path.expanduser(
            "~/.pyenv/versions/*/lib/python3.1[0-9]*/test/"
            "test_email/data/python.jpg"
        )
    )), None,
)


def _sof_marker(data: bytes) -> int | None:
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return None
        m = data[i + 1]
        if 0xD0 <= m <= 0xD8 or m == 0x01:
            i += 2
            continue
        if m in (0xC0, 0xC1, 0xC2) or m == 0xDA:
            return m if m != 0xDA else None
        i += 2 + int.from_bytes(data[i + 2:i + 4], "big")
    return None


def test_third_party_baseline_jpegs_pixel_decode():
    """VERDICT r12 #7: >=1 real baseline JPEG (foreign encoder,
    foreign entropy stream, 4:2:0 subsampling) must pixel-decode.
    Spark's mllib sample images are real camera JPEGs."""
    from matrixinversion_spark.pipeline.multimodal import (
        UnsupportedImageError,
        decode_jpeg_pixels,
        parse_image_header,
    )

    decoded = 0
    saw_420 = False
    for p in _BASELINE_JPEGS:
        data = open(p, "rb").read()
        if _sof_marker(data) != 0xC0:
            continue  # the SOF2 grayscale asset is the next test's
        fmt, w, h = parse_image_header(data)
        assert fmt == "jpeg"
        px = decode_jpeg_pixels(data)
        assert px.shape == (h, w, 3) and px.dtype == np.uint8, p
        # real photographs: full-ish dynamic range, non-degenerate
        assert 16 < px.mean() < 240 and px.std() > 10, p
        saw_420 = True  # every mllib baseline asset is 2x2/1x1/1x1
        decoded += 1
    if decoded == 0:
        pytest.skip("no Spark mllib sample JPEGs in this env")
    assert saw_420


def test_third_party_baseline_jpeg_regression_pin():
    """Bit-level regression pin on one tiny third-party baseline
    JPEG (CPython's 16x16 test asset, 4:2:0): the checksum pins OUR
    decoder's output (T.81 does not mandate bit-exact IDCT), so a
    rounding change shows up as a deliberate re-pin, not silently."""
    import zlib

    from matrixinversion_spark.pipeline.multimodal import (
        decode_jpeg_pixels,
    )

    if _PYTEST_PIN_JPEG is None:
        pytest.skip("CPython test asset not present")
    px = decode_jpeg_pixels(open(_PYTEST_PIN_JPEG, "rb").read())
    assert px.shape == (16, 16, 3)
    assert zlib.crc32(px.tobytes()) == 2195220314


def test_third_party_progressive_jpegs_are_declared_tier():
    """VERDICT r12 #4: formal tier-contract pin with real
    progressive assets — a progressive file must header-parse (dims
    visible to the metadata path) and then raise
    UnsupportedImageError from the pixel path, never silently
    mis-decode as baseline. If progressive support is ever
    implemented, this pin is the deliberate gate to update."""
    from matrixinversion_spark.pipeline.multimodal import (
        UnsupportedImageError,
        decode_jpeg_pixels,
        parse_image_header,
    )

    assets = list(_PROGRESSIVE_JPEGS)
    gray = f"{_SPARK_HOME}/data/mllib/images/origin/multi-channel/" \
        "grayscale.jpg"
    if _os.path.exists(gray):
        assets.append(gray)
    if not assets:
        pytest.skip("no progressive JPEG assets in this env")
    for p in assets:
        data = open(p, "rb").read()
        assert _sof_marker(data) == 0xC2, p
        fmt, w, h = parse_image_header(data)
        assert fmt == "jpeg" and w > 0 and h > 0, p
        with pytest.raises(UnsupportedImageError, match="progressive"):
            decode_jpeg_pixels(data)


# ---------------------------------------------------------------------------
# VERDICT r12 item 5: SSSP opt-in converged-stop (early-exit parity
# with connected_components_hashmin's churn probe)
# ---------------------------------------------------------------------------


def test_sssp_converged_stop_drops_rounds_with_identical_output(
    spark,
):
    """A fast-converging planted graph (diameter 3, horizon 12):
    converged_stop must cut the executed rounds while returning the
    exact frame the full horizon returns; on a graph that needs the
    whole horizon it must not fire early."""
    from matrixinversion_spark.relational.mining import sssp_weighted

    # same planted detour graph as the r12 pin — settles in 3 rounds
    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 3, 1), (3, 1, 1)],
        "src bigint, dst bigint, cost bigint",
    )
    full = {
        r["node"]: r["cost"]
        for r in sssp_weighted(edges, source=0, rounds=12).collect()
    }
    stats = {}
    early = {
        r["node"]: r["cost"]
        for r in sssp_weighted(
            edges, source=0, rounds=12, converged_stop=True,
            stats=stats,
        ).collect()
    }
    assert early == full == {0: 0, 1: 3, 2: 1, 3: 2}
    # 3 productive rounds + 1 fixed-point confirmation round
    assert stats["rounds_run"] == 4

    # a 6-edge chain must use every one of its 6 rounds — no false
    # early exit while costs are still propagating
    chain = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(6)],
        "src bigint, dst bigint, cost bigint",
    )
    stats = {}
    got = {
        r["node"]: r["cost"]
        for r in sssp_weighted(
            chain, source=0, rounds=6, converged_stop=True,
            stats=stats,
        ).collect()
    }
    assert got == {i: i for i in range(7)}
    assert stats["rounds_run"] == 6


# ---------------------------------------------------------------------------
# Spark 4.1.2 hazard pin: Catalyst pushes a semi/anti join below a
# batch session_window aggregation (join keys look like a subset of
# the grouping keys, but the pre-merge per-event window is NOT
# stable under MergingSessions) and silently corrupts the merge.
# Found while building the STREAMING.md session attestation; the
# engine-side rule is: MATERIALIZE (persist/checkpoint) a
# session_window aggregate before joining on its keys.
# ---------------------------------------------------------------------------


def test_session_window_join_pushdown_hazard(spark):
    import datetime as dt

    from matrixinversion_spark.streaming import ops as sops

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        # user 1: two events 29 min apart -> ONE merged session
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=29), 2.0),
        # user 2: control singleton
        (2, t0, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    keys = spark.createDataFrame(
        [(1, t0)], "user_id bigint, session_start timestamp"
    )

    # the engine-level guarantee: a MATERIALIZED session aggregate
    # anti-joins correctly — user 1's merged session matches the key
    # and disappears entirely, leaving only user 2
    s = sops.sessionized(df).persist()
    s.count()
    safe = s.join(
        keys, ["user_id", "session_start"], "left_anti"
    ).collect()
    s.unpersist()
    assert [(r["user_id"], r["n_events"]) for r in safe] == [(2, 1)]

    # the raw (unmaterialized) path: either Spark plans the join
    # above the merge (correct: same single row) or it pushes the
    # anti join below MergingSessions and strips user 1's FIRST
    # event pre-merge, resurrecting user 1 as a partial 1-event
    # session starting at t0+29min (the corruption this pin
    # documents). Any third behavior is a new regression.
    raw = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in sops.sessionized(df)
        .join(keys, ["user_id", "session_start"], "left_anti")
        .collect()
    )
    correct = [(2, t0, 1)]
    corrupt = [(1, t0 + dt.timedelta(minutes=29), 1), (2, t0, 1)]
    assert raw in (correct, corrupt), raw


# ---------------------------------------------------------------------------
# r13 OPTIMIZATION round: convergence-probe and single-pass internals
# ---------------------------------------------------------------------------


def test_cc_sum_probe_never_stops_early(spark):
    """r13 optimization: connected_components' convergence probe is
    now a Σ label aggregate (labels are elementwise non-increasing
    over a fixed vertex set, so equal consecutive sums ⇔ fixed
    point) instead of a new-vs-old join — this differential pins
    that the aggregate criterion never stops BEFORE the fixed point:
    labels on a random graph must match union-find ground truth."""
    import random

    from matrixinversion_spark.pipeline.curation import (
        connected_components,
    )

    rng = random.Random(1313)
    n = 200
    pairs = sorted(
        {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(160)
        }
    )
    edges = spark.createDataFrame(
        [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs],
        "u bigint, v bigint",
    )
    labels, rounds = connected_components(edges)
    got = {r["doc_id"]: r["label"] for r in labels.collect()}

    # driver-side union-find ground truth
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        parent[find(u)] = find(v)
    comp_min: dict[int, int] = {}
    touched = {x for p in pairs for x in p}
    for x in touched:
        root = find(x)
        comp_min[root] = min(comp_min.get(root, x), x)
    expect = {x: comp_min[find(x)] for x in touched}
    assert got == expect
    assert rounds >= 1


def test_sssp_agg_probe_matches_antijoin_semantics(spark):
    """r13 optimization: the converged-stop probe is ONE
    (count, Σ cost) aggregate per round instead of count + gated
    anti-join. Pin that the stop round and the output both match
    running the full horizon (fixed-point invariance) on a graph
    with a cost-refining detour (count stabilizes BEFORE costs do —
    the case where a count-only probe would stop early)."""
    from matrixinversion_spark.relational.mining import sssp_weighted

    # 0→1→2→3 (cheap chain, 1 per hop) plus expensive direct edges
    # 0→2 (10), 0→3 (10): every node is reached by round 1, but
    # node 2's and 3's costs keep improving in rounds 2 and 3.
    rows = [
        (0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 2, 10), (0, 3, 10),
    ]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint, cost bigint")
    stats: dict = {}
    early = sssp_weighted(
        edges, source=0, rounds=10, converged_stop=True, stats=stats
    )
    full = sssp_weighted(edges, source=0, rounds=10)
    got = sorted((r["node"], r["cost"]) for r in early.collect())
    want = sorted((r["node"], r["cost"]) for r in full.collect())
    assert got == want == [(0, 0), (1, 1), (2, 2), (3, 3)]
    # settles at round 3 (chain costs reach 2/3), +1 probe round
    assert stats["rounds_run"] == 4


def test_dsir_single_pass_plan_has_no_generate(spark):
    """r13 optimization: p_dsir_select pins its (doc, lang, bucket)
    count frame through the stats barrier, so the corpus explode
    runs exactly once AT BUILD TIME — the returned plan must contain
    no Generate (explode) node at all (both the model build and the
    scoring probe read the materialized count frame)."""
    from matrixinversion_spark.pipeline.curation import p_dsir_select
    from tests.conftest import SF_DIR

    df = p_dsir_select(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan, plan
