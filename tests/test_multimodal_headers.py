"""Real image-header parsers (pipeline/multimodal.py): round-trips,
format edge cases, JPEG segment walking, error paths. Pure Python —
no Spark session needed."""

from __future__ import annotations

import pytest

from matrixinversion_spark.pipeline.multimodal import (
    parse_image_header,
    synth_image_header,
)


@pytest.mark.parametrize("fmt", ["png", "gif", "jpeg"])
@pytest.mark.parametrize("dims", [(1, 1), (640, 480), (65535, 700)])
def test_header_roundtrip(fmt, dims):
    w, h = dims
    assert parse_image_header(synth_image_header(fmt, w, h)) == (fmt, w, h)


def test_png_large_dims():
    # PNG dims are uint32 — beyond GIF/JPEG's 16-bit range
    payload = synth_image_header("png", 1_000_000, 2_000_000)
    assert parse_image_header(payload) == ("png", 1_000_000, 2_000_000)


def test_jpeg_walks_past_extra_segments():
    """SOF must be found after APP0 + extra APPn/DQT/COM segments and
    a restart marker — the walker handles real-world layouts."""
    base = synth_image_header("jpeg", 123, 456)
    soi, rest = base[:2], base[2:]
    app1 = b"\xff\xe1" + (8).to_bytes(2, "big") + b"Exif\x00\x00"
    com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"hello"
    dqt = b"\xff\xdb" + (5).to_bytes(2, "big") + b"\x00\x01\x02"
    rst = b"\xff\xd0"  # standalone, no length
    assert parse_image_header(soi + app1 + com + dqt + rst + rest) == (
        "jpeg", 123, 456,
    )


def test_jpeg_progressive_sof2():
    payload = bytearray(synth_image_header("jpeg", 77, 88))
    idx = payload.index(b"\xff\xc0")
    payload[idx + 1] = 0xC2  # SOF2 (progressive) carries dims too
    assert parse_image_header(bytes(payload)) == ("jpeg", 77, 88)


def test_jpeg_skips_dht_lookalike():
    """0xC4 (DHT) is in the 0xC0-0xCF range but is NOT a SOF marker;
    a naive range check would misread its payload as dimensions."""
    base = synth_image_header("jpeg", 31, 41)
    soi, rest = base[:2], base[2:]
    dht = b"\xff\xc4" + (6).to_bytes(2, "big") + b"\x00\xff\xff\xff"
    assert parse_image_header(soi + dht + rest) == ("jpeg", 31, 41)


def test_gif87a_variant():
    payload = bytearray(synth_image_header("gif", 10, 20))
    payload[3:6] = b"87a"
    assert parse_image_header(bytes(payload)) == ("gif", 10, 20)


def test_error_paths():
    with pytest.raises(ValueError, match="unrecognized"):
        parse_image_header(b"not an image at all")
    with pytest.raises(ValueError, match="PNG"):
        parse_image_header(synth_image_header("png", 5, 5)[:15])
    with pytest.raises(ValueError, match="GIF"):
        parse_image_header(b"GIF89a\x01")
    with pytest.raises(ValueError, match="no SOF"):
        parse_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00")
