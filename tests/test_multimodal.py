"""Multimodal decode-kernel tests.

The registered queries (mm_*) are oracle-gated on the documents table,
where every payload falls through to the deterministic stub.  These
tests cover the REAL decode layers above the stub: the dependency-free
PPM (P6) parser, the misparse guards, and the full Spark mapInPandas
path with a genuine image payload.
"""

from __future__ import annotations

from chinook_music_database_analysis_spark.operators.multimodal import (
    _decode_media,
    _parse_ppm,
    media_features,
)


def _ppm(w: int, h: int, fill: bytes = b"A") -> bytes:
    return f"P6 {w} {h} 255\n".encode() + fill * (w * h * 3)


def test_ppm_parse_real_decode():
    payload = _ppm(8, 6)
    assert _parse_ppm(payload) == (8, 6)
    n, w, h, c = _decode_media(payload)
    assert (n, w, h, c) == (len(payload), 8, 6, 3)


def test_ppm_comment_header():
    payload = b"P6\n# a comment\n4 3 255\n" + b"B" * 36
    assert _parse_ppm(payload) == (4, 3)


def test_ppm_misparse_guards():
    # Truncated raster, oversized maxval, or text that merely starts
    # with P6 must all fall through to the stub — never a fake decode.
    assert _parse_ppm(_ppm(8, 6)[:-1]) is None
    assert _parse_ppm(b"P6 2 2 65535\n" + b"C" * 12) is None
    assert _parse_ppm(b"P6 is a format name dropped mid-sentence") is None
    n = len(b"P6 not an image")
    assert _decode_media(b"P6 not an image") == (n, n % 512, (n * 7) % 512, 3)


def test_media_features_decodes_ppm_through_spark(spark):
    # ASCII raster bytes survive the text->utf8 encode in with_media,
    # so the full mapInPandas path sees a byte-exact P6 image.
    text = "P6 4 3 255\n" + "A" * 36
    docs = spark.createDataFrame([(1, text), (2, "plain text")], "doc_id long, text string")
    rows = {r.doc_id: r for r in media_features(docs).collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (4, 3, 3)
    n = len("plain text")
    assert (rows[2].n_bytes, rows[2].width, rows[2].height) == (n, n % 512, (n * 7) % 512)
