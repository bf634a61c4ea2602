"""Round-7 hostile-blob hardening (ADVICE r6 medium + verdict task #9):
the decoders run INSIDE Spark tasks over mixed/untrusted corpora, so a
crafted payload must fail soft to None — never a multi-GB allocation, an
unbounded inflate, an uncaught OverflowError, or a TypeError on a NULL
blob cell."""

from __future__ import annotations

import struct
import zlib

import numpy as np

import smartdatapipeline_spark.functions.multimodal as MM


def _png(w, h, ctype, idat_raw, depth=8):
    """Hand-assembled PNG with arbitrary header dims / IDAT payload."""

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat_raw)
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------- PNG hostility


def test_png_decompression_bomb_returns_none():
    """A few-KB IDAT that inflates to ~1 GB must be rejected by the
    bounded inflate (max_length + eof check), not decompressed."""
    # 512×512 gray header (within pixel budget) but a bomb IDAT that
    # wants to inflate to 1 GB — far past the (stride+1)*h expectation
    bomb = zlib.compress(b"\x00" * (1 << 30), 9)  # ~1 MB compressed
    assert len(bomb) < (1 << 21)
    assert MM.parse_png_pixels(_png(512, 512, 0, bomb)) is None


def test_png_hostile_dims_rejected_before_alloc():
    """65535×65535 declared dims (4.3G pixels) exceed _MAX_PIXELS and
    must return None before any allocation or inflate."""
    tiny = zlib.compress(b"\x00" * 10)
    assert MM.parse_png_pixels(_png(65535, 65535, 2, tiny)) is None


def test_png_short_stream_still_fails_soft():
    """An IDAT that inflates to FEWER bytes than the scanlines need is
    malformed, not a crash."""
    short = zlib.compress(b"\x00" * 5)
    assert MM.parse_png_pixels(_png(4, 4, 0, short)) is None


def test_png_exact_stream_still_decodes():
    """The bounded inflate must not break the happy path: a valid
    encode_png round-trip still decodes bit-exact."""
    img = bytes(range(48))  # 4×4 RGB
    enc = MM.encode_png(4, 4, 3, img)
    got = MM.parse_png_pixels(enc)
    assert got == (4, 4, 3, img)


# -------------------------------------------------- JPEG hostility


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _hand_jpeg(scan_bytes, w=8, h=8, dht_override=None):
    """Single-component baseline JPEG with hand-controlled tables."""
    zig = list(MM._ZIGZAG)
    q = np.ones(64, np.int32)
    out = [b"\xff\xd8", _seg(0xDB, bytes([0]) + bytes(q[zig].tolist()))]
    out.append(
        _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes((1, 0x11, 0)))
    )
    for tc in (0, 1):
        if dht_override and tc in dht_override:
            bits, vals = dht_override[tc]
        else:
            bits, vals = MM._STD_HUFF[(tc, 0)]
        out.append(_seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals)))
    out.append(_seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00"))
    return b"".join(out) + scan_bytes + b"\xff\xd9"


def test_jpeg_hostile_sof_dims_rejected():
    """A few-hundred-byte stream declaring 65535×65535 must return None
    before allocating the coefficient planes (pre-fix: ~17 GB numpy)."""
    assert MM.parse_jpeg_pixels(_hand_jpeg(b"\x00", w=65535, h=65535)) is None


def test_jpeg_dc_category_overflow_fails_soft():
    """A crafted DHT mapping a 1-bit code to DC category 40 would read
    a 40-bit magnitude into an int32 block (uncaught OverflowError
    pre-fix) — must fail soft to None."""
    # DC table: single symbol 40 on a 1-bit code; plenty of scan bytes
    # so the magnitude read itself succeeds
    dht = {0: ([1] + [0] * 15, [40])}
    blob = _hand_jpeg(b"\x55" * 16, dht_override=dht)
    assert MM.parse_jpeg_pixels(blob) is None


def test_jpeg_dc_category_12_to_15_fails_soft_not_crash():
    """Out-of-baseline-spec but sub-16 categories accumulate dcpred past
    int32 only via repetition; either way the decode must not raise."""
    dht = {0: ([1] + [0] * 15, [15])}
    blob = _hand_jpeg(b"\xff\x00" * 40, dht_override=dht)
    assert MM.parse_jpeg_pixels(blob) in (None,) or isinstance(
        MM.parse_jpeg_pixels(blob), tuple
    )


def test_jpeg_truncated_scan_fails_soft():
    enc = MM.encode_jpeg(16, 16, 1, bytes((i * 7) % 256 for i in range(256)))
    sos = enc.find(b"\xff\xda")
    for cut in (sos + 14, sos + 20, len(enc) - 3):
        assert MM.parse_jpeg_pixels(enc[:cut]) is None


def test_jpeg_bad_restart_interval_fails_soft():
    """DRI declares restarts every MCU but the stream has none — the
    decoder must return None (missing restart segment), not wedge."""
    enc = MM.encode_jpeg(32, 8, 1, bytes(256), restart_interval=1)
    # strip all restart markers from the entropy stream
    sos = enc.find(b"\xff\xda")
    head, scan = enc[: sos + 14], enc[sos + 14 :]
    for m in range(0xD0, 0xD8):
        scan = scan.replace(bytes([0xFF, m]), b"")
    assert MM.parse_jpeg_pixels(head + scan) is None


def test_jpeg_overlong_huffman_code_fails_soft():
    """An all-ones bitstream never matches a code in a table whose max
    length is < 16 — _huff_read must raise _Trunc internally → None."""
    dht = {0: ([0, 1] + [0] * 14, [0])}  # single 2-bit code '00'
    blob = _hand_jpeg(b"\xff\x00" * 8, dht_override=dht)
    assert MM.parse_jpeg_pixels(blob) is None


# ------------------------------------------- NULL blobs in kernels


def test_null_blob_rows_fail_soft_in_all_decode_kernels(spark):
    """ADVICE r6 low: a NULL binary cell used to hit bytes(None) →
    TypeError and fail the whole task. Every decode kernel must yield a
    NULL row for it instead."""
    from pyspark.sql import functions as F

    png = MM.encode_png(3, 2, 1, bytes(range(6)))
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, None)], "doc_id long, blob binary"
    )
    px = {r["doc_id"]: r for r in MM.decode_image_pixels(df).collect()}
    assert px[1]["format"] == "png" and px[1]["pixels"] is not None
    assert px[2]["format"] is None and px[2]["pixels"] is None

    for fn in (
        MM.decode_png_pixels,
        MM.decode_jpeg_pixels,
        MM.decode_bmp_pixels,
        MM.decode_image_features,
        MM.decode_audio_features,
        MM.extract_features,
    ):
        out = fn(df)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert len(rows) == 2  # no task failure, no dropped row
        null_row = rows[2]
        for c in out.columns:
            if c != "doc_id":
                assert null_row[c] is None, (fn.__name__, c)


def test_extract_features_still_oracle_shaped(spark):
    """The NULL-guard rewrite must not change values for non-NULL blobs
    (the md5-derived features are oracle-checked downstream)."""
    import hashlib

    df = spark.createDataFrame(
        [(7, bytearray(b"hello world"))], "doc_id long, blob binary"
    )
    r = MM.extract_features(df).collect()[0]
    d = hashlib.md5(b"hello world").hexdigest()
    assert r["n_bytes"] == 11
    assert r["header_hash"] == int(d[:15], 16)
    assert r["feat_0"] == int(d[0:8], 16) / 4294967296.0
