"""From-scratch baseline JPEG codec (round 6 — the last compressed-
format gap): roundtrip properties, a hand-assembled entropy-scan golden
that is independent of the encoder's bit writer, fail-soft contract,
the unified pixel dispatcher, and latent PIL parity.

Reference scope note: the reference backend has no multimodal surface
(CSV/JSON only) — this family is part of the training-data-pipeline
extension (BASELINE.json north star)."""

import struct

import numpy as np
import pytest

from smartdatapipeline_spark.functions import multimodal as MM


def _roundtrip(w, h, ch, img_bytes, **kw):
    out = MM.parse_jpeg_pixels(MM.encode_jpeg(w, h, ch, img_bytes, **kw))
    assert out is not None
    ww, hh, cc, px = out
    assert (ww, hh, cc) == (w, h, ch)
    return np.frombuffer(px, np.uint8).reshape(h, w, ch)


def test_gray_flat_blocks_roundtrip_exact():
    """Block-uniform grayscale with quant=1 is EXACTLY lossless (only
    the DC coefficient is nonzero; 8·(v−128)/8 is float-exact) — the
    property the jpeg_pixel_decode oracle pins, incl. edge blocks."""
    rng = np.random.default_rng(11)
    for w, h in [(8, 8), (17, 13), (1, 1), (24, 9), (31, 2), (16, 40)]:
        vals = rng.integers(0, 256, (-(-h // 8), -(-w // 8)))
        img = np.empty((h, w), np.uint8)
        for r in range(h):
            img[r] = vals[r // 8, (np.arange(w) // 8)]
        got = _roundtrip(w, h, 1, img.tobytes())
        assert np.array_equal(got[:, :, 0], img), (w, h)


def test_gray_random_quant1_bounded():
    """Arbitrary grayscale content: quant=1 loss is only the per-
    coefficient rounding — measured ±1 on seeded noise (hard bound ~7)."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (40, 56), np.uint8)
    got = _roundtrip(56, 40, 1, img.tobytes())
    assert np.abs(got[:, :, 0].astype(int) - img).max() <= 2


def test_color_444_and_420_bounded():
    w, h = 32, 24
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256], -1)
    img = img.astype(np.uint8)
    got = _roundtrip(w, h, 3, img.tobytes())
    assert np.abs(got.astype(int) - img).max() <= 3  # color xform round
    got420 = _roundtrip(w, h, 3, img.tobytes(), subsample="420")
    assert np.abs(got420.astype(int) - img).max() <= 8  # chroma 2x2 mean


def test_restart_markers_roundtrip():
    """DRI/RSTn: bit-stream realign + DC predictor reset per interval."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (33, 41), np.uint8)
    got = _roundtrip(41, 33, 1, img.tobytes(), restart_interval=3)
    assert np.abs(got[:, :, 0].astype(int) - img).max() <= 2
    # color + subsampling + restarts together
    img3 = rng.integers(0, 256, (17, 19, 3), np.uint8)
    got3 = _roundtrip(
        19, 17, 3, img3.tobytes(), subsample="420", restart_interval=2
    )
    assert got3.shape == (17, 19, 3)


def test_lossy_quant_tables_still_decode():
    """A realistic (quality-50-ish) quant table: decode succeeds and
    stays within coarse-quantization error on a smooth gradient."""
    w, h = 24, 16
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = ((xx * 2 + yy * 3) % 200 + 20).astype(np.uint8)
    q = np.full(64, 16, np.int32)
    q[0] = 8
    got = _roundtrip(w, h, 1, img.tobytes(), quant=(q, q))
    assert np.abs(got[:, :, 0].astype(int) - img).max() <= 48


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _hand_jpeg(scan_bytes: bytes) -> bytes:
    """Assemble a single-block 8×8 grayscale baseline JPEG around hand-
    written entropy bits — NOT via encode_jpeg, so a compensating
    encoder/decoder bug (wrong zigzag, wrong canonical-code order)
    cannot hide."""
    zig = list(MM._ZIGZAG)
    q = np.ones(64, np.int32)
    out = [b"\xff\xd8", _seg(0xDB, bytes([0]) + bytes(q[zig].tolist()))]
    out.append(_seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0))))
    for tc in (0, 1):
        bits, vals = MM._STD_HUFF[(tc, 0)]
        out.append(_seg(0xC4, bytes([tc << 4]) + bytes(bits) + vals))
    out.append(_seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00"))
    return b"".join(out) + scan_bytes + b"\xff\xd9"


def test_hand_assembled_scan_dc_only():
    """Annex K luma tables, hand-coded bits: DC size-0 ('00') + EOB
    ('1010'), padded with 1s → 0x2B. Block = all-128 gray."""
    out = MM.parse_jpeg_pixels(_hand_jpeg(bytes([0b00101011])))
    assert out is not None
    w, h, ch, px = out
    assert (w, h, ch) == (8, 8, 1)
    assert px == bytes([128] * 64)


def test_hand_assembled_scan_dc_and_one_ac():
    """Hand-coded bits: DC category 2 code '011' + magnitude '11'
    (diff=+3), AC (run 0, size 1) code '00' + bit '1' (+1 at zigzag
    k=1 = natural (0,1)), EOB '1010', pad 1s → 0x79 0xAF. Expected
    pixels from the closed-form IDCT of F[0,0]=3, F[0,1]=1."""
    out = MM.parse_jpeg_pixels(_hand_jpeg(bytes([0x79, 0xAF])))
    assert out is not None
    got = np.frombuffer(out[3], np.uint8).reshape(8, 8)
    f = np.zeros((8, 8))
    f[0, 0], f[0, 1] = 3.0, 1.0
    m = MM._dct_mat()
    want = np.clip(np.round(m.T @ f @ m + 128), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_fail_soft_contract():
    enc = MM.encode_jpeg(8, 8, 1, bytes(64))
    assert MM.parse_jpeg_pixels(b"\xff\xd8junk") is None
    assert MM.parse_jpeg_pixels(enc[:20]) is None  # truncated
    prog = bytearray(enc)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2  # progressive SOF2
    assert MM.parse_jpeg_pixels(bytes(prog)) is None
    trunc_scan = enc[: len(enc) - 10]  # entropy stream cut short
    assert MM.parse_jpeg_pixels(trunc_scan) is None


def test_header_parser_agrees_with_pixel_decoder():
    """parse_image_header (independent marker walk) and
    parse_jpeg_pixels agree on dimensions — cross-implementation pin."""
    enc = MM.encode_jpeg(19, 7, 3, bytes(19 * 7 * 3), subsample="420")
    fmt, w, h = MM.parse_image_header(enc)
    assert (fmt, w, h) == ("jpeg", 19, 7)
    out = MM.parse_jpeg_pixels(enc)
    assert (out[0], out[1]) == (19, 7)


def test_unified_dispatcher(spark):  # noqa: F811
    """decode_image_pixels (ex-PIL-gate) decodes all three formats in
    one Arrow-batched pass; unknown payloads yield NULLs."""
    import pandas as pd

    png = MM.encode_png(3, 2, 1, bytes(range(6)))
    jpg = MM.encode_jpeg(8, 8, 1, bytes([77] * 64))
    rows = [(1, bytearray(png)), (2, bytearray(jpg)), (3, bytearray(b"nope"))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {
        r["doc_id"]: r
        for r in MM.decode_image_pixels(df).collect()
    }
    assert got[1]["format"] == "png" and bytes(got[1]["pixels"]) == bytes(range(6))
    assert got[2]["format"] == "jpeg" and bytes(got[2]["pixels"]) == bytes([77] * 64)
    assert got[3]["format"] is None and got[3]["pixels"] is None


def test_pil_parity_latent():
    """Cross-codec parity with libjpeg via Pillow — latent in this
    container (importorskip), same pattern as the statsmodels/sklearn
    parity tests."""
    pytest.importorskip("PIL.Image")
    import io

    from PIL import Image

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 32), np.uint8)
    # our encoder → PIL decoder
    theirs = np.asarray(
        Image.open(io.BytesIO(MM.encode_jpeg(32, 24, 1, img.tobytes())))
    )
    assert np.abs(theirs.astype(int) - img).max() <= 2
    # PIL encoder → our decoder
    buf = io.BytesIO()
    Image.fromarray(img, "L").save(buf, "JPEG", quality=95)
    out = MM.parse_jpeg_pixels(buf.getvalue())
    assert out is not None and (out[0], out[1]) == (32, 24)
    ours = np.frombuffer(out[3], np.uint8).reshape(24, 32)
    assert np.abs(ours.astype(int) - img).max() <= 24  # q95 loss bound


# ---- hypothesis fuzz: a from-scratch parser must NEVER crash ----

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_parser_never_crashes_on_garbage(data):
    """Arbitrary bytes -> None or a valid tuple, never an exception
    (fail-soft contract for mixed corpora)."""
    out = MM.parse_jpeg_pixels(data)
    assert out is None or (len(out) == 4 and out[2] in (1, 3))


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_parser_never_crashes_on_jpeg_prefixed_garbage(data):
    """Same, with a valid SOI so the marker walk actually engages."""
    out = MM.parse_jpeg_pixels(b"\xff\xd8" + data)
    assert out is None or len(out) == 4


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_gray_roundtrip_bounded_property(w, h, seed):
    """Any size x any seeded content: decode(encode(img)) within the
    per-coefficient-rounding error bound."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), np.uint8)
    out = MM.parse_jpeg_pixels(MM.encode_jpeg(w, h, 1, img.tobytes()))
    assert out is not None and (out[0], out[1]) == (w, h)
    got = np.frombuffer(out[3], np.uint8).reshape(h, w)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 8


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=300), st.integers(0, 2**31 - 1))
def test_truncation_never_crashes(tail, cut_seed):
    """Truncating a VALID jpeg at any byte -> None or a decode, never a
    crash (entropy-stream and segment-walk truncation paths)."""
    enc = MM.encode_jpeg(16, 16, 1, bytes((i * 7) % 256 for i in range(256)))
    cut = cut_seed % len(enc)
    out = MM.parse_jpeg_pixels(enc[:cut] + tail)
    assert out is None or len(out) == 4
