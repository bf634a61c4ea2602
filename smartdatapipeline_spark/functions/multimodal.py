"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, Arrow-batched feature extraction, and decode stubs
(BASELINE.json north-star extension).

The image/audio libraries are not in this container, so the DECODE step
is stubbed exactly as specified: gated behind an import-try with a
clearly-marked ``NotImplementedError``, while everything Spark-side —
schema, partitioning, ``mapInPandas`` batch shape, deterministic
feature math — is real and oracle-tested.

At 100 TB the pattern is: binary column stays in parquet (never
collected), metadata travels as a sibling struct for predicate pushdown
(filter on width/height/duration without touching bytes), and per-batch
python work happens once per Arrow batch inside ``mapInPandas`` — the
only copy is columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _id_field(df: DataFrame, id_col: str) -> "T.StructField":
    """The id column's OWN StructField (name + type preserved) — decode
    outputs key by whatever id the caller passed, string ids included,
    instead of a hardcoded int64 'doc_id' (ADVICE round 2)."""
    return T.StructField(id_col, df.schema[id_col].dataType)


def _feature_schema(df: DataFrame, id_col: str) -> T.StructType:
    return T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("header_hash", T.LongType()),
            T.StructField("feat_0", T.DoubleType()),
            T.StructField("feat_1", T.DoubleType()),
            T.StructField("feat_2", T.DoubleType()),
            T.StructField("feat_3", T.DoubleType()),
        ]
    )


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap content as an opaque binary column + typed metadata struct —
    the storage shape for multimodal payloads. (Testdata has no real
    media, so the bytes are the utf-8 text; the schema/plumbing is what
    is being exercised.)"""
    blob = F.col(text_col).cast("binary")
    meta = F.struct(
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.lit("text/plain").alias("content_type"),
    )
    return df.withColumn("blob", blob).withColumn("media_meta", meta)


def parse_image_header(data: bytes) -> tuple[str | None, int | None, int | None]:
    """REAL image decode (header level), pure stdlib — no PIL needed.

    Returns (format, width, height) for PNG / GIF / BMP / JPEG payloads,
    (None, None, None) for anything unrecognized or truncated. This is
    the driver-side kernel the Arrow-batched decoder below runs per blob;
    full pixel decode stays gated on PIL (``decode_image_pixels``).
    """
    import struct

    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h
    if len(data) >= 26 and data[:2] == b"BM":
        w, h = struct.unpack("<ii", data[18:26])
        return "bmp", abs(w), abs(h)
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        # walk JPEG segments to the first SOF0/1/2 frame header
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return "jpeg", w, h
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
            i += 2 + seglen
        return "jpeg", None, None
    return None, None, None


def parse_wav_header(
    data: bytes,
) -> tuple[int | None, int | None, int | None, float | None]:
    """REAL audio decode (header level), pure stdlib — no soundfile.

    Returns (channels, sample_rate, bits_per_sample, duration_sec) for
    RIFF/WAVE payloads, all-None otherwise. Walks RIFF chunks, so fmt/
    data need not be at fixed offsets."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None, None, None, None
    i = 12
    channels = rate = bits = block = None
    data_size = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (clen,) = struct.unpack("<I", data[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= len(data):
            _, channels, rate, _, block, bits = struct.unpack(
                "<HHIIHH", data[i + 8 : i + 24]
            )
        elif cid == b"data":
            data_size = clen
        i += 8 + clen + (clen & 1)
    if rate and block and data_size is not None:
        dur = (data_size // block) / float(rate)
    else:
        dur = None
    return channels, rate, bits, dur


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched image header decode over the binary column — the
    real (stdlib) decoder wired through ``mapInPandas``. One Python loop
    per Arrow batch; bytes never leave the executor."""
    import pandas as pd

    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                }
            )

    return df.select(id_col, "blob").mapInPandas(_decode, schema=schema)


def decode_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched WAV header decode over the binary column."""
    import pandas as pd

    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("bits", T.IntegerType()),
            T.StructField("duration_sec", T.DoubleType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_wav_header(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "channels": pd.array([p[0] for p in parsed], dtype="Int32"),
                    "sample_rate": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "bits": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "duration_sec": [p[3] for p in parsed],
                }
            )

    return df.select(id_col, "blob").mapInPandas(_decode, schema=schema)


def parse_bmp_pixels(data: bytes) -> tuple[int, int, bytes] | None:
    """REAL pixel decode, pure stdlib: uncompressed 24-bpp BI_RGB BMP →
    (width, height, RGB bytes row-major TOP-DOWN). Handles both
    bottom-up (positive height — the common case) and top-down storage,
    and the 4-byte row padding. Returns None for anything that is not
    an uncompressed 24-bpp BMP (those need a codec — see
    ``decode_image_pixels``)."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        return None
    (offset,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if comp != 0 or bpp != 24 or w <= 0 or h == 0:
        return None
    height, bottom_up = abs(h), h > 0
    row_size = ((w * 3 + 3) // 4) * 4
    if offset + row_size * height > len(data):
        return None
    out = bytearray(w * height * 3)
    for r in range(height):
        src = height - 1 - r if bottom_up else r
        start = offset + src * row_size
        dst = r * w * 3
        row = data[start : start + w * 3]
        # BGR → RGB channel swap
        out[dst + 0 : dst + w * 3 : 3] = row[2::3]
        out[dst + 1 : dst + w * 3 : 3] = row[1::3]
        out[dst + 2 : dst + w * 3 : 3] = row[0::3]
    return w, height, bytes(out)


def decode_bmp_pixels(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Arrow-batched pixel decode for uncompressed 24-bpp BMPs via
    ``parse_bmp_pixels`` — same ``mapInPandas`` plumbing as the header
    decoders; bytes never leave the executor. Non-BMP / compressed rows
    yield NULL pixels (fail-soft for mixed media corpora).

    Output: (id, width, height, pixels binary — RGB row-major top-down).
    """
    import pandas as pd

    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_bmp_pixels(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.array(
                        [p[0] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "pixels": [p[2] if p else None for p in parsed],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(_decode, schema=schema)


def parse_png_pixels(data: bytes) -> tuple[int, int, int, bytes] | None:
    """REAL pixel decode, pure stdlib (round-6: PNG no longer needs a
    codec library): 8-bit-depth non-interlaced PNG → (width, height,
    n_channels, raw bytes row-major top-down). The deflate stream
    inflates with stdlib ``zlib`` and all five scanline filters
    (None/Sub/Up/Average/Paeth, PNG spec §9 "Filtering") reverse
    per-row. Color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA)
    are supported; palette (3), 16-bit depth, and Adam7 interlace
    return None (as does any malformed chunk / CRC / length) — fail-
    soft for mixed corpora, same contract as ``parse_bmp_pixels``."""
    import struct
    import zlib

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length or pos + 12 + length > len(data):
            return None
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
            return None
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) != 13:
        return None
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or ch is None:
        return None
    if w == 0 or h == 0 or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        return None
    out = bytearray(stride * h)
    prev = bytes(stride)  # the row above row 0 is all zeros (spec)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 1:  # Sub: + byte ch positions left
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up: + byte above
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average: + floor((left + above)/2)
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth predictor
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            return None
        out[r * stride : (r + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filters: list[int] | None = None,
) -> bytes:
    """Minimal stdlib PNG ENCODER (8-bit, non-interlaced) — the golden-
    test / test-corpus twin of ``parse_png_pixels``. ``filters`` picks
    the filter type per scanline (default cycles 0..4 so every filter
    path is exercised); the filtered bytes are the spec-exact inverse
    of the decoder's reversal, so round-trip is bit-identical."""
    import struct
    import zlib

    ctype = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixels length != width*height*channels")
    if filters is None:
        filters = [r % 5 for r in range(height)]
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = pixels[r * stride : (r + 1) * stride]
        ft = filters[r]
        raw.append(ft)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = line[i] - a
            elif ft == 2:
                v = line[i] - b
            elif ft == 3:
                v = line[i] - ((a + b) >> 1)
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[i] - pred
            else:
                raise ValueError(f"bad filter type {ft}")
            raw.append(v & 0xFF)
        prev = line

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png_pixels(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Arrow-batched PNG pixel decode via ``parse_png_pixels`` — same
    ``mapInPandas`` plumbing as ``decode_bmp_pixels``; bytes never
    leave the executor; non-PNG / unsupported rows yield NULLs.

    Output: (id, width, height, n_channels, pixels binary — raw
    channel bytes row-major top-down).
    """
    import pandas as pd

    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_png_pixels(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.array(
                        [p[0] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "pixels": [p[3] if p else None for p in parsed],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(_decode, schema=schema)


def decode_image_pixels(blob_col: Column) -> Column:
    """JPEG pixel decode stays gated on PIL (not in this container) —
    the gate is now JPEG-ONLY: PNG pixels decode codec-free via
    ``parse_png_pixels``/``decode_png_pixels`` (stdlib zlib inflate +
    full filter reversal), uncompressed 24-bpp BMP via
    ``parse_bmp_pixels``/``decode_bmp_pixels``, and header decode for
    every format is real (``parse_image_header``). JPEG needs a DCT
    entropy decoder, which is out of scope without a codec library."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "pixel decode for JPEG requires Pillow, which is not available "
            "in this container; PNG pixels decode codec-free via "
            "decode_png_pixels, uncompressed 24-bpp BMP via "
            "decode_bmp_pixels, and header-level decode for all formats is "
            "implemented in parse_image_header/decode_image_features"
        ) from exc
    raise NotImplementedError("PIL present but JPEG pixel decoder not wired yet")


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched deterministic feature extraction over the binary
    column — the ``mapInPandas`` shape a real embedding/feature model
    plugs into (swap ``_fake_features`` for the model forward pass).

    Features are md5-derived so the DuckDB oracle can verify the full
    plumbing end-to-end: feat_i = int(md5_hex[8i:8i+8], 16) / 2^32.
    """
    import hashlib

    import pandas as pd

    def _fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            digests = [hashlib.md5(bytes(b)).hexdigest() for b in blobs]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "header_hash": [int(d[:15], 16) for d in digests],
                }
            )
            for i in range(4):
                out[f"feat_{i}"] = [
                    int(d[8 * i : 8 * i + 8], 16) / 4294967296.0 for d in digests
                ]
            yield out

    return df.select(id_col, "blob").mapInPandas(
        _fake_features, schema=_feature_schema(df, id_col)
    )


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    frame_bytes: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic frame sampling over a binary stream — the video
    analog: split the payload into ``n_frames`` evenly-spaced windows of
    ``frame_bytes`` and emit one row per frame with its hash. Pure
    column expressions (substring on binary), no python."""
    total = F.octet_length("blob")
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    out = df.select(F.col(id_col), "blob", total.alias("_n"), idx)
    offset = (F.col("frame_idx") * F.greatest((F.col("_n") - frame_bytes), F.lit(0)))
    offset = F.floor(offset / F.lit(max(n_frames - 1, 1))).cast("int")
    frame = F.substring(F.col("blob"), offset + 1, frame_bytes)
    return out.select(
        id_col,
        "frame_idx",
        offset.alias("byte_offset"),
        F.conv(F.substring(F.md5(frame), 1, 15), 16, 10).cast("long").alias("frame_hash"),
    )
