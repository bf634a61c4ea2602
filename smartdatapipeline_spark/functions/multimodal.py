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


def decode_image_pixels(blob_col: Column) -> Column:
    """COMPRESSED-format pixel decode (PNG/GIF/JPEG) stays gated on PIL
    (not in this container). Uncompressed 24-bpp BMP decodes with no
    codec at all — use ``parse_bmp_pixels``/``decode_bmp_pixels``;
    header decode for every format is real (``parse_image_header``)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "pixel decode for COMPRESSED formats (png/gif/jpeg) requires "
            "Pillow, which is not available in this container; uncompressed "
            "24-bpp BMP pixels decode codec-free via decode_bmp_pixels, and "
            "header-level decode for all formats is implemented in "
            "parse_image_header/decode_image_features"
        ) from exc
    raise NotImplementedError("PIL present but pixel decoder not wired yet")


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
