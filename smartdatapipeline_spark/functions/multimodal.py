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

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
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


def decode_image(blob_col: Column) -> Column:
    """STUB — image decode (PIL is not installed in this container).

    Real implementation: a pandas UDF mapping blob → struct(width,
    height, mode, pixels array) via PIL.Image.open over Arrow batches.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "decode_image requires Pillow, which is not available in this "
            "container; the Spark-side plumbing (attach_blob/extract_features/"
            "sample_frames) is real and tested"
        ) from exc
    raise NotImplementedError("PIL present but decoder not wired yet")


def decode_audio(blob_col: Column) -> Column:
    """STUB — audio decode (no soundfile/librosa in this container)."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "decode_audio requires soundfile, which is not available in this "
            "container"
        ) from exc
    raise NotImplementedError("soundfile present but decoder not wired yet")


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
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int32"),
                    "header_hash": [int(d[:15], 16) for d in digests],
                }
            )
            for i in range(4):
                out[f"feat_{i}"] = [
                    int(d[8 * i : 8 * i + 8], 16) / 4294967296.0 for d in digests
                ]
            yield out

    return df.select(id_col, "blob").mapInPandas(_fake_features, schema=FEATURE_SCHEMA)


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
