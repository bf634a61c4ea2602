"""Streaming heavy hitters via sharded mergeable Misra–Gries state —
the streaming twin of ``functions/sketch.heavy_hitters``.

State per shard is ≤ k (key, count) pairs — O(k·nshards) total,
independent of stream length. Each micro-batch folds its shard's
value counts into the summary with the MERGE rule (Agarwal et al.
2012, "Mergeable Summaries"): add counts, and if more than k keys
remain, subtract the (k+1)-th largest count from all and drop the
non-positive — exactly the batched form of Misra–Gries decrements,
preserving the guarantee that any key with true frequency
> total/(k+1) is present and undercounted by at most total/(k+1).

Sharding: every occurrence of a key hashes to ONE shard, so a
globally-heavy key is at least as frequent relative to its shard's
total and survives that shard's summary; the union of shard candidate
sets is therefore a superset of the global heavy hitters (the batch
operator's exact recount then confirms counts — same two-phase shape
as the batch path).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "shard int, key string, mg_count bigint"
STATE_SCHEMA = "keys array<string>, counts array<bigint>"


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str,
    k: int = 64,
    nshards: int = 8,
) -> DataFrame:
    """``events``: streaming frame. Emits each shard's full candidate
    summary every batch (update mode) — downstream keeps the latest
    per (shard, key).

    Output: (shard, key, mg_count)."""

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        keys, counts = state.get if state.exists else ([], [])
        summary = dict(zip(list(keys), [int(c) for c in counts]))
        for pdf in pdf_iter:
            for kk, c in pdf["_key"].value_counts().items():
                summary[kk] = summary.get(kk, 0) + int(c)
            if len(summary) > k:
                # batched MG decrement: subtract the (k+1)-th largest
                # count, drop non-positive — ≤ k keys survive
                m = sorted(summary.values(), reverse=True)[k]
                summary = {
                    kk: c - m for kk, c in summary.items() if c - m > 0
                }
        state.update((list(summary.keys()), list(summary.values())))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(summary),
                "key": list(summary.keys()),
                "mg_count": list(summary.values()),
            }
        )

    keyed = events.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(nshards))
        .cast("int")
        .alias("_shard"),
        F.col(key_col).cast("string").alias("_key"),
    )
    return keyed.groupBy("_shard").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def distinct_registers_stream(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    p: int = 8,
) -> DataFrame:
    """Windowed HLL register build on a stream — the streaming twin of
    ``functions/sketch.hll_partial`` (round 9).

    The register build is a plain groupBy(window, bucket).max(rho), so
    Structured Streaming runs it natively with bounded state: ≤ m=2^p
    register rows per (window) regardless of how many events flowed
    through — the same constant-size summary the batch daily partial
    persists, built incrementally. MAX is monotone, so late events
    inside the watermark horizon can only raise registers — exactly the
    idempotent at-least-once semantics the batch `hll_merge` relies on.
    Downstream, `hll_reaggregate`/`hll_raw_estimate` fold the emitted
    windows to any coarser grain without touching the stream again.

    Output: (window_start, window_end, bucket, rho) — update mode.
    """
    from smartdatapipeline_spark.functions.sketch import hll_partial

    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    df = df.filter(F.col(key_col).isNotNull()).withColumn(
        "_w", F.window(F.col(ts_col), window)
    )
    reg = hll_partial(df, key_col, by=["_w"], p=p)
    return reg.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        "bucket",
        "rho",
    )


def cms_stream(
    events: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming Count-Min grid (round 9): `functions/sketch.cms_partial`
    is a pure explode→groupBy(row, cell).sum, so Structured Streaming
    runs it natively in update/complete mode with state bounded BY
    CONSTRUCTION at ≤ depth·width counter rows — no watermark needed;
    the sketch cannot grow past its grid no matter how many events or
    distinct keys flow through. SUM merges partial counts exactly, so
    a drained stream equals the batch grid cell-for-cell."""
    from smartdatapipeline_spark.functions.sketch import cms_partial

    return cms_partial(events, key_col, depth=depth, width=width)


def bloom_stream(
    events: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Streaming Bloom word table (round 9): bit_or per word is a
    streaming-native aggregation with state bounded at ≤ m/60 word
    rows; OR is monotone and idempotent, so replays/late events can
    only set bits that membership already requires — a drained stream
    equals the batch word table bit-for-bit."""
    from smartdatapipeline_spark.functions.sketch import bloom_partial

    return bloom_partial(events, key_col, m_bits=m_bits, n_hashes=n_hashes)


def dyadic_stream(
    events: DataFrame,
    value_col: str,
    levels: int = 20,
    depth: int = 4,
    width: int = 2048,
    by: list[str] | None = None,
) -> DataFrame:
    """Streaming dyadic-CMS quantile grid (round 10):
    `functions/sketch.dyadic_cms_partial` is a pure explode→
    groupBy(level, row, cell).count, so Structured Streaming runs it
    natively in update/complete mode with state bounded BY CONSTRUCTION
    at ≤ levels·depth·width counter rows (× |groups| with ``by``) — no
    watermark needed; counting is additive, so a drained stream equals
    the batch grid cell-for-cell and any quantile is answered from the
    live state by the same dyadic walk."""
    from smartdatapipeline_spark.functions.sketch import dyadic_cms_partial

    return dyadic_cms_partial(
        events, value_col, levels=levels, depth=depth, width=width, by=by
    )
