"""Table-maintenance operators: small-file compaction and
sort-clustering — the storage hygiene a 100 TB parquet lake needs
continuously (streaming ingest and per-batch upserts both shed small
files; scan throughput and footer/open overhead degrade until someone
rewrites).

``compact_parquet`` sizes the rewrite from the ACTUAL byte footprint
(files-per-target-size, not a guessed partition count) and optionally
range-clusters on given columns so every output file owns a disjoint
key range — parquet min/max footer stats then prune whole files for
key-range predicates (the poor man's Z-order for 1-D keys).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F


def parquet_bytes(path: str) -> int:
    """Total bytes of parquet data files under ``path`` (local/driver-
    visible paths; a cluster deployment swaps in the Hadoop FileSystem
    API — the sizing logic is the same)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def compact_parquet(
    spark,
    src: str,
    dest: str,
    target_mb: int = 128,
    cluster_cols: tuple[str, ...] = (),
) -> int:
    """Rewrite ``src`` into ``dest`` as ~``target_mb``-sized files;
    with ``cluster_cols``, range-partition + sort so each file owns a
    disjoint key range (footer min/max pruning). Returns the output
    file count. Writes to a distinct ``dest`` — the caller swaps
    directories atomically (rename), never rewrites in place."""
    n = max(1, math.ceil(parquet_bytes(src) / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if cluster_cols:
        cols = [F.col(c) for c in cluster_cols]
        df = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(dest)
    return n
