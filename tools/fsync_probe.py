"""Adjudication probe for the r8 marker protocol's fsync cost
(VERDICT r8 task #6): the txn swap stamps every staged partition with
a `_txnmark-<txid>` file (fsync file + fsync dir) before the journal.
That is 2 fsyncs per partition per transaction — amortized at 100 TB
partition sizes, but a real per-partition cost for many-tiny-partition
tables (e.g. 365 metric_date partitions).

Measures, on a freshly created N-partition layout (pure filesystem —
the Spark write is identical either way and would drown the signal):

  interleaved — the shipped r8 loop: per partition, write+fsync the
      marker file then fsync the partition dir.
  batched     — write ALL marker files (buffered), then fsync every
      file, then fsync every dir: same durability point (everything is
      durable before the journal write that follows), but the kernel
      sees the writeback in one burst.

Prints one JSON line with medians of --runs trials for both orderings.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import tempfile
import time


def _fsync_path(p: str) -> None:
    fd = os.open(p, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def make_layout(root: str, n: int) -> list[str]:
    parts = []
    for i in range(n):
        d = os.path.join(root, f"metric_date={i:05d}")
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "wb") as f:
            f.write(b"x" * 4096)
        parts.append(d)
    return parts


def interleaved(parts: list[str], txid: str) -> float:
    t0 = time.perf_counter()
    for d in parts:
        with open(os.path.join(d, f"_txnmark-{txid}"), "w") as f:
            f.write(txid)
            f.flush()
            os.fsync(f.fileno())
        _fsync_path(d)
    return time.perf_counter() - t0


def batched(parts: list[str], txid: str) -> float:
    t0 = time.perf_counter()
    fds = []
    for d in parts:
        f = open(os.path.join(d, f"_txnmark-{txid}"), "w")
        f.write(txid)
        f.flush()
        fds.append(f)
    for f in fds:
        os.fsync(f.fileno())
        f.close()
    for d in parts:
        _fsync_path(d)
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=365)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    res: dict[str, list[float]] = {"interleaved": [], "batched": []}
    for r in range(args.runs):
        for name, fn in (("interleaved", interleaved), ("batched", batched)):
            root = tempfile.mkdtemp(prefix="sdp_fsyncprobe_")
            try:
                parts = make_layout(root, args.parts)
                res[name].append(fn(parts, f"tx{r}"))
            finally:
                shutil.rmtree(root, ignore_errors=True)

    out = {
        "parts": args.parts,
        "runs": args.runs,
        **{
            k: {
                "median_sec": round(statistics.median(v), 4),
                "min_sec": round(min(v), 4),
                "per_partition_ms": round(
                    1000 * statistics.median(v) / args.parts, 3
                ),
            }
            for k, v in res.items()
        },
    }
    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
