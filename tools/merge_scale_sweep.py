"""Merge incremental 10×-sweep batch artifacts (check_correctness.py
--json outputs) with the carried prior-round sweep into
CORRECTNESS_SCALE_r{N}.json.

Carried entries are kept verbatim ONLY for queries whose operators are
unchanged this round; pass --fresh <name> to force a query to come
from the new batches (dropping the carried copy).

Usage: python tools/merge_scale_sweep.py OUT.json CARRIED.json BATCH.json [BATCH2.json ...] [--fresh q1 --fresh q2]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = sys.argv[1:]
    fresh: set[str] = set()
    while "--fresh" in args:
        i = args.index("--fresh")
        fresh.add(args[i + 1])
        del args[i : i + 2]
    out_path, carried_path, *batch_paths = args

    with open(carried_path) as f:
        carried = json.load(f)
    queries = {
        k: v for k, v in carried["queries"].items() if k not in fresh
    }
    carried_n = len(queries)
    for bp in batch_paths:
        with open(bp) as f:
            b = json.load(f)
        queries.update(b["queries"])

    def ok(v: dict) -> bool:
        if v.get("err"):
            return False
        if v.get("hash_match"):  # oracle-bit-exact
            return v.get("rows_match") and v.get("schema_match")
        # property-bound entries (oracle=false): rows + property check
        return bool(v.get("rows_match") and v.get("property_match"))

    bad = [k for k, v in queries.items() if not ok(v)]
    out = {
        "note": (
            f"Merged sweep: {carried_n} carried from {carried_path} "
            f"(operators unchanged) + fresh batches {batch_paths}. "
            f"All queries ran against the same scale dir."
        ),
        "scale": carried.get("scale"),
        "sf_dir": carried.get("sf_dir"),
        "queries": dict(sorted(queries.items())),
        "n": len(queries),
        "failures": bad,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(queries)} queries, {len(bad)} failures")
    if bad:
        print("FAILURES:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
