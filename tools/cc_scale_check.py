"""Independent 10×-scale oracle for the connected-components family.

DuckDB's recursive-CTE min-label oracle is the bit-exact reference at
sf0.01/sf0.1, but at the 10× salted sweep volume (9.1M simhash edges)
the recursion is single-threaded and effectively unbounded, so the CC
family gets THIS check instead: the Spark `duplicate_clusters` labels
at 10× are compared against a driver-side union-find over the same
edge list (a different algorithm, independently implemented — edges
already oracle-validated bit-exact at 10× by `simhash_pairs`).
Comparison is exact: every doc's min-label component must match.

Usage: python tools/cc_scale_check.py [scale_dir]
Prints PASS/FAIL + component stats; exit 1 on mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smartdatapipeline_spark.functions import dedup as DD
from smartdatapipeline_spark.session import get_spark


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale_x10"
    spark = get_spark("cc-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(scale_dir, "documents.parquet"))

    pairs = DD.simhash_near_pairs(docs, max_hamming=3)
    # Arrow-columnar pulls (a collect() of 9.1M Rows would be several GB
    # of driver Python objects; two int64 numpy columns are ~150 MB)
    epdf = pairs.select("doc_a", "doc_b").toPandas()
    edges = zip(epdf["doc_a"].to_numpy(), epdf["doc_b"].to_numpy())
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy()
    print(f"edges: {len(epdf)}, docs: {len(ids)}", flush=True)

    # independent reference: path-compressed union-find, min-label roots
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min id so the root IS the min label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    want = {int(i): find(int(i)) for i in ids}

    gpdf = (
        DD.duplicate_clusters(pairs, docs).select("doc_id", "cluster").toPandas()
    )
    got = dict(
        zip(
            (int(x) for x in gpdf["doc_id"].to_numpy()),
            (int(x) for x in gpdf["cluster"].to_numpy()),
        )
    )
    n_bad = sum(1 for i in want if got.get(i) != want[i])
    ids = list(want)
    n_comp = len({v for v in want.values()})
    print(f"components: {n_comp}; spark label mismatches: {n_bad}")
    if n_bad:
        bad = [i for i in ids if got.get(i) != want[i]][:5]
        for i in bad:
            print(f"  doc {i}: spark={got.get(i)} unionfind={want[i]}")
        print("FAIL dup_clusters@10x")
        sys.exit(1)
    print("PASS dup_clusters@10x (union-find cross-check)")


if __name__ == "__main__":
    main()
