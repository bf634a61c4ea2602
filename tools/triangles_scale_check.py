"""10×-scale check for graph_triangles via replica structure.

The DuckDB triangle oracle (bit-exact at sf0.01/sf0.1) exhausts >80 GB
of spill at the 10× sweep volume — a single-node oracle-engine capacity
limit, like the CC recursion. But the salted self-union shifts
l_partkey AND l_suppkey by i·10⁷ in lockstep (tools/make_scale_dir.py),
so the 10× co-supply graph is EXACTLY ten disjoint shifted copies of
the sf0.1 graph, and per-node triangle counts (no cross-replica state:
the k-NN window partitions by node) must be exactly the ten OFF-shifted
copies of the DuckDB-verified sf0.1 result. This script checks that
set equality exactly.

Usage: python tools/triangles_scale_check.py [sf_dir] [scale_dir] [n]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smartdatapipeline_spark.session import get_spark

OFF = 10_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale_x10"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("tri-scale")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    q = E.queries()["graph_triangles"]
    base = q(spark, sf_dir).toPandas()
    big = q(spark, scale_dir).toPandas()
    node_col, cnt_col = base.columns[0], base.columns[1]

    want = set()
    for _, row in base.iterrows():
        for i in range(n):
            want.add((int(row[node_col]) + i * OFF, int(row[cnt_col])))
    got = {(int(r[node_col]), int(r[cnt_col])) for _, r in big.iterrows()}
    print(f"sf0.1 rows: {len(base)}, 10x rows: {len(big)}, expected: {len(want)}")
    if got != want:
        miss = list(want - got)[:5]
        extra = list(got - want)[:5]
        print(f"FAIL graph_triangles@10x: missing={miss} extra={extra}")
        sys.exit(1)
    print("PASS graph_triangles@10x (replica-shift structural check, "
          f"{n} copies x {len(base)} nodes)")


if __name__ == "__main__":
    main()
