"""Dump `.explain("formatted")` for named registry queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query...]

Writes <out_dir>/<query-with-slashes-as-dashes>_<suffix>.txt for each
query. Iterative queries (pagerank, connected components) materialize
localCheckpoints while BUILDING the frame, so their dumped plan is the
final post-loop plan — the loop body's shape is pinned separately by
the per-iteration code and tests.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from smartdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    qs = E.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        fname = f"{name.replace('/', '-')}_{suffix}.txt"
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(plan)
        print("wrote", fname, len(plan), "bytes")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
