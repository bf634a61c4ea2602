"""Plan audit: for every queries() entry, extract the physical-plan
signals that matter at scale — scan pushdown/pruning, join strategies,
exchange (shuffle) count, codegen coverage — and write PLANS.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from smartdatapipeline_spark.session import get_spark


def audit(plan: str) -> dict:
    # formatted explain = operator tree + per-node detail sections; count
    # each node ONCE from its detail heading "(id) NodeName"
    from collections import Counter

    nodes = Counter(
        m.split()[0] for m in re.findall(r"^\(\d+\) (.+)$", plan, re.M)
    )
    join_types = sorted(
        t
        for t in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        )
        if nodes.get(t)
    )
    return {
        "scans": nodes.get("Scan", 0),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "exchanges": nodes.get("Exchange", 0),
        "broadcasts": nodes.get("BroadcastExchange", 0),
        "joins": ",".join(join_types) or "-",
        "wscg": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "aggs": nodes.get("HashAggregate", 0),
        "windows": nodes.get("Window", 0) + nodes.get("WindowGroupLimit", 0),
        "pandas": nodes.get("FlatMapGroupsInPandas", 0)
        + nodes.get("MapInPandas", 0)
        + nodes.get("ArrowEvalPython", 0),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    rows = []
    for name, fn in E.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            rows.append((name, audit(plan)))
        except Exception as exc:  # noqa: BLE001
            rows.append((name, {"error": str(exc)[:80]}))

    lines = [
        "# PLANS — physical-plan audit of every query (auto-generated)",
        "",
        f"`python tools/explain_audit.py {sf_dir}` — signals per query:",
        "scans with pushed filters, shuffle exchanges (broadcast excluded),",
        "broadcast exchanges, join strategies, whole-stage-codegen spans,",
        "hash aggregates, window operators, Arrow/pandas stages.",
        "",
        "NOTE (round 10, PERF.md lesson 14): these are STATIC-plan counts —",
        "upper bounds, not measurements. AQE inserts ReusedExchange at",
        "runtime for identical repeated subplans (funnel's static 7 scans",
        "execute as 3 + reuse), so adjudicate perf claims on the final",
        "adaptive plan or a measured probe, never on this table alone.",
        "",
        "| query | scans | pushed | shuffles | bcasts | joins | wscg | aggs | win | pandas |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        if "error" in a:
            lines.append(f"| {name} | ERROR: {a['error']} | | | | | | | | |")
        else:
            lines.append(
                f"| {name} | {a['scans']} | {a['pushed']} | {a['exchanges']} | "
                f"{a['broadcasts']} | {a['joins']} | {a['wscg']} | {a['aggs']} | "
                f"{a['windows']} | {a['pandas']} |"
            )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(rows)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
