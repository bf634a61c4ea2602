"""Bench regression gate: compare two BENCH_LOCAL_r{N}.json artifacts
(per-query MEDIANS) and fail the freeze when any query moved more than
the threshold without a written adjudication.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--threshold 0.25]
        [--adjudications BENCH_ADJUDICATIONS.md] [--md OUT.md]

Exit status 1 iff ≥1 query regressed beyond the threshold AND is not
named in the adjudications file (a markdown file where each adjudicated
query appears as a literal token — the gate greps, the human writes the
why). Dispersion guard: a mover whose NEW median is within 10% of its
NEW min is flagged as `tight` (the slowdown is reproducible across the
reps, not one bad rep); `loose` movers (median ≫ min) are usually
scheduler/GC noise and the adjudication can say exactly that, citing
this column. Writes a markdown diff table for the round log.

Round-4/5 context: three r4 "regressions" later proved to be bench-
environment noise, and four r5 movers (corpus_curation +57%, …) landed
with nobody measuring. This gate makes the measurement mandatory.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> tuple[dict, dict, object]:
    with open(path) as f:
        d = json.load(f)
    q = dict(d.get("queries", {}))
    q.update(d.get("baselines", {}))
    qmin = dict(d.get("queries_min", {}))
    qmin.update(d.get("baselines_min", {}))
    return q, qmin, d.get("sf")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.25)
    ap.add_argument("--adjudications", default=None)
    ap.add_argument("--md", default=None)
    args = ap.parse_args()

    old_q, _, old_sf = load(args.old)
    new_q, new_min, new_sf = load(args.new)
    if old_sf != new_sf:
        # round-6 incident: an sf0.001 smoke artifact was committed as
        # the round bench and every per-query delta was garbage — the
        # scale fields must match before any number is compared
        print(
            f"FATAL: sf mismatch — {args.old} is sf={old_sf}, "
            f"{args.new} is sf={new_sf}; deltas would be meaningless",
            file=sys.stderr,
        )
        return 2

    adjudicated = ""
    if args.adjudications:
        try:
            with open(args.adjudications) as f:
                adjudicated = f.read()
        except FileNotFoundError:
            pass

    rows = []
    for name in sorted(set(old_q) & set(new_q)):
        o, n = old_q[name], new_q[name]
        if o <= 0:
            continue
        delta = (n - o) / o
        tight = name in new_min and new_min[name] > 0 and (
            n <= new_min[name] * 1.10
        )
        rows.append((name, o, n, delta, tight))

    movers = [r for r in rows if r[3] > args.threshold]
    unadjudicated = [r for r in movers if r[0] not in adjudicated]
    improved = sorted((r for r in rows if r[3] < -args.threshold), key=lambda r: r[3])

    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))
    tot_o = sum(old_q[n] for n, *_ in [(r[0],) for r in rows])
    tot_n = sum(new_q[r[0]] for r in rows)

    lines = [
        f"# Bench diff: {args.old} → {args.new}",
        "",
        f"Common queries: {len(rows)}; total {tot_o:.1f}s → {tot_n:.1f}s "
        f"({(tot_n - tot_o) / tot_o:+.1%}). Added: {added or 'none'}. "
        f"Removed: {removed or 'none'}.",
        "",
        f"## Regressions > {args.threshold:.0%} (gate)",
        "",
        "| query | old s | new s | Δ | repro | adjudicated |",
        "|---|---|---|---|---|---|",
    ]
    for name, o, n, d, tight in sorted(movers, key=lambda r: -r[3]):
        lines.append(
            f"| {name} | {o:.2f} | {n:.2f} | {d:+.0%} | "
            f"{'tight' if tight else 'loose'} | "
            f"{'yes' if name in adjudicated else 'NO'} |"
        )
    if not movers:
        lines.append("| (none) | | | | | |")
    lines += ["", f"## Improvements > {args.threshold:.0%}", ""]
    for name, o, n, d, _ in improved:
        lines.append(f"- {name}: {o:.2f}s → {n:.2f}s ({d:+.0%})")
    if not improved:
        lines.append("- (none)")

    report = "\n".join(lines) + "\n"
    print(report)
    if args.md:
        with open(args.md, "w") as f:
            f.write(report)

    if unadjudicated:
        print(
            f"FREEZE GATE FAILED: {len(unadjudicated)} unadjudicated mover(s) "
            f"> {args.threshold:.0%}: {[r[0] for r in unadjudicated]}",
            file=sys.stderr,
        )
        return 1
    print("freeze gate OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
