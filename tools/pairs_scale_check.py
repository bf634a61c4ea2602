"""Independent 10×-scale check for the pair-space query families whose
DuckDB oracles exceed single-node capacity at the salted sweep volume
(the self-join pair space is quadratic for the ORACLE even where the
engine's banded/blocked plan is not).

The check exploits the scale dir's construction (tools/make_scale_dir.py):
replica 0 is the UNMODIFIED sf0.1 data (ids < OFF, text unsuffixed),
and every per-doc feature (shingles, signatures, simhash, sign-LSH
bucket, vectors) depends only on the doc's own content. Therefore the
scale-run result restricted to all-replica-0 ids must EQUAL the base
sf0.1 result — which the local sweep has already oracle-validated
bit-exact. This gives exact recall+precision on a tenth of the volume
while the engine runs at full 10× volume (partition counts, spills,
band-bucket skew from 10× bucket membership all exercised).

For `cosine_topk` (global exact top-k, where restriction does not
commute with the k cutoff) the invariant is REPLICATION EXPANSION:
every replica of a vector has the identical vector, so a replica-0
query's top-10 at 10× must be exactly 9 self-copies at cosine ≈ 1
(its own replicas — base excludes self, the copies are distinct ids)
followed by the base top-k similarity list expanded 10× and truncated
to the remaining slots.

Usage: python tools/pairs_scale_check.py [scale_dir] [base_dir] [--json OUT] [query ...]
Prints PASS/FAIL per query; exit 1 on any mismatch. --json writes
property-bound entries in the sweep's CORRECTNESS shape.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OFF = 10_000_000  # make_scale_dir.py replica key shift

#: query -> id columns that must all be < OFF for the replica-0 slice
RESTRICT = {
    "minhash_bands": ["doc_id"],
    "minhash_pairs": ["doc_a", "doc_b"],
    "simhash_pairs": ["doc_a", "doc_b"],
    "ngram_jaccard_pairs": ["doc_a", "doc_b"],
    "embedding_near_dup": ["vec_a", "vec_b"],
    "semantic_dedup": ["vec_id"],
}


def _rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        out.append(
            tuple(
                round(v, 9) if isinstance(v, float) else v
                for v in (r[c] for c in cols)
            )
        )
    return sorted(out)


def check_restriction(E, spark, q, scale_dir, base_dir) -> tuple[bool, str, int]:
    fn = E.queries()[q]
    base = _rows(fn(spark, base_dir))
    scale_df = fn(spark, scale_dir)
    cond = None
    for c in RESTRICT[q]:
        t = F.col(c) < OFF
        cond = t if cond is None else (cond & t)
    got = _rows(scale_df.filter(cond))
    ok = got == base
    msg = f"replica-0 slice {len(got)} rows vs base {len(base)}"
    return ok, msg, len(got)


def check_cosine_expansion(E, spark, q, scale_dir, base_dir) -> tuple[bool, str, int]:
    fn = E.queries()[q]
    bdf = fn(spark, base_dir)
    sdf = fn(spark, scale_dir)
    qcol, scol = "query_id", "cos_sim"
    if qcol not in bdf.columns:  # fall back to first/last column names
        qcol, scol = bdf.columns[0], bdf.columns[-1]
    base: dict = {}
    for r in bdf.collect():
        base.setdefault(r[qcol], []).append(round(float(r[scol]), 9))
    scale: dict = {}
    for r in sdf.filter(F.col(qcol) < OFF).collect():
        scale.setdefault(r[qcol], []).append(round(float(r[scol]), 9))
    bad = 0
    n = 0
    SELF = 0.999999999
    for k, sims in scale.items():
        bsims = sorted(base.get(k, []), reverse=True)
        ssims = sorted(sims, reverse=True)
        n += len(ssims)
        if any(x >= SELF for x in bsims):
            # base has true cosine-1 neighbors — self-copies are not
            # separable; fall back to a size check
            if len(ssims) != len(bsims):
                bad += 1
            continue
        selfish = [x for x in ssims if x >= SELF]
        rest = [x for x in ssims if x < SELF]
        want = sorted([s for s in bsims for _ in range(10)], reverse=True)[
            : len(rest)
        ]
        if len(selfish) != 9 or rest != want:
            bad += 1
    ok = bad == 0 and len(scale) == len(base)
    return ok, f"{len(scale)} replica-0 queries, {bad} expansion mismatches", n


def check_copurchase_expansion(E, spark, q, scale_dir, base_dir) -> tuple[bool, str, int]:
    """Global top-k over basket-pair Jaccards: every replica reproduces
    the base basket structure with shifted customer ids, so the scale
    top-k's Jaccard value multiset must equal the base top-k values
    expanded 10× and truncated to k — and its replica-0 subset must be
    a prefix-by-value subset of the base rows."""
    fn = E.queries()[q]
    bdf = fn(spark, base_dir).collect()
    sdf = fn(spark, scale_dir).collect()
    jcol = "jaccard"
    bvals = sorted((round(float(r[jcol]), 9) for r in bdf), reverse=True)
    svals = sorted((round(float(r[jcol]), 9) for r in sdf), reverse=True)
    want = sorted(
        [v for v in bvals for _ in range(10)], reverse=True
    )[: len(svals)]
    ok = svals == want and len(sdf) == len(bdf)
    return ok, f"top-{len(sdf)} value expansion ({len(bdf)} base rows)", len(sdf)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i : i + 2]
    scale_dir = args[0] if args else "/root/repo/.scale_x10"
    base_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    wanted = args[2:] or (list(RESTRICT) + ["cosine_topk", "copurchase_jaccard"])

    from smartdatapipeline_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("pairs-scale")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    fails = 0
    for q in wanted:
        try:
            if q == "cosine_topk":
                ok, msg, nrows = check_cosine_expansion(E, spark, q, scale_dir, base_dir)
            elif q == "copurchase_jaccard":
                ok, msg, nrows = check_copurchase_expansion(E, spark, q, scale_dir, base_dir)
            else:
                ok, msg, nrows = check_restriction(E, spark, q, scale_dir, base_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg, nrows = False, f"ERROR {type(e).__name__}: {e}", 0
        print(("PASS" if ok else "FAIL") + f" {q}: {msg}", flush=True)
        fails += 0 if ok else 1
        results[q] = {
            "err": None if ok else msg,
            "oracle": False,
            "rows_match": ok,
            "schema_match": ok,
            "property_match": ok,
            "spark_rows": nrows,
            "note": (
                "replica-0 identity vs oracle-validated base (pair-space "
                "oracle exceeds single-node capacity at 10x); "
                "tools/pairs_scale_check.py"
            ),
        }
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"queries": results, "sf_dir": scale_dir}, f, indent=1, sort_keys=True)
        print(f"wrote {out_json}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
