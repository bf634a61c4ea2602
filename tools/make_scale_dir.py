"""Materialize a salted N× self-union of every testdata table as
parquet — the synthetic-sf1 input for the scale correctness sweep
(round-4/6 verdict task: re-prove the scale-sensitive query families
bit-exact vs DuckDB at 10× the bench volume, not just at sf0.1).

Salting keeps REFERENTIAL INTEGRITY so join/group cardinalities scale
like real data rather than degenerating into N-way exact duplicates:
replica i shifts every entity key by i·10⁷ (custkey/orderkey/suppkey/
partkey/doc_id/vec_id/user_id/event_id — fact FKs shift in lockstep
with their dimension PKs), shifts event timestamps by 32·i days (fresh
sessions/windows per replica), and suffixes document text per replica
(fresh shingles, so LSH pair volume scales instead of exploding into
cross-replica identity pairs). nation/region stay as-is (shared tiny
dims — nationkeys deliberately unshifted so customer/supplier still
resolve). Embeddings keep their vectors (vec space volume scales; the
near-dup structure replicates per salt shard because vec_ids differ).

Both engines read the SAME produced parquet, so the sweep checks
engine agreement at volume — partition-count sensitivity, spill paths,
decimal-sum ordering, window-frame boundaries.

Usage: python tools/make_scale_dir.py [src_sf_dir] [out_dir] [n_replicas]
Defaults: /root/testdata/sf0.1 → /root/repo/.scale_x10 × 10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smartdatapipeline_spark.session import get_spark, read_events

OFF = 10_000_000  # key shift per replica — far above any sf's max key


def replicate(df, n, shifts=(), ts_cols=(), text_cols=()):
    reps = []
    for i in range(n):
        r = df
        for c in shifts:
            r = r.withColumn(c, F.col(c) + F.lit(i * OFF))
        for c in ts_cols:
            r = r.withColumn(c, F.col(c) + F.expr(f"INTERVAL {32 * i} DAYS"))
        for c in text_cols:
            r = r.withColumn(
                c,
                F.when(F.lit(i) == 0, F.col(c)).otherwise(
                    F.concat(F.col(c), F.lit(f" replica{i}"))
                ),
            )
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale_x10"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark()
    T = lambda name: spark.read.parquet(os.path.join(src, f"{name}.parquet"))  # noqa: E731

    plans = {
        "region": (T("region"), (), (), ()),
        "nation": (T("nation"), (), (), ()),
        "customer": (T("customer"), ("c_custkey",), (), ()),
        "supplier": (T("supplier"), ("s_suppkey",), (), ()),
        "part": (T("part"), ("p_partkey",), (), ()),
        "orders": (T("orders"), ("o_orderkey", "o_custkey"), (), ()),
        "lineitem": (
            T("lineitem"),
            ("l_orderkey", "l_partkey", "l_suppkey"),
            (),
            (),
        ),
        "events": (
            read_events(spark, src),
            ("event_id", "user_id"),
            ("ts",),
            (),
        ),
        "documents": (T("documents"), ("doc_id",), (), ("text",)),
        "embeddings": (T("embeddings"), ("vec_id",), (), ()),
    }
    os.makedirs(dst, exist_ok=True)
    for name, (df, shifts, ts_cols, text_cols) in plans.items():
        reps = 1 if name in ("region", "nation") else n
        out = replicate(df, reps, shifts, ts_cols, text_cols)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
        print(f"{name}: {out.count()} rows -> {dst}/{name}.parquet", flush=True)


if __name__ == "__main__":
    main()
