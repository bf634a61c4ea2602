"""Round-9: wire the r8 sketch family (HLL, Count-Min, char_diversity).

The round-8 verdict graded these `weak — unwired` (zero imports, zero
tests), and ADVICE found hll_raw_estimate crashed on every invocation
(Python F.shiftleft rejects a Column shift amount). These tests pin:

- HLL: estimate accuracy vs exact countDistinct, merge(partials) ==
  direct sketch (exact register identity), reaggregation, small-range
  linear-counting path, and the raw-estimate integer invariants.
- CMS: lookup >= true count (never underestimates), <= true + eps*N
  with eps = e/width, merge-of-partials == direct grid, weighted
  counts.
- char_diversity: known strings, empty/NULL docs emitted explicitly
  (ADVICE r8 low: split('', '') phantom char).

Reference parity: the reference answers distinct counts only by exact
COUNT(DISTINCT) rescans (backend/app/services/kpi.py:40-43,60-61); the
HLL register family is the 100-TB path that re-aggregates daily
partials without rescanning events.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from smartdatapipeline_spark.functions.sketch import (
    cms_lookup,
    cms_merge,
    cms_partial,
    hll_estimate,
    hll_merge,
    hll_partial,
    hll_raw_estimate,
    hll_reaggregate,
)
from smartdatapipeline_spark.functions.text import char_diversity


def _reg_rows(df):
    return sorted((r["bucket"], r["rho"]) for r in df.collect())


# ── HyperLogLog ──────────────────────────────────────────────────────


def test_hll_estimate_accuracy_large_range(spark):
    # 5000 distinct keys, p=8 (m=256): expected rel-err 1.04/sqrt(256)
    # = 6.5%; assert within 2 sigma = 13% (ADVICE r8 prescription).
    n = 5000
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    reg = hll_partial(df, "k", p=8)
    est = hll_estimate(reg, p=8).collect()[0]
    assert not est["small_range"]
    rel = abs(est["estimate"] - n) / n
    assert rel < 2 * 1.04 / math.sqrt(256), f"rel err {rel:.3f}"


def test_hll_small_range_linear_counting(spark):
    # 30 distinct << m=256 ⇒ small-range; linear counting m*ln(m/V) is
    # near-exact when collisions are unlikely.
    n = 30
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    est = hll_estimate(hll_partial(df, "k", p=8), p=8).collect()[0]
    assert est["small_range"]
    # linear counting variance at n=30, m=256 is ~1.4; the bucket
    # occupancy itself is hash-random — allow a generous 5.
    assert abs(est["estimate"] - n) <= 5, est["estimate"]


def test_hll_merge_equals_direct(spark):
    # merge(partial(A), partial(B)) must equal partial(A ∪ B) exactly,
    # register for register — the property that makes daily→monthly
    # re-aggregation a 4 KB merge instead of a rescan.
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("k"))
    merged = hll_merge(hll_partial(a, "k", p=8), hll_partial(b, "k", p=8))
    direct = hll_partial(a.unionByName(b), "k", p=8)
    assert _reg_rows(merged) == _reg_rows(direct)


def test_hll_merge_idempotent(spark):
    # Re-merging an overlapping window must not move the registers
    # (max is idempotent) — safe for at-least-once daily partials.
    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    reg = hll_partial(df, "k", p=8)
    twice = hll_merge(reg, reg)
    assert _reg_rows(twice) == _reg_rows(reg)


def test_hll_reaggregate_matches_grouped_direct(spark):
    # Per-(day, type) partials folded over day == direct per-type
    # sketch of the same rows.
    rows = [
        Row(day=d, typ=t, k=f"{t}-{i}")
        for d in ("d1", "d2")
        for t in ("a", "b")
        for i in range(200 if t == "a" else 500)
    ]
    df = spark.createDataFrame(rows)
    per_day = hll_partial(df, "k", by=["day", "typ"], p=8)
    folded = hll_reaggregate(per_day, drop=["day"], by=["day", "typ"])
    direct = hll_partial(df, "k", by=["typ"], p=8)
    got = sorted((r["typ"], r["bucket"], r["rho"]) for r in folded.collect())
    want = sorted((r["typ"], r["bucket"], r["rho"]) for r in direct.collect())
    assert got == want


def test_hll_raw_estimate_integer_invariants(spark):
    # z_num is the exact integer Σ2^(K−rho) plus 2^K per empty bucket:
    # recompute it driver-side from the registers and compare exactly.
    p, m, k = 8, 256, 53
    df = spark.range(4000).select(F.col("id").cast("string").alias("k"))
    reg = hll_partial(df, "k", p=p)
    regs = {r["bucket"]: r["rho"] for r in reg.collect()}
    raw = hll_raw_estimate(reg, p=p).collect()[0]
    assert raw["buckets_used"] == len(regs)
    assert raw["v_empty"] == m - len(regs)
    z_expect = sum(1 << (k - rho) for rho in regs.values()) + (
        (m - len(regs)) << k
    )
    assert raw["z_num"] == z_expect
    alpha = 0.7213 / (1.0 + 1.079 / m)
    assert raw["raw_est"] == (alpha * m * m * float(1 << k)) / float(z_expect)


def test_hll_partial_p_bounds(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        hll_partial(df, "k", p=3)
    with pytest.raises(ValueError):
        hll_partial(df, "k", p=17)


# ── Count-Min ────────────────────────────────────────────────────────


def _zipf_df(spark):
    # key i appears (401 - 4*i) times for i in 0..99 → skewed truth
    rows = []
    for i in range(100):
        rows.extend(Row(k=f"key{i}") for _ in range(401 - 4 * i))
    return spark.createDataFrame(rows), {f"key{i}": 401 - 4 * i for i in range(100)}


def test_cms_lookup_bounds(spark):
    df, truth = _zipf_df(spark)
    n_total = sum(truth.values())
    depth, width = 4, 256
    cms = cms_partial(df, "k", depth=depth, width=width)
    probes = spark.createDataFrame([Row(k=k) for k in truth])
    got = {r["k"]: r["est"] for r in cms_lookup(cms, probes, "k", depth, width).collect()}
    eps = math.e / width
    for k, true_n in truth.items():
        assert got[k] >= true_n, f"{k}: CMS underestimated {got[k]} < {true_n}"
        assert got[k] <= true_n + eps * n_total, (
            f"{k}: overestimate {got[k]} > {true_n} + {eps * n_total:.1f}"
        )


def test_cms_merge_equals_direct(spark):
    df, _ = _zipf_df(spark)
    a = df.limit(10000).filter(F.col("k") < "key5")
    b = df.subtract(a)  # set-difference is fine: keys are duplicated rows
    # subtract dedups rows — build halves by hash split instead
    a = df.filter(F.crc32(F.col("k")) % 2 == 0)
    b = df.filter(F.crc32(F.col("k")) % 2 == 1)
    merged = cms_merge(
        cms_partial(a, "k", 4, 128), cms_partial(b, "k", 4, 128)
    )
    direct = cms_partial(df, "k", 4, 128)
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


def test_cms_weighted(spark):
    df = spark.createDataFrame(
        [Row(k="a", w=10), Row(k="a", w=5), Row(k="b", w=7)]
    )
    cms = cms_partial(df, "k", depth=4, width=64, weight_col="w")
    probes = spark.createDataFrame([Row(k="a"), Row(k="b"), Row(k="zzz")])
    got = {r["k"]: r["est"] for r in cms_lookup(cms, probes, "k", 4, 64).collect()}
    assert got["a"] >= 15 and got["b"] >= 7
    # absent key: min over rows can only hit occupied cells by collision
    assert got["zzz"] >= 0


def test_cms_bad_dims(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        cms_partial(df, "k", depth=0)
    with pytest.raises(ValueError):
        cms_partial(df, "k", width=1)


# ── char_diversity ───────────────────────────────────────────────────


def test_char_diversity_known_values(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aaaa"),  # single char: simpson 0, top 1.0
            Row(doc_id=2, text="ab"),  # uniform 2: simpson 0.5, top 0.5
            Row(doc_id=3, text="aab"),  # 2/3 a: simpson 1-(4+1)/9
            Row(doc_id=4, text=""),  # empty: explicit zero row
            Row(doc_id=5, text=None),  # null: same
        ]
    )
    got = {r["doc_id"]: r for r in char_diversity(docs).collect()}
    assert len(got) == 5
    assert got[1]["simpson"] == 0.0 and got[1]["top_char_fraction"] == 1.0
    assert got[2]["simpson"] == 0.5 and got[2]["top_char_fraction"] == 0.5
    assert got[3]["n_chars"] == 3 and got[3]["distinct_chars"] == 2
    assert got[3]["simpson"] == 1.0 - 5.0 / 9.0
    for d in (4, 5):
        assert got[d]["n_chars"] == 0 and got[d]["distinct_chars"] == 0
        assert got[d]["top_char_fraction"] is None
        assert got[d]["simpson"] is None


# ── distinct_rollup (daily→period KPI distinct) ──────────────────────


def test_distinct_rollup_accuracy_and_shape(spark):
    from smartdatapipeline_spark.operators.kpi import distinct_rollup

    # 3 metrics × 2 months; per (month, metric) distinct user counts
    # chosen large enough to exercise both HLL ranges
    rows = []
    for mi, metric in enumerate(("a", "b", "c")):
        for month, base in (("2024-01", 0), ("2024-02", 50_000)):
            n = [40, 3000, 900][mi]
            for i in range(n):
                rows.append(
                    Row(
                        ts=f"{month}-{(i % 27) + 1:02d} 12:00:00",
                        metric=metric,
                        user_id=base + mi * 1_000_000 + i,
                    )
                )
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    est = distinct_rollup(df, key_col="user_id", metric_col="metric")
    got = {(str(r["period"]), r["metric"]): r for r in est.collect()}
    assert len(got) == 6
    for (period, metric), r in got.items():
        true_n = {"a": 40, "b": 3000, "c": 900}[metric]
        # apply the linear-counting correction manually when flagged
        if r["small_range"]:
            e = 256 * math.log(256 / r["v_empty"])
        else:
            e = r["raw_est"]
        assert abs(e - true_n) / true_n < 2 * 1.04 / math.sqrt(256), (
            period,
            metric,
            e,
            true_n,
        )


def test_distinct_rollup_matches_direct_sketch(spark):
    # the rollup's folded registers must equal sketching each whole
    # month directly — same identity the oracle pins, here as a unit
    from smartdatapipeline_spark.operators.kpi import distinct_rollup

    rows = [
        Row(
            ts=f"2024-0{1 + (i % 2)}-{(i % 25) + 1:02d} 08:00:00",
            metric="m",
            user_id=i % 777,
        )
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    rolled = distinct_rollup(df, key_col="user_id", metric_col="metric")
    direct = hll_raw_estimate(
        hll_partial(
            df.withColumn("period", F.trunc(F.to_date("ts"), "month")),
            "user_id",
            by=["period", "metric"],
        ),
        by=["period", "metric"],
    )
    got = sorted(tuple(map(str, r)) for r in rolled.collect())
    want = sorted(tuple(map(str, r)) for r in direct.collect())
    assert got == want


# ── KMV / bottom-k (distinct sketch with set algebra) ────────────────


def test_kmv_distinct_accuracy(spark):
    from smartdatapipeline_spark.functions.sketch import kmv_distinct, kmv_partial

    n = 5000
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    est = kmv_distinct(kmv_partial(df, "k", k=256), k=256).collect()[0]
    assert not est["exact"]
    # rel std err ~ 1/sqrt(k-2) = 6.3%; allow 3 sigma
    assert abs(est["est"] - n) / n < 3 / math.sqrt(254), est["est"]


def test_kmv_exact_below_k(spark):
    from smartdatapipeline_spark.functions.sketch import kmv_distinct, kmv_partial

    df = spark.range(40).select(F.col("id").cast("string").alias("k"))
    est = kmv_distinct(kmv_partial(df, "k", k=64), k=64).collect()[0]
    assert est["exact"] and est["est"] == 40.0 and est["n_vals"] == 40


def test_kmv_merge_equals_direct(spark):
    from smartdatapipeline_spark.functions.sketch import kmv_merge, kmv_partial

    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("k"))
    merged = kmv_merge(kmv_partial(a, "k", k=64), kmv_partial(b, "k", k=64), k=64)
    direct = kmv_partial(a.unionByName(b), "k", k=64)
    got = sorted((r["pos"], r["h"]) for r in merged.collect())
    want = sorted((r["pos"], r["h"]) for r in direct.collect())
    assert got == want and len(got) == 64


def test_kmv_two_level_equals_single_window(spark):
    # the bucketed fold must be EXACTLY the naive single-window rank
    from pyspark.sql.window import Window

    from smartdatapipeline_spark.functions.sketch import kmv_partial
    from smartdatapipeline_spark.functions.sketch import KMV_SALT, _h60_of

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    fast = kmv_partial(df, "k", k=64)
    h = _h60_of(F.concat(F.lit(KMV_SALT), F.col("k")))
    naive = (
        df.select(h.alias("h"))
        .distinct()
        .withColumn("pos", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("pos") <= 64)
    )
    assert sorted(tuple(r) for r in fast.select("pos", "h").collect()) == sorted(
        tuple(r) for r in naive.select("pos", "h").collect()
    )


def test_kmv_intersect_known_overlap(spark):
    from smartdatapipeline_spark.functions.sketch import kmv_intersect, kmv_partial

    # |A|=4000, |B|=4000, |A∩B|=2000, |A∪B|=6000, J=1/3
    a = spark.range(0, 4000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("k"))
    res = kmv_intersect(
        kmv_partial(a, "k", k=512), kmv_partial(b, "k", k=512), k=512
    ).collect()[0]
    assert res["union_n_vals"] == 512
    assert abs(res["jaccard_est"] - 1 / 3) < 0.1, res["jaccard_est"]
    assert abs(res["inter_est"] - 2000) / 2000 < 0.25, res["inter_est"]


def test_kmv_intersect_disjoint(spark):
    from smartdatapipeline_spark.functions.sketch import kmv_intersect, kmv_partial

    a = spark.range(0, 1000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(50_000, 51_000).select(F.col("id").cast("string").alias("k"))
    res = kmv_intersect(
        kmv_partial(a, "k", k=64), kmv_partial(b, "k", k=64), k=64
    ).collect()[0]
    assert res["n_match"] == 0 and res["jaccard_est"] == 0.0
    assert res["inter_est"] == 0.0


# ── Bloom membership sketch ──────────────────────────────────────────


def test_bloom_no_false_negatives(spark):
    from smartdatapipeline_spark.functions.sketch import bloom_contains, bloom_partial

    members = spark.range(500).select(F.col("id").cast("string").alias("k"))
    bloom = bloom_partial(members, "k", m_bits=8192, n_hashes=4)
    got = {
        r["k"]: r["might_contain"]
        for r in bloom_contains(bloom, members, "k", 8192, 4).collect()
    }
    assert len(got) == 500 and all(got.values())  # NO false negatives, ever


def test_bloom_false_positive_rate(spark):
    from smartdatapipeline_spark.functions.sketch import bloom_contains, bloom_partial

    members = spark.range(500).select(F.col("id").cast("string").alias("k"))
    outsiders = spark.range(100_000, 102_000).select(
        F.col("id").cast("string").alias("k")
    )
    bloom = bloom_partial(members, "k", m_bits=8192, n_hashes=4)
    got = [
        r["might_contain"]
        for r in bloom_contains(bloom, outsiders, "k", 8192, 4).collect()
    ]
    fpr = sum(got) / len(got)
    # design FPR at n=500, m=8192, k=4 is ~0.24%; allow generous 2%
    assert fpr < 0.02, fpr


def test_bloom_merge_equals_direct(spark):
    from smartdatapipeline_spark.functions.sketch import bloom_merge, bloom_partial

    a = spark.range(0, 300).select(F.col("id").cast("string").alias("k"))
    b = spark.range(200, 600).select(F.col("id").cast("string").alias("k"))
    merged = bloom_merge(
        bloom_partial(a, "k", m_bits=2048, n_hashes=4),
        bloom_partial(b, "k", m_bits=2048, n_hashes=4),
    )
    direct = bloom_partial(a.unionByName(b), "k", m_bits=2048, n_hashes=4)
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


def test_bloom_words_positive(spark):
    # 60-bit words: every mask fits positive BIGINT on any engine
    from smartdatapipeline_spark.functions.sketch import bloom_partial

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    rows = bloom_partial(df, "k", m_bits=4096, n_hashes=4).collect()
    assert all(r["bits"] > 0 for r in rows)
    assert all(0 <= r["word"] < 4096 // 60 + 1 for r in rows)


def test_bloom_bad_dims(spark):
    from smartdatapipeline_spark.functions.sketch import bloom_partial

    df = spark.range(3).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        bloom_partial(df, "k", m_bits=32)
    with pytest.raises(ValueError):
        bloom_partial(df, "k", n_hashes=0)


def test_hll_rollup_cascade_exact(spark):
    # the folded grains must equal sketching each grain directly
    from smartdatapipeline_spark.functions.sketch import hll_rollup

    rows = [
        Row(metric=("a" if i % 3 else "b"), day=f"d{i % 4}", k=i % 333)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows)
    out = hll_rollup(df, "k", dims=["metric", "day"]).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[0]) == 8 and len(by_gid[1]) == 2 and len(by_gid[3]) == 1
    # gid=1 folded rows equal direct per-metric estimates
    direct = {
        r["metric"]: r
        for r in hll_raw_estimate(
            hll_partial(df, "k", by=["metric"]), by=["metric"]
        ).collect()
    }
    for r in by_gid[1]:
        d = direct[r["metric"]]
        assert r["day"] is None
        assert (r["z_num"], r["raw_est"]) == (d["z_num"], d["raw_est"])
    # grand total equals direct global estimate
    g = hll_raw_estimate(hll_partial(df, "k")).collect()[0]
    assert by_gid[3][0]["z_num"] == g["z_num"]
    assert by_gid[3][0]["metric"] is None and by_gid[3][0]["day"] is None


def test_semantic_decontaminate_flags_planted_paraphrase(spark):
    # eval vector e and a near-copy c (tiny perturbation, same bucket);
    # an orthogonal-ish vector stays clean
    from smartdatapipeline_spark.functions.similarity import semantic_decontaminate

    rows = [
        Row(vec_id=1, embedding=[1.0, 0.2, 0.1, 0.9]),   # eval
        Row(vec_id=2, embedding=[0.99, 0.21, 0.1, 0.88]),  # paraphrase
        Row(vec_id=3, embedding=[-1.0, 0.4, -0.2, -0.9]),  # clean
    ]
    df = spark.createDataFrame(rows)
    ev = df.filter(F.col("vec_id") == 1)
    got = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            df, ev, threshold=0.9, nbits=4, exclude_same_id=True
        ).collect()
    }
    assert len(got) == 3
    assert got[2]["contaminated"] and got[2]["n_eval_hits"] == 1
    assert got[2]["max_sim"] > 0.99
    assert not got[3]["contaminated"] and got[3]["max_sim"] is None
    # eval ⊂ corpus with exclude_same_id=True: the eval member itself
    # is excluded from self-match
    assert not got[1]["contaminated"]


def test_semantic_decontaminate_independent_id_namespaces(spark):
    """ADVICE r10: by default (exclude_same_id=False) an INDEPENDENT
    eval set whose integer ids collide with corpus ids must still flag
    the contaminated pair — id equality is not identity across
    namespaces."""
    from smartdatapipeline_spark.functions.similarity import semantic_decontaminate

    corpus = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 0.2, 0.1, 0.9])]
    )
    # independent eval set, coincidentally also id 1, nearly identical
    ev = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.99, 0.21, 0.1, 0.88])]
    )
    got = semantic_decontaminate(corpus, ev, threshold=0.9, nbits=4).collect()
    assert len(got) == 1 and got[0]["contaminated"]
    # opt-in exclusion reproduces the old (self-subset) semantics
    got2 = semantic_decontaminate(
        corpus, ev, threshold=0.9, nbits=4, exclude_same_id=True
    ).collect()
    assert len(got2) == 1 and not got2[0]["contaminated"]


# ── Dyadic-CMS mergeable quantiles ───────────────────────────────────


def test_dyadic_quantiles_rank_error(spark):
    from smartdatapipeline_spark.functions.sketch import (
        dyadic_cms_partial,
        dyadic_cms_quantiles,
    )

    n = 20_000
    # deterministic skewed-ish integer data in [0, 2^16)
    df = spark.range(n).select(
        ((F.col("id") * F.col("id")) % 50_000).alias("v")
    )
    vals = sorted(((i * i) % 50_000) for i in range(n))
    sk = dyadic_cms_partial(df, "v", levels=16, depth=4, width=2048)
    got = dyadic_cms_quantiles(
        sk, [0.1, 0.5, 0.9], total_n=n, levels=16, depth=4, width=2048
    )
    import bisect

    for q, g in zip([0.1, 0.5, 0.9], got):
        # rank of the returned value must be within 5% of q*n
        lo = bisect.bisect_left(vals, g)
        hi = bisect.bisect_right(vals, g)
        target = q * n
        assert lo - 0.05 * n <= target <= hi + 0.05 * n, (q, g, lo, hi)


def test_dyadic_merge_equals_direct(spark):
    from smartdatapipeline_spark.functions.sketch import (
        dyadic_cms_merge,
        dyadic_cms_partial,
    )

    df = spark.range(4000).select((F.col("id") % 1000).alias("v"))
    a = df.filter(F.col("v") % 2 == 0)
    b = df.filter(F.col("v") % 2 == 1)
    merged = dyadic_cms_merge(
        dyadic_cms_partial(a, "v", levels=10, width=256),
        dyadic_cms_partial(b, "v", levels=10, width=256),
    )
    direct = dyadic_cms_partial(df, "v", levels=10, width=256)
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


def test_dyadic_exact_on_tiny_domain(spark):
    # tiny distinct domain + wide grid ⇒ no collisions ⇒ quantiles exact
    from smartdatapipeline_spark.functions.sketch import (
        dyadic_cms_partial,
        dyadic_cms_quantiles,
    )

    rows = [Row(v=1)] * 10 + [Row(v=5)] * 10 + [Row(v=9)] * 10
    df = spark.createDataFrame(rows)
    sk = dyadic_cms_partial(df, "v", levels=4, depth=4, width=2048)
    got = dyadic_cms_quantiles(
        sk, [0.2, 0.5, 0.95], total_n=30, levels=4, depth=4, width=2048
    )
    assert got == [1, 5, 9], got


def test_dyadic_bad_dims(spark):
    from smartdatapipeline_spark.functions.sketch import dyadic_cms_partial

    df = spark.range(3).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        dyadic_cms_partial(df, "v", levels=0)
    with pytest.raises(ValueError):
        dyadic_cms_partial(df, "v", levels=63)


# ── parameter/grouping paths not covered above ───────────────────────


def test_kmv_intersect_grouped(spark):
    from smartdatapipeline_spark.functions.sketch import kmv_intersect, kmv_partial

    # group g1: heavy overlap; group g2: disjoint
    a = spark.createDataFrame(
        [Row(g="g1", k=str(i)) for i in range(300)]
        + [Row(g="g2", k=str(i)) for i in range(100)]
    )
    b = spark.createDataFrame(
        [Row(g="g1", k=str(i)) for i in range(150, 450)]
        + [Row(g="g2", k=str(i)) for i in range(5000, 5100)]
    )
    res = {
        r["g"]: r
        for r in kmv_intersect(
            kmv_partial(a, "k", by=["g"], k=128),
            kmv_partial(b, "k", by=["g"], k=128),
            by=["g"],
            k=128,
        ).collect()
    }
    assert res["g1"]["n_match"] > 0 and res["g1"]["jaccard_est"] > 0.1
    assert res["g2"]["n_match"] == 0 and res["g2"]["inter_est"] == 0.0


def test_bloom_grouped(spark):
    from smartdatapipeline_spark.functions.sketch import bloom_partial

    df = spark.createDataFrame(
        [Row(g="a", k=str(i)) for i in range(50)]
        + [Row(g="b", k=str(i)) for i in range(50, 80)]
    )
    words = bloom_partial(df, "k", by=["g"], m_bits=1024, n_hashes=3).collect()
    gs = {r["g"] for r in words}
    assert gs == {"a", "b"}
    # per-group word tables are independent: group b has fewer set bits
    import collections

    bits = collections.Counter()
    for r in words:
        bits[r["g"]] += bin(r["bits"] & ((1 << 60) - 1)).count("1")
    assert bits["a"] > bits["b"] > 0


def test_hll_p12_accuracy(spark):
    # non-default precision end-to-end: m=4096, rel err ~1.6%
    df = spark.range(50_000).select(F.col("id").cast("string").alias("k"))
    est = hll_estimate(hll_partial(df, "k", p=12), p=12).collect()[0]
    assert abs(est["estimate"] - 50_000) / 50_000 < 2 * 1.04 / math.sqrt(4096)


def test_hll_rollup_single_dim(spark):
    from smartdatapipeline_spark.functions.sketch import hll_rollup

    df = spark.createDataFrame(
        [Row(m="x", k=i % 100) for i in range(500)]
        + [Row(m="y", k=i % 40) for i in range(200)]
    )
    out = hll_rollup(df, "k", dims=["m"]).collect()
    gids = sorted({r["gid"] for r in out})
    assert gids == [0, 1]
    leafs = [r for r in out if r["gid"] == 0]
    total = [r for r in out if r["gid"] == 1]
    assert len(leafs) == 2 and len(total) == 1 and total[0]["m"] is None


# ── round 10: grouped dyadic-CMS quantiles ───────────────────────────


def test_dyadic_grouped_quantiles_rank_error(spark):
    """Per-group walk: each group's quantiles hit within 5% rank error
    of that group's own distribution (two groups with very different
    shapes so a cross-group leak would fail loudly)."""
    import bisect

    from smartdatapipeline_spark.functions.sketch import (
        dyadic_cms_partial,
        dyadic_cms_quantiles_grouped,
    )

    n = 10_000
    # group a: quadratic residues; group b: small linear ramp
    df = spark.range(n).select(
        F.lit("a").alias("g"), ((F.col("id") * F.col("id")) % 50_000).alias("v")
    ).unionByName(
        spark.range(n).select(
            F.lit("b").alias("g"), (F.col("id") % 977).alias("v")
        )
    )
    truth = {
        ("a",): sorted(((i * i) % 50_000) for i in range(n)),
        ("b",): sorted((i % 977) for i in range(n)),
    }
    sk = dyadic_cms_partial(df, "v", levels=16, depth=4, width=2048, by=["g"])
    got = dyadic_cms_quantiles_grouped(
        sk, [0.1, 0.5, 0.9], totals={("a",): n, ("b",): n},
        by=["g"], levels=16, depth=4, width=2048,
    )
    assert set(got) == {("a",), ("b",)}
    for g, anss in got.items():
        vals = truth[g]
        for q, ans in zip([0.1, 0.5, 0.9], anss):
            lo = bisect.bisect_left(vals, ans)
            hi = bisect.bisect_right(vals, ans)
            target = q * n
            assert lo - 0.05 * n <= target <= hi + 0.05 * n, (g, q, ans, lo, hi)
    # group b's p90 must be small (≤ 977) — proves no cross-group mass
    assert got[("b",)][2] <= 977


def test_dyadic_grouped_merge_equals_direct(spark):
    """Cell-wise SUM merge of per-partial grouped grids == grid of the
    concatenated data, per group (the mergeable-summary contract)."""
    from smartdatapipeline_spark.functions.sketch import (
        dyadic_cms_merge,
        dyadic_cms_partial,
    )

    d1 = spark.range(4_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        ((F.col("id") * 7) % 30_000).alias("v"),
    )
    d2 = spark.range(4_000, 9_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        ((F.col("id") * 7) % 30_000).alias("v"),
    )
    kw = dict(levels=15, depth=4, width=512, by=["g"])
    merged = dyadic_cms_merge(
        dyadic_cms_partial(d1, "v", **kw),
        dyadic_cms_partial(d2, "v", **kw),
        by=["g"],
    )
    direct = dyadic_cms_partial(d1.unionByName(d2), "v", **kw)
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(merged) == rows(direct)


def test_dyadic_grouped_missing_total_raises(spark):
    from smartdatapipeline_spark.functions.sketch import (
        dyadic_cms_partial,
        dyadic_cms_quantiles_grouped,
    )

    df = spark.range(100).select(
        F.lit("a").alias("g"), (F.col("id") % 50).alias("v")
    )
    sk = dyadic_cms_partial(df, "v", levels=8, depth=2, width=64, by=["g"])
    with pytest.raises(ValueError, match="no total for group"):
        dyadic_cms_quantiles_grouped(
            sk, [0.5], totals={}, by=["g"], levels=8, depth=2, width=64
        )
