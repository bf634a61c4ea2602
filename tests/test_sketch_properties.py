"""Property-based tests (hypothesis) for the round-9 mergeable-sketch
algebra: for ARBITRARY key multisets and ARBITRARY splits into two
parts, merge(partial(A), partial(B)) must equal partial(A ⊎ B) exactly
— the invariant that makes daily partials re-aggregable at 100 TB —
plus per-sketch structural invariants (register bounds, CMS
never-underestimates, Bloom no-false-negatives) recomputed against a
plain-Python mirror of the same md5 hash.

Integer keys only (cast to string inside each builder): the properties
test ALGEBRA, not hash quality.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from smartdatapipeline_spark.functions.sketch import (
    bloom_merge,
    bloom_partial,
    cms_merge,
    cms_partial,
    hll_merge,
    hll_partial,
    kmv_merge,
    kmv_partial,
)

# small multisets keep each hypothesis example to ~2 tiny Spark jobs
KEYS = st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30)
SPLIT = st.integers(min_value=0, max_value=29)

N_EXAMPLES = 8  # each example runs Spark jobs — keep the budget tight


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _df(spark, keys):
    return spark.createDataFrame([Row(k=str(x)) for x in keys])


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(keys=KEYS, cut=SPLIT)
def test_hll_merge_commutes_with_union(spark, keys, cut):
    a, b = keys[: cut % len(keys)], keys[cut % len(keys) :]
    if not a or not b:
        return
    merged = hll_merge(hll_partial(_df(spark, a), "k"), hll_partial(_df(spark, b), "k"))
    direct = hll_partial(_df(spark, keys), "k")
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want
    # structural: registers mirror the plain-Python hash derivation
    expect = {}
    for x in set(keys):
        h = _h60("hll-v1:" + str(x))
        bucket, w = h >> 52, h & ((1 << 52) - 1)
        rho = 53 if w == 0 else 53 - w.bit_length()
        expect[bucket] = max(expect.get(bucket, 0), rho)
    assert dict(want and {r[0]: r[1] for r in want}) == expect


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(keys=KEYS, cut=SPLIT)
def test_cms_merge_commutes_and_never_underestimates(spark, keys, cut):
    a, b = keys[: cut % len(keys)], keys[cut % len(keys) :]
    if not a or not b:
        return
    merged = cms_merge(
        cms_partial(_df(spark, a), "k", 3, 32), cms_partial(_df(spark, b), "k", 3, 32)
    )
    direct = cms_partial(_df(spark, keys), "k", 3, 32)
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want
    # never-underestimate: each key's min addressed cell >= true count
    cells = {(r[0], r[1]): r[2] for r in want}
    for x in set(keys):
        true_n = keys.count(x)
        est = min(
            cells.get((row, _h60(f"cms-v1:{row}:{x}") % 32), 0) for row in range(3)
        )
        assert est >= true_n


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(keys=KEYS, cut=SPLIT)
def test_kmv_merge_commutes_with_union(spark, keys, cut):
    a, b = keys[: cut % len(keys)], keys[cut % len(keys) :]
    if not a or not b:
        return
    merged = kmv_merge(
        kmv_partial(_df(spark, a), "k", k=8), kmv_partial(_df(spark, b), "k", k=8), k=8
    )
    direct = kmv_partial(_df(spark, keys), "k", k=8)
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want
    # structural: the k smallest distinct hashes, in rank order
    hs = sorted({_h60("kmv-v1:" + str(x)) for x in keys})[:8]
    assert [h for _, h in sorted(want)] == hs


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(keys=KEYS, cut=SPLIT)
def test_bloom_merge_commutes_and_contains_all_members(spark, keys, cut):
    a, b = keys[: cut % len(keys)], keys[cut % len(keys) :]
    if not a or not b:
        return
    merged = bloom_merge(
        bloom_partial(_df(spark, a), "k", m_bits=256, n_hashes=3),
        bloom_partial(_df(spark, b), "k", m_bits=256, n_hashes=3),
    )
    direct = bloom_partial(_df(spark, keys), "k", m_bits=256, n_hashes=3)
    got = {(r["word"]): r["bits"] for r in merged.collect()}
    want = {(r["word"]): r["bits"] for r in direct.collect()}
    assert got == want
    # no false negatives vs the plain-Python mirror of the addressing
    for x in set(keys):
        for i in range(3):
            pos = _h60(f"bloom-v1:{i}:{x}") % 256
            assert want.get(pos // 60, 0) & (1 << (pos % 60)), (x, i)
