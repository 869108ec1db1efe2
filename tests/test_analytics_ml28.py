"""Invariant tests for the MMDS-sketch wave (pcy_pair_pruning,
flajolet_martin_distinct) — independent Python references.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_pcy_matches_python_reference(spark):
    rows = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey % 50)
    items = Counter()
    for s in baskets.values():
        items.update(s)
    support = len(baskets) // 20
    freq_items = {i for i, c in items.items() if c >= support}
    pair_cnt = Counter()
    bucket_cnt = Counter()
    for s in baskets.values():
        ss = sorted(s)
        for ai in range(len(ss)):
            for bi in range(ai + 1, len(ss)):
                x, y = ss[ai], ss[bi]
                pair_cnt[(x, y)] += 1
                bucket_cnt[(x * 53 + y) % 257] += 1
    freq_buckets = {b for b, c in bucket_cnt.items() if c >= support}
    cand_apriori = sum(
        1 for (x, y) in pair_cnt if x in freq_items and y in freq_items
    )
    cand_pcy = sum(
        1
        for (x, y) in pair_cnt
        if x in freq_items and y in freq_items
        and (x * 53 + y) % 257 in freq_buckets
    )
    truly = sum(1 for c in pair_cnt.values() if c >= support)
    false_neg = sum(
        1
        for (x, y), c in pair_cnt.items()
        if c >= support
        and not (
            x in freq_items and y in freq_items
            and (x * 53 + y) % 257 in freq_buckets
        )
    )
    r = REGISTRY["pcy_pair_pruning"].spark(spark, SF).collect()[0]
    assert r.support_threshold == support
    assert r.n_items == len(items)
    assert r.n_freq_items == len(freq_items)
    assert r.n_distinct_pairs == len(pair_cnt)
    assert r.cand_apriori == cand_apriori
    assert r.cand_pcy == cand_pcy
    assert r.truly_frequent == truly
    assert r.false_negatives == false_neg
    # PCY soundness: a frequent pair's own count lower-bounds its
    # bucket count, so it can never be pruned
    assert false_neg == 0
    assert r.pcy_retention_ppm == (
        0 if cand_apriori == 0 else cand_pcy * 1_000_000 // cand_apriori
    )
    assert r.cand_pcy <= r.cand_apriori  # pruning only removes


def _tz(v: int) -> int:
    if v == 0:
        return 48
    n = 0
    while v % 2 == 0:
        v //= 2
        n += 1
    return n


def test_flajolet_martin_matches_python_reference(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source"
    ).collect()
    per_source = defaultdict(set)
    max_tz = defaultdict(int)
    for r in docs:
        v = int(
            hashlib.md5(f"{r.doc_id}:fm".encode()).hexdigest()[:12], 16
        )
        per_source[r.source].add(v)
        max_tz[r.source] = max(max_tz[r.source], _tz(v))
    got = {r.source: r for r in
           REGISTRY["flajolet_martin_distinct"].spark(spark, SF).collect()}
    assert set(got) == set(per_source)
    for src, vals in per_source.items():
        r = got[src]
        assert r.max_tz == max_tz[src], src
        assert r.true_distinct == len(vals)
        est = 1 << max_tz[src]
        assert r.fm_estimate == est
        want = (
            est * 1000 // len(vals)
            if est >= len(vals)
            else len(vals) * 1000 // est
        )
        assert r.error_factor_milli == want
        assert r.error_factor_milli >= 1000  # a factor is always >= 1x
