"""Invariant tests for the link-prediction/supply-chain/percentile wave
(link_prediction_common_neighbors, part_demand_intermittency,
daily_percentile_bands, sequential_pattern_support,
median_of_means_estimate) — independent Python references.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _md5mod(key: str, hexlen: int, mod: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:hexlen], 16) % mod


def test_link_prediction_matches_python_reference(spark):
    """Top-50 induced subgraph, CN counts and RA index on non-edges."""
    rows = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order = defaultdict(set)
    for r in rows:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    top50 = set(sorted(deg, key=lambda n: (-deg[n], n))[:50])
    ind = {(u, v) for u, v in edges if u in top50 and v in top50}
    adj = defaultdict(set)
    for u, v in ind:
        adj[u].add(v)
        adj[v].add(u)
    ideg = {n: len(vs) for n, vs in adj.items()}
    cand = {}
    for z in adj:
        ns = sorted(adj[z])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                u, v = ns[i], ns[j]
                cn, ra = cand.get((u, v), (0, 0))
                cand[(u, v)] = (cn + 1, ra + 1_000_000 // ideg[z])
    non_edge = {k: v for k, v in cand.items() if k not in ind}
    expect = sorted(
        non_edge.items(), key=lambda kv: (-kv[1][0], -kv[1][1], kv[0])
    )[:20]
    got = REGISTRY["link_prediction_common_neighbors"].spark(spark, SF).collect()
    assert [((r.u, r.v), (r.common_neighbors, r.ra_index_ppm)) for r in got] \
        == expect
    for r in got:
        assert (r.u, r.v) not in ind  # predicted links are NOT edges


def test_intermittency_matches_python_reference(spark):
    """ADI/CV² quadrant classes rolled up per brand."""
    li = (
        load_table(spark, SF, "lineitem")
        .join(load_table(spark, SF, "part"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(load_table(spark, SF, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_partkey", "p_brand",
            F.date_trunc("month", "o_orderdate").alias("m"),
            F.expr("CAST(round(l_quantity) AS BIGINT)").alias("q"),
        )
        .collect()
    )
    dm = defaultdict(int)
    brand = {}
    for r in li:
        dm[(r.l_partkey, r.m)] += r.q
        brand[r.l_partkey] = r.p_brand
    n_periods = len({m for _, m in dm})
    per_part = defaultdict(list)
    for (pk, _), q in dm.items():
        per_part[pk].append(q)
    agg = Counter()
    sums = defaultdict(lambda: [0, 0])
    for pk, qs in per_part.items():
        nd, sq, sqq = len(qs), sum(qs), sum(q * q for q in qs)
        adi = 1000 * n_periods // nd
        cv2 = (
            1000 * nd * (nd * sqq - sq * sq) // ((nd - 1) * sq * sq)
            if nd >= 2 else 0
        )
        cls = (
            "smooth" if adi < 1320 and cv2 < 490
            else "intermittent" if adi >= 1320 and cv2 < 490
            else "erratic" if adi < 1320
            else "lumpy"
        )
        agg[(brand[pk], cls)] += 1
        sums[(brand[pk], cls)][0] += adi
        sums[(brand[pk], cls)][1] += cv2
    got = {(r.p_brand, r.demand_class): r for r in
           REGISTRY["part_demand_intermittency"].spark(spark, SF).collect()}
    assert set(got) == set(agg)
    for key, n in agg.items():
        r = got[key]
        assert r.n_parts == n
        assert r.avg_adi_milli == sums[key][0] // n
        assert r.avg_cv2_milli == sums[key][1] // n


def test_percentile_bands_match_python_reference(spark):
    """Nearest-rank ⌈qn⌉ order statistics per day."""
    rows = load_table(spark, SF, "events").select(
        F.to_date("ts").alias("day"),
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
        "event_id",
    ).collect()
    per_day = defaultdict(list)
    for r in rows:
        per_day[r.day].append((r.vm, r.event_id))
    got = {r.day: r for r in
           REGISTRY["daily_percentile_bands"].spark(spark, SF).collect()}
    assert set(got) == set(per_day)
    for day, vs in per_day.items():
        vs.sort()
        n = len(vs)
        r = got[day]
        assert r.n_events == n
        for q, col in ((50, r.p50_micro), (90, r.p90_micro), (99, r.p99_micro)):
            k = (n * q + 99) // 100
            assert col == vs[k - 1][0], (day, q)
        assert r.max_micro == vs[-1][0]
        assert r.p50_micro <= r.p90_micro <= r.p99_micro <= r.max_micro


def test_sequential_pattern_matches_python_reference(spark):
    """first-a < last-b ordering support per directed type pair."""
    rows = load_table(spark, SF, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    mn, mx = {}, {}
    for r in rows:
        k = (r.user_id, r.event_type)
        mn[k] = min(mn.get(k, r.us), r.us)
        mx[k] = max(mx.get(k, r.us), r.us)
    users = defaultdict(set)
    for u, t in mn:
        users[u].add(t)
    both = Counter()
    ordered = Counter()
    for u, ts in users.items():
        for ta in ts:
            for tb in ts:
                if ta == tb:
                    continue
                both[(ta, tb)] += 1
                if mn[(u, ta)] < mx[(u, tb)]:
                    ordered[(ta, tb)] += 1
    got = {(r.type_a, r.type_b): r for r in
           REGISTRY["sequential_pattern_support"].spark(spark, SF).collect()}
    assert set(got) == set(both)
    for key in both:
        r = got[key]
        assert r.n_both == both[key]
        assert r.n_ordered == ordered[key]
        assert r.ordered_ppm == ordered[key] * 1_000_000 // both[key]


def test_median_of_means_matches_python_reference(spark):
    """17 md5 buckets, floor bucket means, median by (mean, bucket)."""
    rows = load_table(spark, SF, "events").select(
        "event_id", "event_type",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
    ).collect()
    bs = defaultdict(lambda: [0, 0])
    for r in rows:
        b = _md5mod(f"{r.event_id}:mom", 6, 17)
        k = (r.event_type, b)
        bs[k][0] += r.vm
        bs[k][1] += 1
    got = {r.event_type: r for r in
           REGISTRY["median_of_means_estimate"].spark(spark, SF).collect()}
    types = {t for t, _ in bs}
    assert set(got) == types
    for et in types:
        means = sorted(
            (s // c, b) for (t, b), (s, c) in bs.items() if t == et
        )
        nb = len(means)
        tot_s = sum(s for (t, _), (s, c) in bs.items() if t == et)
        tot_c = sum(c for (t, _), (s, c) in bs.items() if t == et)
        r = got[et]
        assert r.n_buckets == nb
        assert r.n_events == tot_c
        assert r.mean_micro == tot_s // tot_c
        assert r.mom_micro == means[(nb + 1) // 2 - 1][0]
        assert r.mom_minus_mean_micro == r.mom_micro - r.mean_micro
