"""Invariant tests for the round-5 wave 4: Western Electric run rules,
coordinated join sampling, DTW alignment — independent Python replays at
sf0.001.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_western_electric_python_replay(spark):
    rows = load_table(spark, SF, "events").collect()
    by_day = defaultdict(int)
    for r in rows:
        if r.event_type == "purchase":
            by_day[r.ts.date()] += round(r.value * 100)
    xs = [x for _, x in sorted(by_day.items())]
    n, s = len(xs), sum(xs)
    q = sum(x * x for x in xs)
    nvar = n * q - s * s
    e = [n * x - s for x in xs]
    got = REGISTRY["western_electric_rules"].spark(spark, SF).collect()
    assert len(got) == n
    for t, r in enumerate(got):
        assert r.dev_scaled == e[t]
        assert r.rule1_beyond3 == (e[t] * e[t] > 9 * nvar)
        w3 = e[max(0, t - 2):t + 1]
        assert r.rule2_2of3 == (
            sum(1 for v in w3 if v * v > 4 * nvar and v > 0) >= 2
            or sum(1 for v in w3 if v * v > 4 * nvar and v < 0) >= 2
        )
        w5 = e[max(0, t - 4):t + 1]
        assert r.rule3_4of5 == (
            sum(1 for v in w5 if v * v > nvar and v > 0) >= 4
            or sum(1 for v in w5 if v * v > nvar and v < 0) >= 4
        )
        w8 = e[max(0, t - 7):t + 1]
        assert r.rule4_8side == (
            sum(1 for v in w8 if v > 0) == 8
            or sum(1 for v in w8 if v < 0) == 8
        )
    # near-uniform synthetic revenue: no 3-sigma escape (the 1.73-sigma
    # bound of a uniform), so rule 1 must be all-false on this data
    assert not any(r.rule1_beyond3 for r in got)


def _kept(key: int) -> bool:
    return hashlib.md5(f"{key}:cs".encode()).hexdigest()[:8] < "40000000"


def test_coordinated_sample_join_identity(spark):
    orders = load_table(spark, SF, "orders").collect()
    lines = load_table(spark, SF, "lineitem").collect()
    pri = {o.o_orderkey: o.o_orderpriority for o in orders}
    true_rev = defaultdict(int)
    samp = defaultdict(lambda: [0, 0])
    for l in lines:
        p = pri[l.l_orderkey]
        c = round(l.l_extendedprice * 100)
        true_rev[p] += c
        # coordination: both sides keep the key by the SAME rule, so the
        # sampled join is exactly {lines whose orderkey is kept}
        if _kept(l.l_orderkey):
            samp[p][0] += 1
            samp[p][1] += c
    got = {r.o_orderpriority: r for r in
           REGISTRY["coordinated_join_sample"].spark(spark, SF).collect()}
    assert set(got) == set(true_rev)
    for p in true_rev:
        r = got[p]
        n, sc = samp[p]
        assert (r.n_sampled_lines, r.est_revenue_cents) == (n, 4 * sc)
        assert r.true_revenue_cents == true_rev[p]
        assert r.err_ppm == tdiv(abs(4 * sc - true_rev[p]) * 1000000,
                                 true_rev[p])
        # a 25% coordinated sample should estimate within ~25% here
        assert r.err_ppm < 250000


def test_dtw_python_replay(spark):
    rows = load_table(spark, SF, "events").collect()
    a, b = defaultdict(int), defaultdict(int)
    days = set()
    for r in rows:
        d = r.ts.date()
        days.add(d)
        if r.event_type == "purchase":
            a[d] += round(r.value * 100)
        elif r.event_type == "click":
            b[d] += round(r.value * 100)
    ds = sorted(days)
    xs = [a[d] for d in ds]
    ys = [b[d] for d in ds]
    n, m = len(xs), len(ys)
    BIG = 10 ** 15
    D = [[BIG] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i][j] = abs(xs[i - 1] - ys[j - 1]) + min(
                D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
    l1 = sum(abs(x - y) for x, y in zip(xs, ys))
    row = REGISTRY["dtw_alignment_distance"].spark(spark, SF).collect()[0]
    assert row.n_days == n
    assert row.dtw_cents == D[n][m]
    assert row.l1_cents == l1
    assert row.warping_gain_ppm == tdiv((l1 - D[n][m]) * 1000000, l1)
    # warping can only help when series lengths are equal
    assert 0 <= row.dtw_cents <= l1
