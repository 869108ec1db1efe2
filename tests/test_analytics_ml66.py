"""Invariant tests for round-5 wave 12: Holt-Winters additive seasonal
smoothing, chain-ladder reserving, two-asset minimum variance, Johnson's
rule scheduling, and sorted-neighborhood blocking — independent Python
replays at sf0.001.
"""

from __future__ import annotations

import math
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cents(x: float) -> int:
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def _daily(spark, etype):
    per = defaultdict(int)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == etype:
            per[r.ts.date()] += _cents(r.value)
    return [x for _, x in sorted(per.items())]


def test_holt_winters_python_replay(spark):
    xs = _daily(spark, "purchase")
    n = len(xs)
    l = tdiv(1000 * sum(xs[:7]), 7)
    b = tdiv(1000 * (sum(xs[7:14]) - sum(xs[:7])), 49)
    sv = [1000 * xs[k] - l for k in range(7)]
    i = 0
    for x in xs[7:]:
        so = sv[i]
        ln = tdiv(200 * (1000 * x - so) + 800 * (l + b), 1000)
        bn = tdiv(100 * (ln - l) + 900 * b, 1000)
        sv[i] = tdiv(300 * (1000 * x - ln) + 700 * so, 1000)
        l, b, i = ln, bn, (i + 1) % 7
    r = REGISTRY["holt_winters_additive"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert (r.level_milli, r.trend_milli) == (l, b)
    assert r.f1_milli == l + b + sv[n % 7]
    assert r.f7_milli == l + 7 * b + sv[(n + 6) % 7]
    # the level tracks the series: within the observed range (milli)
    assert 1000 * min(xs) <= r.level_milli <= 1000 * max(xs)


def test_chain_ladder_python_replay(spark):
    orders = {o.o_orderkey: o.o_orderdate.year
              for o in load_table(spark, SF, "orders").collect()}
    cells = defaultdict(int)
    for li in load_table(spark, SF, "lineitem").collect():
        oy = orders[li.l_orderkey]
        w = li.l_shipdate.year - oy
        if w >= 0:
            cells[(oy, w)] += _cents(li.l_extendedprice)
    ky = max(oy + w for oy, w in cells)
    origins = sorted({oy for oy in orders.values() if ky - oy >= 0})
    wl = {oy: min(6, ky - oy) for oy in origins}
    cum = {}
    for oy in origins:
        c = 0
        for w in range(wl[oy] + 1):
            c += cells.get((oy, w), 0)
            cum[(oy, w)] = c
    f = {}
    for j in range(6):
        num = sum(cum[(oy, j + 1)] for oy in origins if wl[oy] >= j + 1)
        den = sum(cum[(oy, j)] for oy in origins if wl[oy] >= j + 1)
        f[j] = tdiv(1000000 * num, den) if den else None
    got = {r.origin_year: r for r in
           REGISTRY["chain_ladder_reserve"].spark(spark, SF).collect()}
    assert sorted(got) == origins
    for oy in origins:
        latest = cum[(oy, wl[oy])]
        ult = latest
        for j in range(wl[oy], 6):
            ult = tdiv(ult * f[j], 1000000)
        r = got[oy]
        assert (r.dev_years_observed, r.latest_cents) == (wl[oy], latest)
        assert r.ultimate_cents == ult
        assert r.reserve_cents == ult - latest
        # cumulative development never shrinks: factors >= 1 so the
        # projected reserve is nonnegative; the complete origin needs none
        assert r.reserve_cents >= 0
        if wl[oy] == 6:
            assert r.reserve_cents == 0
    # age-to-age factors are >= 1 (cumulative of nonnegative increments)
    assert all(v is None or v >= 1000000 for v in f.values())


def test_min_variance_python_replay(spark):
    xa = _daily(spark, "purchase")
    xb = _daily(spark, "click")
    assert len(xa) == len(xb)  # all 30 days present in both series
    n = len(xa)
    sa, sb = sum(xa), sum(xb)
    qa = sum(v * v for v in xa)
    qb = sum(v * v for v in xb)
    p = sum(a * b for a, b in zip(xa, xb))
    va, vb, cv = n * qa - sa * sa, n * qb - sb * sb, n * p - sa * sb
    den = va + vb - 2 * cv
    r = REGISTRY["min_variance_two_asset"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.w_a_ppm == tdiv(1000000 * (vb - cv), den)
    assert r.w_b_ppm == 1000000 - tdiv(1000000 * (vb - cv), den)
    a3, b3, c3 = tdiv(va, 1000), tdiv(vb, 1000), tdiv(cv, 1000)
    assert r.corr2_signed_ppm == tdiv(1000000 * c3 * abs(c3), a3 * b3)
    assert r.minvar_ratio_ppm == tdiv(
        1000000 * (a3 * b3 - c3 * c3), tdiv(den, 1000) * min(a3, b3)
    )
    # allocation identity and the diversification bound
    assert r.w_a_ppm + r.w_b_ppm == 1000000
    assert r.minvar_ratio_ppm <= 1000000
    assert -1000000 <= r.corr2_signed_ppm <= 1000000


def test_johnsons_rule_python_replay(spark):
    xa = _daily(spark, "purchase")
    xb = _daily(spark, "click")
    jobs = list(zip(xa, xb, range(len(xa))))

    def makespan(order):
        tot2 = sum(p2 for _, p2, _ in order)
        cum1 = cum2 = 0
        best = 0
        for p1, p2, _ in order:
            cum1 += p1
            best = max(best, cum1 + tot2 - cum2)
            cum2 += p2
        return best

    johnson = sorted(
        jobs,
        key=lambda j: (0 if j[0] < j[1] else 1,
                       j[0] if j[0] < j[1] else -j[1], j[2]),
    )
    fifo = sorted(jobs, key=lambda j: j[2])
    r = REGISTRY["johnsons_rule_schedule"].spark(spark, SF).collect()[0]
    assert r.n_jobs == len(jobs)
    assert r.makespan_johnson_cents == makespan(johnson)
    assert r.makespan_fifo_cents == makespan(fifo)
    assert r.saving_cents == r.makespan_fifo_cents - r.makespan_johnson_cents
    # Johnson's order is optimal: no adjacent swap improves —
    # min(p1_i, p2_j) <= min(p1_j, p2_i) for every adjacent i before j
    for (a1, a2, _), (b1, b2, _) in zip(johnson, johnson[1:]):
        assert min(a1, b2) <= min(b1, a2)
    assert r.makespan_johnson_cents <= r.makespan_fifo_cents
    # flow-shop lower bounds hold
    lb = max(sum(xa) + johnson[-1][1], johnson[0][0] + sum(xb))
    assert r.makespan_johnson_cents >= lb


def test_sorted_neighborhood_python_replay(spark):
    cust = [(c.c_nationkey, _cents(c.c_acctbal), c.c_custkey)
            for c in load_table(spark, SF, "customer").collect()]
    rows = sorted(cust, key=lambda c: (c[1], c[2]))
    n = len(rows)
    key = [(nat, tdiv(v, 10000)) for nat, v, _ in rows]
    caught = sum(
        1
        for i in range(n)
        for k in range(1, 6)
        if i + k < n and key[i] == key[i + k]
    )
    grp = defaultdict(int)
    for kk in key:
        grp[kk] += 1
    true_pairs = sum(g * (g - 1) // 2 for g in grp.values())
    r = REGISTRY["sorted_neighborhood_blocking"].spark(spark, SF).collect()[0]
    assert r.n_records == n
    assert r.n_true_pairs == true_pairs
    assert r.n_candidates == 5 * n - 15
    assert r.n_caught == caught
    assert r.recall_ppm == tdiv(1000000 * caught, true_pairs)
    assert r.reduction_ppm == tdiv(1000000 * (5 * n - 15), n * (n - 1) // 2)
    # blocking caught pairs are a subset of both sets
    assert caught <= true_pairs
    assert caught <= 5 * n - 15
    # sorted-by-balance windows catch most same-bucket pairs: the sort
    # key CONTAINS the bucket, so misses only come from window overflow
    assert r.recall_ppm > 500000
