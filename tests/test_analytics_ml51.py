"""Invariant tests for the round-4 wave 2: ROC/cost curves, inequality
indices, drift, Chebyshev audit, within-block rank tests, randomness
screens, Durbin-Watson — independent Python replays at sf0.001.
"""

from __future__ import annotations

import datetime
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_roc_and_cost_python_replay(spark):
    docs = load_table(spark, SF, "documents").collect()
    scored = [(r.n_chars, 1 if r.lang == "en" else 0) for r in docs]
    n = len(scored)
    p = sum(pos for _, pos in scored)
    q = n - p
    got = {r.decile: r for r in REGISTRY["roc_curve_points"].spark(spark, SF).collect()}
    by_score = sorted(scored)
    for decile in range(1, 10):
        k = (decile * n + 9) // 10
        thr = by_score[k - 1][0]
        tp = sum(1 for s, pos in scored if pos and s > thr)
        fp = sum(1 for s, pos in scored if not pos and s > thr)
        assert got[decile].threshold == thr
        assert got[decile].tp == tp and got[decile].fp == fp
        assert got[decile].tpr_ppm == tp * 1000000 // p
        assert got[decile].fpr_ppm == fp * 1000000 // q
    # monotone: thresholds rise, TPR falls
    thrs = [got[d].threshold for d in range(1, 10)]
    assert thrs == sorted(thrs)
    tprs = [got[d].tpr_ppm for d in range(1, 10)]
    assert tprs == sorted(tprs, reverse=True)

    best = min(
        ((5 * sum(1 for s, pos in scored if pos and s <= t)
          + sum(1 for s, pos in scored if not pos and s > t)), t)
        for t in sorted({s for s, _ in scored})
    )
    row = REGISTRY["cost_threshold_optimization"].spark(spark, SF).collect()[0]
    assert (row.best_cost, row.best_threshold) == best
    assert row.cost_all_positive == q
    assert row.cost_all_negative == 5 * p
    assert row.best_cost <= min(q, 5 * p)


def test_hoover_python_replay(spark):
    sup = {r.s_suppkey: r.s_nationkey
           for r in load_table(spark, SF, "supplier").collect()}
    n2r = {r.n_nationkey: r.n_regionkey
           for r in load_table(spark, SF, "nation").collect()}
    rname = {r.r_regionkey: r.r_name
             for r in load_table(spark, SF, "region").collect()}
    rev = defaultdict(int)
    for r in load_table(spark, SF, "lineitem").collect():
        rev[(rname[n2r[sup[r.l_suppkey]]], r.l_suppkey)] += round(
            r.l_extendedprice * 100
        )
    got = {r.r_name: r for r in
           REGISTRY["hoover_index_by_region"].spark(spark, SF).collect()}
    regions = defaultdict(list)
    for (rn, _), v in rev.items():
        regions[rn].append(v)
    for rn, xs in regions.items():
        x, n = sum(xs), len(xs)
        hoover = sum(abs(n * xi - x) for xi in xs) * 1000000 // (2 * x * n)
        assert got[rn].n_suppliers == n
        assert got[rn].hoover_ppm == hoover
        assert 0 <= hoover < 1000000


def test_quintile_share_python_replay(spark):
    spend = defaultdict(int)
    cust = [r.c_custkey for r in load_table(spark, SF, "customer").collect()]
    for r in load_table(spark, SF, "orders").collect():
        spend[r.o_custkey] += round(r.o_totalprice * 100)
    ys = sorted((spend.get(c, 0), c) for c in cust)
    n = len(ys)
    top20 = sum(y for y, _ in ys[n - n // 5:])
    bottom40 = sum(y for y, _ in ys[: (2 * n) // 5])
    total = sum(y for y, _ in ys)
    row = REGISTRY["quintile_share_ratio"].spark(spark, SF).collect()[0]
    assert row.n_customers == n
    assert row.top20_cents == top20
    assert row.bottom40_cents == bottom40
    assert row.top20_share_ppm == top20 * 1000000 // total
    assert row.palma_milli == top20 * 1000 // bottom40
    assert row.top20_share_ppm > 200000  # top quintile holds > its pro-rata


def test_tvd_python_replay(spark):
    c1 = Counter()
    c2 = Counter()
    for r in load_table(spark, SF, "events").collect():
        d = r.ts.date()
        if d < datetime.date(2024, 1, 8):
            c1[r.event_type] += 1
        elif datetime.date(2024, 1, 22) <= d < datetime.date(2024, 1, 29):
            c2[r.event_type] += 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    types = sorted(set(c1) | set(c2))
    tvd = sum(abs(c1[t] * n2 - c2[t] * n1) for t in types) * 1000000 // (
        2 * n1 * n2
    )
    got = {r.event_type: r for r in
           REGISTRY["total_variation_drift"].spark(spark, SF).collect()}
    for t in types:
        assert got[t].week1_share_ppm == c1[t] * 1000000 // n1
        assert got[t].week4_share_ppm == c2[t] * 1000000 // n2
        assert got[t].tvd_ppm == tvd
    # stationary synthetic mix: drift should be small
    assert tvd < 200000


def test_chebyshev_python_replay(spark):
    spend = defaultdict(int)
    cust = [r.c_custkey for r in load_table(spark, SF, "customer").collect()]
    for r in load_table(spark, SF, "orders").collect():
        spend[r.o_custkey] += round(r.o_totalprice * 100)
    ys = [spend.get(c, 0) for c in cust]
    n, s = len(ys), sum(ys)
    qq = sum(y * y for y in ys)
    got = {r.k: r for r in
           REGISTRY["chebyshev_bound_audit"].spark(spark, SF).collect()}
    for k in (2, 3, 4):
        beyond = sum(1 for y in ys if (n * y - s) ** 2 > k * k * (n * qq - s * s))
        assert got[k].n_beyond == beyond
        assert got[k].observed_ppm == beyond * 1000000 // n
        assert got[k].chebyshev_bound_ppm == 1000000 // (k * k)
        assert got[k].bound_holds == 1  # mathematical truth at every SF


def _week_ranks(spark):
    weekly = defaultdict(lambda: [0, 0, 0, 0])
    for r in load_table(spark, SF, "events").collect():
        d = (r.ts.date() - datetime.date(2024, 1, 1)).days
        if d < 28:
            weekly[r.user_id][d // 7] += 1
    r2sums = [0, 0, 0, 0]
    for v in weekly.values():
        for j in range(4):
            less = sum(1 for i in range(4) if i != j and v[i] < v[j])
            eq = sum(1 for i in range(4) if i != j and v[i] == v[j])
            r2sums[j] += 2 * less + eq + 2
    return len(weekly), r2sums


def test_friedman_pages_python_replay(spark):
    b, r2sums = _week_ranks(spark)
    # doubled ranks per block sum to 2*(1+2+3+4) = 20
    assert sum(r2sums) == 20 * b
    stat = sum(tdiv(3000 * s * s, b * 4 * 5) for s in r2sums) - 3000 * b * 5
    got = {r.week: r for r in
           REGISTRY["friedman_test_weeks"].spark(spark, SF).collect()}
    for j in range(4):
        assert got[j].n_blocks == b
        assert got[j].r2_sum == r2sums[j]
        assert got[j].friedman_milli == stat
    l2 = sum((j + 1) * r2sums[j] for j in range(4))
    el2 = (b * 4 * 25) // 2
    row = REGISTRY["pages_l_trend_test"].spark(spark, SF).collect()[0]
    assert row.l2 == l2
    assert row.e_l2 == el2
    assert row.trend_sign == (1 if l2 > el2 else -1 if l2 < el2 else 0)


def test_runs_turning_python_replay(spark):
    daily = defaultdict(int)
    for r in load_table(spark, SF, "orders").collect():
        daily[r.o_orderdate.date()] += round(r.o_totalprice * 100)
    days = sorted(daily)
    ys = [daily[d] for d in days]
    srt = sorted(ys)
    m = len(srt)
    med2 = 2 * srt[(m - 1) // 2] if m % 2 else srt[m // 2 - 1] + srt[m // 2]
    signs = [1 if 2 * y > med2 else 0 for y in ys if 2 * y != med2]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1, n2 = sum(signs), len(signs) - sum(signs)
    row = REGISTRY["runs_test_median"].spark(spark, SF).collect()[0]
    assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, runs)
    assert row.e_runs_milli == 1000 + 2000 * n1 * n2 // (n1 + n2)

    turning = sum(
        1
        for i in range(1, len(ys) - 1)
        if (ys[i] > ys[i - 1] and ys[i] > ys[i + 1])
        or (ys[i] < ys[i - 1] and ys[i] < ys[i + 1])
    )
    row = REGISTRY["turning_points_randomness"].spark(spark, SF).collect()[0]
    assert row.n_days == len(ys)
    assert row.n_turning == turning
    assert row.ratio_ppm == turning * 3000000 // (2 * (len(ys) - 2))
    # iid-ish daily sums: the ratio should be in the randomness ballpark
    assert 700000 < row.ratio_ppm < 1300000


def test_durbin_watson_python_replay(spark):
    daily = defaultdict(int)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == "purchase":
            daily[r.ts.date()] += round(r.value * 100)
    days = sorted(daily)
    ys = [daily[d] for d in days]
    n = len(ys)
    xs = list(range(1, n + 1))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    d_den = n * sxx - sx * sx
    ad = sy * sxx - sx * sxy
    bd = n * sxy - sx * sy
    ed = [d_den * y - ad - bd * x for x, y in zip(xs, ys)]
    dw = tdiv(sum((b - a) ** 2 for a, b in zip(ed, ed[1:])) * 1000,
              sum(e * e for e in ed))
    row = REGISTRY["durbin_watson_daily"].spark(spark, SF).collect()[0]
    assert row.n_days == n
    assert row.dw_milli == dw
    # detrended iid-ish noise: DW should be near 2
    assert 1000 < dw < 3200
