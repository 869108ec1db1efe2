"""Invariant tests for the round-5 wave 6: BY screen, secretary problem,
inventory/queue simulations, business-day SLA, TOPSIS — independent
Python replays at sf0.001.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from datetime import date
from fractions import Fraction

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_by_ladder_constants_and_subset_of_bh(spark):
    # regenerate the BY critical ladder: chi2(1) quantile at
    # alpha*i/(m*c(m)), via bisection on the normal CDF
    def chi2_1_quantile(p):
        target = (1 + p) / 2
        lo, hi = 0.0, 40.0
        for _ in range(200):
            mid = (lo + hi) / 2
            if 0.5 * (1 + math.erf(mid / math.sqrt(2))) < target:
                lo = mid
            else:
                hi = mid
        return ((lo + hi) / 2) ** 2

    h25 = float(sum(Fraction(1, i) for i in range(1, 26)))
    ladder = [round(chi2_1_quantile(1 - 0.05 * i / (25 * h25)) * 1000)
              for i in range(1, 26)]
    got = REGISTRY["benjamini_yekutieli_screen"].spark(spark, SF).collect()
    assert [r.by_critical_milli for r in got] == ladder
    # BY is strictly more conservative than BH on the same statistics
    bh = {r.n_name: r.rejected for r in
          REGISTRY["fdr_bh_screen"].spark(spark, SF).collect()}
    for r in got:
        if r.rejected:
            assert bh[r.n_name] == 1
    # step-up structure: rejections form a prefix of the rank order
    rej = [r.rejected for r in got]
    assert rej == sorted(rej, reverse=True)


def test_secretary_python_replay(spark):
    orders = sorted(load_table(spark, SF, "orders").collect(),
                    key=lambda o: o.o_orderkey)[:100]
    panel = [(o.o_orderkey, round(o.o_totalprice * 100)) for o in orders]
    vmax = max(v for _, v in panel)
    ns = 0
    for seed in range(1, 65):
        order = sorted(panel, key=lambda t: (hashlib.md5(
            f"{t[0]}:sec{seed}".encode()).hexdigest(), t[0]))
        thr = max(v for _, v in order[:36])
        picked = None
        for _, v in order[36:]:
            if v > thr:
                picked = v
                break
        if picked is None:
            picked = order[-1][1]
        ns += 1 if picked == vmax else 0
    row = REGISTRY["secretary_optimal_stopping"].spark(spark, SF).collect()[0]
    assert (row.n_items, row.n_trials, row.n_success) == (100, 64, ns)
    assert row.success_ppm == tdiv(1000000 * ns, 64)
    # 1/e law: with 64 trials the success rate sits in a broad band
    # around 368000 ppm (binomial sd ~ 60000 ppm)
    assert 150000 < row.success_ppm < 600000


def _daily_counts(spark, etype):
    rows = load_table(spark, SF, "events").collect()
    by_day = defaultdict(int)
    for r in rows:
        if r.event_type == etype:
            by_day[r.ts.date()] += 1
    return [c for _, c in sorted(by_day.items())]


def test_inventory_policy_python_replay(spark):
    dem = _daily_counts(spark, "purchase")
    s_small = sum(dem) // len(dem)
    s_big = 3 * s_small
    lvl, reorders, stockouts = s_big, 0, 0
    for x in dem:
        stockouts += max(x - lvl, 0)
        lvl = max(lvl - x, 0)
        if lvl < s_small:
            lvl = s_big
            reorders += 1
    row = REGISTRY["inventory_policy_simulation"].spark(spark, SF).collect()[0]
    assert (row.n_days, row.s_reorder_point, row.s_order_up_to) == (
        len(dem), s_small, s_big)
    assert (row.n_reorders, row.stockout_units, row.ending_level) == (
        reorders, stockouts, lvl)
    # S = 3x mean demand: the policy must reorder at least once a week-ish
    assert 0 < row.n_reorders <= row.n_days


def test_lindley_python_replay(spark):
    arr = _daily_counts(spark, "click")
    c = (sum(arr) + len(arr) - 1) // len(arr)
    b, mx, busy = 0, 0, 0
    for x in arr:
        b = max(0, b + x - c)
        mx = max(mx, b)
        busy += 1 if b > 0 else 0
    row = REGISTRY["lindley_queue_backlog"].spark(spark, SF).collect()[0]
    assert (row.n_days, row.daily_capacity) == (len(arr), c)
    assert (row.ending_backlog, row.max_backlog, row.n_backlogged_days) == (
        b, mx, busy)
    # capacity = ceil-mean: the queue is stable (ending backlog bounded)
    assert row.ending_backlog <= row.max_backlog


def test_business_days_sla_python_replay(spark):
    lines = load_table(spark, SF, "lineitem").collect()
    stats = defaultdict(lambda: [0, 0, 0])
    epoch = date(1970, 1, 1)
    off_by_dow = {0: 3, 1: 3, 2: 3, 3: 5, 4: 5, 5: 5, 6: 4}
    for l in lines:
        ed = (l.l_shipdate.date() - epoch).days
        sla = off_by_dow[(ed + 4) % 7]
        # cross-check the closed form against literal business-day walking
        walked, d = 0, ed
        while walked < 3:
            d += 1
            if (d + 4) % 7 not in (0, 6):
                walked += 1
        assert d - ed == sla
        s = stats[l.l_linestatus]
        s[0] += 1
        s[1] += 1 if (l.l_orderkey % 5) > sla else 0
        s[2] += sla
    got = {r.l_linestatus: r for r in
           REGISTRY["business_days_sla_audit"].spark(spark, SF).collect()}
    for ls, (n, late, tot) in stats.items():
        r = got[ls]
        assert (r.n_lines, r.n_late, r.total_sla_days) == (n, late, tot)
        assert r.late_ppm == tdiv(1000000 * late, n)


def test_topsis_python_replay(spark):
    lines = load_table(spark, SF, "lineitem").collect()
    agg = defaultdict(lambda: [0, set()])
    for l in lines:
        a = agg[l.l_suppkey]
        a[0] += round(l.l_extendedprice * 100)
        a[1].add(l.l_orderkey)
    crit = {s: (rev, len(orders), tdiv(1000 * rev, len(orders)))
            for s, (rev, orders) in agg.items()}
    lo = [min(c[i] for c in crit.values()) for i in range(3)]
    hi = [max(c[i] for c in crit.values()) for i in range(3)]
    scored = []
    for s, c in crit.items():
        nr = tdiv(1000000 * (c[0] - lo[0]), hi[0] - lo[0])
        no = tdiv(1000000 * (c[1] - lo[1]), hi[1] - lo[1])
        np_ = tdiv(1000000 * (c[2] - lo[2]), hi[2] - lo[2])
        dm = 50 * nr + 30 * no + 20 * (1000000 - np_)
        dp = 50 * (1000000 - nr) + 30 * (1000000 - no) + 20 * np_
        scored.append((tdiv(1000000 * dm, dp + dm), s, c))
    scored.sort(key=lambda t: (-t[0], t[1]))
    got = REGISTRY["topsis_l1_ranking"].spark(spark, SF).collect()
    assert len(got) == min(10, len(scored))
    for r, (sc, s, c) in zip(got, scored[:10]):
        assert (r.s_suppkey, r.topsis_score_ppm) == (s, sc)
        assert (r.revenue_cents, r.n_orders, r.avg_price_milli) == c
    # scores live on the [0, 1e6] ppm grid
    assert all(0 <= r.topsis_score_ppm <= 1000000 for r in got)
