"""Invariant tests for round-6 wave 21 (part 1): apportionment, p-chart,
classifier apply, Bartlett, Taylor's law, GPD-POT, Weibull — independent
Python replays at sf0.001.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cents(x: float) -> int:
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def test_dhondt_python_replay(spark):
    nat = {n.n_nationkey: n.n_regionkey
           for n in load_table(spark, SF, "nation").collect()}
    reg = {r.r_regionkey: r.r_name
           for r in load_table(spark, SF, "region").collect()}
    cnk = {c.c_custkey: c.c_nationkey
           for c in load_table(spark, SF, "customer").collect()}
    votes: dict[str, int] = defaultdict(int)
    for o in load_table(spark, SF, "orders").collect():
        votes[reg[nat[cnk[o.o_custkey]]]] += 1

    def allocate(div):
        quots = [(tdiv(v * 1_000_000, div(k)), p, k)
                 for p, v in votes.items() for k in range(1, 61)]
        quots.sort(key=lambda t: (-t[0], t[1], t[2]))
        seats: dict[str, int] = defaultdict(int)
        for _, p, _ in quots[:60]:
            seats[p] += 1
        return seats

    dh = allocate(lambda k: k)
    sl = allocate(lambda k: 2 * k - 1)
    rows = REGISTRY["dhondt_seat_apportionment"].spark(spark, SF).collect()
    assert [r.party for r in rows] == sorted(votes)
    for r in rows:
        assert r.votes == votes[r.party]
        assert r.seats_dhondt == dh.get(r.party, 0)
        assert r.seats_sainte_lague == sl.get(r.party, 0)
    assert sum(r.seats_dhondt for r in rows) == 60
    assert sum(r.seats_sainte_lague for r in rows) == 60


def test_p_chart_python_replay(spark):
    per: dict = defaultdict(lambda: [0, 0])
    for e in load_table(spark, SF, "events").collect():
        d = e.ts.date()
        per[d][0] += 1
        per[d][1] += 1 if e.event_type == "error" else 0
    nn = sum(v[0] for v in per.values())
    xx = sum(v[1] for v in per.values())
    rows = REGISTRY["p_chart_attribute_control"].spark(spark, SF).collect()
    assert [r.day for r in rows] == sorted(per)
    for r in rows:
        n, x = per[r.day]
        assert (r.n_events, r.n_defect) == (n, x)
        assert r.p_ppm == tdiv(1_000_000 * x, n)
        assert r.pbar_ppm == tdiv(1_000_000 * xx, nn)
        diff = x * nn - xx * n
        if diff * diff > 9 * xx * (nn - xx) * n:
            assert r.ooc_sign == (1 if diff > 0 else -1)
        else:
            assert r.ooc_sign == 0
    # pooled centerline: the days flag in BOTH directions at most rarely
    assert sum(abs(r.ooc_sign) for r in rows) <= len(rows) // 2


def test_quality_classifier_python_replay(spark):
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for d in load_table(spark, SF, "documents").collect():
        if d.text is None:
            continue
        t = d.text
        L = max(len(t), 1)
        alpha = tdiv(
            1000 * sum("a" <= c <= "z" or "A" <= c <= "Z" for c in t), L
        )
        digit = tdiv(1000 * sum("0" <= c <= "9" for c in t), L)
        space = tdiv(1000 * t.count(" "), L)
        logit = (-2000 + 4 * alpha - 6 * digit + 2 * space
                 + tdiv(min(len(t), 4000), 4))
        a = agg[d.source]
        a[0] += 1
        a[1] += 1 if logit > 1000 else 0
        a[2] += 1 if logit <= -1000 else 0
        a[3] += logit
    rows = REGISTRY["quality_classifier_logreg_apply"].spark(spark, SF).collect()
    assert [r.source for r in rows] == sorted(agg)
    for r in rows:
        n, keep, disc, s = agg[r.source]
        assert (r.n_docs, r.n_keep, r.n_discard) == (n, keep, disc)
        assert r.mean_logit_micro == tdiv(s, n)
    # the gate separates: some docs kept, some discarded, overall
    assert sum(r.n_keep for r in rows) > 0


def test_bartlett_python_replay(spark):
    grp: dict = defaultdict(list)
    for li in load_table(spark, SF, "lineitem").collect():
        grp[li.l_returnflag].append(_cents(li.l_quantity))
    k = len(grp)
    nn = sum(len(v) for v in grp.values())
    pooled_num = 0.0
    sum_ln = 0.0
    sum_inv = 0.0
    for v in grp.values():
        n = len(v)
        s1, s2 = sum(v), sum(x * x for x in v)
        s2i = (n * s2 - s1 * s1) / (n * (n - 1))
        pooled_num += round((n - 1) * s2i, 4)
        sum_ln += round((n - 1) * math.log(s2i), 8)
        sum_inv += round(1.0 / (n - 1), 12)
    b = (nn - k) * math.log(pooled_num / (nn - k)) - sum_ln
    c = 1.0 + (sum_inv - 1.0 / (nn - k)) / (3.0 * (k - 1))
    r = REGISTRY["bartlett_variance_homogeneity"].spark(spark, SF).collect()[0]
    assert (r.n_total, r.n_groups) == (nn, k)
    assert r.bartlett_b == pytest.approx(b, rel=1e-6, abs=1e-3)
    assert r.correction_c == pytest.approx(c, abs=5.1e-7)
    assert r.bartlett_stat == pytest.approx(b / c, rel=1e-6, abs=1e-3)
    assert r.reject_equal_var_5pct == (1 if b / c > 5.991 else 0)


def test_taylors_law_python_replay(spark):
    daily: dict = defaultdict(int)
    for e in load_table(spark, SF, "events").collect():
        daily[(e.event_type, e.ts.date())] += 1
    per: dict = defaultdict(list)
    for (et, _), c in daily.items():
        per[et].append(c)
    pts = {}
    for et, cs in per.items():
        n = len(cs)
        s1, s2 = sum(cs), sum(c * c for c in cs)
        mean = s1 / n
        var = (n * s2 - s1 * s1) / (n * (n - 1))
        pts[et] = (n, mean, var)
    k = len(pts)
    sx = sum(round(math.log(m), 10) for _, m, _ in pts.values())
    sy = sum(round(math.log(v), 10) for _, _, v in pts.values())
    sxx = sum(round(math.log(m) ** 2, 10) for _, m, _ in pts.values())
    sxy = sum(round(math.log(m) * math.log(v), 10)
              for _, m, v in pts.values())
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    rows = REGISTRY["taylors_law_powerfit"].spark(spark, SF).collect()
    assert [r.event_type for r in rows] == sorted(pts)
    for r in rows:
        n, mean, var = pts[r.event_type]
        assert r.n_days == n
        assert r.mean_daily == pytest.approx(mean, abs=2e-4)
        assert r.var_daily == pytest.approx(var, abs=2e-4)
        assert r.taylor_slope_b == pytest.approx(slope, abs=2e-6)
    # event volumes are homogeneous-Poisson-ish by construction:
    # the slope sits in the dispersed-but-not-explosive band
    assert -1.0 < rows[0].taylor_slope_b < 4.0


def test_gpd_pot_python_replay(spark):
    xs = sorted((_cents(o.o_totalprice)
                 for o in load_table(spark, SF, "orders").collect()),
                reverse=True)
    n = len(xs)
    top = xs[: (n + 19) // 20]
    u = min(top)
    ys = [x - u for x in xs if x > u]
    k = len(ys)
    s1 = sum(ys)
    s2 = sum(y * y for y in ys)
    ybar = s1 / k
    s2y = (s2 - s1 * s1 / k) / (k - 1)
    xi = 0.5 * (1.0 - ybar * ybar / s2y)
    beta = 0.5 * ybar * (ybar * ybar / s2y + 1.0) / 100.0
    r = REGISTRY["pot_gpd_moment_fit"].spark(spark, SF).collect()[0]
    assert (r.n_exceed, r.threshold_cents) == (k, u)
    assert r.mean_excess == pytest.approx(ybar / 100.0, abs=2e-4)
    assert r.gpd_shape_xi == pytest.approx(xi, abs=2e-6)
    assert r.gpd_scale_beta == pytest.approx(beta, abs=2e-4)
    assert r.heavy_tail_flag == (1 if xi > 0 else 0)


def test_weibull_python_replay(spark):
    okey = {o.o_orderkey: o.o_orderdate
            for o in load_table(spark, SF, "orders").collect()}
    ts = []
    for li in load_table(spark, SF, "lineitem").collect():
        od = okey[li.l_orderkey]
        if li.l_shipdate > od:
            ts.append(int((li.l_shipdate - od).total_seconds()) // 60)
    ts.sort()
    n = len(ts)
    sx = sy = sxx = sxy = 0.0
    for i, t in enumerate(ts, start=1):
        x = round(math.log(t), 8)
        y = round(math.log(-math.log(1.0 - (i - 0.3) / (n + 0.4))), 8)
        sx += x
        sy += y
        sxx += round(x * x, 12)
        sxy += round(x * y, 12)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    scale_days = math.exp(-((sy - sx * slope) / n) / slope) / 1440.0
    r = REGISTRY["weibull_median_ranks_fit"].spark(spark, SF).collect()[0]
    assert r.n_failures == n
    assert r.weibull_shape_k == pytest.approx(slope, abs=2e-5)
    assert r.weibull_scale_days == pytest.approx(scale_days, rel=1e-4)
    assert r.wearout_flag == (1 if slope > 1.0 else 0)
    # lead times cluster in a narrow band -> strongly wear-out shaped
    assert r.weibull_shape_k > 1.0
