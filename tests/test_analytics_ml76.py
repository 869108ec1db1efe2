"""Invariant tests for round-6 wave 22: min-plus APSP, inequality panel,
permutation/sample entropy, lagged MI, Poisson two-rate, SES grid —
independent Python replays at sf0.001.
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


def _daily_purchase_dollars(spark):
    per: dict = defaultdict(int)
    for e in load_table(spark, SF, "events").collect():
        if e.event_type == "purchase":
            per[e.ts.date()] += _cents(e.value)
    return [tdiv(v, 100) for _, v in sorted(per.items())]


def test_apsp_python_replay(spark):
    okey = {o.o_orderkey: (o.o_custkey, o.o_orderdate)
            for o in load_table(spark, SF, "orders").collect()}
    cnat = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, SF, "customer").collect()}
    snat = {s.s_suppkey: s.s_nationkey
            for s in load_table(spark, SF, "supplier").collect()}
    acc: dict = defaultdict(lambda: [0, 0])
    for li in load_table(spark, SF, "lineitem").collect():
        cust, od = okey[li.l_orderkey]
        if li.l_shipdate <= od:
            continue
        src, dst = snat[li.l_suppkey], cnat[cust]
        if src == dst:
            continue
        a = acc[(src, dst)]
        a[0] += (li.l_shipdate - od).days
        a[1] += 1
    w = {k: v[0] // v[1] for k, v in acc.items()}
    nodes = sorted({x for k in w for x in k})
    INF = 10**15
    d = {(a, b): (0 if a == b else w.get((a, b), INF))
         for a in nodes for b in nodes}
    for _ in range(3):
        nd = {}
        for a in nodes:
            for b in nodes:
                nd[(a, b)] = min(d[(a, m)] + d[(m, b)] for m in nodes)
        d = nd
    pairs = sorted(((v, a, b) for (a, b), v in d.items()
                    if a != b and v < INF),
                   key=lambda t: (-t[0], t[1], t[2]))[:10]
    rows = REGISTRY["apsp_min_plus_doubling"].spark(spark, SF).collect()
    assert [(r.src_nation, r.dst_nation, r.dist_days) for r in rows] == [
        (a, b, v) for v, a, b in pairs
    ]
    # the min-plus closure can only shrink direct edges
    assert all(
        r.dist_days <= w.get((r.src_nation, r.dst_nation), 10**15)
        for r in rows
    )
    assert rows[0].dist_days > 0


def test_inequality_python_replay(spark):
    spend: dict = defaultdict(int)
    for o in load_table(spark, SF, "orders").collect():
        spend[o.o_custkey] += _cents(o.o_totalprice)
    cnat = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, SF, "customer").collect()}
    nreg = {n.n_nationkey: n.n_regionkey
            for n in load_table(spark, SF, "nation").collect()}
    rname = {r.r_regionkey: r.r_name
             for r in load_table(spark, SF, "region").collect()}
    per: dict = defaultdict(list)
    for cust, x in spend.items():
        if x > 0:
            per[rname[nreg[cnat[cust]]]].append(x)
    rows = REGISTRY["inequality_indices_panel"].spark(spark, SF).collect()
    assert [r.region for r in rows] == sorted(per)
    for r in rows:
        xs = per[r.region]
        n, sx = len(xs), sum(xs)
        slnx = sum(round(math.log(x), 8) for x in xs)
        sxlnx = sum(round(x * math.log(x), 2) for x in xs)
        theil = sxlnx / sx - math.log(sx / n)
        atk = 1.0 - math.exp(slnx / n) / (sx / n)
        assert r.n == n
        assert r.mean_cents == tdiv(sx, n)
        assert r.theil_t == pytest.approx(theil, abs=2e-6)
        assert r.atkinson_1 == pytest.approx(atk, abs=2e-6)
        # both indices live in their theoretical bands
        assert 0.0 <= r.theil_t and 0.0 <= r.atkinson_1 < 1.0


def test_permutation_entropy_python_replay(spark):
    per: dict = defaultdict(int)
    for e in load_table(spark, SF, "events").collect():
        if e.event_type == "purchase":
            per[e.ts.date()] += _cents(e.value)
    xs = [v for _, v in sorted(per.items())]
    cnt: dict = defaultdict(int)
    for a, b, c in zip(xs, xs[1:], xs[2:]):
        pid = 4 * (a <= b) + 2 * (b <= c) + (a <= c)
        cnt[pid] += 1
    n = sum(cnt.values())
    h = sum(round(-c * math.log(c / n), 8) for c in cnt.values()) / n
    rows = REGISTRY["permutation_entropy_ordinal"].spark(spark, SF).collect()
    assert [(r.pattern_id, r.n_windows) for r in rows] == [
        (k, cnt[k]) for k in sorted(cnt)
    ]
    for r in rows:
        assert r.p_milli == tdiv(1000 * cnt[r.pattern_id], n)
        assert r.perm_entropy_nats == pytest.approx(h, abs=2e-6)
        assert r.perm_entropy_norm == pytest.approx(h / math.log(6), abs=2e-6)
    # revenue noise is complex: entropy well above a monotone series
    assert rows[0].perm_entropy_norm > 0.5


def test_sample_entropy_python_replay(spark):
    xs = _daily_purchase_dollars(spark)
    n = len(xs)
    s1, q = sum(xs), sum(x * x for x in xs)
    b_cnt = a_cnt = 0
    for i in range(n - 2):
        for j in range(i + 1, n - 2):
            d2m = max((xs[i] - xs[j]) ** 2, (xs[i + 1] - xs[j + 1]) ** 2)
            d2m1 = max(d2m, (xs[i + 2] - xs[j + 2]) ** 2)
            if 4 * n * n * d2m <= n * q - s1 * s1:
                b_cnt += 1
            if 4 * n * n * d2m1 <= n * q - s1 * s1:
                a_cnt += 1
    r = REGISTRY["sample_entropy_daily"].spark(spark, SF).collect()[0]
    assert (r.n_days, r.template_m2_matches, r.template_m3_matches) == (
        n, b_cnt, a_cnt
    )
    if a_cnt > 0:
        assert r.sampen == pytest.approx(math.log(b_cnt / a_cnt), abs=2e-6)
        assert r.undefined_flag == 0
    else:
        assert r.sampen is None
        assert r.undefined_flag == 1


def test_lagged_mi_python_replay(spark):
    clicks: dict = defaultdict(int)
    rev: dict = defaultdict(int)
    days = set()
    for e in load_table(spark, SF, "events").collect():
        d = e.ts.date()
        days.add(d)
        if e.event_type == "click":
            clicks[d] += 1
        elif e.event_type == "purchase":
            rev[d] += _cents(e.value)
    days = sorted(days)
    nd = len(days)

    def ntile3(vals):
        order = sorted(range(nd), key=lambda i: (vals[i], days[i]))
        base, extra = divmod(nd, 3)
        bins = [0] * nd
        pos = 0
        for b in range(3):
            size = base + (1 if b < extra else 0)
            for _ in range(size):
                bins[order[pos]] = b + 1
                pos += 1
        return bins

    cb = ntile3([clicks[d] for d in days])
    rb = ntile3([rev[d] for d in days])
    day_idx = {d: i for i, d in enumerate(days)}
    rows = REGISTRY["lagged_mutual_information"].spark(spark, SF).collect()
    assert [r.lag for r in rows] == [0, 1, 2, 3]
    import datetime

    for r in rows:
        joint: dict = defaultdict(int)
        for i, d in enumerate(days):
            d2 = d + datetime.timedelta(days=r.lag)
            if d2 in day_idx:
                joint[(cb[i], rb[day_idx[d2]])] += 1
        n = sum(joint.values())
        nx: dict = defaultdict(int)
        ny: dict = defaultdict(int)
        for (x, y), c in joint.items():
            nx[x] += c
            ny[y] += c
        mi = sum(round(c * math.log(c * n / (nx[x] * ny[y])), 8)
                 for (x, y), c in joint.items()) / n
        assert r.n_pairs == n
        assert r.mi_nats == pytest.approx(mi, abs=2e-6)
    # MI at lag 0 within valid entropy bound ln(3)
    assert rows[0].mi_nats <= math.log(3) + 1e-9


def test_poisson_two_rate_python_replay(spark):
    wk: dict = defaultdict(int)
    we: dict = defaultdict(int)
    for e in load_table(spark, SF, "events").collect():
        d = e.ts.date()
        tgt = we if d.isoweekday() >= 6 else wk
        tgt[d] += 1 if e.event_type == "error" else 0
    n1, t1 = sum(wk.values()), len(wk)
    n2, t2 = sum(we.values()), len(we)
    nn = n1 + n2
    dd = n1 * (t1 + t2) - nn * t1
    z2 = tdiv(1000 * dd * dd, nn * t1 * t2)
    r = REGISTRY["poisson_two_rate_test"].spark(spark, SF).collect()[0]
    assert (r.weekday_errors, r.weekend_errors) == (n1, n2)
    assert (r.weekday_days, r.weekend_days) == (t1, t2)
    assert r.rate1_milli == tdiv(1000 * n1, t1)
    assert r.rate2_milli == tdiv(1000 * n2, t2)
    assert r.z2_milli == z2
    assert r.rates_differ_5pct == (1 if z2 > 3841 else 0)
    # uniform generator: no genuine weekday/weekend rate split
    assert r.rates_differ_5pct == 0


def test_ses_grid_python_replay(spark):
    xs = _daily_purchase_dollars(spark)
    rows = REGISTRY["ses_alpha_grid_eval"].spark(spark, SF).collect()
    sses = {}
    for a10 in (2, 5, 8):
        s, e = xs[0], 0
        for x in xs[1:]:
            e += (x - s) ** 2
            s = tdiv(a10 * x + (10 - a10) * s, 10)
        sses[a10 * 10] = (e, s)
    assert [r.alpha_pct for r in rows] == [20, 50, 80]
    best = min(sses, key=lambda k: sses[k][0])
    for r in rows:
        e, s = sses[r.alpha_pct]
        assert (r.n_days, r.sse, r.final_level) == (len(xs), e, s)
        assert r.is_best == (1 if r.alpha_pct == best else 0)
    assert sum(r.is_best for r in rows) >= 1
