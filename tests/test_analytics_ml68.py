"""Invariant tests for round-5 wave 14: Yule-Walker AR(2), Pollaczek-
Khinchine M/G/1 wait, restricted mean survival time, Storey pi0, and
first-fit-decreasing bin packing — independent Python replays at
sf0.001.
"""

from __future__ import annotations

import datetime as dt
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


def _daily(spark, etype="purchase"):
    per = defaultdict(int)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type == etype:
            per[r.ts.date()] += _cents(r.value)
    return [x for _, x in sorted(per.items())]


def test_yule_walker_python_replay(spark):
    xs = _daily(spark)
    n, s = len(xs), sum(xs)
    xd = [n * x - s for x in xs]
    c0 = sum(v * v for v in xd)
    c1 = sum(a * b for a, b in zip(xd, xd[1:]))
    c2 = sum(a * b for a, b in zip(xd, xd[2:]))
    det = c0 * c0 - c1 * c1
    phi1 = tdiv(1000 * c1 * (c0 - c2), det)
    phi2 = tdiv(1000 * (c0 * c2 - c1 * c1), det)
    r = REGISTRY["yule_walker_ar2"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert (r.phi1_milli, r.phi2_milli) == (phi1, phi2)
    assert r.forecast_next_milli == tdiv(1000 * s, n) + tdiv(
        phi1 * xd[-1] + phi2 * xd[-2], 1000 * n
    )
    # stationarity triangle: phi2 in (-1,1), phi1+phi2 < 1, phi2-phi1 < 1
    assert abs(phi2) < 1000
    assert phi1 + phi2 < 1000 and phi2 - phi1 < 1000


def test_pollaczek_khinchine_python_replay(spark):
    us = dt.timedelta(microseconds=1)
    jobs = [
        (r.ts, _cents(r.value) * 1000)
        for r in load_table(spark, SF, "events").collect()
        if r.event_type == "purchase"
    ]
    n = len(jobs)
    span = (max(t for t, _ in jobs) - min(t for t, _ in jobs)) // us
    work = sum(s for _, s in jobs)
    q2 = sum(s * s for _, s in jobs)
    rho_ppm = tdiv(1000000 * work, span)
    r = REGISTRY["pollaczek_khinchine_wait"].spark(spark, SF).collect()[0]
    assert r.n_jobs == n
    assert r.mean_service_us == tdiv(work, n)
    assert r.rho_ppm == rho_ppm
    assert r.wq_pk_us == tdiv(1000000 * q2, 2 * span * (1000000 - rho_ppm))
    # stable single server; PK wait exceeds the M/D/1 floor of the same
    # load (deterministic service halves the wait at equal mean)
    assert 0 < r.rho_ppm < 1000000
    md1_floor = tdiv(1000000 * tdiv(work, n) * work, 2 * span * (1000000 - rho_ppm))
    assert r.wq_pk_us >= md1_floor  # E[S^2] >= E[S]^2


def test_rmst_python_replay(spark):
    orders = {o.o_orderkey: o for o in
              load_table(spark, SF, "orders").collect()}
    durs = defaultdict(list)
    for li in load_table(spark, SF, "lineitem").collect():
        o = orders[li.l_orderkey]
        if li.l_shipdate >= o.o_orderdate:
            grp = ("urgent" if o.o_orderpriority in ("1-URGENT", "2-HIGH")
                   else "normal")
            durs[grp].append((li.l_shipdate.date() - o.o_orderdate.date()).days)
    got = {r.grp: r for r in
           REGISTRY["rmst_survival_area"].spark(spark, SF).collect()}
    assert set(got) == {"urgent", "normal"}
    for grp, ts in durs.items():
        nn = len(ts)
        cnt = defaultdict(int)
        for t in ts:
            cnt[t] += 1
        points = [(0, 1000000)]
        s_ppm, seen = 1000000, 0
        for t in sorted(cnt):
            n_at = nn - seen
            s_ppm = s_ppm * (n_at - cnt[t]) // n_at
            points.append((t, s_ppm))
            seen += cnt[t]
        # integrate the step curve to tau=60, ordering ties (t, -s)
        points.sort(key=lambda p: (p[0], -p[1]))
        rmst = 0
        for (t, sp), nxt in zip(points, points[1:] + [(60, None)]):
            if t < 60:
                rmst += sp * (min(nxt[0], 60) - t)
        r = got[grp]
        assert r.tau_days == 60
        assert r.rmst_ppm_days == rmst
        assert r.rmst_milli_days == rmst // 1000
        # RMST is bounded by the horizon and positive
        assert 0 < rmst <= 60 * 1000000


def test_storey_pi0_python_replay(spark):
    cust = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, SF, "customer").collect()}
    lab = defaultdict(lambda: [0, 0])
    for o in load_table(spark, SF, "orders").collect():
        g = lab[cust[o.o_custkey]]
        g[0] += 1
        g[1] += 1 if o.o_orderpriority in ("1-URGENT", "2-HIGH") else 0
    nn = sum(v[0] for v in lab.values())
    yy = sum(v[1] for v in lab.values())
    z2 = []
    for n1, y1 in lab.values():
        diff = y1 * (nn - n1) - (yy - y1) * n1
        z2.append(tdiv(diff * diff * nn * 1000,
                       n1 * (nn - n1) * yy * (nn - yy)))
    m = len(z2)
    got = {r.lambda_pct: r for r in
           REGISTRY["storey_pi0_estimate"].spark(spark, SF).collect()}
    assert sorted(got) == [25, 50, 75]
    for lam, thr, mult, den in ((25, 1323, 4, 3), (50, 455, 2, 1),
                                (75, 102, 4, 1)):
        cnt = sum(1 for z in z2 if z < thr)
        r = got[lam]
        assert r.n_pvals_above == cnt
        assert r.pi0_ppm == min(1000000, tdiv(1000000 * mult * cnt, den * m))
    # independent synthetic lake: most hypotheses are true nulls
    assert got[50].pi0_ppm >= 500000


def test_binpacking_ffd_python_replay(spark):
    xs = _daily(spark)
    items = sorted(xs, reverse=True)
    cap = 2 * max(xs)
    bins = []
    for s in items:
        for i, b in enumerate(bins):
            if b + s <= cap:
                bins[i] = b + s
                break
        else:
            bins.append(s)
    r = REGISTRY["binpacking_ffd_bound"].spark(spark, SF).collect()[0]
    assert r.n_items == len(xs)
    assert r.capacity_cents == cap
    assert r.n_bins_ffd == len(bins)
    lb = (sum(xs) + cap - 1) // cap
    assert r.lower_bound == lb
    assert r.occupancy_ppm == 1000000 * sum(xs) // (len(bins) * cap)
    # volume lower bound holds; every bin but possibly the last pair is
    # more than half full under FFD (two half-empty bins would merge)
    assert len(bins) >= lb
    assert sum(1 for b in bins if 2 * b <= cap) <= 1
