"""Invariant tests for the queueing wave (littles_law_audit,
kingman_queue_estimate) — independent Python references.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_littles_law_matches_python_reference(spark):
    o = {
        r.o_orderkey: r.s
        for r in load_table(spark, SF, "orders")
        .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS s")
        .collect()
    }
    last_ship = {}
    for r in (
        load_table(spark, SF, "lineitem")
        .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS e")
        .collect()
    ):
        cur = last_ship.get(r.l_orderkey)
        if cur is None or r.e > cur:
            last_ship[r.l_orderkey] = r.e
    ivs = [
        (o[k], e) for k, e in last_ship.items() if e > o[k]
    ]
    n = len(ivs)
    sum_days = sum((e - s).days for s, e in ivs)
    d0 = min(min(s for s, _ in ivs), min(e for _, e in ivs))
    d1 = max(max(s for s, _ in ivs), max(e for _, e in ivs))
    t_days = (d1 - d0).days + 1
    # sweep: wip(t) = # intervals with s <= t < e
    deltas = defaultdict(int)
    for s, e in ivs:
        deltas[s] += 1
        deltas[e] -= 1
    wip_days = 0
    cur = 0
    day = d0
    import datetime
    while day <= d1:
        cur += deltas.get(day, 0)
        wip_days += cur
        day += datetime.timedelta(days=1)
    r = REGISTRY["littles_law_audit"].spark(spark, SF).collect()[0]
    assert (r.n_orders, r.sum_days) == (n, sum_days)
    assert (r.wip_days, r.t_days) == (wip_days, t_days)
    # Little's law, finite-horizon exact form
    assert r.identity_holds == 1
    assert wip_days == sum_days
    assert r.avg_wip_milli == wip_days * 1000 // t_days
    assert r.arrival_rate_milli == n * 1000 // t_days
    assert r.avg_duration_milli == sum_days * 1000 // n


def test_kingman_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "events")
        .selectExpr(
            "unix_micros(CAST(ts AS TIMESTAMP)) AS t",
            "CAST(round(value * 1000) AS BIGINT) AS s",
        )
        .collect()
    )
    pts = sorted((r.t, r.s) for r in rows)
    gaps = [pts[i + 1][0] - pts[i][0] for i in range(len(pts) - 1)]
    svcs = [s for _, s in pts]
    na, sa, qa = len(gaps), sum(gaps), sum(a * a for a in gaps)
    ns, ss, qs = len(svcs), sum(svcs), sum(s * s for s in svcs)
    ca2 = (na * qa - sa * sa) * 1_000_000 // (sa * sa)
    cs2 = (ns * qs - ss * ss) * 1_000_000 // (ss * ss)
    rho = ss * 1000 * 1_000_000 // sa
    mean_service = ss * 1000 // ns
    wq = (
        (rho * 1_000_000 // (1_000_000 - rho))
        * ((ca2 + cs2) // 2) // 1_000_000
        * mean_service // 1_000_000
    )
    r = REGISTRY["kingman_queue_estimate"].spark(spark, SF).collect()[0]
    assert r.n_gaps == na
    assert r.mean_gap_micros == sa // na
    assert (r.ca2_ppm, r.cs2_ppm) == (ca2, cs2)
    assert r.rho_ppm == rho
    assert r.kingman_wq_micro == wq
    # a stable queue: the synthetic service demand must not saturate
    assert r.rho_ppm < 1_000_000
