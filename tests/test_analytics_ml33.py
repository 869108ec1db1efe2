"""Invariant tests for the rating/survival-comparison wave
(elo_rating_two_teams, logrank_test_groups) — independent Python
references.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

_TAB = [90, 117, 150, 191, 240, 296, 359, 428, 500, 571, 640,
        703, 759, 808, 849, 882, 909]


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_elo_matches_python_reference(spark):
    monthly = defaultdict(lambda: [0, 0])
    for r in (
        load_table(spark, SF, "orders")
        .selectExpr(
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
            " AS mk",
            "o_orderpriority",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    ):
        urgent = r.o_orderpriority in ("1-URGENT", "2-HIGH")
        monthly[r.mk][0 if urgent else 1] += r.cents
    games = []
    for mk in sorted(monthly):
        ra_rev, rb_rev = monthly[mk]
        games.append(1000 if ra_rev > rb_rev else (0 if ra_rev < rb_rev
                                                   else 500))
    ra = rb = 1500
    sum_abs = 0
    for s in games:
        b = max(-8, min(8, _tdiv(ra - rb, 50)))
        e = _TAB[b + 8]  # SQL arrays are 1-based: [b+9] == 0-based b+8
        delta = _tdiv(32 * (s - e), 1000)
        ra += delta
        rb -= delta
        sum_abs += abs(delta)
    r = REGISTRY["elo_rating_two_teams"].spark(spark, SF).collect()[0]
    assert r.n_games == len(games)
    assert r.a_wins == sum(1 for s in games if s == 1000)
    assert r.b_wins == sum(1 for s in games if s == 0)
    assert r.ties == sum(1 for s in games if s == 500)
    assert (r.rating_urgent, r.rating_normal) == (ra, rb)
    assert r.sum_abs_delta == sum_abs
    assert r.rating_sum == 3000  # zero-sum conservation


def test_logrank_matches_python_reference(spark):
    o = {
        r.o_orderkey: (r.o_orderdate, r.o_orderpriority)
        for r in load_table(spark, SF, "orders")
        .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS o_orderdate",
                    "o_orderpriority")
        .collect()
    }
    durs = []
    for r in (
        load_table(spark, SF, "lineitem")
        .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS ship")
        .collect()
    ):
        od, pri = o[r.l_orderkey]
        if r.ship >= od:
            durs.append(
                ((r.ship - od).days,
                 1 if pri in ("1-URGENT", "2-HIGH") else 0)
            )
    nn = len(durs)
    nn1 = sum(g for _, g in durs)
    at_t = defaultdict(lambda: [0, 0])
    for t, g in durs:
        at_t[t][0] += 1
        at_t[t][1] += g
    o1 = e1 = v = 0
    n_at, n1_at = nn, nn1
    for t in sorted(at_t):
        d, d1 = at_t[t]
        o1 += d1
        e1 += d * n1_at * 1_000_000 // n_at
        if n_at > 1:
            v += (
                d * n1_at * (n_at - n1_at) * (n_at - d) * 1_000_000
                // (n_at * n_at * (n_at - 1))
            )
        n_at -= d
        n1_at -= d1
    chi2 = (o1 * 1_000_000 - e1) ** 2 * 1000 // (v * 1_000_000)
    r = REGISTRY["logrank_test_groups"].spark(spark, SF).collect()[0]
    assert r.n_times == len(at_t)
    assert (r.n_total, r.n_group1) == (nn, nn1)
    assert r.o1 == o1
    assert r.e1_ppm == e1
    assert r.v_ppm == v
    assert r.chi2_milli == chi2
    assert r.signif_05 == int(chi2 >= 3841)
    # without censoring every group-1 subject eventually events
    assert o1 == nn1
