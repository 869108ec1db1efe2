"""Invariant tests for round-7 wave 25 (exact global order statistics
via the tiered-rank device) — independent Python replays at sf0.001.

Each replay recomputes the statistic from raw rows with plain Python
sorts (no Spark windows, no DuckDB), the third lane beside the Spark
plan and the DuckDB oracle.
"""

from __future__ import annotations

import math

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cents(x: float) -> int:
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def _click_view(spark):
    return [
        (_cents(r.value), r.event_id, 1 if r.event_type == "click" else 0)
        for r in load_table(spark, SF, "events").collect()
        if r.event_type in ("click", "view")
    ]


def _st_rank(i: int, n: int) -> int:
    if 2 * i <= n:
        return 2 * i - 1 if i % 2 == 1 else 2 * i
    d = n + 1 - i
    if 2 * d <= n:
        return 2 * d if d % 2 == 1 else 2 * d - 1
    return n


def test_siegel_tukey_python_replay(spark):
    rows = sorted(_click_view(spark))
    n = len(rows)
    ranks = [_st_rank(i + 1, n) for i in range(n)]
    assert sorted(ranks) == list(range(1, n + 1))  # a permutation
    na = sum(a for _, _, a in rows)
    w = sum(r for r, (_, _, a) in zip(ranks, rows) if a == 1)
    z2 = tdiv(3000 * (2 * w - na * (n + 1)) ** 2, na * (n - na) * (n + 1))
    got = REGISTRY["siegel_tukey_scale_test"].spark(spark, SF).collect()[0]
    assert got.n_a == na and got.n_b == n - na
    assert got.st_rank_sum == w
    assert got.z2_milli == z2
    assert got.scale_differs_5pct == (1 if z2 > 3841 else 0)


def test_latency_percentiles_python_replay(spark):
    orders = {
        r.o_orderkey: r.o_orderdate
        for r in load_table(spark, SF, "orders").collect()
    }
    tts = sorted(
        int((r.l_shipdate - orders[r.l_orderkey]).total_seconds() // 60)
        for r in load_table(spark, SF, "lineitem").collect()
        if r.l_orderkey in orders and r.l_shipdate > orders[r.l_orderkey]
    )
    n = len(tts)
    got = {
        r.pct_milli: r
        for r in REGISTRY["latency_percentiles_exact"].spark(spark, SF).collect()
    }
    assert sorted(got) == [500, 900, 990, 999]
    for pm, r in got.items():
        tr = (pm * n + 999) // 1000
        assert r.n_obs == n and r.target_rank == tr
        assert r.latency_minutes == tts[tr - 1]
    # percentile table is monotone
    assert (
        got[500].latency_minutes
        <= got[900].latency_minutes
        <= got[990].latency_minutes
        <= got[999].latency_minutes
    )


def test_trimmed_winsorized_python_replay(spark):
    xs = sorted(
        _cents(r.o_totalprice)
        for r in load_table(spark, SF, "orders").collect()
    )
    n = len(xs)
    k = n // 10
    mid = xs[k : n - k]
    xlo, xhi = xs[k], xs[n - k - 1]
    got = REGISTRY["trimmed_winsorized_means"].spark(spark, SF).collect()[0]
    assert got.n_orders == n and got.k_cut == k
    assert got.lower_cut_cents == xlo and got.upper_cut_cents == xhi
    assert got.mean_cents == sum(xs) // n
    assert got.trimmed_mean_cents == sum(mid) // (n - 2 * k)
    assert got.winsorized_mean_cents == (sum(mid) + k * (xlo + xhi)) // n
    # the robustness ladder is internally consistent: every estimate
    # sits inside the winsorization cut interval
    for v in (got.mean_cents, got.trimmed_mean_cents, got.winsorized_mean_cents):
        assert xs[0] <= v <= xs[-1]


def _doubled_median(sorted_vals: list[int]) -> int:
    n = len(sorted_vals)
    return sorted_vals[(n + 1) // 2 - 1] + sorted_vals[n // 2]


def test_mad_python_replay(spark):
    xs = sorted(
        _cents(r.o_totalprice)
        for r in load_table(spark, SF, "orders").collect()
    )
    med2 = _doubled_median(xs)
    dv = sorted(abs(2 * x - med2) for x in xs)
    mad4 = _doubled_median(dv)
    got = REGISTRY["mad_robust_scale"].spark(spark, SF).collect()[0]
    assert got.n_orders == len(xs)
    assert got.median_cents == med2 // 2
    assert got.mad_cents == mad4 // 4
    assert got.mad_over_median_milli == (1000 * mad4) // (2 * med2)


def test_bowley_kelly_python_replay(spark):
    vs = sorted(
        _cents(r.value) for r in load_table(spark, SF, "events").collect()
    )
    n = len(vs)

    def q(pm: int) -> int:
        return vs[(pm * n + 999) // 1000 - 1]

    p10, q1, q2, q3, p90 = q(100), q(250), q(500), q(750), q(900)
    got = REGISTRY["bowley_kelly_quantile_skew"].spark(spark, SF).collect()[0]
    assert (got.q1_cents, got.q2_cents, got.q3_cents) == (q1, q2, q3)
    assert (got.p10_cents, got.p90_cents) == (p10, p90)
    assert got.bowley_skew_milli == tdiv(1000 * (q3 + q1 - 2 * q2), q3 - q1)
    assert got.kelly_skew_milli == tdiv(
        1000 * (p90 + p10 - 2 * q2), p90 - p10
    )
    # both coefficients are bounded in [-1, 1] by construction
    assert -1000 <= got.bowley_skew_milli <= 1000
    assert -1000 <= got.kelly_skew_milli <= 1000


def test_qq_decile_python_replay(spark):
    rows = _click_view(spark)
    a = sorted(v for v, _, f in rows if f == 1)
    b = sorted(v for v, _, f in rows if f == 0)
    got = {
        r.decile: r
        for r in REGISTRY["qq_decile_two_sample"].spark(spark, SF).collect()
    }
    assert sorted(got) == list(range(1, 10))
    for d in range(1, 10):
        qa = a[(d * len(a) + 9) // 10 - 1]
        qb = b[(d * len(b) + 9) // 10 - 1]
        r = got[d]
        assert r.q_click_cents == qa
        assert r.q_view_cents == qb
        assert r.qq_gap_cents == qb - qa
    # each side's decile sequence is monotone
    assert all(
        got[d].q_click_cents <= got[d + 1].q_click_cents for d in range(1, 9)
    )
