"""Invariant tests for round-7 wave 26 (effect sizes + outlier screens
on the tiered-rank device) — independent Python replays at sf0.001.
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


def test_cliffs_delta_python_replay(spark):
    rows = _click_view(spark)
    a = [v for v, _, f in rows if f == 1]
    b = [v for v, _, f in rows if f == 0]
    sb = sorted(b)
    import bisect

    gt = sum(bisect.bisect_left(sb, x) for x in a)  # pairs with b < a
    lt = sum(len(b) - bisect.bisect_right(sb, x) for x in a)
    got = REGISTRY["cliffs_delta_effect_size"].spark(spark, SF).collect()[0]
    assert got.n_a == len(a) and got.n_b == len(b)
    assert got.n_greater == gt and got.n_less == lt
    assert got.n_ties == len(a) * len(b) - gt - lt
    dm = tdiv(1000 * (gt - lt), len(a) * len(b))
    assert got.cliffs_delta_milli == dm
    exp_mag = (
        "negligible" if abs(dm) < 147
        else "small" if abs(dm) < 330
        else "medium" if abs(dm) < 474
        else "large"
    )
    assert got.magnitude == exp_mag
    # identity with the Mann-Whitney U: delta = (2U - na*nb)/(na*nb)
    # with ties at half weight => 2*gt + ties = 2U
    assert -1000 <= dm <= 1000


def test_brunner_munzel_python_replay(spark):
    rows = sorted(_click_view(spark), key=lambda t: (t[0], t[1]))
    n = len(rows)
    groups = {1: [], 0: []}
    # pooled rank by (v, event_id); within-group rank by the same order
    for big_r, (v, eid, f) in enumerate(rows, 1):
        groups[f].append(big_r)
    stats = {}
    for f, big_rs in groups.items():
        n_g = len(big_rs)
        cs = [br - (i + 1) for i, br in enumerate(big_rs)]
        stats[f] = (
            n_g,
            sum(big_rs),
            sum(cs),
            sum(c * c for c in cs),
        )
    n1, sr1, sc1, scc1 = stats[1]
    n2, sr2, sc2, scc2 = stats[0]
    rb1, rb2 = sr1 / n1, sr2 / n2
    s1 = (scc1 - sc1 * sc1 / n1) / (n1 - 1)
    s2 = (scc2 - sc2 * sc2 / n2) / (n2 - 1)
    w = (rb2 - rb1) / math.sqrt(
        n1 * n2 * (s1 / (n1 * float(n2) * n2) + s2 / (n2 * float(n1) * n1))
    )
    got = REGISTRY["brunner_munzel_test"].spark(spark, SF).collect()[0]
    assert got.n_click == n1 and got.n_view == n2
    assert abs(got.p_hat_view_exceeds - (rb2 - (n2 + 1) / 2.0) / n1) < 1e-6
    assert abs(got.bm_w_stat - w) < 2e-4
    assert got.reject_5pct == (1 if abs(round(w, 4)) > 1.96 else 0)
    # within-group ranks partition the pooled ranks
    assert n1 + n2 == n


def test_dixon_q_python_replay(spark):
    xs = sorted(
        _cents(r.o_totalprice)
        for r in load_table(spark, SF, "orders").collect()
    )
    got = REGISTRY["dixon_q_extreme_gap"].spark(spark, SF).collect()[0]
    rng = xs[-1] - xs[0]
    assert got.n_orders == len(xs)
    assert got.max_cents == xs[-1] and got.min_cents == xs[0]
    assert got.q_upper_ppm == tdiv(1000000 * (xs[-1] - xs[-2]), rng)
    assert got.q_lower_ppm == tdiv(1000000 * (xs[1] - xs[0]), rng)
    gap_hi, gap_lo = xs[-1] - xs[-2], xs[1] - xs[0]
    assert got.wider_tail_sign == (
        1 if gap_hi > gap_lo else -1 if gap_hi < gap_lo else 0
    )


def test_tukey_fences_python_replay(spark):
    xs = sorted(
        _cents(r.o_totalprice)
        for r in load_table(spark, SF, "orders").collect()
    )
    n = len(xs)
    q1 = xs[(250 * n + 999) // 1000 - 1]
    q3 = xs[(750 * n + 999) // 1000 - 1]
    iqr = q3 - q1
    lo = q1 - (3 * iqr) // 2
    hi = q3 + (3 * iqr) // 2
    got = REGISTRY["tukey_fences_outliers"].spark(spark, SF).collect()[0]
    assert got.n_orders == n
    assert (got.q1_cents, got.q3_cents, got.iqr_cents) == (q1, q3, iqr)
    assert (got.lo_fence_cents, got.hi_fence_cents) == (lo, hi)
    assert got.n_below == sum(1 for x in xs if x < lo)
    assert got.n_above == sum(1 for x in xs if x > hi)
    assert got.outlier_ppm == (1000000 * (got.n_below + got.n_above)) // n
