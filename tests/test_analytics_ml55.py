"""Invariant tests for the round-4 wave 6: PR curve points, Cohen's d,
odds/risk ratios — independent Python replays at sf0.001.
"""

from __future__ import annotations

import math
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — the semantics BOTH engines
    use (Spark `div`, DuckDB `//`). Python's `//` floors toward -inf, which
    only coincides on non-negative operands; replays must not depend on the
    current data generation keeping values non-negative (round-4 ADVICE).
    """
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q



def test_pr_curve_python_replay(spark):
    docs = load_table(spark, SF, "documents").collect()
    scored = sorted((r.n_chars, 1 if r.lang == "en" else 0) for r in docs)
    n = len(scored)
    p = sum(pos for _, pos in scored)
    got = {r.decile: r for r in
           REGISTRY["pr_curve_points"].spark(spark, SF).collect()}
    for decile in range(1, 10):
        k = (decile * n + 9) // 10
        thr = scored[k - 1][0]
        tp = sum(1 for s, pos in scored if pos and s > thr)
        npred = sum(1 for s, _ in scored if s > thr)
        if npred == 0:
            assert decile not in got
            continue
        r = got[decile]
        assert r.threshold == thr
        assert r.tp == tp and r.n_predicted_pos == npred
        assert r.precision_ppm == tdiv(tp * 1000000, npred)
        assert r.recall_ppm == tdiv(tp * 1000000, p)
    # recall decreases with the threshold; precision bounded by 1
    recalls = [got[d].recall_ppm for d in sorted(got)]
    assert recalls == sorted(recalls, reverse=True)
    assert all(r.precision_ppm <= 1000000 for r in got.values())


def test_cohens_d_python_replay(spark):
    groups = defaultdict(list)
    for r in load_table(spark, SF, "events").collect():
        if r.event_type in ("click", "view"):
            groups[r.event_type].append(round(r.value * 100))
    g1, g2 = groups["click"], groups["view"]
    n1, n2 = len(g1), len(g2)
    s1, s2 = sum(g1), sum(g2)
    q1 = sum(v * v for v in g1)
    q2 = sum(v * v for v in g2)
    pooled = ((q1 - tdiv(s1 * s1, n1)) + (q2 - tdiv(s2 * s2, n2))) / (n1 + n2 - 2)
    d = round((s1 / n1 - s2 / n2) / math.sqrt(pooled), 6)
    row = REGISTRY["cohens_d_effect_size"].spark(spark, SF).collect()[0]
    assert (row.n_click, row.n_view) == (n1, n2)
    assert row.mean_diff_milli_cents == tdiv(1000 * s1, n1) - tdiv(1000 * s2, n2)
    assert row.cohens_d_6dp == d
    # click and view draw from the same value distribution: tiny effect
    assert abs(row.cohens_d_6dp) < 0.2


def test_odds_ratio_python_replay(spark):
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, SF, "customer").collect()}
    nname = {r.n_nationkey: r.n_name
             for r in load_table(spark, SF, "nation").collect()}
    ab = defaultdict(lambda: [0, 0])
    for r in load_table(spark, SF, "orders").collect():
        urgent = r.o_orderpriority in ("1-URGENT", "2-HIGH")
        ab[nname[cust[r.o_custkey]]][0 if urgent else 1] += 1
    ta = sum(v[0] for v in ab.values())
    tb = sum(v[1] for v in ab.values())
    got = {r.n_name: r for r in
           REGISTRY["odds_ratio_by_nation"].spark(spark, SF).collect()}
    assert set(got) == set(ab)
    for name, (a, b) in ab.items():
        r = got[name]
        assert (r.n_urgent, r.n_other) == (a, b)
        # degenerate 2x2 cells (b = 0 or ta = a) are a DEFINED NULL on both
        # engine lanes (explicit NULLIF, see the entry docstring)
        if b * (ta - a) == 0:
            assert r.odds_ratio_milli is None
        else:
            assert r.odds_ratio_milli == tdiv(1000 * a * (tb - b), b * (ta - a))
        if (a + b) * (ta - a) == 0:
            assert r.risk_ratio_milli is None
        else:
            assert r.risk_ratio_milli == tdiv(
                1000 * a * (ta + tb - a - b), (a + b) * (ta - a)
            )
        # RR is always nearer 1 than OR for a positive association
        # (and the reverse for negative) — check they agree in direction
        assert (r.odds_ratio_milli >= 1000) == (r.risk_ratio_milli >= 1000) or (
            abs(r.odds_ratio_milli - 1000) <= 20
        )
