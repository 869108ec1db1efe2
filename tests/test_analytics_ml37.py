"""Invariant tests for the agreement/reliability wave
(kendall_w_concordance, cronbach_alpha_reliability) — independent
Python references.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _nation_stats(spark):
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF, "customer").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF, "nation").collect()
    }
    rows = (
        load_table(spark, SF, "orders")
        .selectExpr(
            "o_custkey",
            "CAST(year(o_orderdate) AS BIGINT) AS yr",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    )
    return cust, nat, rows


def _doubled_ranks(vals):
    s = sorted(vals)
    first = {}
    cnt = defaultdict(int)
    for i, v in enumerate(s):
        cnt[v] += 1
        if v not in first:
            first[v] = i + 1
    return {i: 2 * first[v] + cnt[v] - 1 for i, v in enumerate(vals)}, cnt


def test_kendall_w_matches_python_reference(spark):
    cust, nat, rows = _nation_stats(spark)
    rev = defaultdict(int)
    orders = defaultdict(int)
    custs = defaultdict(set)
    for r in rows:
        name = nat[cust[r.o_custkey]]
        rev[name] += r.cents
        orders[name] += 1
        custs[name].add(r.o_custkey)
    nations = sorted(rev)
    n = len(nations)
    rankers = [
        [rev[x] for x in nations],
        [orders[x] for x in nations],
        [len(custs[x]) for x in nations],
    ]
    r_sum = [0] * n
    t_total = 0
    for vals in rankers:
        ranks, cnt = _doubled_ranks(vals)
        for i in range(n):
            r_sum[i] += ranks[i]
        t_total += sum(t ** 3 - t for t in cnt.values())
    s_d = sum((rs - 3 * (n + 1)) ** 2 for rs in r_sum)
    w = 12 * s_d * 1_000_000 // (4 * (9 * (n ** 3 - n) - 3 * t_total))
    chi2 = 3 * (n - 1) * w // 1000
    r = REGISTRY["kendall_w_concordance"].spark(spark, SF).collect()[0]
    assert (r.n_subjects, r.m_rankers) == (n, 3)
    assert r.s_doubled == s_d
    assert r.tie_correction == t_total
    assert r.w_ppm == w
    assert r.chi2_milli == chi2
    assert r.signif_05 == int(chi2 >= 36415)
    assert 0 <= r.w_ppm <= 1_000_000  # W is bounded in [0, 1]


def test_cronbach_alpha_matches_python_reference(spark):
    cust, nat, rows = _nation_stats(spark)
    items = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        if r.yr in (1995, 1996, 1997):
            items[nat[cust[r.o_custkey]]][r.yr - 1995] += r.cents
    xs = list(items.values())
    n = len(xs)
    v_items = 0
    for j in range(3):
        s = sum(x[j] for x in xs)
        q = sum(x[j] ** 2 for x in xs)
        v_items += n * q - s * s
    st = sum(sum(x) for x in xs)
    qt = sum(sum(x) ** 2 for x in xs)
    v_total = n * qt - st * st
    alpha = 3 * (v_total - v_items) * 1_000_000 // (2 * v_total)
    r = REGISTRY["cronbach_alpha_reliability"].spark(spark, SF).collect()[0]
    assert (r.n_subjects, r.k_items) == (n, 3)
    assert r.var_items_num == str(v_items)
    assert r.var_total_num == str(v_total)
    assert r.alpha_ppm == alpha
    # alpha <= 1 always; and for positively correlated items > 0
    assert r.alpha_ppm <= 1_000_000
