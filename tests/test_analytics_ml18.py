"""Invariant tests for the rank-statistics/retrieval-eval wave
(kendall_tau_by_year, pettitt_changepoint_daily, ndcg_graded_retrieval)
— independent Python references.

The Pettitt test is the load-bearing one: the catalog entry computes
U_t through the rank identity V_t = 2(rank-1) + ties - n with a cumsum,
and the reference here executes the textbook O(n^2) double sum
U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j) — agreement proves the
identity, not just the plumbing.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _daily_orders(spark):
    rows = (
        load_table(spark, SF, "orders")
        .selectExpr(
            "CAST(year(o_orderdate) AS BIGINT) AS yr",
            "CAST(o_orderdate AS DATE) AS day",
            "round(o_totalprice * 100) AS cents",
        )
        .collect()
    )
    daily = defaultdict(lambda: [0, 0])  # (yr, day) -> [count, cents]
    for r in rows:
        d = daily[(r.yr, r.day)]
        d[0] += 1
        d[1] += int(r.cents)
    return daily


def test_kendall_tau_matches_naive_pair_reference(spark):
    daily = _daily_orders(spark)
    by_year = defaultdict(list)
    for (yr, day), (x, y) in daily.items():
        by_year[yr].append((day, x, y))
    ref = {}
    for yr, pts in by_year.items():
        pts.sort()
        c = d = tx = ty = 0
        n = len(pts)
        for i in range(n):
            for j in range(i + 1, n):
                dx = (pts[j][1] > pts[i][1]) - (pts[j][1] < pts[i][1])
                dy = (pts[j][2] > pts[i][2]) - (pts[j][2] < pts[i][2])
                if dx * dy == 1:
                    c += 1
                elif dx * dy == -1:
                    d += 1
                elif dx == 0 and dy != 0:
                    tx += 1
                elif dy == 0 and dx != 0:
                    ty += 1
        denom = (c + d + tx) * (c + d + ty)
        ref[yr] = (
            n,
            n * (n - 1) // 2,
            c,
            d,
            tx,
            ty,
            c - d,
            (c - d > 0) - (c - d < 0),
            0 if denom == 0 else (c - d) * (c - d) * 1_000_000 // denom,
        )
    got = REGISTRY["kendall_tau_by_year"].spark(spark, SF).collect()
    assert len(got) == len(ref)
    for r in got:
        assert (
            r.n_days,
            r.n_pairs,
            r.c_pairs,
            r.d_pairs,
            r.tx,
            r.ty,
            r.s_stat,
            r.tau_sign,
            r.tau_b_sq_ppm,
        ) == ref[r.yr], r.yr
        assert 0 <= r.tau_b_sq_ppm <= 1_000_000


def _daily_nation_revenue(spark):
    orders = load_table(spark, SF, "orders").selectExpr(
        "o_custkey", "CAST(o_orderdate AS DATE) AS day",
        "round(o_totalprice * 100) AS cents",
    )
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF, "customer")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF, "nation")
        .select("n_nationkey", "n_name")
        .collect()
    }
    daily = defaultdict(int)
    for r in orders.collect():
        daily[(nat[cust[r.o_custkey]], r.day)] += int(r.cents)
    series = defaultdict(list)
    for (n_name, day), cents in daily.items():
        series[n_name].append((day, cents))
    for pts in series.values():
        pts.sort()
    return series


def test_pettitt_matches_naive_double_sum(spark):
    series = _daily_nation_revenue(spark)
    got = {r.n_name: r for r in
           REGISTRY["pettitt_changepoint_daily"].spark(spark, SF).collect()}
    assert set(got) == set(series)
    for n_name, pts in series.items():
        xs = [c for _, c in pts]
        n = len(xs)
        best_k, best_day, best_u = -1, None, None
        for t in range(1, n):  # U_t for t = 1..n-1 (1-indexed prefix len)
            ut = sum(
                (xs[i] > xs[j]) - (xs[i] < xs[j])
                for i in range(t)
                for j in range(t, n)
            )
            if abs(ut) > best_k:
                best_k, best_day, best_u = abs(ut), pts[t - 1][0], ut
        r = got[n_name]
        assert r.n_days == n
        assert r.k_stat == best_k, n_name
        assert r.cp_day == best_day, n_name
        assert r.u_at_cp == best_u, n_name
        want_alarm = int(6000 * best_k * best_k >= 3689 * (n**3 + n**2))
        assert r.pettitt_alarm == want_alarm


_DISC = [1000, 630, 500, 430, 386, 356, 333, 315, 301, 289]
_PANEL = ("join", "vector", "stream", "table")


def test_ndcg_matches_python_reference(spark):
    docs = (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    )
    per_term = defaultdict(list)  # term -> [(doc_id, gain, score)]
    for r in docs:
        toks = re.findall("[a-z]+", r.text.lower())
        dl = len(toks)
        cnt = Counter(toks)
        for term in _PANEL:
            tf = cnt.get(term, 0)
            if tf:
                gain = 7 if tf >= 3 else (3 if tf == 2 else 1)
                per_term[term].append((r.doc_id, gain, tf * 1_000_000 // dl))
    got = {r.term: r for r in
           REGISTRY["ndcg_graded_retrieval"].spark(spark, SF).collect()}
    assert set(got) == {t for t in _PANEL if per_term[t]}
    for term, cands in per_term.items():
        if not cands:
            continue
        by_score = sorted(cands, key=lambda c: (-c[2], c[0]))[:10]
        by_gain = sorted(cands, key=lambda c: (-c[1], c[0]))[:10]
        dcg = sum(g * _DISC[i] for i, (_, g, _s) in enumerate(by_score))
        idcg = sum(g * _DISC[i] for i, (_, g, _s) in enumerate(by_gain))
        r = got[term]
        assert r.n_candidates == len(cands)
        assert r.dcg_milli == dcg
        assert r.idcg_milli == idcg
        assert r.ndcg_ppm == dcg * 1_000_000 // idcg
        assert r.dcg_milli <= r.idcg_milli  # ideal ordering dominates
        assert r.ndcg_ppm <= 1_000_000
