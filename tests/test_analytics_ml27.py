"""Invariant tests for the sequential-DP/paired-test wave
(viterbi_hmm_decoding, wilcoxon_signed_rank) — independent Python
references. The Viterbi reference runs the classic trellis loop with
the same integer renormalization; agreement across the THREE
implementations (Spark aggregate() fold, DuckDB recursive CTE, Python
loop) pins the recurrence.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

_E0 = {"view": 400, "click": 300, "error": 150, "signup": 100,
       "purchase": 50}
_E1 = {"view": 150, "click": 250, "error": 50, "signup": 150,
       "purchase": 400}


def _viterbi(symbols):
    x = symbols[0]
    v0 = 800 * _E0[x] // 1000
    v1 = 200 * _E1[x] // 1000
    p0, p1 = "0", "1"
    for x in symbols[1:]:
        a0 = max(v0 * 700, v1 * 400) // 1000 * _E0[x] // 1000
        a1 = max(v0 * 300, v1 * 600) // 1000 * _E1[x] // 1000
        m = max(a0, a1)
        np0 = (p0 if v0 * 700 >= v1 * 400 else p1) + "0"
        np1 = (p0 if v0 * 300 >= v1 * 600 else p1) + "1"
        v0, v1 = a0 * 1000 // m, a1 * 1000 // m
        p0, p1 = np0, np1
    return (p0, v0) if v0 >= v1 else (p1, v1)


def test_viterbi_matches_python_trellis(spark):
    ev = sorted(
        load_table(spark, SF, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    by_user = defaultdict(list)
    for r in ev:
        if len(by_user[r.user_id]) < 8:
            by_user[r.user_id].append(r.event_type)
    paths = defaultdict(lambda: [0, 0, 0])  # n, score_sum, buying_steps
    for seq in by_user.values():
        path, score = _viterbi(seq)
        p = paths[path]
        p[0] += 1
        p[1] += score
        p[2] += path.count("1")
    want = sorted(
        ((n, path, s, b) for path, (n, s, b) in paths.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = REGISTRY["viterbi_hmm_decoding"].spark(spark, SF).collect()
    assert len(got) == len(want)
    for r, (n, path, s, b) in zip(got, want):
        assert (r.decoded_path, r.n_users, r.score_sum, r.buying_steps) == (
            path, n, s, b,
        )
        # renormalization invariant: the winning score is always the
        # per-step max, i.e. exactly 1000 after the first transition
        if len(path) > 1:
            assert r.score_sum == 1000 * r.n_users


def test_wilcoxon_matches_python_reference(spark):
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF, "customer").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF, "nation").collect()
    }
    monthly = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .filter("year(o_orderdate) IN (1997, 1998)")
        .selectExpr(
            "o_custkey",
            "CAST(year(o_orderdate) AS BIGINT) AS yr",
            "CAST(month(o_orderdate) AS BIGINT) AS mo",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    ):
        monthly[(nat[cust[r.o_custkey]], r.yr, r.mo)] += r.cents
    diffs = defaultdict(list)
    for (n_name, yr, mo), c in monthly.items():
        if yr == 1997 and (n_name, 1998, mo) in monthly:
            d = monthly[(n_name, 1998, mo)] - c
            if d != 0:
                diffs[n_name].append(d)
    got = {r.n_name: r for r in
           REGISTRY["wilcoxon_signed_rank"].spark(spark, SF).collect()}
    assert set(got) == set(diffs)
    for n_name, ds in diffs.items():
        s = sorted(abs(d) for d in ds)
        first = {}
        cnt = defaultdict(int)
        for i, v in enumerate(s):
            cnt[v] += 1
            if v not in first:
                first[v] = i + 1
        w2 = sum(
            2 * first[abs(d)] + cnt[abs(d)] - 1 for d in ds if d > 0
        )
        n = len(ds)
        mu2 = n * (n + 1) // 2
        z2 = (w2 - mu2) ** 2 * 6000 // (n * (n + 1) * (2 * n + 1))
        r = got[n_name]
        assert r.n_eff == n
        assert r.n_pos == sum(1 for d in ds if d > 0)
        assert r.w_plus_x2 == w2, n_name
        assert r.mu_x2 == mu2
        assert r.z2_milli == z2
        assert r.signif_05 == int(z2 >= 3841)
