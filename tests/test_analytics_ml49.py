"""Invariant tests for the round-4 nonparametric wave: independent
Python replays of Cramér-von Mises, Kruskal-Wallis, Cochran's Q,
Jonckheere-Terpstra, tail dependence, and the Hampel filter.

Division note (SKILL.md gotcha): Spark `div` / DuckDB `//` truncate
toward zero; Python `//` floors — `tdiv` below replays engine semantics.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cents(x: float) -> int:
    from decimal import Decimal, ROUND_HALF_UP

    return int(
        (Decimal(repr(x)) * 100).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _events(spark):
    return load_table(spark, SF, "events").collect()


def test_cramer_von_mises_python_replay(spark):
    rows = [
        (round(r.value * 100), r.event_type == "click")
        for r in _events(spark)
        if r.event_type in ("click", "view")
    ]
    vals = sorted({v for v, _ in rows})
    ca = Counter(v for v, a in rows if a)
    cb = Counter(v for v, a in rows if not a)
    n, m = sum(ca.values()), sum(cb.values())
    c1 = c2 = 0
    raw = 0
    maxd = 0
    for v in vals:
        c1 += ca.get(v, 0)
        c2 += cb.get(v, 0)
        d = c1 * m - c2 * n
        raw += (ca.get(v, 0) + cb.get(v, 0)) * d * d
        maxd = max(maxd, abs(d))
    got = REGISTRY["cramer_von_mises_integer"].spark(spark, SF).collect()[0]
    assert got.n_a == n and got.n_b == m
    assert got.max_abs_d == maxd
    assert got.cvm_t_ppm == tdiv(raw * 1000000, n * m * (n + m) ** 2)
    # CvM of two same-shaped uniform samples should be small: T ~ O(1/6)
    assert 0 <= got.cvm_t_ppm < 2_000_000


def test_kruskal_wallis_python_replay(spark):
    orders = load_table(spark, SF, "orders").collect()
    samples = [(r.o_orderpriority, round(r.o_totalprice * 100)) for r in orders]
    tv = Counter(v for _, v in samples)
    r2 = {}
    cless = 0
    for v in sorted(tv):
        r2[v] = 2 * cless + tv[v] + 1
        cless += tv[v]
    per = defaultdict(lambda: [0, 0])  # grp -> [n_i, r2_sum]
    for g, v in samples:
        per[g][0] += 1
        per[g][1] += r2[v]
    n = len(samples)
    t3 = sum(t**3 - t for t in tv.values())
    h_milli = (
        sum(tdiv(3000 * s * s, n * (n + 1) * ni) for ni, s in per.values())
        - 3000 * (n + 1)
    )
    h_adj = tdiv(h_milli * (n**3 - n), n**3 - n - t3)
    got = {
        r.grp: r
        for r in REGISTRY["kruskal_wallis_by_priority"].spark(spark, SF).collect()
    }
    assert len(got) == 5
    for g, (ni, s) in per.items():
        assert got[g].n_i == ni
        assert got[g].r2_sum == s
        assert got[g].mean_rank_milli == tdiv(1000 * s, 2 * ni)
        assert got[g].h_milli == h_milli
        assert got[g].h_adj_milli == h_adj
    # priorities are iid slices of the same price distribution: H ~ chi2(4),
    # far below the 0.001-significance cutoff for any real separation
    assert abs(h_milli) < 30_000


def test_cochran_q_python_replay(spark):
    blocks = defaultdict(lambda: [0, 0, 0])
    for r in _events(spark):
        wk = (r.ts.date() - __import__("datetime").date(2024, 1, 1)).days // 7
        k = {"click": 0, "view": 1, "error": 2}.get(r.event_type)
        if k is not None:
            blocks[(r.user_id, wk)][k] += 1
    xs = []
    for counts in blocks.values():
        tot = sum(counts)
        xs.append(tuple(1 if 3 * c >= tot else 0 for c in counts))
    s = sum(sum(x) for x in xs)
    r2 = sum(sum(x) ** 2 for x in xs)
    c = [sum(x[j] for x in xs) for j in range(3)]
    q_milli = tdiv(
        1000 * 2 * sum((3 * cj - s) ** 2 for cj in c), 3 * (3 * s - r2)
    )
    got = {r.cond: r for r in REGISTRY["cochran_q_test"].spark(spark, SF).collect()}
    assert got["click"].c_j == c[0]
    assert got["view"].c_j == c[1]
    assert got["error"].c_j == c[2]
    for r in got.values():
        assert r.n_blocks == len(xs)
        assert r.q_milli == q_milli
        assert r.df == 2


def test_jonckheere_bruteforce_replay(spark):
    orders = load_table(spark, SF, "orders").collect()
    groups = defaultdict(list)
    for r in orders:
        groups[int(r.o_orderpriority[0])].append(round(r.o_totalprice * 100))
    j2 = 0
    pairs = 0
    ks = sorted(groups)
    for i_idx, gi in enumerate(ks):
        for gj in ks[i_idx + 1 :]:
            pairs += len(groups[gi]) * len(groups[gj])
            ci = Counter(groups[gi])
            for vj in groups[gj]:
                for vi, cnt in ci.items():
                    if vi < vj:
                        j2 += 2 * cnt
                    elif vi == vj:
                        j2 += cnt
    got = REGISTRY["jonckheere_terpstra_trend"].spark(spark, SF).collect()[0]
    assert got.j2 == j2
    assert got.pairs_total == pairs
    assert got.n_total == sum(len(v) for v in groups.values())
    assert got.trend_sign == (1 if j2 > pairs else -1 if j2 < pairs else 0)


def test_tail_dependence_python_replay(spark):
    daily = defaultdict(lambda: [0, 0])
    for r in _events(spark):
        d = r.ts.date()
        if r.event_type == "purchase":
            daily[d][0] += round(r.value * 100)
        elif r.event_type == "error":
            daily[d][1] += 1
    xs = sorted(x for x, _ in daily.values())
    ys = sorted(y for _, y in daily.values())
    n = len(daily)
    got = {
        r.q_permille: r
        for r in REGISTRY["tail_dependence_empirical"].spark(spark, SF).collect()
    }
    for q in (500, 700, 800):
        k = (q * n + 999) // 1000
        x_thr, y_thr = xs[k - 1], ys[k - 1]
        joint = sum(1 for x, y in daily.values() if x > x_thr and y > y_thr)
        assert got[q].x_thr == x_thr
        assert got[q].y_thr == y_thr
        assert got[q].n_joint == joint
        assert got[q].lambda_u_ppm == (joint * 1000000) // (n - k)


def test_hampel_python_replay(spark):
    daily = defaultdict(dict)
    for r in _events(spark):
        d = r.ts.date()
        daily[r.event_type][d] = daily[r.event_type].get(d, 0) + 1
    got = REGISTRY["hampel_filter_outliers"].spark(spark, SF).collect()
    by_key = {(r.event_type, r.day): r for r in got}
    n_out = 0
    for et, days in daily.items():
        ds = sorted(days)
        for i, d in enumerate(ds):
            nb = sorted(days[ds[j]] for j in range(max(0, i - 3), min(len(ds), i + 4)))
            m = len(nb)
            med2 = 2 * nb[(m - 1) // 2] if m % 2 else nb[m // 2 - 1] + nb[m // 2]
            dv = sorted(abs(2 * e - med2) for e in nb)
            mad4 = 2 * dv[(m - 1) // 2] if m % 2 else dv[m // 2 - 1] + dv[m // 2]
            r = by_key[(et, d)]
            assert r.med2 == med2, (et, d)
            assert r.mad4 == mad4, (et, d)
            expect = 1 if 2 * abs(2 * days[d] - med2) > 3 * mad4 else 0
            assert r.is_outlier == expect
            n_out += expect
    assert len(got) == sum(len(v) for v in daily.values())
