"""Invariant tests for round-6 wave 23: JS drift, Youden J, Hill tail
index, Markov entropy rate, Gini mean difference, median polish —
independent Python replays at sf0.001.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cents(x: float) -> int:
    return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)


def test_jensen_shannon_python_replay(spark):
    docs = [d for d in load_table(spark, SF, "documents").collect()]
    by_src: dict = defaultdict(int)
    for d in docs:
        by_src[d.source] += 1
    top2 = sorted(sorted(by_src), key=lambda s: (-by_src[s], s))[:2]
    sa, sb = sorted(top2)
    ca: dict = defaultdict(int)
    cb: dict = defaultdict(int)
    for d in docs:
        if d.text is None or d.source not in (sa, sb):
            continue
        b = min(len(d.text) // 100, 9)
        (ca if d.source == sa else cb)[b] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for b in set(ca) | set(cb):
        p, q = ca.get(b, 0) / na, cb.get(b, 0) / nb
        t = 0.0
        if p > 0:
            t += 0.5 * p * math.log(2 * p / (p + q))
        if q > 0:
            t += 0.5 * q * math.log(2 * q / (p + q))
        js += round(t, 10)
    rows = REGISTRY["jensen_shannon_drift"].spark(spark, SF).collect()
    assert [r.length_bucket for r in rows] == sorted(set(ca) | set(cb))
    for r in rows:
        assert (r.n_source_a, r.n_source_b) == (
            ca.get(r.length_bucket, 0), cb.get(r.length_bucket, 0)
        )
        assert r.js_divergence_nats == pytest.approx(js, abs=2e-6)
        assert r.js_distance_bits == pytest.approx(
            math.sqrt(js / math.log(2)), abs=2e-6
        )
    # JSD is bounded by ln 2
    assert 0.0 <= rows[0].js_divergence_nats <= math.log(2) + 1e-9


def test_youden_python_replay(spark):
    docs = load_table(spark, SF, "documents").collect()
    by_src: dict = defaultdict(int)
    for d in docs:
        by_src[d.source] += 1
    topsrc = sorted(sorted(by_src), key=lambda s: (-by_src[s], s))[0]
    pts = []
    for d in docs:
        if d.text is None:
            continue
        s = min(len(d.text) // 10, 2000)
        pts.append((s, 1 if d.source == topsrc else 0))
    np_ = sum(y for _, y in pts)
    nn = len(pts) - np_
    cand = sorted({s for s, _ in pts})
    best = []
    for thr in cand:
        tp = sum(1 for s, y in pts if s >= thr and y == 1)
        fp = sum(1 for s, y in pts if s >= thr and y == 0)
        j = tdiv(1000 * tp, np_) - tdiv(1000 * fp, nn)
        best.append((j, thr, tp, fp))
    best.sort(key=lambda t: (-t[0], t[1]))
    rows = REGISTRY["youden_j_threshold"].spark(spark, SF).collect()
    assert len(rows) == 5
    for r, (j, thr, tp, fp) in zip(rows, best[:5]):
        assert (r.threshold_milli, r.tp, r.fp, r.j_milli) == (thr, tp, fp, j)
        assert r.tpr_milli == tdiv(1000 * tp, np_)
        assert r.fpr_milli == tdiv(1000 * fp, nn)
    # the max-J threshold can never fall below the trivial corners
    assert rows[0].j_milli >= 0


def test_hill_python_replay(spark):
    xs = sorted((_cents(o.o_totalprice)
                 for o in load_table(spark, SF, "orders").collect()),
                reverse=True)
    rows = REGISTRY["hill_tail_index"].spark(spark, SF).collect()
    assert [r.tail_k for r in rows] == [50, 100, 200]
    for r in rows:
        k = r.tail_k
        xk1 = xs[k]
        hmean = sum(round(math.log(xs[i] / xk1), 10) for i in range(k)) / k
        assert r.hill_mean_log_excess == pytest.approx(hmean, abs=2e-6)
        assert r.tail_index_alpha == pytest.approx(1.0 / hmean, abs=2e-4)
        assert r.infinite_variance_flag == (1 if 1.0 / hmean < 2.0 else 0)


def test_markov_entropy_rate_python_replay(spark):
    byuser: dict = defaultdict(list)
    for e in load_table(spark, SF, "events").collect():
        byuser[e.user_id].append((e.ts, e.event_id, e.event_type))
    trans: dict = defaultdict(int)
    for seq in byuser.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    marg: dict = defaultdict(int)
    for (a, _), c in trans.items():
        marg[a] += c
    n = sum(trans.values())
    hsum = sum(round(-c * math.log(c / marg[a]), 8)
               for (a, _), c in trans.items())
    h0sum = sum(round(-c * math.log(c / n), 8) for c in marg.values())
    r = REGISTRY["markov_entropy_rate"].spark(spark, SF).collect()[0]
    assert r.n_transitions == n
    assert r.entropy_rate_nats == pytest.approx(hsum / n, abs=2e-6)
    assert r.marginal_entropy_nats == pytest.approx(h0sum / n, abs=2e-6)
    assert r.predictability_gain == pytest.approx(
        1.0 - hsum / h0sum, abs=2e-6
    )
    # entropy rate can never exceed the marginal entropy
    assert r.entropy_rate_nats <= r.marginal_entropy_nats + 1e-9


def test_gmd_python_replay(spark):
    grp: dict = defaultdict(list)
    for li in load_table(spark, SF, "lineitem").collect():
        grp[li.l_returnflag].append(_cents(li.l_extendedprice))
    rows = REGISTRY["gini_mean_difference"].spark(spark, SF).collect()
    assert [r.l_returnflag for r in rows] == sorted(grp)
    for r in rows:
        xs = sorted(grp[r.l_returnflag])
        n, sx = len(xs), sum(xs)
        wsum = sum((2 * i - n - 1) * x for i, x in enumerate(xs, start=1))
        # cross-check the identity against the O(n^2) definition on a
        # deterministic slice
        sub = xs[:60]
        direct = sum(abs(a - b) for i, a in enumerate(sub)
                     for b in sub[i + 1:])
        ident = sum((2 * i - len(sub) - 1) * x
                    for i, x in enumerate(sub, start=1))
        assert direct == ident
        assert r.n == n
        assert r.mean_cents == tdiv(sx, n)
        assert r.gmd_cents == tdiv(2 * wsum, n * (n - 1))
        assert r.gini_milli == tdiv(1000 * wsum, (n - 1) * sx)
        # prices are broadly dispersed but bounded
        assert 0 < r.gini_milli < 1000


def test_median_polish_python_replay(spark):
    cnk = {c.c_custkey: c.c_nationkey
           for c in load_table(spark, SF, "customer").collect()}
    nreg = {n.n_nationkey: n.n_regionkey
            for n in load_table(spark, SF, "nation").collect()}
    cells: dict = defaultdict(int)
    for o in load_table(spark, SF, "orders").collect():
        cells[(nreg[cnk[o.o_custkey]], o.o_orderdate.month)] += _cents(
            o.o_totalprice
        )
    x = {k: 16 * tdiv(v, 100000) for k, v in cells.items()}
    rm: dict = defaultdict(int)
    cm: dict = defaultdict(int)

    def med(vals):
        vs = sorted(vals)
        m = len(vs)
        if m % 2:
            return vs[m // 2]
        tot = vs[m // 2 - 1] + vs[m // 2]
        assert tot % 2 == 0
        return tot // 2

    for axis in ("rg", "mo", "rg", "mo"):
        idx = 0 if axis == "rg" else 1
        groups: dict = defaultdict(list)
        for k, v in x.items():
            groups[k[idx]].append(v)
        ms = {g: med(vs) for g, vs in groups.items()}
        x = {k: v - ms[k[idx]] for k, v in x.items()}
        for g, m in ms.items():
            (rm if axis == "rg" else cm)[g] += m
    top = sorted(x.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:12]
    rows = REGISTRY["median_polish_two_way"].spark(spark, SF).collect()
    assert [(r.region_key, r.month_num, r.row_effect_k16,
             r.col_effect_k16, r.residual_k16) for r in rows] == [
        (rg, mo, rm[rg], cm[mo], resid) for (rg, mo), resid in top
    ]
    # after two sweeps, every row and column median of residuals is 0-ish:
    # the top residual dominates its own row+column story
    assert abs(rows[0].residual_k16) > 0
