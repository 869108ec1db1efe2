"""Invariant tests for the round-5 wave 1/2: time-series diagnostics,
ranker evaluation, variance homogeneity, referential integrity, IVM,
structural similarity, and embedding density — independent Python replays
at sf0.001.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def rha(v: float) -> int:
    """round half AWAY from zero — Spark/DuckDB round(); Python's round()
    is banker's and differs when float32*1000 lands exactly on .5."""
    import math

    return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)


def _daily(spark):
    rows = load_table(spark, SF, "events").collect()
    by_day = defaultdict(int)
    for r in rows:
        if r.event_type == "purchase":
            by_day[r.ts.date()] += round(r.value * 100)
    return [x for _, x in sorted(by_day.items())]


def test_ljung_box_python_replay(spark):
    xs = _daily(spark)
    n, s = len(xs), sum(xs)
    e = [n * x - s for x in xs]
    den = sum(v * v for v in e)
    got = {r.lag_k: r for r in
           REGISTRY["ljung_box_portmanteau"].spark(spark, SF).collect()}
    assert set(got) == {1, 2, 3}
    q_cum = 0
    for k in (1, 2, 3):
        num = sum(e[i] * e[i - k] for i in range(k, n))
        ac = tdiv(1000 * num, den)
        assert got[k].ac_milli == ac
        q_cum += tdiv(ac * ac, n - k)
        assert got[k].q_cum_milli == tdiv(n * (n + 2) * q_cum, 1000)
        assert abs(got[k].ac_milli) <= 1000


def test_theil_u2_python_replay(spark):
    xs = _daily(spark)
    num = sum((xs[i] - xs[i - 7]) ** 2 for i in range(7, len(xs)))
    den = sum((xs[i] - xs[i - 1]) ** 2 for i in range(7, len(xs)))
    row = REGISTRY["theil_u2_seasonal"].spark(spark, SF).collect()[0]
    assert row.n_eval_days == len(xs) - 7
    assert row.u2_sq_ppm == tdiv(1000000 * num, den)


def test_binseg_python_replay(spark):
    xs = _daily(spark)
    n, s = len(xs), sum(xs)
    best = None
    st = 0
    for t in range(1, n):
        st += xs[t - 1]
        gain = tdiv((n * st - t * s) ** 2, n * t * (n - t))
        if best is None or gain > best[0]:
            best = (gain, t, st)
    row = REGISTRY["binseg_changepoint_daily"].spark(spark, SF).collect()[0]
    gain, t, st = best
    assert (row.split_pos, row.gain_cents2) == (t, gain)
    assert row.mean_left_milli == tdiv(1000 * st, t)
    assert row.mean_right_milli == tdiv(1000 * (s - st), n - t)
    # the two segment means actually differ at the reported split
    assert row.mean_left_milli != row.mean_right_milli


def test_lift_gain_python_replay(spark):
    docs = load_table(spark, SF, "documents").collect()
    ranked = sorted(docs, key=lambda r: (-r.n_chars, r.doc_id))
    n = len(ranked)
    p = sum(1 for r in ranked if r.lang == "en")
    # ntile semantics: first n % 10 tiles have n//10 + 1 rows
    base, extra = divmod(n, 10)
    got = {r.decile: r for r in
           REGISTRY["lift_gain_deciles"].spark(spark, SF).collect()}
    idx, cum_pos, cum_n = 0, 0, 0
    for d in range(1, 11):
        size = base + (1 if d <= extra else 0)
        chunk = ranked[idx:idx + size]
        idx += size
        pos = sum(1 for r in chunk if r.lang == "en")
        cum_pos += pos
        cum_n += size
        r = got[d]
        assert (r.n_docs, r.n_pos) == (size, pos)
        assert r.gain_ppm == tdiv(1000000 * cum_pos, p)
        assert r.lift_milli == tdiv(1000 * cum_pos * n, p * cum_n)
    assert got[10].gain_ppm == 1000000  # full population captures all
    # gains monotone nondecreasing
    gains = [got[d].gain_ppm for d in range(1, 11)]
    assert gains == sorted(gains)


def test_map_at_k_python_replay(spark):
    docs = load_table(spark, SF, "documents").collect()
    ranked = sorted(docs, key=lambda r: (-r.n_chars, r.doc_id))[:20]
    r_tot = defaultdict(int)
    for r in docs:
        r_tot[r.lang] += 1
    got = {r.lang: r for r in
           REGISTRY["map_at_k_retrieval"].spark(spark, SF).collect()}
    assert set(got) == set(r_tot)
    for lang in r_tot:
        cum, num = 0, 0
        for i, r in enumerate(ranked, start=1):
            if r.lang == lang:
                cum += 1
                num += tdiv(1000000 * cum, i)
        g = got[lang]
        assert g.r_total == r_tot[lang]
        assert g.hits_at_20 == cum
        assert g.ap_ppm == tdiv(num, min(r_tot[lang], 20))
        assert 0 <= g.ap_ppm <= 1000000


def test_brier_decomposition_python_replay(spark):
    docs = load_table(spark, SF, "documents").collect()
    ranked = sorted(docs, key=lambda r: (-r.n_chars, r.doc_id))
    n = len(ranked)
    base, extra = divmod(n, 10)
    bins = []
    idx = 0
    for d in range(1, 11):
        size = base + (1 if d <= extra else 0)
        chunk = ranked[idx:idx + size]
        idx += size
        bins.append((d, (11 - d) * 100000, size,
                     sum(1 for r in chunk if r.lang == "en")))
    N = sum(b[2] for b in bins)
    P = sum(b[3] for b in bins)
    obar = tdiv(1000000 * P, N)
    rel = tdiv(sum(nb * tdiv((p - tdiv(1000000 * pos, nb)) ** 2, 1000000)
                   for _, p, nb, pos in bins), N)
    res = tdiv(sum(nb * tdiv((tdiv(1000000 * pos, nb) - obar) ** 2, 1000000)
                   for _, p, nb, pos in bins), N)
    unc = tdiv(obar * (1000000 - obar), 1000000)
    direct = tdiv(sum(nb * p * p - 2000000 * p * pos + 10**12 * pos
                      for _, p, nb, pos in bins), 1000000 * N)
    row = REGISTRY["brier_score_decomposition"].spark(spark, SF).collect()[0]
    assert (row.n_docs, row.obar_ppm) == (N, obar)
    assert (row.reliability_ppm, row.resolution_ppm) == (rel, res)
    assert (row.uncertainty_ppm, row.brier_ppm) == (unc, direct)
    # Murphy identity: Brier = REL - RES + UNC, exact in real arithmetic,
    # within a few ppm of truncation error on the integer grid
    assert abs((rel - res + unc) - direct) < 10


def test_levene_bf_python_replay(spark):
    rows = load_table(spark, SF, "events").collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r.event_type].append(round(r.value * 100))
    med2, zstats = {}, {}
    for grp, vs in groups.items():
        vs.sort()
        ng = len(vs)
        med2[grp] = vs[(ng + 1) // 2 - 1] + vs[ng // 2]
        zs = [abs(2 * v - med2[grp]) for v in vs]
        zstats[grp] = (ng, sum(zs), sum(z * z for z in zs))
    k = len(groups)
    N = sum(v[0] for v in zstats.values())
    Z = sum(v[1] for v in zstats.values())
    A = sum(tdiv((N * zg - ng * Z) ** 2, ng) for ng, zg, _ in zstats.values())
    B = sum(tdiv(ng * qg - zg * zg, ng) for ng, zg, qg in zstats.values())
    f = tdiv(1000 * (N - k) * A, (k - 1) * N * N * B)
    got = {r.event_type: r for r in
           REGISTRY["levene_brown_forsythe"].spark(spark, SF).collect()}
    for grp, (ng, zg, _) in zstats.items():
        r = got[grp]
        assert (r.n_g, r.med2_cents) == (ng, med2[grp])
        assert r.z_mean_milli == tdiv(1000 * zg, ng)
        assert (r.f_milli, r.df1, r.df2) == (f, k - 1, N - k)


def test_holt_python_replay(spark):
    xs = _daily(spark)
    lv = 1000 * xs[0]
    b = 1000 * (xs[1] - xs[0])
    for x in xs[1:]:
        l_new = tdiv(200000 * x + 800 * (lv + b), 1000)
        b = tdiv(100 * l_new - 100 * lv + 900 * b, 1000)
        lv = l_new
    row = REGISTRY["holt_linear_smoothing"].spark(spark, SF).collect()[0]
    assert row.n_days == len(xs)
    assert (row.level_milli, row.trend_milli) == (lv, b)
    assert row.forecast_7d_milli == lv + 7 * b
    # the smoothed level tracks the data scale
    assert min(xs) * 1000 // 2 < lv < max(xs) * 1000 * 2


def test_fk_orphan_audit_integrity(spark):
    rows = {r.fk_edge: r for r in
            REGISTRY["fk_orphan_audit"].spark(spark, SF).collect()}
    assert len(rows) == 5
    # the synthetic lake is referentially intact
    assert all(r.n_orphan == 0 and r.orphan_ppm == 0 for r in rows.values())
    # under integrity, simulated orphans == children whose FK % 97 == 0
    orders = load_table(spark, SF, "orders").collect()
    sim = sum(1 for o in orders if o.o_custkey % 97 == 0)
    assert rows["orders.o_custkey -> customer"].n_orphan_sim == sim
    li = load_table(spark, SF, "lineitem").collect()
    assert rows["lineitem.l_orderkey -> orders"].n_orphan_sim == sum(
        1 for l in li if l.l_orderkey % 97 == 0)


def test_ivm_consistency_executed(spark):
    rows = REGISTRY["ivm_incremental_agg"].spark(spark, SF).collect()
    assert rows and all(r.consistent for r in rows)
    # deletes actually happened: some group lost rows vs the base table
    orders = load_table(spark, SF, "orders").collect()
    base = defaultdict(int)
    for o in orders:
        base[o.o_orderpriority] += 1
    deleted = sum(1 for o in orders
                  if o.o_orderkey % 43 == 0 and o.o_orderkey % 37 != 0)
    assert deleted > 0
    assert sum(r.cnt_ivm for r in rows) == len(orders) - deleted


def test_scan_similarity_python_replay(spark):
    li = load_table(spark, SF, "lineitem").collect()
    byo = defaultdict(set)
    for l in li:
        byo[l.l_orderkey].add(l.l_suppkey)
    w = defaultdict(int)
    for sup in byo.values():
        ss = sorted(sup)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                w[(ss[i], ss[j])] += 1
    edges = [(a, b) for (a, b), c in w.items()
             if c >= 2 and (a * 31 + b * 17) % 20 == 0]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    exp = []
    for a, b in edges:
        c = len(adj[a] & adj[b])
        exp.append((tdiv(1000000 * c, len(adj[a]) + len(adj[b]) - c),
                    a, b, c, len(adj[a]), len(adj[b])))
    exp.sort(key=lambda t: (-t[0], t[1], t[2]))
    got = REGISTRY["scan_structural_similarity"].spark(spark, SF).collect()
    assert len(got) == min(15, len(exp))
    for r, (jac, a, b, c, da, db) in zip(got, exp[:15]):
        assert (r.a, r.b, r.n_common, r.deg_a, r.deg_b, r.jaccard_ppm) == (
            a, b, c, da, db, jac)


def test_silhouette_python_replay(spark):
    emb = load_table(spark, SF, "embeddings").collect()
    q = {r.vec_id: [rha(float(x) * 1000) for x in r.embedding]
         for r in emb}
    meds = {m: q[m] for m in (0, 10, 20, 30)}
    per = defaultdict(list)
    for vid, qv in q.items():
        ds = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv, mv)), mid)
            for mid, mv in meds.items()
        )
        (a2, mid), (b2, _) = ds[0], ds[1]
        per[mid].append((a2, b2))
    got = {r.medoid_id: r for r in
           REGISTRY["silhouette_medoid_eval"].spark(spark, SF).collect()}
    for mid, pts in per.items():
        r = got[mid]
        assert r.n_points == len(pts)
        s = sum(tdiv(1000000 * (b2 - a2), max(b2, 1)) for a2, b2 in pts)
        assert r.mean_silhouette_ppm == tdiv(s, len(pts))
        assert r.n_well_separated == sum(1 for a2, b2 in pts if 4 * a2 <= b2)
    assert sum(r.n_points for r in got.values()) == len(q)


def test_dbscan_python_replay(spark):
    emb = load_table(spark, SF, "embeddings").collect()
    pts = [(r.vec_id, r.label,
            rha(float(r.embedding[0]) * 1000) + 1000,
            rha(float(r.embedding[1]) * 1000) + 1000) for r in emb]
    counts = defaultdict(lambda: [0, 0, 0])  # label -> [n, core, maxnbr]
    for vid, lbl, x, y in pts:
        nbr = sum(1 for _, _, x2, y2 in pts
                  if (x - x2) ** 2 + (y - y2) ** 2 <= 62500)
        c = counts[lbl]
        c[0] += 1
        c[1] += 1 if nbr >= 4 else 0
        c[2] = max(c[2], nbr)
    got = {r.label: r for r in
           REGISTRY["dbscan_grid_core_points"].spark(spark, SF).collect()}
    assert set(got) == set(counts)
    for lbl, (n, core, mx) in counts.items():
        r = got[lbl]
        assert (r.n_points, r.n_core, r.max_neighbors) == (n, core, mx)
        assert r.core_ppm == tdiv(1000000 * core, n)
