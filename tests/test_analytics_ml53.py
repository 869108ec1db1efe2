"""Invariant tests for the round-4 wave 4: Erlang-C, l-diversity,
Lorenz deciles, MASE, confusion metrics, panel fixed effects, local
clustering, k-truss peel — independent Python replays at sf0.001.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_erlang_c_python_replay(spark):
    evs = sorted(
        ((int(r.ts.timestamp() * 1_000_000), round(r.value * 1000))
         for r in load_table(spark, SF, "events").collect()),
    )
    ss = sum(s for _, s in evs)
    ga = sum(b[0] - a[0] for a, b in zip(evs, evs[1:]))
    rho = tdiv(ss * 1000 * 1000000, ga)
    b = 1000000
    expect = []
    for k in range(1, 11):
        rb = tdiv(rho * b, 1000000)
        b = tdiv(rb * 1000000, k * 1000000 + rb)
        if k * 1000000 > rho:
            c = tdiv(b * k * 1000000 * 1000000,
                     k * 1000000 * 1000000 - rho * (1000000 - b))
            expect.append((k, rho, b, c))
    got = [(r.n_servers, r.offered_load_ppm, r.erlang_b_ppm,
            r.erlang_c_wait_ppm)
           for r in REGISTRY["erlang_c_wait_probability"].spark(spark, SF).collect()]
    assert got == expect
    # Erlang C >= Erlang B at every stable c (queued >= lost waiting mass)
    for _, _, bp, cp in got:
        assert cp >= bp


def test_ldiversity_python_replay(spark):
    cls = defaultdict(Counter)
    for r in load_table(spark, SF, "customer").collect():
        band = tdiv(round(r.c_acctbal * 100), 100000)
        cls[(r.c_nationkey, band)][r.c_mktsegment] += 1
    row = REGISTRY["ldiversity_audit"].spark(spark, SF).collect()[0]
    assert row.n_classes == len(cls)
    assert row.n_rows == sum(sum(c.values()) for c in cls.values())
    assert row.rows_failing_l2 == sum(
        sum(c.values()) for c in cls.values() if len(c) < 2
    )
    assert row.rows_failing_l3 == sum(
        sum(c.values()) for c in cls.values() if len(c) < 3
    )
    assert row.min_l == min(len(c) for c in cls.values())
    assert row.worst_disclosure_ppm == max(
        max(c.values()) * 1000000 // sum(c.values()) for c in cls.values()
    )
    assert row.worst_disclosure_ppm <= 1000000


def test_lorenz_python_replay(spark):
    spend = defaultdict(int)
    cust = [r.c_custkey for r in load_table(spark, SF, "customer").collect()]
    for r in load_table(spark, SF, "orders").collect():
        spend[r.o_custkey] += round(r.o_totalprice * 100)
    ys = [y for y, _ in sorted((spend.get(c, 0), c) for c in cust)]
    n, total = len(ys), sum(ys)
    cum = 0
    cums = []
    for y in ys:
        cum += y
        cums.append(cum)
    pts = {}
    for k in range(1, 11):
        r = k * n // 10
        pts[k] = cums[r - 1] * 1000000 // total
    gini = 1000000 - sum(
        pts[k] + (pts[k - 1] if k > 1 else 0) for k in range(1, 11)
    ) // 10
    got = {r.decile: r for r in
           REGISTRY["lorenz_curve_deciles"].spark(spark, SF).collect()}
    for k in range(1, 11):
        assert got[k].lorenz_ppm == pts[k]
        assert got[k].gini_ppm == gini
    assert got[10].lorenz_ppm == 1000000  # curve ends at (1,1)
    vals = [got[k].lorenz_ppm for k in range(1, 11)]
    assert vals == sorted(vals)  # Lorenz curves are monotone


def test_mase_python_replay(spark):
    daily = defaultdict(dict)
    for r in load_table(spark, SF, "events").collect():
        d = r.ts.date()
        daily[r.event_type][d] = daily[r.event_type].get(d, 0) + 1
    got = {r.event_type: r for r in
           REGISTRY["mase_forecast_eval"].spark(spark, SF).collect()}
    for et, days in daily.items():
        ds = sorted(days)
        ys = [days[d] for d in ds]
        sae_s = sum(abs(ys[i] - ys[i - 7]) for i in range(7, len(ys)))
        sae_n = sum(abs(ys[i] - ys[i - 1]) for i in range(1, len(ys)))
        n_s, n_n = len(ys) - 7, len(ys) - 1
        assert got[et].n_forecasts == n_s
        assert got[et].seasonal_abs_err == sae_s
        assert got[et].naive_abs_err == sae_n
        assert got[et].mase_milli == tdiv(sae_s * n_n * 1000, sae_n * n_s)


def test_confusion_python_replay(spark):
    tp = fp = fn = tn = 0
    for r in load_table(spark, SF, "documents").collect():
        pred = r.n_chars > 250
        label = r.lang == "en"
        tp += pred and label
        fp += pred and not label
        fn += (not pred) and label
        tn += (not pred) and not label
    row = REGISTRY["confusion_matrix_metrics"].spark(spark, SF).collect()[0]
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    assert row.precision_milli == tp * 1000 // (tp + fp)
    assert row.recall_milli == tp * 1000 // (tp + fn)
    assert row.f1_milli == 2 * tp * 1000 // (2 * tp + fp + fn)
    ba = (tp * 1000000 // (tp + fn) + tn * 1000000 // (tn + fp)) // 2
    assert row.balanced_accuracy_ppm == ba


def test_fixed_effects_python_replay(spark):
    orders = load_table(spark, SF, "orders").collect()
    months = sorted({(r.o_orderdate.year, r.o_orderdate.month) for r in orders})
    cust = [r.c_custkey for r in load_table(spark, SF, "customer").collect()]
    cells = defaultdict(lambda: [0, 0])
    for r in orders:
        c = cells[(r.o_custkey, (r.o_orderdate.year, r.o_orderdate.month))]
        c[0] += 1
        c[1] += round(r.o_totalprice * 100)
    m = len(months)
    a = b = 0
    for ck in cust:
        sx = sy = sxy = sxx = 0
        for mo in months:
            x, y = cells.get((ck, mo), (0, 0))
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x
        a += m * sxy - sx * sy
        b += m * sxx - sx * sx
    row = REGISTRY["fixed_effects_within_estimator"].spark(spark, SF).collect()[0]
    assert row.n_entities == len(cust)
    assert row.n_periods == m
    assert row.fe_slope_milli_cents_per_order == tdiv(1000 * a, b)
    assert row.demeaned_var_x == b
    # an extra order raises spend: within-slope must be strongly positive
    assert row.fe_slope_milli_cents_per_order > 0


def _cosupply_graph(spark):
    per_order = defaultdict(set)
    for r in load_table(spark, SF, "lineitem").collect():
        per_order[r.l_orderkey].add(r.l_suppkey)
    w = Counter()
    for supps in per_order.values():
        ss = sorted(supps)
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1:]:
                w[(s1, s2)] += 1
    return {(s1, s2) for (s1, s2), c in w.items()
            if c >= 2 and (s1 * 31 + s2 * 17) % 20 == 0}


def test_local_clustering_and_ktruss_python_replay(spark):
    e = _cosupply_graph(spark)
    adj = defaultdict(set)
    for a, b in e:
        adj[a].add(b)
        adj[b].add(a)
    # local clustering
    rows = REGISTRY["local_clustering_topk"].spark(spark, SF).collect()
    expect = []
    for u in adj:
        d = len(adj[u])
        if d < 2:
            continue
        nb = sorted(adj[u])
        tri = sum(
            1
            for i, v in enumerate(nb)
            for wv in nb[i + 1:]
            if (v, wv) in e or (wv, v) in e
        )
        expect.append((tri * 2000000 // (d * (d - 1)), u, d, tri))
    expect.sort(key=lambda t: (-t[0], t[1]))
    expect = expect[:15]
    got = [(r.lcc_ppm, r.node, r.degree, r.triangles) for r in rows]
    assert got == expect

    # k-truss peel
    def support(edges):
        ad = defaultdict(set)
        for a, b in edges:
            ad[a].add(b)
            ad[b].add(a)
        return {ed: len(ad[ed[0]] & ad[ed[1]]) for ed in edges}

    s0 = support(e)
    e1 = {ed for ed, s in s0.items() if s >= 1}
    s1 = support(e1)
    e2 = {ed for ed, s in s1.items() if s >= 1}
    row = REGISTRY["ktruss_edge_peel"].spark(spark, SF).collect()[0]
    assert row.edges_round0 == len(e)
    assert row.edges_round1 == len(e1)
    assert row.edges_round2 == len(e2)
    nodes1 = {x for ed in e1 for x in ed}
    assert row.nodes_in_truss_candidates == len(nodes1)
    assert row.max_support_after_peel == (max(s1.values()) if s1 else 0)
    # peeling never grows the edge set
    assert row.edges_round0 >= row.edges_round1 >= row.edges_round2
