"""Invariant tests for the round-5 wave 10: Goodman-Kruskal gamma and
quantile treatment effects — independent Python replays at sf0.001.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_gamma_python_replay(spark):
    orders = sorted(load_table(spark, SF, "orders").collect(),
                    key=lambda o: (o.o_totalprice, o.o_orderkey))
    n = len(orders)
    base, extra = divmod(n, 5)
    grid = defaultdict(int)
    idx = 0
    for c in range(1, 6):
        size = base + (1 if c <= extra else 0)
        for o in orders[idx:idx + size]:
            grid[(int(o.o_orderpriority[0]), c)] += 1
        idx += size
    cc = dd = 0
    cells = list(grid.items())
    for (r1, c1), n1 in cells:
        for (r2, c2), n2 in cells:
            if r2 > r1 and c2 > c1:
                cc += n1 * n2
            elif r2 > r1 and c2 < c1:
                dd += n1 * n2
    row = REGISTRY["goodman_kruskal_gamma"].spark(spark, SF).collect()[0]
    assert (row.n_concordant, row.n_discordant) == (cc, dd)
    assert row.gamma_milli == tdiv(1000 * (cc - dd), cc + dd)
    # priority and price are independent in the synthetic lake: |gamma|
    # stays small
    assert abs(row.gamma_milli) < 200


def test_qte_python_replay(spark):
    rows = [r for r in load_table(spark, SF, "events").collect()
            if r.event_type in ("click", "view")]
    groups = {1: [], 0: []}
    for r in rows:
        groups[1 if r.event_type == "click" else 0].append(
            (round(r.value * 100), r.event_id))
    for g in groups.values():
        g.sort()
    got = {r.decile: r for r in
           REGISTRY["quantile_treatment_effect"].spark(spark, SF).collect()}
    assert set(got) == set(range(1, 10))
    for q in range(1, 10):
        va = groups[1][(q * len(groups[1]) + 9) // 10 - 1][0]
        vb = groups[0][(q * len(groups[0]) + 9) // 10 - 1][0]
        r = got[q]
        assert (r.v_click_cents, r.v_view_cents) == (va, vb)
        assert r.qte_cents == va - vb
    # order statistics are nondecreasing in the decile
    vs = [got[q].v_click_cents for q in range(1, 10)]
    assert vs == sorted(vs)
