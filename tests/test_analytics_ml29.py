"""Invariant tests for the matching wave (stable_matching_assortative)
— independent Python reference running plain greedy over the sorted
cell list plus a brute-force blocking-pair scan (the stability proof
re-executed outside SQL).
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_stable_matching_matches_greedy_reference(spark):
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF, "customer").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF, "nation").collect()
    }
    cells = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .selectExpr(
            "o_custkey", "o_orderpriority",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    ):
        cells[(nat[cust[r.o_custkey]], r.o_orderpriority)] += r.cents
    order = sorted(cells.items(), key=lambda kv: (-kv[1], kv[0]))
    used_n, used_m, matches = set(), set(), {}
    for (nn, mode), cents in order:
        if nn not in used_n and mode not in used_m:
            used_n.add(nn)
            used_m.add(mode)
            matches[(nn, mode)] = cents
    # brute-force blocking-pair scan
    val_n = {nn: c for (nn, _m), c in matches.items()}
    val_m = {m: c for (_n, m), c in matches.items()}
    blocking = 0
    for (nn, mode), cents in cells.items():
        if (nn, mode) in matches:
            continue
        pref_n = nn not in val_n or cents > val_n[nn]
        pref_m = mode not in val_m or cents > val_m[mode]
        if pref_n and pref_m:
            blocking += 1
    got = REGISTRY["stable_matching_assortative"].spark(spark, SF).collect()
    assert len(got) == len(matches)
    want = sorted(matches.items(), key=lambda kv: (-kv[1], kv[0]))
    for i, (r, ((nn, mode), cents)) in enumerate(zip(got, want), 1):
        assert (r.n_name, r.mode, r.cents, r.match_rank) == (
            nn, mode, cents, i,
        )
        assert r.n_blocking_pairs == blocking
        assert r.is_stable == int(blocking == 0)
    # the theorem: greedy on common values admits no blocking pair
    assert blocking == 0
