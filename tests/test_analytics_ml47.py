"""Invariant tests for the market-structure wave
(herfindahl_concentration_index) — independent Python reference.
"""

from __future__ import annotations

from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_hhi_matches_python_reference(spark):
    supp = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, SF, "supplier").collect()
    }
    n2r = {
        r.n_nationkey: r.n_regionkey
        for r in load_table(spark, SF, "nation").collect()
    }
    rname = {
        r.r_regionkey: r.r_name
        for r in load_table(spark, SF, "region").collect()
    }
    rev = defaultdict(int)
    for r in (
        load_table(spark, SF, "lineitem")
        .selectExpr(
            "l_suppkey",
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    ):
        rev[(n2r[supp[r.l_suppkey]], r.l_suppkey)] += r.cents
    per_region = defaultdict(dict)
    for (rk, sk), c in rev.items():
        per_region[rk][sk] = c
    got = {r.r_name: r for r in
           REGISTRY["herfindahl_concentration_index"].spark(spark, SF)
           .collect()}
    assert set(got) == {rname[rk] for rk in per_region}
    for rk, suppliers in per_region.items():
        t = sum(suppliers.values())
        hhi = sum(c * c * 1_000_000 // (t * t) for c in suppliers.values())
        r = got[rname[rk]]
        assert r.n_suppliers == len(suppliers)
        assert r.hhi_ppm == hhi, rname[rk]
        assert r.effective_competitors_milli == 1_000_000_000 // hhi
        band = 2 if hhi > 250_000 else (1 if hhi > 150_000 else 0)
        assert r.concentration_band == band
        # HHI is bounded below by 1/n (per-term floors only reduce it)
        assert hhi <= 1_000_000
        assert r.effective_competitors_milli <= len(suppliers) * 1000 + 1000
