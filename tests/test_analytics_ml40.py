"""Invariant tests for the tail/cluster-quality wave
(block_maxima_return_levels, davies_bouldin_medoid_index) —
independent Python references.
"""

from __future__ import annotations

import math
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_block_maxima_matches_python_reference(spark):
    daily = defaultdict(int)
    for r in (
        load_table(spark, SF, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(year(o_orderdate) AS BIGINT) AS yr",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[(r.yr, r.day)] += r.cents
    blocks = defaultdict(lambda: [0, 0])  # yr -> [max, n_days]
    for (yr, _d), c in daily.items():
        b = blocks[yr]
        b[0] = max(b[0], c)
        b[1] += 1
    n = len(blocks)
    order = sorted(blocks.items(), key=lambda kv: (-kv[1][0], kv[0]))
    got = REGISTRY["block_maxima_return_levels"].spark(spark, SF).collect()
    assert len(got) == n
    for i, (r, (yr, (bmax, ndays))) in enumerate(zip(got, order), 1):
        assert (r.yr, r.n_days_in_block, r.block_max) == (yr, ndays, bmax)
        assert r.severity_rank == i
        assert r.return_period_milli_blocks == (n + 1) * 1000 // i
        assert r.exceedance_prob_ppm == i * 1_000_000 // (n + 1)
    # plotting positions sum property: exceedance probs are i/(n+1)
    assert got[0].return_period_milli_blocks == (n + 1) * 1000


def test_davies_bouldin_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "embeddings")
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
        .collect()
    )
    scale = max(max(abs(x) for x in r.emb) for r in rows)

    def rnd(x):
        v = x * 127.0 / scale
        return int(math.floor(v + 0.5)) if v >= 0 else -int(
            math.floor(-v + 0.5)
        )

    pts = {r.vec_id: [rnd(x) for x in r.emb] for r in rows}
    # medoid rule mirrors the entry: % 64 survivors capped below 2048
    cents = {v: q for v, q in pts.items() if v % 64 == 0 and v < 2048}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    members = defaultdict(list)
    for v, q in pts.items():
        best = min(cents, key=lambda c: (d2(q, cents[c]), c))
        members[best].append(d2(q, cents[best]))
    s_milli = {
        c: sum(ds) * 1000 // len(ds) for c, ds in members.items()
    }
    r_micro = {}
    for ci in cents:
        r_micro[ci] = max(
            (s_milli[ci] + s_milli[cj]) * 1000
            // d2(cents[ci], cents[cj])
            for cj in cents
            if cj != ci
        )
    db = sum(r_micro.values()) // len(r_micro)
    got = {r.centroid_id: r for r in
           REGISTRY["davies_bouldin_medoid_index"].spark(spark, SF)
           .collect()}
    assert set(got) == set(cents)
    for ci, r in got.items():
        assert r.n_members == len(members[ci])
        assert r.s_milli == s_milli[ci], ci
        assert r.r_i_micro == r_micro[ci], ci
        assert r.db_index_micro == db
        # the worst-rival ratio is at least the scatter-over-separation
        # against ANY single rival
        assert r.r_i_micro > 0
