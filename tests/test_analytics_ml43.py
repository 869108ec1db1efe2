"""Invariant tests for the linear-algebra wave
(power_iteration_top_eigen, diag_mahalanobis_outliers) — independent
Python references replaying the exact integer recursions.
"""

from __future__ import annotations

import math
from collections import defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _quantized(spark, cap=None):
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

    return {
        r.vec_id: [rnd(x) for x in r.emb]
        for r in rows
        if cap is None or r.vec_id < cap
    }


def test_power_iteration_matches_python_reference(spark):
    pts = _quantized(spark, cap=2000)
    vecs = list(pts.values())
    n = len(vecs)
    dim = len(vecs[0])
    s = [sum(v[d] for v in vecs) for d in range(dim)]
    cov = [[0] * dim for _ in range(dim)]
    for d1 in range(dim):
        for d2 in range(dim):
            sxy = sum(v[d1] * v[d2] for v in vecs)
            cov[d1][d2] = n * sxy - s[d1] * s[d2]
    mc = max(abs(cov[i][j]) for i in range(dim) for j in range(dim))
    a = [[_tdiv(cov[i][j] * 1000, mc) for j in range(dim)]
         for i in range(dim)]
    v = [1000] * dim
    for _ in range(3):
        w = [
            _tdiv(sum(a[i][j] * v[j] for j in range(dim)), 1000)
            for i in range(dim)
        ]
        mw = max(abs(x) for x in w)
        v = [_tdiv(x * 1000, mw) for x in w]
    av = [
        _tdiv(sum(a[i][j] * v[j] for j in range(dim)), 1000)
        for i in range(dim)
    ]
    lam = _tdiv(
        sum(v[i] * av[i] for i in range(dim)) * 1000,
        sum(x * x for x in v),
    )
    tr = sum(a[i][i] for i in range(dim))
    want = sorted(
        ((d + 1, v[d]) for d in range(dim)),
        key=lambda t: (-abs(t[1]), t[0]),
    )[:8]
    got = REGISTRY["power_iteration_top_eigen"].spark(spark, SF).collect()
    assert len(got) == 8
    for r, (d, load) in zip(got, want):
        assert (r.dim, r.loading_milli) == (d, load)
        assert r.lambda_milli == lam
        assert r.var_explained_ppm == _tdiv(lam * 1_000_000, tr)
    # the iterate is max-normalized: its largest |loading| is 1000
    assert max(abs(r.loading_milli) for r in got) == 1000


def test_diag_mahalanobis_matches_python_reference(spark):
    pts = _quantized(spark)
    dim = len(next(iter(pts.values())))
    n = len(pts)
    s = [0] * dim
    q = [0] * dim
    for v in pts.values():
        for d in range(dim):
            s[d] += v[d]
            q[d] += v[d] * v[d]
    vn = [n * q[d] - s[d] * s[d] for d in range(dim)]
    scores = {}
    for vid, v in pts.items():
        total = 0
        dims = 0
        for d in range(dim):
            if vn[d] > 0:
                dev = n * v[d] - s[d]
                total += dev * dev * 1_000_000 // vn[d]
                dims += 1
        scores[vid] = (total, dims)
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:15]
    got = REGISTRY["diag_mahalanobis_outliers"].spark(spark, SF).collect()
    assert len(got) == 15
    for r, (vid, (d2, dims)) in zip(got, want):
        assert (r.vec_id, r.n_dims, r.d2_ppm) == (vid, dims, d2)
        assert r.mean_z2_ppm == d2 // dims
    # sum of z^2 over the population ~ n per dimension: the TOP outlier
    # must exceed the average score
    avg = sum(t for t, _ in scores.values()) // len(scores)
    assert got[0].d2_ppm >= avg
