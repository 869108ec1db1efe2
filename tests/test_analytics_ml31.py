"""Invariant tests for the robust-fit/anomaly wave
(ransac_line_consensus, hbos_anomaly_scores) — independent Python
references.
"""

from __future__ import annotations

import datetime
import hashlib
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_ransac_matches_python_reference(spark):
    daily = defaultdict(int)
    base = datetime.date(1995, 1, 1)
    for r in (
        load_table(spark, SF, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    ):
        daily[(r.day - base).days] += r.cents
    pts = sorted(daily.items())
    n = len(pts)
    best = None
    for cand in range(32):
        ia = int(hashlib.md5(f"ransac:a:{cand}".encode())
                 .hexdigest()[:8], 16) % n
        ib = int(hashlib.md5(f"ransac:b:{cand}".encode())
                 .hexdigest()[:8], 16) % n
        (x1, y1), (x2, y2) = pts[ia], pts[ib]
        if x1 == x2:
            continue
        dx, dy = x2 - x1, y2 - y1
        inliers = sum(
            1
            for x, y in pts
            if (dy * (x - x1) - (y - y1) * dx) ** 2 * 4
            <= dx * dx * 25_000_000 ** 2
        )
        key = (inliers, -cand)
        if best is None or key > best[0]:
            best = (key, cand, x1, y1, x2, y2, inliers)
    _, cand, x1, y1, x2, y2, inliers = best
    r = REGISTRY["ransac_line_consensus"].spark(spark, SF).collect()[0]
    assert r.best_candidate == cand
    assert (r.x1, r.y1, r.x2, r.y2) == (x1, y1, x2, y2)
    assert r.n_points == n
    assert r.inliers == inliers
    assert r.inlier_share_ppm == inliers * 1_000_000 // n
    # the sampled pair is always on its own line
    assert r.inliers >= 2


def test_hbos_matches_python_reference(spark):
    rows = (
        load_table(spark, SF, "orders")
        .selectExpr(
            "o_orderkey",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
            "CAST(month(o_orderdate) AS BIGINT) AS mo",
        )
        .collect()
    )
    feats = [
        (r.o_orderkey, min(19, r.cents * 20 // 60_000_000), r.mo - 1)
        for r in rows
    ]
    n = len(feats)
    h1 = Counter(b for _, b, _ in feats)
    h2 = Counter(m for _, _, m in feats)
    scored = sorted(
        (
            (
                -(n * 1000 // h1[b]) * (n * 1000 // h2[m]),
                k,
                b,
                m,
            )
            for k, b, m in feats
        )
    )[:20]
    got = REGISTRY["hbos_anomaly_scores"].spark(spark, SF).collect()
    assert len(got) == 20
    for r, (negscore, k, b, m) in zip(got, scored):
        assert (r.o_orderkey, r.b_price, r.b_month) == (k, b, m)
        assert (r.c_price, r.c_month) == (h1[b], h2[m])
        assert r.hbos_score_micro == -negscore
    # rare bins score higher: the top row's bins are no more populated
    # than the median order's bins
    top = got[0]
    assert top.c_price <= max(h1.values())
    assert top.hbos_score_micro >= got[-1].hbos_score_micro
