"""Invariant tests for the geo-encoding/boosting/hashing wave
(geohash_prefix_rollup, adaboost_two_round_stumps,
feature_hashing_collision_audit) — independent Python references.

The geohash reference here is the TEXTBOOK bisection algorithm, not the
quantize-and-interleave construction the entry uses — agreement proves
the 20-bit integer construction IS standard geohash at 8 characters.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_classic(lat: float, lon: float, nchars: int = 8) -> str:
    latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < nchars * 5:
        if even:
            mid = (lonr[0] + lonr[1]) / 2
            bits.append(1 if lon >= mid else 0)
            lonr[0 if lon >= mid else 1] = mid
        else:
            mid = (latr[0] + latr[1]) / 2
            bits.append(1 if lat >= mid else 0)
            latr[0 if lat >= mid else 1] = mid
        even = not even
    return "".join(
        _B32[int("".join(map(str, bits[i * 5:i * 5 + 5])), 2)]
        for i in range(nchars)
    )


def test_geohash_classic_reference_vector():
    assert geohash_classic(57.64911, 10.40744) == "u4pruydq"


def test_geohash_rollup_matches_bisection_reference(spark):
    keys = [
        r.c_custkey
        for r in load_table(spark, SF, "customer").select("c_custkey").collect()
    ]
    pref = defaultdict(lambda: [0, set(), 0])
    for k in keys:
        lat_m = (k * 7919) % 180000 - 90000
        lon_m = (k * 104729) % 360000 - 180000
        gh = geohash_classic(lat_m / 1000.0, lon_m / 1000.0)
        p = pref[gh[:3]]
        p[0] += 1
        p[1].add(gh)
        p[2] += int(hashlib.md5(gh.encode()).hexdigest()[:8], 16)
    want = sorted(
        ((n, px, len(cells), ck) for px, (n, cells, ck) in pref.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = REGISTRY["geohash_prefix_rollup"].spark(spark, SF).collect()
    assert len(got) == len(want)
    for r, (n, px, cells, ck) in zip(got, want):
        assert (r.prefix, r.n_customers, r.n_cells, r.checksum) == (
            px, n, cells, ck,
        )


def _doc_feats(spark):
    out = []
    for r in (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("lang", "n_chars", "text")
        .collect()
    ):
        toks = len(re.findall("[a-z]+", r.text.lower()))
        out.append(
            {
                "y": 1 if r.lang == "en" else 0,
                "len500": 1 if r.n_chars >= 500 else 0,
                "tok90": 1 if toks >= 90 else 0,
                "digit": 1 if re.search("[0-9]", r.text) else 0,
                "avg6": 1 if r.n_chars >= 6 * toks else 0,
            }
        )
    return out


def test_adaboost_matches_python_reference(spark):
    rows = _doc_feats(spark)
    feats = ["avg6", "digit", "len500", "tok90"]  # tie-break order
    n = len(rows)
    err1 = {f: sum(1 for r in rows if r[f] != r["y"]) for f in feats}
    best1 = min(feats, key=lambda f: (err1[f], f))
    e1 = err1[best1]
    # exact integer reweighting: mis -> n-e1, correct -> e1
    w = [(n - e1) if r[best1] != r["y"] else e1 for r in rows]
    tw = sum(w)
    mm = sum(wi for wi, r in zip(w, rows) if r[best1] != r["y"])
    werr = {
        f: sum(wi for wi, r in zip(w, rows) if r[f] != r["y"]) for f in feats
    }
    best2 = min(feats, key=lambda f: (werr[f], f))
    got = REGISTRY["adaboost_two_round_stumps"].spark(spark, SF).collect()
    r1, r2 = got
    assert r1.round == 1 and r1.feature == best1
    assert (r1.err_raw, r1.mass_total) == (e1, n)
    assert r1.err_ppm == e1 * 1_000_000 // n
    # the boosting invariant: exactly half the reweighted mass sits on
    # round 1's mistakes
    assert tw == 2 * e1 * (n - e1)
    assert mm == e1 * (n - e1)
    assert r1.post_update_mis_mass_ppm == (
        0 if tw == 0 else mm * 1_000_000 // tw
    )
    if tw:
        assert r1.post_update_mis_mass_ppm == 500_000
    assert r2.round == 2 and r2.feature == best2
    assert (r2.err_raw, r2.mass_total) == (werr[best2], tw)
    assert r2.err_ppm == (
        0 if tw == 0 else werr[best2] * 1_000_000 // tw
    )
    assert r2.post_update_mis_mass_ppm is None


def test_feature_hashing_matches_python_reference(spark):
    freq = Counter()
    for r in (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("text")
        .collect()
    ):
        freq.update(re.findall("[a-z]+", r.text.lower()))
    buckets = defaultdict(lambda: [0, 0])  # k, mass
    for t, f in freq.items():
        b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 4096
        buckets[b][0] += 1
        buckets[b][1] += f
    total = sum(freq.values())
    hist = defaultdict(lambda: [0, 0])  # k -> n_buckets, token_mass
    for k, m in buckets.values():
        hist[k][0] += 1
        hist[k][1] += m
    hist[0] = [4096 - len(buckets), 0]
    got = {r.terms_per_bucket: r for r in
           REGISTRY["feature_hashing_collision_audit"]
           .spark(spark, SF).collect()}
    assert set(got) == set(hist)
    for k, (nb, mass) in hist.items():
        r = got[k]
        assert (r.n_buckets, r.n_terms, r.token_mass) == (nb, k * nb, mass)
        assert r.mass_ppm == mass * 1_000_000 // total
        assert r.collided_mass_ppm == (
            (mass if k >= 2 else 0) * 1_000_000 // total
        )
    # histogram closure: every one of the 4096 buckets is accounted for
    assert sum(r.n_buckets for r in got.values()) == 4096
