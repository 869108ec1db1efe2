"""Invariant tests for the phonetic-blocking/row-pattern/newsvendor wave
(phonetic_blocking_join, match_recognize_emulation,
newsvendor_quantile_stock) — independent Python references.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

_SDX_MAP = {}
for letters, digit in (
    ("BFPV", "1"),
    ("CGJKQSXZ", "2"),
    ("DT", "3"),
    ("L", "4"),
    ("MN", "5"),
    ("R", "6"),
    ("AEIOUY", "0"),
):
    for ch in letters:
        _SDX_MAP[ch] = digit


def soundex(word: str) -> str:
    """Standard Soundex incl. the H/W-bridged collapse rule."""
    u = word.upper()
    codes = [_SDX_MAP[c] for c in u if c in _SDX_MAP]  # H/W dropped
    collapsed = [c for i, c in enumerate(codes) if i == 0 or c != codes[i - 1]]
    if u[0] not in "HW":
        collapsed = collapsed[1:]
    digits = [c for c in collapsed if c != "0"]
    return (u[0] + "".join(digits) + "000")[:4]


def test_python_soundex_reference_vectors():
    assert soundex("Robert") == soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"  # H bridges S-C collapse
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"
    assert soundex("Honeyman") == "H555"
    assert soundex("Jaques") == "J220"


def _vocab(spark):
    words = set()
    for r in (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("text")
        .collect()
    ):
        words.update(re.findall("[a-z]{3,}", r.text.lower()))
    for r in load_table(spark, SF, "part").select("p_name").collect():
        words.update(re.findall("[a-z]{3,}", r.p_name.lower()))
    return words


def test_phonetic_blocking_matches_python_reference(spark):
    vocab = _vocab(spark)
    clean = defaultdict(set)
    for w in vocab:
        clean[soundex(w)].add(w)
    dirty = defaultdict(set)  # code -> {(word, src)}
    for w in vocab:
        d = w[0] + w[2:]
        dirty[soundex(d)].add((d, w))
    n_dirty = sum(len(v) for v in dirty.values())
    found_true = 0
    ref = {}
    for code in set(clean) & set(dirty):
        pairs = [
            (cw, dw, src)
            for cw in clean[code]
            for (dw, src) in dirty[code]
        ]
        n_true = sum(1 for cw, _, src in pairs if src == cw)
        found_true += n_true
        fp = sum(
            int(hashlib.md5(f"{cw}>{dw}".encode()).hexdigest()[:10], 16)
            for cw, dw, _ in pairs
        )
        ref[code] = (
            len(clean[code]),
            len({dw for _, dw, _ in pairs}),
            len(pairs),
            n_true,
            fp,
        )
    recall = found_true * 1_000_000 // n_dirty
    got = REGISTRY["phonetic_blocking_join"].spark(spark, SF).collect()
    assert {r.code for r in got} == set(ref)
    for r in got:
        nc, ndw, ncand, ntrue, fp = ref[r.code]
        assert (
            r.n_clean,
            r.n_dirty_words,
            r.n_candidates,
            r.n_true,
            r.pair_fingerprint,
        ) == (nc, ndw, ncand, ntrue, fp), r.code
        assert r.blocking_recall_ppm == recall


def _cents(v: float) -> int:
    return int(math.copysign(math.floor(abs(v) * 100 + 0.5), v))


def test_match_recognize_matches_python_reference(spark):
    orders = (
        load_table(spark, SF, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF, "customer")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    nation = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF, "nation")
        .select("n_nationkey", "n_name")
        .collect()
    }
    daily = defaultdict(int)
    for r in orders:
        nk = cust.get(r.o_custkey)
        if nk is None:
            continue
        daily[(nation[nk], r.o_orderdate.date())] += _cents(r.o_totalprice)
    series = defaultdict(list)
    for (nname, day), cents in daily.items():
        series[nname].append((day, cents))
    ref = {}
    for nname, pts in series.items():
        pts.sort()
        s = "".join(
            "U" if c > p else ("D" if c < p else "F")
            for (_, p), (_, c) in zip(pts, pts[1:])
        )
        valleys = re.findall("D+U+", s)
        ref[nname] = (
            len(pts),
            len(valleys),
            sum(map(len, valleys)),
            max(map(len, valleys), default=0),
        )
    got = REGISTRY["match_recognize_emulation"].spark(spark, SF).collect()
    assert {r.n_name for r in got} == set(ref)
    for r in got:
        nd, nv, vd, lv = ref[r.n_name]
        assert (r.n_days, r.n_valleys, r.valley_days, r.longest_valley) == (
            nd,
            nv,
            vd,
            lv,
        ), r.n_name


def test_newsvendor_matches_python_reference_and_is_optimal(spark):
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_partkey", "l_shipdate", "l_quantity")
        .collect()
    )
    brand = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, SF, "part")
        .select("p_partkey", "p_brand")
        .collect()
    }
    demand = Counter()
    for r in li:
        b = brand.get(r.l_partkey)
        if b is not None:
            demand[(b, r.l_shipdate.date())] += int(r.l_quantity)
    by_brand = defaultdict(list)
    for (b, _), d in demand.items():
        by_brand[b].append(d)

    def cost(q, ds):
        return sum(q - d if q >= d else 9 * (d - q) for d in ds)

    got = REGISTRY["newsvendor_quantile_stock"].spark(spark, SF).collect()
    assert {r.p_brand for r in got} == set(by_brand)
    for r in got:
        ds = sorted(by_brand[r.p_brand])
        n = len(ds)
        q = next(
            v for i, v in enumerate(ds) if (i + 1) * 10 >= 9 * n
        )
        assert r.n_days == n
        assert r.q_star == q, r.p_brand
        assert r.cost_at_q == cost(q, ds)
        assert r.cost_minus == cost(q - 1, ds)
        assert r.cost_plus == cost(q + 1, ds)
        # the empirical critical fractile provably minimizes the
        # piecewise-linear cost — must hold on every brand
        assert r.is_optimal == 1
