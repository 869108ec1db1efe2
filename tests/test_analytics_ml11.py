"""Invariant tests for the retrieval/information-theory/dispersion wave
(phrase_match_positional, shannon_fano_code_length, vocab_oov_audit,
overdispersion_fano_burstiness, mcnemar_paired_conversion) —
independent Python references replicating the exact integer arithmetic.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division — Spark `div` / DuckDB `//`."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    rows = (
        load_table(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", "text")
        .collect()
    )
    return [(r.doc_id, r.source, r.text.split(" ")) for r in rows]


def test_phrase_match_matches_python_reference(spark):
    """Top bigram selection and positional phrase-occurrence counts."""
    docs = _doc_tokens(spark)
    bg = Counter()
    for _, _, ts in docs:
        for i in range(len(ts) - 1):
            bg[(ts[i], ts[i + 1])] += 1
    w1, w2 = min(bg, key=lambda k: (-bg[k], k))
    per_doc = Counter()
    for did, _, ts in docs:
        for i in range(len(ts) - 1):
            if ts[i] == w1 and ts[i + 1] == w2:
                per_doc[did] += 1
    expect = sorted(per_doc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = REGISTRY["phrase_match_positional"].spark(spark, SF).collect()
    assert [(r.doc_id, r.n_occurrences) for r in got] == expect
    assert all(r.phrase == f"{w1} {w2}" for r in got)


def test_shannon_fano_matches_python_reference(spark):
    """bin()-length code table, per-source bits and savings vs the
    uniform ceil(log2 V) code."""
    docs = _doc_tokens(spark)
    glob = Counter(t for _, _, ts in docs for t in ts)
    n_total = sum(glob.values())
    v = len(glob)
    bits = {t: (n_total // c).bit_length() for t, c in glob.items()}
    unif = (v - 1).bit_length()
    per_src = defaultdict(Counter)
    for _, src, ts in docs:
        per_src[src].update(ts)
    got = {r.source: r for r in
           REGISTRY["shannon_fano_code_length"].spark(spark, SF).collect()}
    assert set(got) == set(per_src)
    for src, cnts in per_src.items():
        n = sum(cnts.values())
        total = sum(c * bits[t] for t, c in cnts.items())
        r = got[src]
        assert r.n_tokens == n
        assert r.total_bits == total
        assert r.bits_per_token_milli == 1000 * total // n
        assert r.uniform_bits == n * unif
        assert r.savings_ppm == _tdiv((n * unif - total) * 1_000_000, n * unif)
        assert r.total_bits <= r.uniform_bits * 2  # sane code table


def test_vocab_oov_matches_python_reference(spark):
    """Top-20 vocab (count desc, token asc) and per-source OOV rates."""
    docs = _doc_tokens(spark)
    glob = Counter(t for _, _, ts in docs for t in ts)
    ranked = sorted(glob, key=lambda t: (-glob[t], t))
    vocab = set(ranked[:20])
    per_src = defaultdict(Counter)
    for _, src, ts in docs:
        per_src[src].update(ts)
    got = {r.source: r for r in
           REGISTRY["vocab_oov_audit"].spark(spark, SF).collect()}
    assert set(got) == set(per_src)
    for src, cnts in per_src.items():
        n = sum(cnts.values())
        oov = sum(c for t, c in cnts.items() if t not in vocab)
        r = got[src]
        assert r.n_tokens == n
        assert r.n_oov == oov
        assert r.oov_ppm == oov * 1_000_000 // n
        assert r.oov_types == sum(1 for t in cnts if t not in vocab)


def test_fano_burstiness_matches_python_reference(spark):
    """Fano factor and Goh-Barabási burstiness from exact integer
    moments + isqrt; burstiness must land in (-1000, 1000)."""
    rows = (
        load_table(spark, SF, "events")
        .select(F.to_date("ts").alias("day"), "event_type")
        .collect()
    )
    daily = Counter((r.event_type, r.day) for r in rows)
    by_type = defaultdict(list)
    for (et, _), x in daily.items():
        by_type[et].append(x)
    got = {r.event_type: r for r in
           REGISTRY["overdispersion_fano_burstiness"].spark(spark, SF).collect()}
    assert set(got) == set(by_type)
    for et, xs in by_type.items():
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        var_num = n * sxx - sx * sx
        sig = math.isqrt(var_num * n * 1_000_000 // (n - 1))
        r = got[et]
        assert r.n_days == n
        assert r.mean_milli == 1000 * sx // n
        assert r.fano_milli == 1000 * var_num // ((n - 1) * sx)
        assert r.sigma_n_milli == sig
        assert r.burstiness_milli == _tdiv(
            1000 * (sig - 1000 * sx), sig + 1000 * sx
        )
        assert -1000 < r.burstiness_milli < 1000
        assert r.overdispersed == (1 if r.fano_milli > 1000 else 0)


def test_mcnemar_matches_python_reference(spark):
    """Concordance table per type sums to the user population; χ² from
    discordant pairs only."""
    rows = (
        load_table(spark, SF, "events")
        .select("user_id", "event_type", F.dayofmonth("ts").alias("dom"))
        .collect()
    )
    users = {r.user_id for r in rows}
    h = defaultdict(lambda: [0, 0])
    for r in rows:
        h[(r.user_id, r.event_type)][0 if r.dom <= 15 else 1] = 1
    types = {et for _, et in h}
    got = {r.event_type: r for r in
           REGISTRY["mcnemar_paired_conversion"].spark(spark, SF).collect()}
    assert set(got) == types
    for et in types:
        n11 = n10 = n01 = 0
        obs = 0
        for (u, t), (a, b) in h.items():
            if t != et:
                continue
            obs += 1
            n11 += a * b
            n10 += a * (1 - b)
            n01 += (1 - a) * b
        r = got[et]
        assert (r.n11, r.n10, r.n01) == (n11, n10, n01)
        assert r.n00 == len(users) - obs
        assert r.n11 + r.n10 + r.n01 + r.n00 == len(users)
        chi2 = 1000 * (n10 - n01) ** 2 // max(n10 + n01, 1)
        assert r.chi2_milli == chi2
        assert r.significant_05 == (1 if chi2 > 3841 else 0)
