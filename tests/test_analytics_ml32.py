"""Invariant tests for the deterministic-summary wave
(misra_gries_heavy_hitters, count_sketch_signed) — independent Python
references.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    for r in (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    ):
        yield r.doc_id, re.findall("[a-z]+", r.text.lower())


def test_misra_gries_matches_python_reference(spark):
    shard_counts = defaultdict(Counter)
    truth = Counter()
    for doc_id, toks in _tokens(spark):
        shard_counts[doc_id % 8].update(toks)
        truth.update(toks)
    merged = Counter()
    total_err = 0
    for shard, cnt in shard_counts.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        off = ranked[10][1] if len(ranked) > 10 else 0
        total_err += off
        for term, c in ranked[:10]:
            if c > off:
                merged[term] += c - off
    want = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = REGISTRY["misra_gries_heavy_hitters"].spark(spark, SF).collect()
    assert len(got) == len(want)
    for r, (term, est) in zip(got, want):
        assert (r.term, r.est) == (term, est)
        assert r.true_count == truth[term]
        assert r.total_err == total_err
        # the MG guarantee, re-derived
        assert est <= truth[term]
        assert est >= truth[term] - total_err
        assert r.within_bound == 1


def test_count_sketch_matches_python_reference(spark):
    freq = Counter()
    for _doc, toks in _tokens(spark):
        freq.update(toks)
    cells = defaultdict(int)
    lanes = {}
    for term, f in freq.items():
        for r in range(5):
            b = int(hashlib.md5(f"{term}:b:{r}".encode())
                    .hexdigest()[:8], 16) % 128
            s = 1 if int(hashlib.md5(f"{term}:s:{r}".encode())
                         .hexdigest()[:8], 16) % 2 == 0 else -1
            cells[(r, b)] += s * f
            lanes[(term, r)] = (b, s)
    got = REGISTRY["count_sketch_signed"].spark(spark, SF).collect()
    want = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(got) == len(want)
    for r_row, (term, f) in zip(got, want):
        ests = sorted(
            lanes[(term, r)][1] * cells[(r, lanes[(term, r)][0])]
            for r in range(5)
        )
        med = ests[2]
        assert (r_row.term, r_row.true_count) == (term, f)
        assert r_row.est_median == med, term
        assert r_row.abs_err == abs(med - f)
