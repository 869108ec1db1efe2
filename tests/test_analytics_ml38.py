"""Invariant tests for the text-complexity wave
(yule_k_characteristic, lz78_phrase_complexity) — independent Python
references. The LZ78 reference runs the textbook incremental parse
with a real dict; agreement across Spark's fold, DuckDB's recursive
CTE, and this loop pins the parse.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_yule_k_matches_python_reference(spark):
    per_source = defaultdict(Counter)
    for r in (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("source", "text")
        .collect()
    ):
        per_source[r.source].update(re.findall("[a-z]+", r.text.lower()))
    got = {r.source: r for r in
           REGISTRY["yule_k_characteristic"].spark(spark, SF).collect()}
    assert set(got) == set(per_source)
    for src, freq in per_source.items():
        n = sum(freq.values())
        v = len(freq)
        s2 = sum(m * m for m in freq.values())
        r = got[src]
        assert (r.n_tokens, r.v_types, r.s2) == (n, v, s2)
        assert r.yule_k_x100 == (s2 - n) * 1_000_000 // (n * n)
        # Yule's K is nonnegative (s2 >= n since every m >= 1)
        assert r.yule_k_x100 >= 0


def _lz78_phrases(s: str) -> int:
    dict_set = set()
    cur = ""
    cnt = 0
    for c in s:
        if cur + c in dict_set:
            cur += c
        else:
            cnt += 1
            dict_set.add(cur + c)
            cur = ""
    return cnt + (1 if cur else 0)


def test_lz78_matches_python_reference(spark):
    stats = defaultdict(lambda: [0, 0, 0])
    for r in (
        load_table(spark, SF, "documents")
        .filter("text IS NOT NULL AND (doc_id div 20) % 20 = 0")
        .select("source", "text")
        .collect()
    ):
        s = re.sub("[^a-z ]", "", r.text.lower()[:200])
        if not s:
            continue
        st = stats[r.source]
        st[0] += 1
        st[1] += len(s)
        st[2] += _lz78_phrases(s)
    got = {r.source: r for r in
           REGISTRY["lz78_phrase_complexity"].spark(spark, SF).collect()}
    assert set(got) == set(stats)
    for src, (n_docs, chars, phrases) in stats.items():
        r = got[src]
        assert (r.n_docs, r.total_chars, r.total_phrases) == (
            n_docs, chars, phrases,
        ), src
        assert r.phrase_rate_ppm == phrases * 1_000_000 // chars
        # LZ78 bound: a parse never produces more phrases than chars,
        # and repetition strictly reduces the count
        assert r.total_phrases <= r.total_chars
    # structure-vs-vocabulary: a constant string has tiny LZ complexity
    assert _lz78_phrases("ababababababab") < _lz78_phrases("abcdefghijklmn")
