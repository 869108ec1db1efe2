"""Invariant tests for the chained-streaming/calibration/feature wave
(streaming_chained_dedup_window, isotonic_calibration_pava,
target_encoding_loo_folds, brown_double_smoothing_forecast,
class_rebalance_undersample) — independent Python references.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _md5mod(key: str, hexlen: int, mod: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:hexlen], 16) % mod


def test_chained_dedup_window_drain(spark):
    """Dedup collapses every key's two copies; append emits exactly the
    watermark-closed windows (ends 1:00 and 2:00; the 3:00 window is
    open at drain end: max event 2:28 − 10 min wm = 2:18 < 3:00)."""
    got = REGISTRY["streaming_chained_dedup_window"].spark(spark, SF).collect()
    assert [str(r.window_start) for r in got] == [
        "2024-01-01 00:00:00",
        "2024-01-01 01:00:00",
    ]
    for r in got:
        assert r.n_keys == 4 * 30  # 4 partitions x 30 deduped keys/hour
    expect = {0: 0, 1: 0}
    for p in range(4):
        for k in range(75):
            h = (2 * k) // 60
            if h <= 1:
                expect[h] += (p * 31 + 2 * k * 17) % 1000
    assert [r.total_cents for r in got] == [expect[0], expect[1]]


def test_isotonic_pava_matches_python_reference(spark):
    """Minimax iso fit on the ppm lattice == Python; fit is monotone
    nondecreasing and pools the non-monotone raw rates."""
    rows = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "value")
        .collect()
    )
    bins = defaultdict(lambda: [0, 0])
    for r in rows:
        cents = round(r.value * 100)
        noise = int(
            hashlib.md5(f"{r.event_id}:iso".encode()).hexdigest()[:6], 16
        ) % 100000
        b = min(9, max(0, (cents * 4 + noise) // 30000))
        bins[b][0] += 1
        bins[b][1] += 1 if r.value > 350 else 0
    ks = sorted(bins)
    pre_n = {k: sum(bins[j][0] for j in ks if j <= k) for k in ks}
    pre_s = {k: sum(bins[j][1] for j in ks if j <= k) for k in ks}

    def avg_ppm(j, k):
        n = pre_n[k] - pre_n[j] + bins[j][0]
        s = pre_s[k] - pre_s[j] + bins[j][1]
        return s * 1_000_000 // n

    got = {r.bin: r for r in
           REGISTRY["isotonic_calibration_pava"].spark(spark, SF).collect()}
    assert set(got) == set(ks)
    prev = -1
    for i in ks:
        iso = max(
            min(avg_ppm(j, k) for k in ks if k >= i) for j in ks if j <= i
        )
        r = got[i]
        assert r.n_events == bins[i][0]
        assert r.raw_rate_ppm == bins[i][1] * 1_000_000 // bins[i][0]
        assert r.iso_rate_ppm == iso
        assert iso >= prev  # monotone by the max-min structure
        prev = iso


def test_target_encoding_matches_python_reference(spark):
    """LOO and m-smoothed encodings; no cell sees its own fold."""
    rows = load_table(spark, SF, "events").select(
        "event_id", "event_type",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
    ).collect()
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        fold = _md5mod(f"{r.event_id}:fold", 6, 5)
        cells[(r.event_type, fold)][0] += 1
        cells[(r.event_type, fold)][1] += r.vm
    tot_n = sum(n for n, _ in cells.values())
    tot_s = sum(s for _, s in cells.values())
    prior = tot_s // tot_n
    got = {(r.event_type, r.fold): r for r in
           REGISTRY["target_encoding_loo_folds"].spark(spark, SF).collect()}
    assert set(got) == set(cells)
    for (et, fold), (n, s) in cells.items():
        cat_n = sum(v[0] for k, v in cells.items() if k[0] == et)
        cat_s = sum(v[1] for k, v in cells.items() if k[0] == et)
        r = got[(et, fold)]
        assert r.n_rows == n
        assert r.enc_loo_micro == (cat_s - s) // (cat_n - n)
        assert r.enc_smoothed_micro == (cat_s - s + 100 * prior) // (
            cat_n - n + 100
        )
        assert r.enc_full_micro == cat_s // cat_n


def test_brown_smoothing_matches_python_reference(spark):
    """Double EWMA on the milli lattice; forecast 3S'−2S' and backtest
    error per day."""
    rows = load_table(spark, SF, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    ).collect()
    daily = Counter((r.event_type, r.day) for r in rows)
    by_type = defaultdict(list)
    for (et, d), x in sorted(daily.items()):
        by_type[et].append((d, x))

    def ewma(seq):
        out = []
        for i in range(len(seq)):
            lo = max(0, i - 15)
            num = sum((1 << (15 - (i - j))) * seq[j] for j in range(lo, i + 1))
            den = sum(1 << (15 - (i - j)) for j in range(lo, i + 1))
            out.append(num // den)
        return out

    got = {(r.event_type, r.day): r for r in
           REGISTRY["brown_double_smoothing_forecast"].spark(spark, SF).collect()}
    n_checked = 0
    for et, seq in by_type.items():
        xs = [x for _, x in seq]
        s1 = ewma([1000 * x for x in xs])
        s2 = ewma(s1)
        for i in range(len(seq) - 1):  # last day has no actual_next
            d, x = seq[i]
            r = got[(et, d)]
            fc = 3 * s1[i] - 2 * s2[i]
            assert r.n_events == x
            assert r.s1_milli == s1[i]
            assert r.s2_milli == s2[i]
            assert r.forecast_next_milli == fc
            assert r.actual_next == seq[i + 1][1]
            assert r.abs_err_milli == abs(fc - 1000 * seq[i + 1][1])
            n_checked += 1
    assert n_checked == len(got)


def test_class_rebalance_matches_python_reference(spark):
    """Every class cut to exactly the minority size; kept-id fingerprint
    matches the md5-order selection."""
    rows = load_table(spark, SF, "documents").select("doc_id", "lang").collect()
    by_lang = defaultdict(list)
    for r in rows:
        key = hashlib.md5(f"{r.doc_id}:rebal".encode()).hexdigest()
        by_lang[r.lang].append((key, r.doc_id))
    n_min = min(len(v) for v in by_lang.values())
    got = {r.lang: r for r in
           REGISTRY["class_rebalance_undersample"].spark(spark, SF).collect()}
    assert set(got) == set(by_lang)
    for lang, items in by_lang.items():
        items.sort()
        kept = [d for _, d in items[:n_min]]
        r = got[lang]
        assert r.n_before == len(items)
        assert r.n_after == n_min  # exact rebalance, every class
        assert r.kept_id_sum == sum(kept)
