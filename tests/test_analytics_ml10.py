"""Invariant tests for the interval/market-data/privacy wave
(concurrency_sweepline_daily, max_drawdown_monthly_revenue,
ohlc_bars_daily, ewma_daily_event_counts, tcloseness_emd_audit) —
independent Python references replicating the exact integer arithmetic.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
from nyc_taxi_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _events(spark):
    return (
        load_table(spark, SF, "events")
        .select(
            "event_id",
            F.unix_micros("ts").alias("us"),
            "event_type",
            F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
        )
        .collect()
    )


def test_sweepline_matches_python_reference(spark):
    """Per-day concurrency integral, peak and Little's identity must
    match a brute-force Python sweep over the same clipped segments."""
    rows = _events(spark)
    segs = defaultdict(list)  # day -> [(cs, ce)]
    for r in rows:
        s, e = r.us, r.us + r.vm
        for d in range(s // DAY_US, (e - 1) // DAY_US + 1):
            segs[d].append((max(s, d * DAY_US), min(e, (d + 1) * DAY_US)))
    got = {
        r.day.toordinal() - 719163: r  # 719163 = date(1970,1,1).toordinal()
        for r in REGISTRY["concurrency_sweepline_daily"].spark(spark, SF).collect()
    }
    assert set(got) == set(segs)
    for d, ss in segs.items():
        bounds = sorted(
            [(cs, 1) for cs, _ in ss] + [(ce, -1) for _, ce in ss]
        )
        running = peak = integral = 0
        for i, (t, delta) in enumerate(bounds):
            running += delta
            peak = max(peak, running)
            if i + 1 < len(bounds):
                integral += running * (bounds[i + 1][0] - t)
        r = got[d]
        assert r.n_jobs == len(ss)
        assert r.sum_clipped_us == sum(ce - cs for cs, ce in ss)
        assert r.concurrency_integral_us == integral
        assert r.littles_identity_holds == 1  # executed, not assumed
        assert r.peak_concurrency == peak
        assert r.avg_concurrency_ppm == integral // 86400


def test_max_drawdown_matches_python_reference(spark):
    """Running-peak drawdown per nation in exact cents."""
    orders = (
        load_table(spark, SF, "orders")
        .join(load_table(spark, SF, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(load_table(spark, SF, "nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.date_trunc("month", "o_orderdate").alias("mo"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .collect()
    )
    series = defaultdict(Counter)
    for r in orders:
        series[r.n_name][r.mo] += r.cents
    got = {
        r.n_name: r
        for r in REGISTRY["max_drawdown_monthly_revenue"].spark(spark, SF).collect()
    }
    assert set(got) == set(series)
    for nk, mo_rev in series.items():
        peak = 0
        max_dd = max_ppm = 0
        for mo in sorted(mo_rev):
            rev = mo_rev[mo]
            peak = max(peak, rev)
            max_dd = max(max_dd, peak - rev)
            max_ppm = max(max_ppm, (peak - rev) * 1_000_000 // peak)
        r = got[nk]
        assert r.n_months == len(mo_rev)
        assert r.best_month_cents == max(mo_rev.values())
        assert r.max_drawdown_cents == max_dd
        assert r.max_drawdown_ppm == max_ppm
        assert 0 <= r.max_drawdown_ppm <= 1_000_000


def test_ohlc_bars_match_python_reference(spark):
    """Open/high/low/close per (day, type) with the (ts, event_id) total
    order breaking same-microsecond ties."""
    rows = _events(spark)
    bars = defaultdict(list)
    for r in rows:
        bars[(r.us // DAY_US, r.event_type)].append((r.us, r.event_id, r.vm))
    got = {
        (r.day.toordinal() - 719163, r.event_type): r
        for r in REGISTRY["ohlc_bars_daily"].spark(spark, SF).collect()
    }
    assert set(got) == set(bars)
    for key, vs in bars.items():
        vs.sort()
        r = got[key]
        assert r.n_events == len(vs)
        assert r.open_micro == vs[0][2]
        assert r.close_micro == vs[-1][2]
        assert r.high_micro == max(v for _, _, v in vs)
        assert r.low_micro == min(v for _, _, v in vs)
        assert r.total_micro == sum(v for _, _, v in vs)
        assert r.low_micro <= r.open_micro <= r.high_micro
        assert r.low_micro <= r.close_micro <= r.high_micro


def test_ewma_matches_python_reference(spark):
    """adjust=True EWMA with 2^(15-k) integer weights over a 16-day
    horizon, including the partial leading windows."""
    rows = _events(spark)
    daily = Counter((r.event_type, r.us // DAY_US) for r in rows)
    by_type = defaultdict(list)
    for (et, d), x in sorted(daily.items()):
        by_type[et].append((d, x))
    got = {
        (r.event_type, r.day.toordinal() - 719163): r
        for r in REGISTRY["ewma_daily_event_counts"].spark(spark, SF).collect()
    }
    n_checked = 0
    for et, seq in by_type.items():
        for i, (d, x) in enumerate(seq):
            lo = max(0, i - 15)
            num = sum(
                (1 << (15 - (i - j))) * seq[j][1] for j in range(lo, i + 1)
            )
            den = sum(1 << (15 - (i - j)) for j in range(lo, i + 1))
            r = got[(et, d)]
            assert r.n_events == x
            assert r.ewma_milli == 1000 * num // den
            n_checked += 1
    assert n_checked == len(got)


def test_tcloseness_matches_python_reference(spark):
    """Ordinal EMD per QI class as exact rationals on n_g*N; flags only
    above t=0.15; a class distributed like the population scores 0."""
    cust = load_table(spark, SF, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "least(9, greatest(0, (CAST(round(c_acctbal * 100) AS BIGINT)"
            " + 100000) div 120000))"
        ).alias("bin"),
    ).collect()
    by_grp = defaultdict(Counter)
    glob = Counter()
    for r in cust:
        by_grp[(r.c_nationkey, r.c_mktsegment)][r.bin] += 1
        glob[r.bin] += 1
    n_total = sum(glob.values())
    gcum = [sum(glob[j] for j in range(i + 1)) for i in range(10)]
    got = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in REGISTRY["tcloseness_emd_audit"].spark(spark, SF).collect()
    }
    assert set(got) == set(by_grp)
    for key, cnts in by_grp.items():
        n_g = sum(cnts.values())
        acc = 0
        cum = 0
        for i in range(9):
            cum += cnts[i]
            acc += abs(cum * n_total - gcum[i] * n_g)
        t_ppm = 1_000_000 * acc // (9 * n_g * n_total)
        r = got[key]
        assert r.k_size == n_g
        assert r.t_emd_ppm == t_ppm
        assert r.tcloseness_violation == (1 if t_ppm > 150_000 else 0)
        assert 0 <= r.t_emd_ppm <= 1_000_000
