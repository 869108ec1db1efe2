"""Analytics & statistics catalog, part 5 — the round-5 wave.

Time-series diagnostics (Ljung-Box portmanteau, Theil's U2 vs seasonal
naive, binary-segmentation changepoint), classifier/ranker evaluation
(lift/gain deciles, MAP@k, Brier decomposition), variance-homogeneity
testing (Brown-Forsythe), and referential-integrity / IVM warehouse ops.
Same contract as every other family module: DataFrame-first Spark plans
with full DuckDB value oracles; exact integer/ppm lanes wherever the
statistic is rational (the DECIMAL(38,0) `div` / HUGEINT `//` truncating
idiom for 128-bit intermediates), so every entry value-hashes bit-stably
cross-engine. All final integer output columns are BIGINT on BOTH lanes
(the round-4 HUGEINT lesson: tests/oracle_harness.py now enforces the
canonical dtype lattice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from nyc_taxi_data_pipeline_spark.plans._base import (
    _register,
    _t,
)

__all__: list[str] = []


def _cents(col: str) -> F.Column:
    return F.expr(f"CAST(round({col} * 100) AS BIGINT)")


# Shared daily-revenue frame: purchase events rolled up to one exact
# integer (cents) per day — the same base series bollinger/durbin-watson/
# cusum use, so the diagnostics family reads one consistent hypertable.
_DAILY_SQL = """
daily AS (
  SELECT CAST(ts AS DATE) AS d,
         sum(CAST(round(value * 100) AS BIGINT)) AS x
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.sum(_cents("value")).alias("x"))
    )


# ===========================================================================
# Time-series diagnostics
# ===========================================================================

_LJUNG_BOX_ORACLE = (
    "WITH "
    + _DAILY_SQL
    + """,
tot AS (SELECT count(*) AS n, sum(x) AS s FROM daily),
dev AS (
  -- scaled deviation n*x - S  (= n * (x - mean), integer-exact)
  SELECT d, CAST(t.n * daily.x - t.s AS HUGEINT) AS e
  FROM daily, tot t
),
lagd AS (
  SELECT e,
         lag(e, 1) OVER (ORDER BY d) AS e1,
         lag(e, 2) OVER (ORDER BY d) AS e2,
         lag(e, 3) OVER (ORDER BY d) AS e3
  FROM dev
),
ag AS (
  SELECT sum(e * e)  AS den,
         sum(e * e1) AS n1,
         sum(e * e2) AS n2,
         sum(e * e3) AS n3
  FROM lagd
),
acs AS (
  SELECT k.k,
         CAST(1000 * (CASE k.k WHEN 1 THEN a.n1 WHEN 2 THEN a.n2
                               ELSE a.n3 END) // a.den AS BIGINT) AS ac_milli
  FROM ag a, (VALUES (1), (2), (3)) k(k)
)
SELECT a.k AS lag_k,
       a.ac_milli,
       CAST(t.n * (t.n + 2)
            * sum(a.ac_milli * a.ac_milli // (t.n - a.k))
              OVER (ORDER BY a.k)
            // 1000 AS BIGINT) AS q_cum_milli
FROM acs a, tot t
ORDER BY a.k
"""
)


@_register("ljung_box_portmanteau", _LJUNG_BOX_ORACLE)
def ljung_box_portmanteau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test of daily-revenue autocorrelation at lags
    1..3 — the residual-whiteness diagnostic run after any forecast fit
    (completes the ACF/PACF/Durbin-Watson family with the joint test).
    Autocorrelations are computed on integer-scaled deviations
    e_t = n*x_t - S (so no float mean enters), r_k in exact milli via one
    128-bit division, and Q_k = n(n+2) * cumsum(r_k^2 / (n-k)) on the
    3-row lag frame — every arithmetic step is the same truncating
    integer recipe on both lanes. Scale shape: one day rollup (shuffle to
    ~|days| rows), three lag windows + one aggregate on the tiny daily
    frame; the 1-row totals broadcast."""
    daily = _daily(spark, sf_dir)
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.expr("CAST(n * x - s AS DECIMAL(38,0))").alias("e"),
    )
    w = W.orderBy("d")
    lagd = dev.select(
        "n",
        "e",
        F.lag("e", 1).over(w).alias("e1"),
        F.lag("e", 2).over(w).alias("e2"),
        F.lag("e", 3).over(w).alias("e3"),
    )
    ag = lagd.groupBy("n").agg(
        F.sum(F.expr("e * e")).alias("den"),
        F.sum(F.expr("e * e1")).alias("n1"),
        F.sum(F.expr("e * e2")).alias("n2"),
        F.sum(F.expr("e * e3")).alias("n3"),
    )
    ks = spark.range(1, 4).select(F.col("id").cast("int").alias("k"))
    acs = ks.crossJoin(F.broadcast(ag)).select(
        "k",
        "n",
        F.expr(
            "CAST(1000 * (CASE k WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END)"
            " div den AS BIGINT)"
        ).alias("ac_milli"),
    )
    wk = W.orderBy("k")
    return acs.select(
        F.col("k").alias("lag_k"),
        "ac_milli",
        F.expr("n * (n + 2)").alias("_nn"),
        F.sum(F.expr("ac_milli * ac_milli div (n - k)")).over(wk).alias("_c"),
    ).select(
        "lag_k",
        "ac_milli",
        F.expr("CAST(_nn * _c div 1000 AS BIGINT)").alias("q_cum_milli"),
    ).orderBy("lag_k")


_THEIL_U2_ORACLE = (
    "WITH "
    + _DAILY_SQL
    + """,
lagd AS (
  SELECT x,
         lag(x, 1) OVER (ORDER BY d) AS x1,
         lag(x, 7) OVER (ORDER BY d) AS x7
  FROM daily
),
ev AS (SELECT * FROM lagd WHERE x7 IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_eval_days,
       CAST(1000000 * sum(CAST(x - x7 AS HUGEINT) * (x - x7))
            // sum(CAST(x - x1 AS HUGEINT) * (x - x1)) AS BIGINT)
         AS u2_sq_ppm
FROM ev
"""
)


@_register("theil_u2_seasonal", _THEIL_U2_ORACLE)
def theil_u2_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 forecast-quality ratio of the weekly seasonal-naive
    forecast (x_{t-7}) against the no-change naive (x_{t-1}) on daily
    revenue: U2^2 = sum((x_t - x_{t-7})^2) / sum((x_t - x_{t-1})^2) over
    the days where both lags exist — below 1e6 ppm means the seasonal
    model beats drift, the decision number behind 'is weekly seasonality
    real enough to model'. Squares ride 128-bit lanes; one exact division
    lands the ppm readout. Companion to mase_forecast_eval (absolute
    errors) with the squared-error / relative-to-naive view. Scale shape:
    day rollup + two lag windows on the tiny daily frame, one aggregate."""
    daily = _daily(spark, sf_dir)
    w = W.orderBy("d")
    lagd = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    ).filter(F.col("x7").isNotNull())
    return lagd.agg(
        F.count(F.lit(1)).alias("n_eval_days"),
        F.expr(
            "CAST(1000000 * sum(CAST(x - x7 AS DECIMAL(38,0)) * (x - x7))"
            " div sum(CAST(x - x1 AS DECIMAL(38,0)) * (x - x1)) AS BIGINT)"
        ).alias("u2_sq_ppm"),
    )


_BINSEG_ORACLE = (
    "WITH "
    + _DAILY_SQL
    + """,
pre AS (
  SELECT d,
         row_number() OVER (ORDER BY d) AS t,
         sum(x) OVER (ORDER BY d) AS st
  FROM daily
),
tot AS (SELECT count(*) AS n, sum(x) AS s FROM daily),
scores AS (
  SELECT p.d, p.t,
         CAST(CAST(t2.n * p.st - p.t * t2.s AS HUGEINT)
              * (t2.n * p.st - p.t * t2.s)
              // (CAST(t2.n AS HUGEINT) * p.t * (t2.n - p.t))
              AS BIGINT) AS gain_cents2,
         CAST(1000 * p.st // p.t AS BIGINT) AS mean_left_milli,
         CAST(1000 * (t2.s - p.st) // (t2.n - p.t) AS BIGINT)
           AS mean_right_milli
  FROM pre p, tot t2
  WHERE p.t < t2.n
)
SELECT d AS split_day, t AS split_pos, gain_cents2,
       mean_left_milli, mean_right_milli
FROM scores
ORDER BY gain_cents2 DESC, d
LIMIT 1
"""
)


@_register("binseg_changepoint_daily", _BINSEG_ORACLE)
def binseg_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint detection (one split) on daily
    revenue: the best split t maximizes the between-segment SSE reduction
    gain(t) = (n*S_t - t*S)^2 / (n * t * (n-t)) — the exact integer form
    of t(n-t)/n * (mean_L - mean_R)^2, derived from one prefix-cumsum
    window, no per-split rescan. Reports the argmax day with both segment
    means. The LEVEL-shift complement to pettitt_changepoint_daily's
    rank-based test and cusum's sequential screen; iterating the same
    primitive on each half is full binary segmentation. Scale shape: one
    day rollup, one cumsum window, one TakeOrdered(1) over |days| rows."""
    daily = _daily(spark, sf_dir)
    pre = daily.select(
        "d",
        F.row_number().over(W.orderBy("d")).alias("t"),
        F.sum("x").over(
            W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("st"),
    )
    tot = daily.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    scores = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("t") < F.col("n"))
        .select(
            "d",
            "t",
            F.expr(
                "CAST(CAST(n * st - t * s AS DECIMAL(38,0))"
                " * (n * st - t * s)"
                " div (CAST(n AS DECIMAL(38,0)) * t * (n - t)) AS BIGINT)"
            ).alias("gain_cents2"),
            F.expr("CAST(1000 * st div t AS BIGINT)").alias(
                "mean_left_milli"
            ),
            F.expr(
                "CAST(1000 * (s - st) div (n - t) AS BIGINT)"
            ).alias("mean_right_milli"),
        )
    )
    return (
        scores.orderBy(F.col("gain_cents2").desc(), "d")
        .limit(1)
        .select(
            F.col("d").alias("split_day"),
            F.col("t").alias("split_pos"),
            "gain_cents2",
            "mean_left_milli",
            "mean_right_milli",
        )
    )


# ===========================================================================
# Ranker / classifier evaluation
# ===========================================================================

_LIFT_GAIN_ORACLE = """
WITH scored AS (
  SELECT doc_id, n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
dec AS (
  SELECT pos, ntile(10) OVER (ORDER BY score DESC, doc_id) AS decile
  FROM scored
),
per AS (
  SELECT decile, count(*) AS n_docs,
         CAST(sum(pos) AS BIGINT) AS n_pos
  FROM dec GROUP BY decile
),
tot AS (SELECT sum(n_docs) AS n, sum(n_pos) AS p FROM per),
cum AS (
  SELECT decile, n_docs, n_pos,
         sum(n_docs) OVER (ORDER BY decile) AS cum_n,
         sum(n_pos)  OVER (ORDER BY decile) AS cum_pos
  FROM per
)
SELECT c.decile, c.n_docs, c.n_pos,
       CAST(c.cum_pos AS BIGINT) AS cum_pos,
       CAST(1000000 * c.cum_pos // t.p AS BIGINT) AS gain_ppm,
       CAST(1000 * c.cum_pos * t.n // (t.p * c.cum_n) AS BIGINT)
         AS lift_milli
FROM cum c, tot t
ORDER BY c.decile
"""


@_register("lift_gain_deciles", _LIFT_GAIN_ORACLE)
def lift_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift table — the campaign-targeting view of a
    ranker that pr_curve_points (precision/recall) and roc_curve_points
    (TPR/FPR) don't show: 'mailing the top-k deciles captures gain_ppm of
    all positives, lift_milli times better than random'. Deciles come
    from one ntile window over (score DESC, doc_id) — a total order, so
    both engines bucket identically; gains/lift are exact integer
    rationals. Scale shape: one global-order window at |docs| rows (at
    100 TB: range-partitioned rank, the length_bucket_padding recipe),
    then a 10-row frame."""
    scored = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    dec = scored.select(
        "pos",
        F.ntile(10)
        .over(W.orderBy(F.col("score").desc(), "doc_id"))
        .alias("decile"),
    )
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    tot = per.agg(F.sum("n_docs").alias("n"), F.sum("n_pos").alias("p"))
    wc = W.orderBy("decile")
    cum = per.select(
        "decile",
        "n_docs",
        "n_pos",
        F.sum("n_docs").over(wc).alias("cum_n"),
        F.sum("n_pos").over(wc).alias("cum_pos"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_docs",
            "n_pos",
            F.col("cum_pos").cast("long").alias("cum_pos"),
            F.expr("CAST(1000000 * cum_pos div p AS BIGINT)").alias(
                "gain_ppm"
            ),
            F.expr(
                "CAST(1000 * cum_pos * n div (p * cum_n) AS BIGINT)"
            ).alias("lift_milli"),
        )
        .orderBy("decile")
    )


_MAP_AT_K_ORACLE = """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents
),
top20 AS (SELECT * FROM ranked WHERE rnk <= 20),
langs AS (SELECT lang, count(*) AS r_total FROM documents GROUP BY lang),
hits AS (
  SELECT l.lang, t.rnk,
         CASE WHEN t.lang = l.lang THEN 1 ELSE 0 END AS rel
  FROM langs l CROSS JOIN top20 t
),
cumhits AS (
  SELECT lang, rnk, rel,
         sum(rel) OVER (PARTITION BY lang ORDER BY rnk) AS cum_rel
  FROM hits
),
ap AS (
  SELECT c.lang,
         CAST(coalesce(sum(CASE WHEN c.rel = 1
                    THEN 1000000 * c.cum_rel // c.rnk END), 0) AS BIGINT)
           AS ap_num_ppm,
         CAST(max(c.cum_rel) AS BIGINT) AS hits_at_20
  FROM cumhits c
  GROUP BY c.lang
)
SELECT a.lang,
       CAST(l.r_total AS BIGINT) AS r_total,
       a.hits_at_20,
       CAST(a.ap_num_ppm // least(l.r_total, 20) AS BIGINT) AS ap_ppm
FROM ap a JOIN langs l ON l.lang = a.lang
ORDER BY a.lang
"""


@_register("map_at_k_retrieval", _MAP_AT_K_ORACLE)
def map_at_k_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision at k=20 per language 'query' over one global
    length ranking: AP@20 = (sum over hit positions i of P@i) / min(R, 20)
    in exact ppm (each P@i is one integer division, the sum then divides
    by the recall base) — the order-sensitive companion to
    ndcg_graded_retrieval (graded gains) and reciprocal_rank_fusion
    (first-hit only): AP integrates precision over EVERY hit. The shared
    top-20 panel is computed once and broadcast against the 5-language
    query set. Scale shape: one TakeOrdered(20) over docs, a 5x20
    broadcast cross, windows on 100 rows."""
    docs = _t(spark, sf_dir, "documents")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(W.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rnk"),
    )
    top20 = ranked.filter(F.col("rnk") <= 20).select(
        F.col("lang").alias("doc_lang"), "rnk"
    )
    langs = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("r_total"))
    hits = langs.crossJoin(F.broadcast(top20)).select(
        "lang",
        "r_total",
        "rnk",
        F.when(F.col("doc_lang") == F.col("lang"), 1).otherwise(0).alias(
            "rel"
        ),
    )
    wl = W.partitionBy("lang").orderBy("rnk")
    cumhits = hits.select(
        "lang", "r_total", "rnk", "rel", F.sum("rel").over(wl).alias("cum_rel")
    )
    return (
        cumhits.groupBy("lang", "r_total")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("rel") == 1,
                        F.expr("1000000 * cum_rel div rnk"),
                    )
                ),
                F.lit(0),
            ).alias("ap_num_ppm"),
            F.max("cum_rel").cast("long").alias("hits_at_20"),
        )
        .select(
            "lang",
            F.col("r_total").cast("long").alias("r_total"),
            "hits_at_20",
            F.expr(
                "CAST(ap_num_ppm div least(r_total, 20) AS BIGINT)"
            ).alias("ap_ppm"),
        )
        .orderBy("lang")
    )


_BRIER_ORACLE = """
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
  FROM documents
),
bins AS (
  SELECT decile,
         CAST((11 - decile) * 100000 AS BIGINT) AS p_ppm,
         count(*) AS n_b,
         sum(y) AS pos_b
  FROM scored GROUP BY decile
),
tot AS (
  SELECT sum(n_b) AS n, sum(pos_b) AS p,
         CAST(1000000 * sum(pos_b) // sum(n_b) AS BIGINT) AS obar_ppm
  FROM bins
),
terms AS (
  SELECT b.n_b, b.pos_b, b.p_ppm,
         CAST(1000000 * b.pos_b // b.n_b AS BIGINT) AS o_ppm
  FROM bins b
)
SELECT CAST(t.n AS BIGINT) AS n_docs,
       t.obar_ppm,
       CAST(sum(x.n_b * ((x.p_ppm - x.o_ppm) * (x.p_ppm - x.o_ppm)
                         // 1000000)) // t.n AS BIGINT) AS reliability_ppm,
       CAST(sum(x.n_b * ((x.o_ppm - t.obar_ppm) * (x.o_ppm - t.obar_ppm)
                         // 1000000)) // t.n AS BIGINT) AS resolution_ppm,
       CAST(t.obar_ppm * (1000000 - t.obar_ppm) // 1000000 AS BIGINT)
         AS uncertainty_ppm,
       CAST(sum(x.n_b * (x.p_ppm * x.p_ppm // 1000000)
                - 2 * (x.p_ppm * x.pos_b // 1000)
                + 1000000 * x.pos_b) // (1000 * t.n) AS BIGINT)
         AS brier_milli_ppm
FROM terms x, tot t
GROUP BY t.n, t.obar_ppm
"""


@_register("brier_score_decomposition", _BRIER_ORACLE)
def brier_score_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score over 10 prediction bins
    (reliability - resolution + uncertainty), the diagnostic BEHIND
    calibration_reliability_bins' per-bin diagram: one number each for
    'how miscalibrated', 'how much the bins separate outcomes', and the
    outcome-base-rate floor. Bin forecasts are the decile midpoint ladder
    (11-decile)/10; every term is an exact ppm rational (squares ride the
    ppm grid with explicit //1e6 rescales, identical on both lanes), and
    the direct Brier expansion sum(n_b p^2 - 2 p pos_b + pos_b)/N rides
    along in milli-ppm as the identity check. Scale shape: one ntile
    window, a 10-row frame, 1-row totals broadcast."""
    scored = _t(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.ntile(10)
        .over(W.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("decile"),
    )
    bins = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_b"), F.sum("y").alias("pos_b")
    ).select(
        "decile",
        F.expr("CAST((11 - decile) * 100000 AS BIGINT)").alias("p_ppm"),
        "n_b",
        "pos_b",
    )
    tot = bins.agg(
        F.sum("n_b").alias("n"),
        F.sum("pos_b").alias("p"),
        F.expr(
            "CAST(1000000 * sum(pos_b) div sum(n_b) AS BIGINT)"
        ).alias("obar_ppm"),
    )
    terms = bins.select(
        "n_b",
        "pos_b",
        "p_ppm",
        F.expr("CAST(1000000 * pos_b div n_b AS BIGINT)").alias("o_ppm"),
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .groupBy("n", "obar_ppm")
        .agg(
            F.expr(
                "CAST(sum(n_b * ((p_ppm - o_ppm) * (p_ppm - o_ppm)"
                " div 1000000)) div n AS BIGINT)"
            ).alias("reliability_ppm"),
            F.expr(
                "CAST(sum(n_b * ((o_ppm - obar_ppm) * (o_ppm - obar_ppm)"
                " div 1000000)) div n AS BIGINT)"
            ).alias("resolution_ppm"),
            F.expr(
                "CAST(max(obar_ppm) * (1000000 - max(obar_ppm))"
                " div 1000000 AS BIGINT)"
            ).alias("uncertainty_ppm"),
            F.expr(
                "CAST(sum(n_b * (p_ppm * p_ppm div 1000000)"
                " - 2 * (p_ppm * pos_b div 1000)"
                " + 1000000 * pos_b) div (1000 * n) AS BIGINT)"
            ).alias("brier_milli_ppm"),
        )
        .select(
            F.col("n").cast("long").alias("n_docs"),
            "obar_ppm",
            "reliability_ppm",
            "resolution_ppm",
            "uncertainty_ppm",
            "brier_milli_ppm",
        )
    )
