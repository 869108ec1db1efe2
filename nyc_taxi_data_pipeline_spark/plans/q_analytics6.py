"""Analytics & statistics catalog, part 6 — round-5 continuation waves.

Fundamental parametric tests the catalog's nonparametric tier was built
around but never included directly (Welch's t, one-way ANOVA F),
stratified pooled effects (Mantel-Haenszel), empirical-Bayes shrinkage
(James-Stein), exact-integer kernel density estimation, and a weekly
periodogram from literal trig tables. Same contract as every family
module: DataFrame-first Spark plans with full DuckDB value oracles;
rational statistics ride exact integer lanes (DECIMAL(38,0) `div` /
HUGEINT `//` truncating idiom) so every entry value-hashes bit-stably
cross-engine, and all integer output columns are BIGINT on both lanes.
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


# Shared daily-revenue frame (same base series the diagnostics family in
# q_analytics5 reads, so frequency-domain and time-domain views agree).
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
# Parametric location tests: Welch's t and one-way ANOVA
# ===========================================================================

_WELCH_ORACLE = """
WITH s AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'view')
),
g AS (
  SELECT grp,
         count(*)                      AS n,
         CAST(sum(v) AS BIGINT)        AS sv,
         CAST(sum(v * v) AS BIGINT)    AS qv
  FROM s GROUP BY grp
),
w AS (
  SELECT
    max(CASE WHEN grp = 1 THEN n  END) AS na,
    max(CASE WHEN grp = 1 THEN sv END) AS sa,
    max(CASE WHEN grp = 1 THEN qv END) AS qa,
    max(CASE WHEN grp = 0 THEN n  END) AS nb,
    max(CASE WHEN grp = 0 THEN sv END) AS sb,
    max(CASE WHEN grp = 0 THEN qv END) AS qb
  FROM g
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(1000 * sa // na AS BIGINT) AS mean_a_milli,
       CAST(1000 * sb // nb AS BIGINT) AS mean_b_milli,
       CAST(1000 * (sa * nb - sb * na) // (na * nb) AS BIGINT)
         AS mean_diff_milli,
       CAST(
         (1000 * CAST(sa * nb - sb * na AS HUGEINT) * (sa * nb - sb * na))
         //
         (CAST(nb AS HUGEINT) * nb
           * ((CAST(na AS HUGEINT) * qa - CAST(sa AS HUGEINT) * sa)
              // (na - 1))
          + CAST(na AS HUGEINT) * na
           * ((CAST(nb AS HUGEINT) * qb - CAST(sb AS HUGEINT) * sb)
              // (nb - 1)))
         AS BIGINT) AS t2_milli
FROM w
"""


@_register("welch_t_test", _WELCH_ORACLE)
def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t test (click vs view event
    values), reported as t^2 so the statistic stays rational: with
    S=sum(v), Q=sum(v^2) per group and nv_g = (n_g*Q_g - S_g^2)/(n_g-1)
    (= n_g^2 * sample variance, reduced FIRST so it stays int64),
      t^2 = (Sa*nb - Sb*na)^2 / (nb^2 * nv_a + na^2 * nv_b)
    — one 128-bit truncating division, no square root, no float
    intermediate. This is the PARAMETRIC member the catalog's location
    tests were built around (rank_sum_auc is the rank version,
    permutation_test_mean_diff the resampling version, cohens_d the
    effect size) but never included directly; t^2 ~ F(1, df) reads on
    the same alarm ladder as anova_oneway_f. Scale shape: one hash
    aggregate to 2 rows (map-side partials carry n/S/Q), constant work
    after — the canonical 100 TB test query."""
    s = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("grp"),
            _cents("value").alias("v"),
        )
    )
    g = s.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.expr("v * v")).alias("qv"),
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == 1, F.col("sv"))).alias("sa"),
        F.max(F.when(F.col("grp") == 1, F.col("qv"))).alias("qa"),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == 0, F.col("sv"))).alias("sb"),
        F.max(F.when(F.col("grp") == 0, F.col("qv"))).alias("qb"),
    )
    return w.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.expr("CAST(1000 * sa div na AS BIGINT)").alias("mean_a_milli"),
        F.expr("CAST(1000 * sb div nb AS BIGINT)").alias("mean_b_milli"),
        F.expr(
            "CAST(1000 * (sa * nb - sb * na) div (na * nb) AS BIGINT)"
        ).alias("mean_diff_milli"),
        # Spark `div` always lands in BIGINT (and WRAPS past int64 — the
        # round-4 chebyshev lesson), so the per-group variance numerators
        # are reduced by (n-1) FIRST (n^2*var ~ 1e13, int64-safe) and the
        # single 128-bit division is the final one.
        F.expr(
            "CAST("
            " (1000 * CAST(sa * nb - sb * na AS DECIMAL(38,0))"
            "  * (sa * nb - sb * na))"
            " div"
            " (CAST(nb AS DECIMAL(38,0)) * nb"
            "   * ((CAST(na AS DECIMAL(38,0)) * qa"
            "       - CAST(sa AS DECIMAL(38,0)) * sa) div (na - 1))"
            "  + CAST(na AS DECIMAL(38,0)) * na"
            "   * ((CAST(nb AS DECIMAL(38,0)) * qb"
            "       - CAST(sb AS DECIMAL(38,0)) * sb) div (nb - 1)))"
            " AS BIGINT)"
        ).alias("t2_milli"),
    )


_ANOVA_ORACLE = """
WITH s AS (
  SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
g AS (
  SELECT grp,
         count(*)                   AS n_g,
         CAST(sum(v) AS BIGINT)     AS sv,
         CAST(sum(v * v) AS BIGINT) AS qv
  FROM s GROUP BY grp
),
tot AS (
  SELECT count(*)                         AS k,
         CAST(sum(n_g) AS BIGINT)         AS n,
         CAST(sum(sv) AS BIGINT)          AS stot,
         CAST(sum(qv) AS BIGINT)          AS q,
         CAST(sum(CAST(sv AS HUGEINT) * sv // n_g) AS HUGEINT) AS between_raw
  FROM g
)
SELECT CAST(k AS BIGINT) AS k_groups,
       n AS n_total,
       CAST(between_raw - CAST(stot AS HUGEINT) * stot // n AS BIGINT)
         AS ssb,
       CAST(q - between_raw AS BIGINT) AS ssw,
       CAST(1000 * (between_raw - CAST(stot AS HUGEINT) * stot // n)
            * (n - k) // ((q - between_raw) * (k - 1)) AS BIGINT)
         AS f_milli,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(n - k AS BIGINT) AS df2
FROM tot
"""


@_register("anova_oneway_f", _ANOVA_ORACLE)
def anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic across the five event types: the
    between/within variance decomposition SSB = sum_g(Sg^2/ng) - S^2/n,
    SSW = Q - sum_g(Sg^2/ng), F = (SSB/(k-1))/(SSW/(n-k)) — the
    parametric k-group omnibus the catalog's kruskal_wallis (rank) and
    mood_median (median) tests approximate from below. Per-group Sg^2/ng
    terms use the truncating 128-bit `div` recipe identically on both
    lanes, so the sums-of-squares value-check as exact integers (the
    sub-cent truncation bias is identical cross-engine and ~1e-15 of the
    statistic). Scale shape: one hash aggregate to k rows with mergeable
    (n, S, Q) partials, constant work after — the textbook map-side
    combine query."""
    s = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"), _cents("value").alias("v")
    )
    g = s.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("v").alias("sv"),
        F.sum(F.expr("v * v")).alias("qv"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("sv").alias("stot"),
        F.sum("qv").alias("q"),
        F.sum(
            F.expr("CAST(sv AS DECIMAL(38,0)) * sv div n_g")
        ).alias("between_raw"),
    )
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n").cast("long").alias("n_total"),
        F.expr(
            "CAST(between_raw - CAST(stot AS DECIMAL(38,0)) * stot div n"
            " AS BIGINT)"
        ).alias("ssb"),
        F.expr("CAST(q - between_raw AS BIGINT)").alias("ssw"),
        F.expr(
            "CAST(1000 * CAST(between_raw"
            "  - CAST(stot AS DECIMAL(38,0)) * stot div n AS DECIMAL(38,0))"
            " * (n - k) div (CAST(q - between_raw AS DECIMAL(38,0)) * (k - 1))"
            " AS BIGINT)"
        ).alias("f_milli"),
        F.expr("CAST(k - 1 AS BIGINT)").alias("df1"),
        F.expr("CAST(n - k AS BIGINT)").alias("df2"),
    )


# ===========================================================================
# Stratified pooled effect: Mantel-Haenszel
# ===========================================================================

_MH_ORACLE = """
WITH s AS (
  SELECT n.n_name AS stratum,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS e,
         CASE WHEN o.o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
cells AS (
  SELECT stratum,
         sum(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END) AS b,
         sum(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END) AS d,
         count(*) AS nst
  FROM s GROUP BY stratum
),
pooled AS (
  SELECT count(*) AS n_strata,
         CAST(sum(1000000 * a * d // nst) AS BIGINT) AS r_scaled,
         CAST(sum(1000000 * b * c // nst) AS BIGINT) AS s_scaled
  FROM cells
)
SELECT CAST(n_strata AS BIGINT) AS n_strata,
       r_scaled,
       s_scaled,
       CAST(1000 * r_scaled // s_scaled AS BIGINT) AS or_mh_milli
FROM pooled
"""


@_register("mantel_haenszel_pooled_or", _MH_ORACLE)
def mantel_haenszel_pooled_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio across 25 nation strata
    (exposure: BUILDING market segment; outcome: 1-URGENT priority):
    OR_MH = sum_s(a_s d_s / n_s) / sum_s(b_s c_s / n_s) — the
    confounder-adjusted pooled effect that odds_ratio_by_nation reports
    per-stratum and simpson_paradox_audit diagnoses; MH is what you
    publish AFTER the Simpson check says the strata agree. Per-stratum
    terms ride a ppm-scaled truncating division (identical recipe both
    lanes) so the pooled ratio is one exact integer division. Scale
    shape: two broadcast dim joins onto the fact, one rollup to 25
    strata, constant pooling — at 100 TB the 2x2 cells are mergeable
    partials per stratum."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    s = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("stratum"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias(
                "e"
            ),
            F.when(F.col("o_orderpriority").startswith("1"), 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    cells = s.groupBy("stratum").agg(
        F.sum(F.expr("CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END")).alias("a"),
        F.sum(F.expr("CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END")).alias("b"),
        F.sum(F.expr("CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END")).alias("c"),
        F.sum(F.expr("CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END")).alias("d"),
        F.count(F.lit(1)).alias("nst"),
    )
    pooled = cells.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.expr("1000000 * a * d div nst")).alias("r_scaled"),
        F.sum(F.expr("1000000 * b * c div nst")).alias("s_scaled"),
    )
    return pooled.select(
        F.col("n_strata").cast("long").alias("n_strata"),
        F.col("r_scaled").cast("long").alias("r_scaled"),
        F.col("s_scaled").cast("long").alias("s_scaled"),
        F.expr("CAST(1000 * r_scaled div s_scaled AS BIGINT)").alias(
            "or_mh_milli"
        ),
    )


# ===========================================================================
# Empirical Bayes: James-Stein shrinkage of group means
# ===========================================================================

_JS_ORACLE = """
WITH x AS (
  SELECT n.n_name,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS v
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
),
g AS (
  SELECT n_name,
         count(*)                   AS n_g,
         CAST(sum(v) AS BIGINT)     AS sv,
         CAST(sum(v * v) AS BIGINT) AS qv
  FROM x GROUP BY n_name
),
m AS (
  SELECT n_name, n_g, sv, qv, sv // n_g AS mean_c FROM g
),
tot AS (
  SELECT count(*) AS k,
         CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(sv) AS BIGINT) // CAST(sum(n_g) AS BIGINT) AS grand_c,
         CAST(sum(qv - CAST(sv AS HUGEINT) * sv // n_g) AS BIGINT) AS ssw
  FROM m
),
f AS (
  SELECT t.k, t.n, t.grand_c,
         (t.ssw // (t.n - t.k)) // (t.n // t.k) AS vbar,
         CAST(sum(CAST(m.mean_c - t.grand_c AS HUGEINT)
                  * (m.mean_c - t.grand_c)) AS BIGINT) AS ssdev
  FROM m, tot t
  GROUP BY t.k, t.n, t.grand_c, t.ssw
),
fac AS (
  SELECT k, n, grand_c, ssdev,
         greatest(0, 1000000 - 1000000 * (k - 3) * vbar // ssdev)
           AS factor_ppm
  FROM f
)
SELECT m.n_name,
       CAST(m.n_g AS BIGINT) AS n_g,
       CAST(m.mean_c AS BIGINT) AS mean_cents,
       CAST(fac.grand_c + factor_ppm * (m.mean_c - fac.grand_c) // 1000000
            AS BIGINT) AS shrunk_cents,
       CAST(factor_ppm AS BIGINT) AS factor_ppm
FROM m, fac
ORDER BY m.n_name
"""


@_register("james_stein_shrinkage", _JS_ORACLE)
def james_stein_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """James-Stein empirical-Bayes shrinkage of the 25 per-nation mean
    account balances toward the grand mean: factor = max(0, 1 -
    (k-3)*vbar / sum_i (m_i - m)^2) with vbar the pooled within-group
    variance of a group mean — the estimator that DOMINATES the raw
    group means in total squared error for k >= 4 (Stein's paradox) and
    the closed-form ancestor of every hierarchical-model partial pool.
    All lanes are truncating integer divisions on cent-scaled sums,
    identical cross-engine, so the shrunk means value-check exactly.
    Scale shape: one rollup to k rows carrying (n, S, Q) partials, a
    broadcast of the 1-row pooled stats back onto the k-row frame —
    group count k is the only data-independent dimension."""
    x = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", _cents("c_acctbal").alias("v"))
    )
    g = x.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("v").alias("sv"),
        F.sum(F.expr("v * v")).alias("qv"),
    )
    m = g.select(
        "n_name", "n_g", "sv", "qv", F.expr("sv div n_g").alias("mean_c")
    ).localCheckpoint(eager=False)
    tot = m.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.expr("sum(sv) div sum(n_g)").alias("grand_c"),
        F.sum(
            F.expr("qv - CAST(sv AS DECIMAL(38,0)) * sv div n_g")
        ).alias("ssw"),
    )
    f = (
        m.crossJoin(F.broadcast(tot))
        .groupBy("k", "n", "grand_c", "ssw")
        .agg(
            F.sum(
                F.expr(
                    "CAST(mean_c - grand_c AS DECIMAL(38,0))"
                    " * (mean_c - grand_c)"
                )
            ).alias("ssdev")
        )
        .select(
            "k",
            "n",
            "grand_c",
            "ssdev",
            F.expr(
                "greatest(CAST(0 AS BIGINT), 1000000"
                " - 1000000 * (k - 3) * ((ssw div (n - k)) div (n div k))"
                "   div ssdev)"
            ).alias("factor_ppm"),
        )
    )
    return (
        m.crossJoin(F.broadcast(f))
        .select(
            "n_name",
            F.col("n_g").cast("long").alias("n_g"),
            F.col("mean_c").cast("long").alias("mean_cents"),
            F.expr(
                "CAST(grand_c + factor_ppm * (mean_c - grand_c) div 1000000"
                " AS BIGINT)"
            ).alias("shrunk_cents"),
            F.col("factor_ppm").cast("long").alias("factor_ppm"),
        )
        .orderBy("n_name")
    )


# ===========================================================================
# Exact-integer kernel density estimation
# ===========================================================================

_KDE_ORACLE = """
WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
),
grid AS (SELECT 2500 * unnest(range(0, 21)) AS g),
n AS (SELECT count(*) AS n FROM v)
SELECT CAST(grid.g AS BIGINT) AS g_cents,
       CAST(n.n AS BIGINT) AS n_obs,
       CAST(sum(greatest(0, 2500 - abs(v.v - grid.g))) AS BIGINT)
         AS kde_raw,
       CAST(1000000000 * CAST(sum(greatest(0, 2500 - abs(v.v - grid.g)))
            AS HUGEINT) // (n.n * 2500 * 2500) AS BIGINT) AS density_ppb
FROM grid CROSS JOIN v CROSS JOIN n
GROUP BY grid.g, n.n
ORDER BY g_cents
"""


@_register("kde_triangular_grid", _KDE_ORACLE)
def kde_triangular_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel density estimate of purchase values on a fixed 21-point
    grid (0..50000 cents, step 2500) with a triangular kernel of
    bandwidth h=2500: K contributions are max(0, h - |v - g|) — an
    INTEGER, so the whole density curve value-checks exactly
    (density_ppb = 1e9 * sum(K) / (n h^2), the kernel's mass being h^2).
    The smooth-density companion to histogram_equiwidth's binned view
    and distribution_drift_psi's binned comparisons: KDE reads modes
    and tails a coarse histogram quantizes away, and the triangular
    kernel is the exactness-preserving member of the kernel family
    (Gaussian would need libm). Scale shape: the 21-row grid broadcasts
    onto the scan; per-gridpoint sums are mergeable map-side partials —
    one rollup to 21 rows, never a data-sized shuffle."""
    v = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(_cents("value").alias("v"))
    )
    grid = spark.range(0, 21).select((F.col("id") * 2500).alias("g"))
    joined = v.crossJoin(F.broadcast(grid))
    agg = joined.groupBy("g").agg(
        F.sum(F.expr("greatest(0, 2500 - abs(v - g))")).alias("kde_raw"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return agg.select(
        F.col("g").cast("long").alias("g_cents"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("kde_raw").cast("long").alias("kde_raw"),
        F.expr(
            "CAST(1000000000 * CAST(kde_raw AS DECIMAL(38,0))"
            " div (n_obs * 2500 * 2500) AS BIGINT)"
        ).alias("density_ppb"),
    ).orderBy("g_cents")


# ===========================================================================
# Frequency domain: weekly periodogram from literal trig tables
# ===========================================================================

# cos/sin(2*pi*k/7) * 1e4, k = 0..6 — literal constants on BOTH lanes so
# no runtime libm call can drift cross-engine.
_COS7 = [10000, 6235, -2225, -9010, -9010, -2225, 6235]
_SIN7 = [0, 7818, 9749, 4339, -4339, -9749, -7818]

_DFT_ORACLE = (
    "WITH "
    + _DAILY_SQL
    + f""",
idx AS (
  SELECT row_number() OVER (ORDER BY d) AS t, x FROM daily
),
tot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s FROM idx),
dm AS (
  SELECT t,
         CAST(tot.n * idx.x - tot.s AS BIGINT) AS xd,
         ([{','.join(str(c) for c in _COS7)}])[(t - 1) % 7 + 1] AS c4,
         ([{','.join(str(c) for c in _SIN7)}])[(t - 1) % 7 + 1] AS s4,
         tot.n AS n
  FROM idx, tot
),
acc AS (
  SELECT max(n) AS n,
         CAST(sum(xd * c4) AS BIGINT) AS cr,
         CAST(sum(xd * s4) AS BIGINT) AS sr,
         CAST(sum(CAST(xd AS HUGEINT) * xd) AS HUGEINT) AS q
  FROM dm
)
SELECT CAST(n AS BIGINT) AS n_days,
       cr AS dft_cos_scaled,
       sr AS dft_sin_scaled,
       CAST(2000000 * (CAST(cr AS HUGEINT) * cr + CAST(sr AS HUGEINT) * sr)
            // (n * 100000000 * q) AS BIGINT) AS weekly_power_ppm
FROM acc
"""
)


@_register("dft_weekly_power", _DFT_ORACLE)
def dft_weekly_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency discrete Fourier transform of daily revenue at
    the weekly frequency (period 7): C = sum(xd_t cos(2 pi t/7)),
    S = sum(xd_t sin(.)) over the n-scaled demeaned series xd = n*x - S,
    and the normalized periodogram share weekly_power_ppm =
    2(C^2+S^2)/(n * sum xd^2) — the FREQUENCY-domain view of weekly
    seasonality beside the time-domain members (autocorrelation_lag_k
    reads lag-7 correlation, dow_seasonality_profile the day means,
    haar_wavelet_energy the dyadic scales). Trig values are 1e-4-scaled
    LITERAL tables (no runtime libm), so every lane is exact integer and
    the power share value-checks cross-engine; Cauchy-Schwarz bounds the
    share at 1e6, making overflow impossible in the 128-bit lanes.
    Scale shape: day rollup, a 1-row total broadcast back, one linear
    pass — per-series DFT at 100 TB runs inside the same two aggregates
    keyed by series."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=False)
    idx = daily.select(
        F.row_number().over(W.orderBy("d")).alias("t"), "x"
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    cos_arr = "array(" + ",".join(str(c) for c in _COS7) + ")"
    sin_arr = "array(" + ",".join(str(c) for c in _SIN7) + ")"
    dm = idx.crossJoin(F.broadcast(tot)).select(
        F.expr("CAST(n * x - s AS BIGINT)").alias("xd"),
        F.expr(f"element_at({cos_arr}, CAST((t - 1) % 7 + 1 AS INT))").alias(
            "c4"
        ),
        F.expr(f"element_at({sin_arr}, CAST((t - 1) % 7 + 1 AS INT))").alias(
            "s4"
        ),
        "n",
    )
    acc = dm.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("xd * c4")).alias("cr"),
        F.sum(F.expr("xd * s4")).alias("sr"),
        F.sum(F.expr("CAST(xd AS DECIMAL(38,0)) * xd")).alias("q"),
    )
    return acc.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("cr").cast("long").alias("dft_cos_scaled"),
        F.col("sr").cast("long").alias("dft_sin_scaled"),
        F.expr(
            "CAST(2000000 * (CAST(cr AS DECIMAL(38,0)) * cr"
            " + CAST(sr AS DECIMAL(38,0)) * sr)"
            " div (n * 100000000 * q) AS BIGINT)"
        ).alias("weekly_power_ppm"),
    )
