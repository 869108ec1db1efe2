"""Analytics & statistics catalog, part 4 — the round-4 wave.

Causal inference (IPW / RDD / IV-Wald), nonparametric k-sample tests
(Cramér-von Mises, Kruskal-Wallis, Cochran's Q, Jonckheere-Terpstra),
financial/time-series screens (Sharpe, Bollinger, Hampel, SAX motifs,
empirical tail dependence). Same contract as every other family module:
DataFrame-first Spark plans with full DuckDB value oracles; exact
integer/ppm lanes wherever a statistic is rational, IEEE-rounded sqrt +
round(..., 6) where a square root is inherent.

Exact-division convention (new in this wave, simpler than the seeded
double trick used by earlier entries): Spark's `div` on DECIMAL(38,0)
operands and DuckDB's `//` on HUGEINT both TRUNCATE toward zero with
128-bit intermediates, verified bit-equal including negatives — so
`num div den` / `num // den` is the whole idiom.
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


# ===========================================================================
# Nonparametric two-/k-sample tests
# ===========================================================================

_CVM_ORACLE = """
WITH s AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('click', 'view')
),
g AS (
  SELECT v, sum(is_a) AS ca, sum(1 - is_a) AS cb
  FROM s GROUP BY v
),
tot AS (SELECT sum(ca) AS n, sum(cb) AS m FROM g),
c AS (
  SELECT v, ca, cb,
         sum(ca) OVER (ORDER BY v) AS c1,
         sum(cb) OVER (ORDER BY v) AS c2
  FROM g
),
terms AS (
  SELECT CAST(c.ca + c.cb AS HUGEINT) *
         (c.c1 * t.m - c.c2 * t.n) * (c.c1 * t.m - c.c2 * t.n) AS term,
         abs(c.c1 * t.m - c.c2 * t.n) AS absd
  FROM c, tot t
)
SELECT t.n AS n_a, t.m AS n_b,
       CAST((SELECT max(absd) FROM terms) AS BIGINT) AS max_abs_d,
       CAST((SELECT sum(term) FROM terms) * 1000000
            // (CAST(t.n AS HUGEINT) * t.m * (t.n + t.m) * (t.n + t.m))
            AS BIGINT) AS cvm_t_ppm
FROM tot t
"""


@_register("cramer_von_mises_integer", _CVM_ORACLE)
def cramer_von_mises_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic comparing the value
    distributions of 'click' vs 'view' events, on a fully integer lane:
    at each distinct cent value, D = c1*m - c2*n is the (n*m)-scaled ECDF
    gap, and T = sum(t_v * D^2) / (n*m*(n+m)^2) — reported in exact ppm
    via 128-bit truncating division. CvM integrates the SQUARED gap over
    the whole support (vs KS's single supremum in ks_test_two_sample), so
    it sees distributional differences a max-statistic misses. Scale
    shape: one hash agg on distinct cent values (bounded by the value
    DOMAIN, 49k cells, not the corpus), one window cumsum over that
    bounded frame, one final agg."""
    ev = _t(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "view")).select(
        _cents("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
    )
    g = s.groupBy("v").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = g.select(
        "ca", "cb", F.sum("ca").over(w).alias("c1"), F.sum("cb").over(w).alias("c2")
    )
    c = c.localCheckpoint(eager=False)
    tot = c.agg(F.max("c1").alias("n"), F.max("c2").alias("m"))
    terms = c.crossJoin(F.broadcast(tot)).select(
        "n",
        "m",
        (F.col("ca") + F.col("cb")).alias("t"),
        (F.col("c1") * F.col("m") - F.col("c2") * F.col("n")).alias("d"),
    )
    return (
        terms.groupBy("n", "m")
        .agg(
            F.max(F.abs(F.col("d"))).cast("long").alias("max_abs_d"),
            F.sum(
                F.col("t").cast("decimal(38,0)") * F.col("d") * F.col("d")
            ).alias("raw"),
        )
        .select(
            F.col("n").alias("n_a"),
            F.col("m").alias("n_b"),
            "max_abs_d",
            F.expr(
                "CAST((raw * 1000000) div (CAST(n AS DECIMAL(38,0)) * m"
                " * (n + m) * (n + m)) AS BIGINT)"
            ).alias("cvm_t_ppm"),
        )
    )


_KW_ORACLE = """
WITH s AS (
  SELECT o_orderpriority AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
dv AS (
  SELECT v, count(*) AS t FROM s GROUP BY v
),
rk AS (
  SELECT v, t,
         2 * (sum(t) OVER (ORDER BY v) - t) + t + 1 AS r2
  FROM dv
),
per_val AS (
  SELECT s.grp, s.v, count(*) AS cnt FROM s GROUP BY 1, 2
),
grp_stats AS (
  SELECT p.grp, sum(p.cnt) AS n_i,
         sum(CAST(p.cnt AS HUGEINT) * r.r2) AS r2_sum
  FROM per_val p JOIN rk r ON r.v = p.v
  GROUP BY p.grp
),
gl AS (
  SELECT sum(n_i) AS n,
         (SELECT sum(CAST(t AS HUGEINT) * t * t - t) FROM dv) AS t3
  FROM grp_stats
),
h AS (
  SELECT sum(3000 * r2_sum * r2_sum
             // (CAST(g.n AS HUGEINT) * (g.n + 1) * gs.n_i))
         - 3000 * (g.n + 1) AS h_milli,
         g.n, g.t3
  FROM grp_stats gs, gl g
  GROUP BY g.n, g.t3
)
SELECT gs.grp, gs.n_i,
       CAST(gs.r2_sum AS BIGINT) AS r2_sum,
       CAST(1000 * gs.r2_sum // (2 * CAST(gs.n_i AS HUGEINT)) AS BIGINT)
         AS mean_rank_milli,
       CAST(h.h_milli AS BIGINT) AS h_milli,
       CAST(h.h_milli * (CAST(h.n AS HUGEINT) * h.n * h.n - h.n)
            // (CAST(h.n AS HUGEINT) * h.n * h.n - h.n - h.t3)
            AS BIGINT) AS h_adj_milli
FROM grp_stats gs, h
ORDER BY gs.grp
"""


@_register("kruskal_wallis_by_priority", _KW_ORACLE)
def kruskal_wallis_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test of o_totalprice across the 5 order
    priorities, on DOUBLED-midrank integer lanes (r2 = 2*c_less + t + 1
    is always integral, so tied cent values never leave exact
    arithmetic): H = 3*sum(R2_i^2/(N(N+1)n_i)) - 3(N+1), reported in
    milli with per-group truncating division (identical flooring on both
    engines — the oracle IS the same floor sequence), plus the tie
    correction H/C with C = 1 - sum(t^3-t)/(N^3-N) applied as a second
    exact integer division. The k-sample generalization of
    rank_sum_auc_by_event_type. Scale shape: rank table is one agg over
    distinct cent values + one window cumsum on that bounded frame; group
    stats are one join + agg; the H combine runs on 5 rows."""
    s = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), _cents("o_totalprice").alias("v")
    )
    dv = s.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    rk = dv.select(
        "v", "t", (2 * (F.sum("t").over(w) - F.col("t")) + F.col("t") + 1).alias("r2")
    )
    per_val = s.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("cnt"))
    gs = (
        per_val.join(rk, "v")
        .groupBy("grp")
        .agg(
            F.sum("cnt").alias("n_i"),
            F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("r2")).alias("r2_sum"),
        )
        .localCheckpoint(eager=False)
    )
    t3 = dv.agg(
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t") - F.col("t")
        ).alias("t3")
    )
    # compute N first, then the per-group floored terms against the
    # broadcast 1-row globals frame
    glob = gs.agg(F.sum("n_i").cast("decimal(38,0)").alias("n")).crossJoin(
        F.broadcast(t3)
    )
    terms = gs.crossJoin(F.broadcast(glob)).select(
        "grp",
        "n_i",
        "r2_sum",
        "n",
        "t3",
        F.expr(
            "(3000 * r2_sum * r2_sum) div (n * (n + 1) * n_i)"
        ).alias("term"),
    )
    hrow = terms.groupBy("n", "t3").agg(
        (F.sum("term") - 3000 * (F.col("n") + 1)).alias("h_milli")
    )
    return (
        gs.crossJoin(F.broadcast(hrow))
        .select(
            "grp",
            "n_i",
            F.col("r2_sum").cast("long").alias("r2_sum"),
            F.expr(
                "CAST((1000 * r2_sum) div (2 * CAST(n_i AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("mean_rank_milli"),
            F.col("h_milli").cast("long").alias("h_milli"),
            F.expr(
                "CAST((h_milli * (n * n * n - n)) div (n * n * n - n - t3)"
                " AS BIGINT)"
            ).alias("h_adj_milli"),
        )
        .orderBy("grp")
    )


_COCHRAN_ORACLE = """
WITH blocks AS (
  SELECT user_id, (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS wk,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error
  FROM events
  GROUP BY 1, 2
),
x AS (
  SELECT user_id, wk,
         CASE WHEN 3 * n_click >= n_click + n_view + n_error
              THEN 1 ELSE 0 END AS x1,
         CASE WHEN 3 * n_view  >= n_click + n_view + n_error
              THEN 1 ELSE 0 END AS x2,
         CASE WHEN 3 * n_error >= n_click + n_view + n_error
              THEN 1 ELSE 0 END AS x3
  FROM blocks
),
agg AS (
  SELECT count(*) AS n_blocks,
         sum(x1) AS c1, sum(x2) AS c2, sum(x3) AS c3,
         sum(x1 + x2 + x3) AS s,
         sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS r2
  FROM x
),
q AS (
  SELECT n_blocks, c1, c2, c3, s,
         CAST(1000 * 2 * ((3 * CAST(c1 AS HUGEINT) - s) * (3 * c1 - s)
                        + (3 * CAST(c2 AS HUGEINT) - s) * (3 * c2 - s)
                        + (3 * CAST(c3 AS HUGEINT) - s) * (3 * c3 - s))
              // (3 * (3 * CAST(s AS HUGEINT) - r2)) AS BIGINT) AS q_milli
  FROM agg
)
SELECT t.cond,
       CASE t.i WHEN 1 THEN q.c1 WHEN 2 THEN q.c2 ELSE q.c3 END AS c_j,
       q.n_blocks, q.q_milli, CAST(2 AS BIGINT) AS df
FROM q, (VALUES ('click', 1), ('view', 2), ('error', 3)) AS t(cond, i)
ORDER BY t.cond
"""


@_register("cochran_q_test", _COCHRAN_ORACLE)
def cochran_q_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test for k=3 matched binary treatments: blocks are
    (user, week) cells, the binary response is 'type k ran at or above
    the block's own cross-type mean' (3*n_k >= total — integer-exact and
    non-degenerate at EVERY scale factor, where a fixed absolute
    threshold saturates to all-ones as volume grows). Q = (k-1) *
    sum_j (k*C_j - S)^2 / (k * (k*S - sum_b R_b^2)) is rational in pure
    block/column totals, so the milli report is one exact 128-bit
    division — the within-subjects complement to
    chisq_independence_screen (which assumes independent rows) and
    mcnemar_paired_conversion (its k=2 special case). Scale shape: one
    hash agg to blocks, one 1-row total agg; the per-condition expansion
    is a 3-row literal frame."""
    ev = _t(spark, sf_dir, "events")
    blocks = (
        ev.groupBy(
            "user_id",
            F.expr(
                "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7"
                " AS BIGINT)"
            ).alias("wk"),
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("nc"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nv"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("ne"),
        )
        .select(
            F.when(3 * F.col("nc") >= F.col("nc") + F.col("nv") + F.col("ne"), 1)
            .otherwise(0)
            .alias("x1"),
            F.when(3 * F.col("nv") >= F.col("nc") + F.col("nv") + F.col("ne"), 1)
            .otherwise(0)
            .alias("x2"),
            F.when(3 * F.col("ne") >= F.col("nc") + F.col("nv") + F.col("ne"), 1)
            .otherwise(0)
            .alias("x3"),
        )
    )
    r = F.col("x1") + F.col("x2") + F.col("x3")
    agg = blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("x1").alias("c1"),
        F.sum("x2").alias("c2"),
        F.sum("x3").alias("c3"),
        F.sum(r).alias("s"),
        F.sum(r * r).alias("r2"),
    )
    num = (
        "((3 * CAST(c1 AS DECIMAL(38,0)) - s) * (3 * c1 - s)"
        " + (3 * CAST(c2 AS DECIMAL(38,0)) - s) * (3 * c2 - s)"
        " + (3 * CAST(c3 AS DECIMAL(38,0)) - s) * (3 * c3 - s))"
    )
    q = agg.select(
        "n_blocks",
        "c1",
        "c2",
        "c3",
        F.expr(
            f"CAST((1000 * 2 * {num}) div"
            " (3 * (3 * CAST(s AS DECIMAL(38,0)) - r2)) AS BIGINT)"
        ).alias("q_milli"),
    )
    conds = spark.createDataFrame(
        [("click", 1), ("view", 2), ("error", 3)], "cond string, i int"
    )
    return (
        q.crossJoin(F.broadcast(conds))
        .select(
            "cond",
            F.when(F.col("i") == 1, F.col("c1"))
            .when(F.col("i") == 2, F.col("c2"))
            .otherwise(F.col("c3"))
            .alias("c_j"),
            "n_blocks",
            "q_milli",
            F.lit(2).cast("long").alias("df"),
        )
        .orderBy("cond")
    )


_JT_ORACLE = """
WITH s AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
piv AS (
  SELECT v,
         sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS k1,
         sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS k2,
         sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS k3,
         sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS k4,
         sum(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS k5
  FROM s GROUP BY v
),
cum AS (
  SELECT v, k1, k2, k3, k4, k5,
         coalesce(sum(k1) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS l1,
         coalesce(sum(k2) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS l2,
         coalesce(sum(k3) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS l3,
         coalesce(sum(k4) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS l4
  FROM piv
),
j AS (
  SELECT sum(CAST(k2 AS HUGEINT) * (2 * l1 + k1)
           + CAST(k3 AS HUGEINT) * (2 * (l1 + l2) + k1 + k2)
           + CAST(k4 AS HUGEINT) * (2 * (l1 + l2 + l3) + k1 + k2 + k3)
           + CAST(k5 AS HUGEINT) * (2 * (l1 + l2 + l3 + l4)
                                    + k1 + k2 + k3 + k4)) AS j2
  FROM cum
),
n AS (
  SELECT sum(k1) AS n1, sum(k2) AS n2, sum(k3) AS n3,
         sum(k4) AS n4, sum(k5) AS n5
  FROM piv
)
SELECT CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS n_total,
       CAST(j.j2 AS BIGINT) AS j2,
       CAST(n1 * (n2 + n3 + n4 + n5) + n2 * (n3 + n4 + n5)
            + n3 * (n4 + n5) + n4 * n5 AS BIGINT) AS pairs_total,
       CAST(CASE WHEN j.j2 > n1 * (n2 + n3 + n4 + n5) + n2 * (n3 + n4 + n5)
                            + n3 * (n4 + n5) + n4 * n5 THEN 1
                 WHEN j.j2 < n1 * (n2 + n3 + n4 + n5) + n2 * (n3 + n4 + n5)
                            + n3 * (n4 + n5) + n4 * n5 THEN -1
                 ELSE 0 END AS BIGINT) AS trend_sign
FROM j, n
"""


@_register("jonckheere_terpstra_trend", _JT_ORACLE)
def jonckheere_terpstra_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test: is
    o_totalprice stochastically increasing with order priority 1->5? The
    statistic J = sum over group pairs i<j of Mann-Whitney counts is
    computed WITHOUT any pairwise join: pivot the 5 ordered groups into
    per-value count columns, one window cumsum gives each group's
    strictly-below mass, and the doubled lane j2 = 2J (ties at half
    weight stay integral) falls out of one linear pass. E[J2] equals
    pairs_total = sum_{i<j} n_i*n_j exactly. Scale shape: distinct-value
    frame (domain-bounded) + one window + one agg — the k-sample trend
    sibling of mann_kendall_theil_sen (which trends over TIME, not
    ordered groups)."""
    s = _t(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        _cents("o_totalprice").alias("v"),
    )
    piv = s.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("g") == k, 1).otherwise(0)).alias(f"k{k}")
            for k in range(1, 6)
        ]
    )
    wprev = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    cum = piv.select(
        "v",
        *[F.col(f"k{k}") for k in range(1, 6)],
        *[
            F.coalesce(F.sum(f"k{k}").over(wprev), F.lit(0)).alias(f"l{k}")
            for k in range(1, 5)
        ],
    )
    below = {
        2: "l1",
        3: "(l1 + l2)",
        4: "(l1 + l2 + l3)",
        5: "(l1 + l2 + l3 + l4)",
    }
    eq = {
        2: "k1",
        3: "(k1 + k2)",
        4: "(k1 + k2 + k3)",
        5: "(k1 + k2 + k3 + k4)",
    }
    contrib = " + ".join(
        f"CAST(k{k} AS DECIMAL(38,0)) * (2 * {below[k]} + {eq[k]})"
        for k in range(2, 6)
    )
    j = cum.agg(F.expr(f"sum({contrib})").alias("j2"))
    n = piv.agg(*[F.sum(f"k{k}").alias(f"n{k}") for k in range(1, 6)])
    pairs = (
        "n1 * (n2 + n3 + n4 + n5) + n2 * (n3 + n4 + n5)"
        " + n3 * (n4 + n5) + n4 * n5"
    )
    return j.crossJoin(F.broadcast(n)).select(
        F.expr("CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT)").alias("n_total"),
        F.col("j2").cast("long").alias("j2"),
        F.expr(f"CAST({pairs} AS BIGINT)").alias("pairs_total"),
        F.expr(
            f"CAST(CASE WHEN j2 > {pairs} THEN 1"
            f" WHEN j2 < {pairs} THEN -1 ELSE 0 END AS BIGINT)"
        ).alias("trend_sign"),
    )


_TAILDEP_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1
),
arrs AS (
  SELECT count(*) AS n,
         list_sort(list(x)) AS ax,
         list_sort(list(y)) AS ay
  FROM daily
),
qs AS (SELECT unnest([500, 700, 800]) AS q_permille),
thr AS (
  SELECT q.q_permille, a.n,
         a.ax[CAST((q.q_permille * a.n + 999) // 1000 AS INTEGER)] AS x_thr,
         a.ay[CAST((q.q_permille * a.n + 999) // 1000 AS INTEGER)] AS y_thr,
         a.n - (q.q_permille * a.n + 999) // 1000 AS n_above
  FROM qs q, arrs a
)
SELECT t.q_permille, t.x_thr, t.y_thr,
       CAST(count(*) FILTER (WHERE d.x > t.x_thr AND d.y > t.y_thr)
            AS BIGINT) AS n_joint,
       CAST(count(*) FILTER (WHERE d.x > t.x_thr AND d.y > t.y_thr)
            * 1000000 // t.n_above AS BIGINT) AS lambda_u_ppm
FROM thr t, daily d
GROUP BY t.q_permille, t.x_thr, t.y_thr, t.n_above
ORDER BY t.q_permille
"""


@_register("tail_dependence_empirical", _TAILDEP_ORACLE)
def tail_dependence_empirical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical upper-tail dependence lambda_U(q) between daily purchase
    revenue and daily error count: P(Y > y_q | X > x_q) estimated at
    q = 0.5/0.7/0.8 with thresholds as EXACT order statistics (k-th
    element of the sorted daily arrays, k = ceil(q*n)) and the joint
    exceedance ratio in exact ppm. Tail dependence is what correlation
    can't see — two metrics can be uncorrelated overall yet co-explode in
    the tail (the ops question: do error storms ride on revenue spikes?).
    Scale shape: the daily frame is calendar-bounded; thresholds come
    from one 1-row array agg broadcast back over it."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", _cents("value")).otherwise(0)
        ).alias("x"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("y"),
    ).localCheckpoint(eager=False)
    arrs = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sort_array(F.collect_list("x")).alias("ax"),
        F.sort_array(F.collect_list("y")).alias("ay"),
    )
    qs = spark.range(1).select(
        F.explode(F.expr("array(500, 700, 800)")).alias("q_permille")
    )
    thr = qs.crossJoin(F.broadcast(arrs)).select(
        "q_permille",
        "n",
        F.expr(
            "element_at(ax, CAST((q_permille * n + 999) div 1000 AS INT))"
        ).alias("x_thr"),
        F.expr(
            "element_at(ay, CAST((q_permille * n + 999) div 1000 AS INT))"
        ).alias("y_thr"),
        F.expr("n - (q_permille * n + 999) div 1000").alias("n_above"),
    )
    return (
        F.broadcast(thr)
        .join(daily, (F.col("x") > F.col("x_thr")) & (F.col("y") > F.col("y_thr")), "left")
        .groupBy("q_permille", "x_thr", "y_thr", "n_above")
        .agg(F.count(F.col("d")).alias("n_joint"))
        .select(
            "q_permille",
            "x_thr",
            "y_thr",
            F.col("n_joint").cast("long").alias("n_joint"),
            F.expr(
                "CAST((n_joint * 1000000) div n_above AS BIGINT)"
            ).alias("lambda_u_ppm"),
        )
        .orderBy("q_permille")
    )


# ===========================================================================
# Causal inference: IPW / regression discontinuity / instrumental variable
# ===========================================================================

_IPW_ORACLE = """
WITH o AS (
  SELECT o_orderpriority AS stratum,
         CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':ipw'), 1, 6)
              AS BIGINT) % 2 AS t,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
),
s AS (
  SELECT stratum,
         count(*) AS n_s,
         sum(t) AS n_t,
         sum(1 - t) AS n_c,
         sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS sy_t,
         sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS sy_c
  FROM o GROUP BY stratum
),
gl AS (SELECT sum(n_s) AS n FROM s),
terms AS (
  SELECT s.stratum, s.n_s, s.n_t, s.n_c,
         CAST(1000 * CAST(s.sy_t AS HUGEINT) * s.n_s
              // (CAST(g.n AS HUGEINT) * s.n_t) AS BIGINT) AS treated_milli,
         CAST(1000 * CAST(s.sy_c AS HUGEINT) * s.n_s
              // (CAST(g.n AS HUGEINT) * s.n_c) AS BIGINT) AS control_milli,
         CAST(1000 * CAST(s.sy_t AS HUGEINT) // s.n_t
              - 1000 * CAST(s.sy_c AS HUGEINT) // s.n_c AS BIGINT)
           AS naive_diff_milli
  FROM s, gl g
)
SELECT stratum, n_s, n_t, n_c, treated_milli, control_milli,
       naive_diff_milli,
       CAST(sum(treated_milli - control_milli) OVER () AS BIGINT)
         AS ate_ipw_milli
FROM terms
ORDER BY stratum
"""


@_register("ipw_ate_estimate", _IPW_ORACLE)
def ipw_ate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect with
    stratum-level propensities: treatment is an md5 coin on the order
    key, strata are the 5 order priorities, the outcome is the order
    total in cents. Within stratum s the propensity e_s = n_t/n_s is an
    exact rational, so the Horvitz-Thompson terms sum_T y/e_s and
    sum_C y/(1-e_s) reduce to sy_t*n_s/n_t and sy_c*n_s/n_c — ONE exact
    128-bit division per stratum-arm (floor-per-term, the oracle runs
    the identical floor sequence), and the overall ATE is the sum of
    per-stratum milli terms. Since treatment is a genuine coin, the
    expected readout is ~0 (an A/A audit of the estimator) — the
    doubly-robust companion to stratified_ate_adjustment (outcome-model
    side). Scale shape: one hash agg to 5 strata, then 5-row algebra."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("stratum"),
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(o_orderkey AS STRING), ':ipw')),"
            " 1, 6), 16, 10) AS BIGINT) % 2"
        ).alias("t"),
        _cents("o_totalprice").alias("y"),
    )
    s = o.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("t").alias("n_t"),
        F.sum(1 - F.col("t")).alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).alias("sy_t"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).alias("sy_c"),
    )
    gl = s.agg(F.sum("n_s").cast("decimal(38,0)").alias("n"))
    terms = s.crossJoin(F.broadcast(gl)).select(
        "stratum",
        "n_s",
        "n_t",
        "n_c",
        F.expr(
            "CAST((1000 * CAST(sy_t AS DECIMAL(38,0)) * n_s) div (n * n_t)"
            " AS BIGINT)"
        ).alias("treated_milli"),
        F.expr(
            "CAST((1000 * CAST(sy_c AS DECIMAL(38,0)) * n_s) div (n * n_c)"
            " AS BIGINT)"
        ).alias("control_milli"),
        F.expr(
            "CAST((1000 * CAST(sy_t AS DECIMAL(38,0))) div n_t"
            " - (1000 * CAST(sy_c AS DECIMAL(38,0))) div n_c AS BIGINT)"
        ).alias("naive_diff_milli"),
    )
    w = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return terms.select(
        "*",
        F.sum(F.col("treated_milli") - F.col("control_milli"))
        .over(w)
        .cast("long")
        .alias("ate_ipw_milli"),
    ).orderBy("stratum")


_RDD_ORACLE = """
WITH li AS (
  SELECT l_orderkey, count(*) AS y FROM lineitem GROUP BY l_orderkey
),
o AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) - 25000000 AS x,
         li.y
  FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
  WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
        BETWEEN 15000000 AND 34999999
),
sides AS (
  SELECT CASE WHEN x >= 0 THEN 'right' ELSE 'left' END AS side,
         count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM o GROUP BY 1
),
fit AS (
  SELECT side, n,
         CAST(1000000000 * (n * sxy - sx * sy)
              // (n * sxx - sx * sx) AS BIGINT) AS slope_nano,
         CAST(1000 * (sy * sxx - sx * sxy)
              // (n * sxx - sx * sx) AS BIGINT) AS mu_at_cutoff_milli
  FROM sides
)
SELECT f.side, f.n, f.slope_nano, f.mu_at_cutoff_milli,
       CAST((SELECT mu_at_cutoff_milli FROM fit WHERE side = 'right')
            - (SELECT mu_at_cutoff_milli FROM fit WHERE side = 'left')
            AS BIGINT) AS rdd_effect_milli
FROM fit f
ORDER BY f.side
"""


@_register("regression_discontinuity_cutoff", _RDD_ORACLE)
def regression_discontinuity_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity design: running variable is the
    order total in cents centered at a 250k cutoff, outcome is the
    order's line count, bandwidth ±100k. Each side gets an exact OLS fit
    from the five classical sums (n, Sx, Sy, Sxx, Sxy): the intercept AT
    the cutoff (sy*sxx - sx*sxy)/(n*sxx - sx^2) and the slope are pure
    rationals reported via single 128-bit truncating divisions, and the
    RDD effect is the right-minus-left intercept gap. Since nothing in
    the synthetic data jumps at the cutoff, the expected effect is ~0 —
    a placebo audit of the machinery (the local-linear sibling of
    regression_trend_aggregates and difference_in_differences). Scale
    shape: filter pushes the bandwidth window into the scan; one
    join-agg to per-order rows; one 2-group agg; 2-row algebra."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.expr(f"{cents} BETWEEN 15000000 AND 34999999"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.expr(f"{cents} - 25000000").alias("x"), "y")
    )
    sides = o.groupBy(
        F.when(F.col("x") >= 0, "right").otherwise("left").alias("side")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    fit = sides.select(
        "side",
        "n",
        F.expr(
            "CAST((1000000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"
            " AS BIGINT)"
        ).alias("slope_nano"),
        F.expr(
            "CAST((1000 * (sy * sxx - sx * sxy)) div (n * sxx - sx * sx)"
            " AS BIGINT)"
        ).alias("mu_at_cutoff_milli"),
    ).localCheckpoint(eager=False)
    effect = fit.groupBy().agg(
        F.sum(
            F.when(F.col("side") == "right", F.col("mu_at_cutoff_milli"))
            .otherwise(-F.col("mu_at_cutoff_milli"))
        ).alias("rdd_effect_milli")
    )
    return (
        fit.crossJoin(F.broadcast(effect))
        .select(
            "side",
            "n",
            "slope_nano",
            "mu_at_cutoff_milli",
            F.col("rdd_effect_milli").cast("long").alias("rdd_effect_milli"),
        )
        .orderBy("side")
    )


_IV_ORACLE = """
WITH cust AS (
  SELECT c_custkey,
         CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':iv'), 1, 6)
              AS BIGINT) % 2 AS z
  FROM customer
),
u AS (
  SELECT c.c_custkey, c.z,
         count(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 END) AS x,
         coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS y
  FROM cust c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
arms AS (
  SELECT sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS n0,
         sum(CASE WHEN z = 1 THEN x ELSE 0 END) AS sx1,
         sum(CASE WHEN z = 0 THEN x ELSE 0 END) AS sx0,
         sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS sy1,
         sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS sy0
  FROM u
)
SELECT n1, n0,
       CAST(1000 * CAST(sy1 AS HUGEINT) // n1 AS BIGINT) AS y1_mean_milli,
       CAST(1000 * CAST(sy0 AS HUGEINT) // n0 AS BIGINT) AS y0_mean_milli,
       CAST(1000 * CAST(sx1 AS HUGEINT) // n1 AS BIGINT) AS x1_mean_milli,
       CAST(1000 * CAST(sx0 AS HUGEINT) // n0 AS BIGINT) AS x0_mean_milli,
       CAST(1000 * (CAST(sy1 AS HUGEINT) * n0 - CAST(sy0 AS HUGEINT) * n1)
            // (CAST(sx1 AS HUGEINT) * n0 - CAST(sx0 AS HUGEINT) * n1)
            AS BIGINT) AS wald_milli
FROM arms
"""


@_register("iv_wald_estimate", _IV_ORACLE)
def iv_wald_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable Wald estimator: instrument z is an md5 coin
    on the customer key, exposure x is the customer's count of URGENT
    orders, outcome y is total spend in cents. Wald = (E[y|z=1] -
    E[y|z=0]) / (E[x|z=1] - E[x|z=0]); cross-multiplying kills both
    1/n factors, so the whole estimate is ONE exact 128-bit division
    (sy1*n0 - sy0*n1) / (sx1*n0 - sx0*n1) in milli-cents per urgent
    order. With a pure-coin instrument the first stage is null, so the
    denominator is a small random integer — the honest weak-instrument
    pathology, reported as-is (the estimator family's placebo audit,
    next to ipw_ate_estimate and difference_in_differences). Scale
    shape: one broadcast-joined per-customer rollup, then a 1-row agg."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(c_custkey AS STRING), ':iv')),"
            " 1, 6), 16, 10) AS BIGINT) % 2"
        ).alias("z"),
    )
    u = (
        cust.join(
            _t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey", "z")
        .agg(
            F.count(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            ).alias("x"),
            F.coalesce(F.sum(_cents("o_totalprice")), F.lit(0)).alias("y"),
        )
    )
    arms = u.agg(
        F.sum(F.when(F.col("z") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("z") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("z") == 1, F.col("x")).otherwise(0)).alias("sx1"),
        F.sum(F.when(F.col("z") == 0, F.col("x")).otherwise(0)).alias("sx0"),
        F.sum(F.when(F.col("z") == 1, F.col("y")).otherwise(0)).alias("sy1"),
        F.sum(F.when(F.col("z") == 0, F.col("y")).otherwise(0)).alias("sy0"),
    )
    return arms.select(
        "n1",
        "n0",
        F.expr(
            "CAST((1000 * CAST(sy1 AS DECIMAL(38,0))) div n1 AS BIGINT)"
        ).alias("y1_mean_milli"),
        F.expr(
            "CAST((1000 * CAST(sy0 AS DECIMAL(38,0))) div n0 AS BIGINT)"
        ).alias("y0_mean_milli"),
        F.expr(
            "CAST((1000 * CAST(sx1 AS DECIMAL(38,0))) div n1 AS BIGINT)"
        ).alias("x1_mean_milli"),
        F.expr(
            "CAST((1000 * CAST(sx0 AS DECIMAL(38,0))) div n0 AS BIGINT)"
        ).alias("x0_mean_milli"),
        F.expr(
            "CAST((1000 * (CAST(sy1 AS DECIMAL(38,0)) * n0"
            " - CAST(sy0 AS DECIMAL(38,0)) * n1))"
            " div (CAST(sx1 AS DECIMAL(38,0)) * n0"
            " - CAST(sx0 AS DECIMAL(38,0)) * n1) AS BIGINT)"
        ).alias("wald_milli"),
    )


# ===========================================================================
# Financial / time-series screens
# ===========================================================================

_SHARPE_ORACLE = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mo,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
),
d AS (
  SELECT mo, rev - lag(rev) OVER (ORDER BY mo) AS diff
  FROM m
),
agg AS (
  SELECT count(diff) AS n,
         sum(CAST(diff AS HUGEINT)) AS s,
         sum(CAST(diff AS HUGEINT) * diff) AS q
  FROM d WHERE diff IS NOT NULL
)
SELECT n,
       CAST(s AS BIGINT) AS sum_diff_cents,
       CAST(n * q - s * s AS DOUBLE) AS radicand,
       round(CAST(s AS DOUBLE) / sqrt(CAST(n * q - s * s AS DOUBLE)), 6)
         AS sharpe_6dp
FROM agg
"""


@_register("sharpe_ratio_monthly_revenue", _SHARPE_ORACLE)
def sharpe_ratio_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe ratio of month-over-month revenue changes: with S = sum of
    diffs and the radicand n*Q - S^2 both exact integers, mean/sigma
    algebraically collapses to S / sqrt(n*Q - S^2) — ONE IEEE
    correctly-rounded sqrt and one division on identical operands in
    both engines, rounded to 6dp (the same portability contract as the
    cosine entries). Population sigma (1/n) is used, matching the
    one-pass moment entries. The risk-adjusted-return screen next to
    max_drawdown_monthly_revenue (drawdown measures the worst path;
    Sharpe the average-per-volatility). Scale shape: one monthly rollup
    (calendar-bounded frame), one lag window, one 1-row agg."""
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("mo"))
        .agg(F.sum(_cents("o_totalprice")).alias("rev"))
    )
    d = m.select(
        (F.col("rev") - F.lag("rev").over(W.orderBy("mo"))).alias("diff")
    ).filter(F.col("diff").isNotNull())
    agg = d.agg(
        F.count("diff").alias("n"),
        F.sum(F.col("diff").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("diff").cast("decimal(38,0)") * F.col("diff")).alias("q"),
    )
    return agg.select(
        "n",
        F.col("s").cast("long").alias("sum_diff_cents"),
        F.expr("CAST(n * q - s * s AS DOUBLE)").alias("radicand"),
        F.round(
            F.expr("CAST(s AS DOUBLE) / sqrt(CAST(n * q - s * s AS DOUBLE))"), 6
        ).alias("sharpe_6dp"),
    )


_BOLLINGER_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         sum(CAST(round(value * 100) AS BIGINT)) AS x
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
win AS (
  SELECT d, x,
         count(*) OVER w AS n,
         sum(x) OVER w AS s,
         sum(CAST(x AS HUGEINT) * x) OVER w AS q
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT d AS day, x AS revenue_cents, n AS n_win,
       CAST(CASE
         WHEN (n * CAST(x AS HUGEINT) - s) * (n * CAST(x AS HUGEINT) - s)
              > 4 * (n * q - CAST(s AS HUGEINT) * s)
              AND n * CAST(x AS HUGEINT) > s THEN 1
         WHEN (n * CAST(x AS HUGEINT) - s) * (n * CAST(x AS HUGEINT) - s)
              > 4 * (n * q - CAST(s AS HUGEINT) * s)
              AND n * CAST(x AS HUGEINT) < s THEN -1
         ELSE 0 END AS BIGINT) AS breakout,
       round(2.0 * sqrt(CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE))
             / CAST(n AS DOUBLE), 4) AS band_halfwidth_4dp
FROM win
ORDER BY day
"""


@_register("bollinger_breakout_days", _BOLLINGER_ORACLE)
def bollinger_breakout_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout screen on daily purchase revenue with a
    7-day trailing window: the +/-2-sigma breach test is decided ENTIRELY
    in integer arithmetic — (n*x - S)^2 > 4*(n*Q - S^2) is the exact
    square of |x - mean| > 2*sigma — so the breakout flag carries no
    float risk at any scale; only the reported band half-width touches
    doubles (one sqrt + round(4), the portable pattern). The day-level
    volatility screen next to ewma_daily_event_counts (EWMA smooths;
    Bollinger flags regime exits). Scale shape: calendar-bounded daily
    frame, one ROWS window, pure JVM expressions."""
    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(_cents("value")).alias("x"))
    )
    w = W.orderBy("d").rowsBetween(-6, 0)
    win = daily.select(
        "d",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).over(w).alias("q"),
    )
    dev = "(n * CAST(x AS DECIMAL(38,0)) - s)"
    var = "(n * q - CAST(s AS DECIMAL(38,0)) * s)"
    return win.select(
        F.col("d").alias("day"),
        F.col("x").alias("revenue_cents"),
        F.col("n").alias("n_win"),
        F.expr(
            f"CAST(CASE WHEN {dev} * {dev} > 4 * {var}"
            f" AND n * CAST(x AS DECIMAL(38,0)) > s THEN 1"
            f" WHEN {dev} * {dev} > 4 * {var}"
            f" AND n * CAST(x AS DECIMAL(38,0)) < s THEN -1"
            " ELSE 0 END AS BIGINT)"
        ).alias("breakout"),
        F.round(
            F.expr(f"2.0 * sqrt(CAST({var} AS DOUBLE)) / CAST(n AS DOUBLE)"), 4
        ).alias("band_halfwidth_4dp"),
    ).orderBy("day")


_HAMPEL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
nb AS (
  SELECT event_type, d, cnt,
         list_sort(list(cnt) OVER w) AS a
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
med AS (
  SELECT event_type, d, cnt, a, len(a) AS m,
         CASE WHEN len(a) % 2 = 1 THEN 2 * a[(len(a) + 1) // 2]
              ELSE a[len(a) // 2] + a[len(a) // 2 + 1] END AS med2
  FROM nb
),
dev AS (
  SELECT event_type, d, cnt, m, med2,
         list_sort(list_transform(a, e -> abs(2 * e - med2))) AS dv
  FROM med
)
SELECT event_type, d AS day, cnt, med2,
       CASE WHEN m % 2 = 1 THEN 2 * dv[(m + 1) // 2]
            ELSE dv[m // 2] + dv[m // 2 + 1] END AS mad4,
       CAST(CASE WHEN 2 * abs(2 * cnt - med2) >
              3 * (CASE WHEN m % 2 = 1 THEN 2 * dv[(m + 1) // 2]
                        ELSE dv[m // 2] + dv[m // 2 + 1] END)
            THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM dev
ORDER BY event_type, day
"""


@_register("hampel_filter_outliers", _HAMPEL_ORACLE)
def hampel_filter_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter on daily event counts per type: a day is an outlier
    if |x - median| > 3 * MAD over the +/-3-day neighborhood. Both the
    rolling median and the MAD ride doubled/quadrupled integer lanes
    (med2 = a_(k)+a_(k+1) for even windows, mad4 likewise), so the
    outlier decision 2*|2x - med2| > 3*mad4 is exact integer comparison
    even at even-sized boundary windows — the ROBUST cousin of
    outlier_zscore_by_group (mean/sigma break down when the outliers
    they hunt contaminate them; median/MAD have a 50% breakdown point).
    Scale shape: calendar-bounded daily frame, one 7-row ROWS window
    with array expressions, zero Python."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    nb = daily.select(
        "event_type",
        "d",
        "cnt",
        F.sort_array(F.collect_list("cnt").over(w)).alias("a"),
    )
    med2 = (
        "CASE WHEN size(a) % 2 = 1"
        " THEN 2 * element_at(a, CAST((size(a) + 1) div 2 AS INT))"
        " ELSE element_at(a, CAST(size(a) div 2 AS INT))"
        " + element_at(a, CAST(size(a) div 2 + 1 AS INT)) END"
    )
    med = nb.select(
        "event_type",
        "d",
        "cnt",
        "a",
        F.expr("size(a)").alias("m"),
        F.expr(med2).alias("med2"),
    )
    dev = med.select(
        "event_type",
        "d",
        "cnt",
        "m",
        "med2",
        F.expr("sort_array(transform(a, e -> abs(2 * e - med2)))").alias("dv"),
    )
    mad4 = (
        "CASE WHEN m % 2 = 1"
        " THEN 2 * element_at(dv, CAST((m + 1) div 2 AS INT))"
        " ELSE element_at(dv, CAST(m div 2 AS INT))"
        " + element_at(dv, CAST(m div 2 + 1 AS INT)) END"
    )
    return dev.select(
        "event_type",
        F.col("d").alias("day"),
        "cnt",
        "med2",
        F.expr(mad4).alias("mad4"),
        F.expr(
            f"CAST(CASE WHEN 2 * abs(2 * cnt - med2) > 3 * ({mad4})"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("is_outlier"),
    ).orderBy("event_type", "day")


_SAX_ORACLE = """
WITH spine AS (
  SELECT et.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) et,
       (SELECT unnest(generate_series(0, 719)) AS h) g
),
hourly AS (
  SELECT event_type,
         (CAST(ts AS DATE) - DATE '2024-01-01') * 24
           + EXTRACT(hour FROM ts) AS h,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
dense AS (
  SELECT s.event_type, s.h, coalesce(hh.cnt, 0) AS cnt
  FROM spine s LEFT JOIN hourly hh
    ON hh.event_type = s.event_type AND hh.h = s.h
),
paa AS (
  SELECT event_type, h // 6 AS seg, sum(cnt) AS v
  FROM dense GROUP BY 1, 2
),
lett AS (
  SELECT event_type, seg,
         ((row_number() OVER (PARTITION BY event_type ORDER BY v, seg) - 1)
          * 4) // (count(*) OVER (PARTITION BY event_type)) AS li
  FROM paa
),
sym AS (
  SELECT event_type, seg,
         CASE li WHEN 0 THEN 'a' WHEN 1 THEN 'b' WHEN 2 THEN 'c'
                 ELSE 'd' END AS letter
  FROM lett
),
words AS (
  SELECT event_type,
         letter
         || lead(letter, 1) OVER w
         || lead(letter, 2) OVER w
         || lead(letter, 3) OVER w AS motif
  FROM sym
  WINDOW w AS (PARTITION BY event_type ORDER BY seg)
),
counts AS (
  SELECT event_type, motif, count(*) AS occurrences
  FROM words WHERE motif IS NOT NULL
  GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, motif, occurrences,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY occurrences DESC, motif) AS rnk
  FROM counts
)
SELECT event_type, motif, CAST(occurrences AS BIGINT) AS occurrences,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 8
ORDER BY event_type, rnk
"""


@_register("sax_symbolic_motifs", _SAX_ORACLE)
def sax_symbolic_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation, Lin/Keogh 2003) motif
    discovery over hourly event volume: the 720-hour series per type is
    piecewise-aggregated into 6-hour segments (PAA; SUM over equal-width
    segments preserves order, stays integral), each segment gets a
    quartile letter a-d by RANK (empirical breakpoints via the exact
    ntile identity ((r-1)*k) div n — deterministic under the (value,
    seg) total order, engine-independent unlike Gaussian breakpoints),
    and 4-letter sliding words are counted for recurring shapes. This is
    the standard discretize-then-count motif pipeline used for time-
    series anomaly hunting; the symbolic sibling of
    seasonal_anomaly_days (which scores residuals, not shapes). Scale
    shape: a calendar-bounded dense spine (sequence + explode), one
    hash agg to segments, two windows over the 120-row-per-type frame."""
    ev = _t(spark, sf_dir, "events")
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(
        F.broadcast(
            spark.range(1).select(
                F.explode(F.sequence(F.lit(0), F.lit(719))).alias("h")
            )
        )
    )
    hourly = ev.groupBy(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) * 24
            + F.hour("ts")
        ).alias("h"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    dense = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    paa = dense.groupBy(
        "event_type", F.expr("h div 6").alias("seg")
    ).agg(F.sum("cnt").alias("v"))
    wrank = W.partitionBy("event_type").orderBy("v", "seg")
    wpart = W.partitionBy("event_type")
    lett = paa.select(
        "event_type",
        "seg",
        F.expr(
            "CASE ((row_number() OVER (PARTITION BY event_type ORDER BY v,"
            " seg) - 1) * 4) div (count(*) OVER (PARTITION BY event_type))"
            " WHEN 0 THEN 'a' WHEN 1 THEN 'b' WHEN 2 THEN 'c' ELSE 'd' END"
        ).alias("letter"),
    )
    wseq = W.partitionBy("event_type").orderBy("seg")
    words = lett.select(
        "event_type",
        F.concat(
            "letter",
            F.lead("letter", 1).over(wseq),
            F.lead("letter", 2).over(wseq),
            F.lead("letter", 3).over(wseq),
        ).alias("motif"),
    ).filter(F.col("motif").isNotNull())
    counts = words.groupBy("event_type", "motif").agg(
        F.count(F.lit(1)).alias("occurrences")
    )
    wtop = W.partitionBy("event_type").orderBy(
        F.col("occurrences").desc(), "motif"
    )
    return (
        counts.select(
            "event_type",
            "motif",
            F.col("occurrences").cast("long").alias("occurrences"),
            F.row_number().over(wtop).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 8)
        .orderBy("event_type", "rnk")
    )
