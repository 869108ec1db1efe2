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
    tiered_global_rank,
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
SELECT CAST(t.n AS BIGINT) AS n_a, CAST(t.m AS BIGINT) AS n_b,
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
    DOMAIN, 49k cells, not the corpus), then the ECDF prefix sums are
    computed without a single-partition window (tiered_global_rank
    cumsum over contiguous 128-cent bands — the distinct-value frame
    only saturates at domain size, so it is treated as data-sized
    until then), one final agg."""
    ev = _t(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "view")).select(
        _cents("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
    )
    g = s.groupBy("v").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    c = tiered_global_rank(
        g,
        F.expr("v div 128"),
        ["v"],
        rank_name="__ri",
        cumsum={"ca": "c1", "cb": "c2"},
    ).select("ca", "cb", "c1", "c2")
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
SELECT gs.grp, CAST(gs.n_i AS BIGINT) AS n_i,
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
    distinct cent values + a tiered prefix sum (tiered_global_rank
    cumsum over contiguous 65536-cent price bands — near-unique prices
    make the distinct-value frame data-sized, so no single-partition
    window); group stats are one join + agg; the H combine runs on 5
    rows."""
    s = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), _cents("o_totalprice").alias("v")
    )
    dv = s.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    rk = tiered_global_rank(
        dv,
        F.expr("v div 65536"),
        ["v"],
        rank_name="__ri",
        cumsum={"t": "ct"},
    ).select(
        "v", "t", (2 * (F.col("ct") - F.col("t")) + F.col("t") + 1).alias("r2")
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
       CAST(CASE t.i WHEN 1 THEN q.c1 WHEN 2 THEN q.c2 ELSE q.c3 END
            AS BIGINT) AS c_j,
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
    frame + tiered prefix sums (tiered_global_rank cumsum over
    contiguous 65536-cent bands; exclusive below-mass = inclusive
    cumsum minus the current cell — no single-partition window) + one
    agg — the k-sample trend sibling of mann_kendall_theil_sen (which
    trends over TIME, not ordered groups)."""
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
    cum = tiered_global_rank(
        piv,
        F.expr("v div 65536"),
        ["v"],
        rank_name="__ri",
        cumsum={f"k{k}": f"c{k}" for k in range(1, 5)},
    ).select(
        "v",
        *[F.col(f"k{k}") for k in range(1, 6)],
        *[
            (F.col(f"c{k}") - F.col(f"k{k}")).alias(f"l{k}")
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
SELECT t.q_permille, CAST(t.x_thr AS BIGINT) AS x_thr,
       CAST(t.y_thr AS BIGINT) AS y_thr,
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
SELECT stratum, n_s, CAST(n_t AS BIGINT) AS n_t,
       CAST(n_c AS BIGINT) AS n_c, treated_milli, control_milli,
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
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
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
SELECT d AS day, CAST(x AS BIGINT) AS revenue_cents, n AS n_win,
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


# ===========================================================================
# Classifier operating curves / inequality indices / drift
# ===========================================================================

_ROC_ORACLE = """
WITH scored AS (
  SELECT n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
tot AS (SELECT sum(pos) AS p, sum(1 - pos) AS q, count(*) AS n FROM scored),
dv AS (
  SELECT score, sum(pos) AS cp, sum(1 - pos) AS cq, count(*) AS t
  FROM scored GROUP BY score
),
cum AS (
  SELECT score,
         sum(t) OVER (ORDER BY score) AS c_le,
         sum(cp) OVER (ORDER BY score) AS p_le,
         sum(cq) OVER (ORDER BY score) AS q_le
  FROM dv
),
deciles AS (SELECT unnest(range(1, 10)) AS decile),
thr AS (
  SELECT d.decile,
         min(c.score) AS threshold
  FROM deciles d, tot, cum c
  WHERE c.c_le >= (d.decile * tot.n + 9) // 10
  GROUP BY d.decile
)
SELECT t.decile, t.threshold,
       CAST(o.p - c.p_le AS BIGINT) AS tp,
       CAST(o.q - c.q_le AS BIGINT) AS fp,
       CAST((o.p - c.p_le) * 1000000 // o.p AS BIGINT) AS tpr_ppm,
       CAST((o.q - c.q_le) * 1000000 // o.q AS BIGINT) AS fpr_ppm
FROM thr t
JOIN cum c ON c.score = t.threshold
CROSS JOIN tot o
ORDER BY t.decile
"""


@_register("roc_curve_points", _ROC_ORACLE)
def roc_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC operating points for the 'document length predicts English'
    classifier: at each score-decile threshold (an EXACT order statistic
    from the cumulative distinct-score frame), TP/FP counts and
    TPR/FPR in exact ppm for the rule 'score > threshold'. The curve
    companion to rank_sum_auc_by_event_type (AUC is this curve's
    integral — points localize WHERE the ranking is good) and
    calibration_reliability_bins (which audits probabilities, not
    decisions). Scale shape: one hash agg on the score domain (bounded:
    n_chars), one window cumsum over it, a 9-row threshold join."""
    scored = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    tot = scored.agg(
        F.sum("pos").alias("p"),
        F.sum(1 - F.col("pos")).alias("q"),
        F.count(F.lit(1)).alias("n"),
    )
    dv = scored.groupBy("score").agg(
        F.sum("pos").alias("cp"),
        F.sum(1 - F.col("pos")).alias("cq"),
        F.count(F.lit(1)).alias("t"),
    )
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = dv.select(
        "score",
        F.sum("t").over(w).alias("c_le"),
        F.sum("cp").over(w).alias("p_le"),
        F.sum("cq").over(w).alias("q_le"),
    ).localCheckpoint(eager=False)
    deciles = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    thr = (
        F.broadcast(deciles.crossJoin(tot))
        .join(cum, F.col("c_le") >= F.expr("(decile * n + 9) div 10"))
        .groupBy("decile", "p", "q")
        .agg(F.min("score").alias("threshold"))
    )
    return (
        thr.join(cum, F.col("score") == F.col("threshold"))
        .select(
            "decile",
            "threshold",
            (F.col("p") - F.col("p_le")).cast("long").alias("tp"),
            (F.col("q") - F.col("q_le")).cast("long").alias("fp"),
            F.expr(
                "CAST(((p - p_le) * 1000000) div p AS BIGINT)"
            ).alias("tpr_ppm"),
            F.expr(
                "CAST(((q - q_le) * 1000000) div q AS BIGINT)"
            ).alias("fpr_ppm"),
        )
        .orderBy("decile")
    )


_COST_THR_ORACLE = """
WITH scored AS (
  SELECT n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
tot AS (SELECT sum(pos) AS p, sum(1 - pos) AS q FROM scored),
dv AS (
  SELECT score, sum(pos) AS cp, sum(1 - pos) AS cq
  FROM scored GROUP BY score
),
cum AS (
  SELECT score,
         sum(cp) OVER (ORDER BY score) AS p_le,
         sum(cq) OVER (ORDER BY score) AS q_le
  FROM dv
),
costs AS (
  -- predict positive when score > threshold: FN = p_le (missed), FP = q - q_le
  SELECT c.score AS threshold,
         5 * c.p_le + (t.q - c.q_le) AS cost
  FROM cum c, tot t
),
best AS (
  SELECT threshold, cost FROM costs ORDER BY cost, threshold LIMIT 1
)
SELECT b.threshold AS best_threshold,
       CAST(b.cost AS BIGINT) AS best_cost,
       CAST(t.q AS BIGINT) AS cost_all_positive,
       CAST(5 * t.p AS BIGINT) AS cost_all_negative
FROM best b, tot t
"""


@_register("cost_threshold_optimization", _COST_THR_ORACLE)
def cost_threshold_optimization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive decision threshold: with FN 5x costlier than FP
    (the curation asymmetry — discarding a good document costs more than
    keeping a bad one), sweep EVERY distinct score as 'predict positive
    above here' and take the argmin of 5*FN + FP, all in integers on the
    same cumulative frame the ROC entry builds; the two baseline
    policies (always/never positive) bound the win. This turns
    roc_curve_points into a DECISION — the missing last step of every
    classifier-eval entry. Scale shape: identical to the ROC frame plus
    one TakeOrdered(1)."""
    scored = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    tot = scored.agg(
        F.sum("pos").alias("p"), F.sum(1 - F.col("pos")).alias("q")
    )
    dv = scored.groupBy("score").agg(
        F.sum("pos").alias("cp"), F.sum(1 - F.col("pos")).alias("cq")
    )
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = dv.select(
        "score",
        F.sum("cp").over(w).alias("p_le"),
        F.sum("cq").over(w).alias("q_le"),
    )
    costs = cum.crossJoin(F.broadcast(tot)).select(
        F.col("score").alias("threshold"),
        (5 * F.col("p_le") + (F.col("q") - F.col("q_le"))).alias("cost"),
        "p",
        "q",
    )
    return (
        costs.orderBy("cost", "threshold")
        .limit(1)
        .select(
            F.col("threshold").alias("best_threshold"),
            F.col("cost").cast("long").alias("best_cost"),
            F.col("q").cast("long").alias("cost_all_positive"),
            (5 * F.col("p")).cast("long").alias("cost_all_negative"),
        )
    )


_HOOVER_ORACLE = """
WITH s AS (
  SELECT n.n_regionkey AS rk, l.l_suppkey,
         CAST(sum(round(l.l_extendedprice * 100)) AS BIGINT) AS rev
  FROM lineitem l
  JOIN supplier su ON su.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = su.s_nationkey
  GROUP BY 1, 2
),
tot AS (
  SELECT rk, CAST(sum(rev) AS HUGEINT) AS x, count(*) AS n
  FROM s GROUP BY rk
)
SELECT r.r_name, t.n AS n_suppliers,
       CAST(sum(abs(t.n * CAST(s.rev AS HUGEINT) - t.x)) * 1000000
            // (2 * t.x * t.n) AS BIGINT) AS hoover_ppm
FROM s JOIN tot t ON t.rk = s.rk
JOIN region r ON r.r_regionkey = s.rk
GROUP BY r.r_name, t.n, t.x
ORDER BY r.r_name
"""


@_register("hoover_index_by_region", _HOOVER_ORACLE)
def hoover_index_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index of supplier revenue per region: the
    share of total revenue that would have to move between suppliers to
    equalize them, H = sum|x_i/X - 1/n| / 2 = sum|n*x_i - X| / (2*X*n) —
    a single exact 128-bit division per region, completing the
    inequality triptych: Gini (gini_concentration_by_segment, area
    view), HHI (herfindahl_concentration_index, top-weighted view),
    Hoover (mass-transfer view) — three indices that RANK markets
    differently, which is the analytical point. Scale shape: same
    (region, supplier) rollup as the HHI entry, broadcast totals, one
    mergeable abs-deviation sum."""
    s = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_regionkey").alias("rk"), "l_suppkey")
        .agg(
            F.expr("CAST(sum(round(l_extendedprice * 100)) AS BIGINT)").alias(
                "rev"
            )
        )
        .localCheckpoint(eager=False)
    )
    tot = s.groupBy("rk").agg(
        F.sum(F.col("rev").cast("decimal(38,0)")).alias("x"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        s.join(F.broadcast(tot), "rk")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
            ),
            F.col("r_regionkey") == F.col("rk"),
        )
        .groupBy("r_name", F.col("n").alias("n_suppliers"), "x")
        .agg(
            F.sum(
                F.abs(F.col("n") * F.col("rev").cast("decimal(38,0)") - F.col("x"))
            ).alias("absdev")
        )
        .select(
            "r_name",
            "n_suppliers",
            F.expr(
                "CAST((absdev * 1000000) div (2 * x * n_suppliers) AS BIGINT)"
            ).alias("hoover_ppm"),
        )
        .orderBy("r_name")
    )


_QSR_ORACLE = """
WITH spend AS (
  SELECT c.c_custkey,
         coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
ranked AS (
  SELECT y, row_number() OVER (ORDER BY y, c_custkey) AS r,
         count(*) OVER () AS n
  FROM spend
),
parts AS (
  SELECT sum(CASE WHEN r > n - n // 5 THEN CAST(y AS HUGEINT)
                  ELSE 0 END) AS top20,
         sum(CASE WHEN r <= (2 * n) // 5 THEN CAST(y AS HUGEINT)
                  ELSE 0 END) AS bottom40,
         sum(CAST(y AS HUGEINT)) AS total,
         max(n) AS n
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(top20 AS BIGINT) AS top20_cents,
       CAST(bottom40 AS BIGINT) AS bottom40_cents,
       CAST(top20 * 1000000 // total AS BIGINT) AS top20_share_ppm,
       CAST(bottom40 * 1000000 // total AS BIGINT) AS bottom40_share_ppm,
       CAST(top20 * 1000 // bottom40 AS BIGINT) AS palma_milli
FROM parts
"""


@_register("quintile_share_ratio", _QSR_ORACLE)
def quintile_share_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma-style quintile share ratio on customer lifetime spend
    (zero-order customers included via left join — they ARE the bottom
    tail): top-20% spend over bottom-40% spend, boundaries as exact
    rank cutoffs (r > n - n div 5, r <= 2n div 5, deterministic
    (spend, custkey) order), the ratio in exact milli. Palma's insight —
    the middle 40% share is nearly constant across economies, so
    inequality lives in the tails — is why this beats a full Lorenz
    integral for monitoring. The customer-grain member of the
    inequality family (Gini/HHI/Hoover run at supplier/segment grain).
    Scale shape: one rollup, then the exact rank cutoffs come from
    tiered_global_rank over contiguous 4194304-cent (~$42k) spend bands
    (wide enough that the offsets frame stays bounded by range/width,
    not customer count; no single-partition window over the customer
    frame), one agg."""
    spend = (
        _t(spark, sf_dir, "customer")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum(_cents("o_totalprice")), F.lit(0)).alias("y"))
    )
    ranked = tiered_global_rank(
        spend,
        F.expr("y div 4194304"),
        ["y", "c_custkey"],
        rank_name="r",
        total_name="n",
    ).select("y", "r", "n")
    parts = ranked.agg(
        F.sum(
            F.when(
                F.col("r") > F.col("n") - F.expr("n div 5"),
                F.col("y").cast("decimal(38,0)"),
            ).otherwise(0)
        ).alias("top20"),
        F.sum(
            F.when(
                F.col("r") <= F.expr("(2 * n) div 5"),
                F.col("y").cast("decimal(38,0)"),
            ).otherwise(0)
        ).alias("bottom40"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("total"),
        F.max("n").alias("n"),
    )
    return parts.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("top20").cast("long").alias("top20_cents"),
        F.col("bottom40").cast("long").alias("bottom40_cents"),
        F.expr("CAST((top20 * 1000000) div total AS BIGINT)").alias(
            "top20_share_ppm"
        ),
        F.expr("CAST((bottom40 * 1000000) div total AS BIGINT)").alias(
            "bottom40_share_ppm"
        ),
        F.expr("CAST((top20 * 1000) div bottom40 AS BIGINT)").alias(
            "palma_milli"
        ),
    )


_TVD_ORACLE = """
WITH weekly AS (
  SELECT event_type,
         sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-08'
                  THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-22'
                  AND CAST(ts AS DATE) < DATE '2024-01-29'
                  THEN 1 ELSE 0 END) AS c2
  FROM events GROUP BY 1
),
tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM weekly),
tvd AS (
  SELECT CAST(sum(abs(CAST(w.c1 AS HUGEINT) * t.n2
                      - CAST(w.c2 AS HUGEINT) * t.n1)) * 1000000
              // (2 * CAST(t.n1 AS HUGEINT) * t.n2) AS BIGINT) AS tvd_ppm
  FROM weekly w, tot t
  GROUP BY t.n1, t.n2
)
SELECT w.event_type,
       CAST(w.c1 * 1000000 // t.n1 AS BIGINT) AS week1_share_ppm,
       CAST(w.c2 * 1000000 // t.n2 AS BIGINT) AS week4_share_ppm,
       v.tvd_ppm
FROM weekly w, tot t, tvd v
ORDER BY w.event_type
"""


@_register("total_variation_drift", _TVD_ORACLE)
def total_variation_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between the week-1 and week-4 event-type
    mixes: TVD = max over event SETS of probability disagreement =
    half the L1 gap, computed exactly as sum|c1*N2 - c2*N1| / (2*N1*N2)
    — the metric with the operational guarantee (no event's probability
    moved more than TVD), where distribution_drift_psi's KL-flavored
    score has no such bound and needs binning choices. Exact ppm, no
    logs, no floats. Scale shape: one 5-row categorical rollup with
    conditional sums pushed into the scan, 5-row algebra after."""
    ev = _t(spark, sf_dir, "events")
    weekly = ev.groupBy("event_type").agg(
        F.sum(
            F.when(F.to_date("ts") < F.lit("2024-01-08").cast("date"), 1).otherwise(0)
        ).alias("c1"),
        F.sum(
            F.when(
                (F.to_date("ts") >= F.lit("2024-01-22").cast("date"))
                & (F.to_date("ts") < F.lit("2024-01-29").cast("date")),
                1,
            ).otherwise(0)
        ).alias("c2"),
    ).localCheckpoint(eager=False)
    tot = weekly.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    wt = weekly.crossJoin(F.broadcast(tot))
    tvd = wt.agg(
        F.expr(
            "CAST(sum(abs(CAST(c1 AS DECIMAL(38,0)) * n2"
            " - CAST(c2 AS DECIMAL(38,0)) * n1)) * 1000000"
            " div (2 * CAST(max(n1) AS DECIMAL(38,0)) * max(n2)) AS BIGINT)"
        ).alias("tvd_ppm")
    )
    return (
        wt.crossJoin(F.broadcast(tvd))
        .select(
            "event_type",
            F.expr(
                "CAST((CAST(c1 AS DECIMAL(38,0)) * 1000000) div n1 AS BIGINT)"
            ).alias("week1_share_ppm"),
            F.expr(
                "CAST((CAST(c2 AS DECIMAL(38,0)) * 1000000) div n2 AS BIGINT)"
            ).alias("week4_share_ppm"),
            "tvd_ppm",
        )
        .orderBy("event_type")
    )


_CHEBYSHEV_ORACLE = """
WITH spend AS (
  SELECT c.c_custkey,
         coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
mom AS (
  SELECT count(*) AS n,
         sum(CAST(y AS HUGEINT)) AS s,
         sum(CAST(y AS HUGEINT) * y) AS q
  FROM spend
),
ks AS (SELECT unnest([2, 3, 4]) AS k)
SELECT k.k,
       CAST((SELECT count(*) FROM spend, mom
             WHERE (mom.n * CAST(spend.y AS HUGEINT) - mom.s)
                   * (mom.n * CAST(spend.y AS HUGEINT) - mom.s)
                   > CAST(k.k AS HUGEINT) * k.k
                     * (mom.n * mom.q - mom.s * mom.s)) AS BIGINT)
         AS n_beyond,
       CAST((SELECT count(*) FROM spend, mom
             WHERE (mom.n * CAST(spend.y AS HUGEINT) - mom.s)
                   * (mom.n * CAST(spend.y AS HUGEINT) - mom.s)
                   > CAST(k.k AS HUGEINT) * k.k
                     * (mom.n * mom.q - mom.s * mom.s))
            * 1000000 // (SELECT n FROM mom) AS BIGINT) AS observed_ppm,
       CAST(1000000 // (k.k * k.k) AS BIGINT) AS chebyshev_bound_ppm,
       CAST(CASE WHEN (SELECT count(*) FROM spend, mom
             WHERE (mom.n * CAST(spend.y AS HUGEINT) - mom.s)
                   * (mom.n * CAST(spend.y AS HUGEINT) - mom.s)
                   > CAST(k.k AS HUGEINT) * k.k
                     * (mom.n * mom.q - mom.s * mom.s))
            * (k.k * k.k) <= (SELECT n FROM mom)
            THEN 1 ELSE 0 END AS BIGINT) AS bound_holds
FROM ks k
ORDER BY k.k
"""


@_register("chebyshev_bound_audit", _CHEBYSHEV_ORACLE)
def chebyshev_bound_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chebyshev inequality audit on customer lifetime spend: the count
    of customers beyond k population sigmas, decided ENTIRELY in integer
    arithmetic — (n*y - S)^2 > k^2 * (n*Q - S^2) is EXACTLY
    |y - mu| > k*sigma with both sides scaled by n^2, no division — vs
    the distribution-free bound P <= 1/k^2. bound_holds must be 1 for
    every k at EVERY scale (a mathematical truth, so this doubles as a
    moment-lane self-test); the interesting readout is the gap
    (observed_ppm << bound), quantifying how light-tailed spend is vs
    the worst case. The distribution-free anchor of the outlier family
    (outlier_zscore assumes normal-ish; this assumes nothing). Scale
    shape: one rollup, one 1-row moment agg broadcast back, k-row
    literal frame."""
    spend = (
        _t(spark, sf_dir, "customer")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum(_cents("o_totalprice")), F.lit(0)).alias("y"))
        .localCheckpoint(eager=False)
    )
    mom = spend.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("q"),
    )
    ks = spark.range(1).select(F.explode(F.expr("array(2, 3, 4)")).alias("k"))
    beyond = (
        spend.crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(ks))
        .filter(
            F.expr(
                "(n * CAST(y AS DECIMAL(38,0)) - s)"
                " * (n * CAST(y AS DECIMAL(38,0)) - s)"
                " > CAST(k AS DECIMAL(38,0)) * k * (n * q - s * s)"
            )
        )
        .groupBy("k", "n")
        .agg(F.count(F.lit(1)).alias("n_beyond"))
    )
    return (
        F.broadcast(ks)
        .join(beyond.drop("n"), "k", "left")
        .crossJoin(F.broadcast(mom.select("n")))
        .select(
            "k",
            F.coalesce("n_beyond", F.lit(0)).cast("long").alias("n_beyond"),
            F.expr(
                "CAST((coalesce(n_beyond, 0) * 1000000) div n AS BIGINT)"
            ).alias("observed_ppm"),
            F.expr("CAST(1000000 div (k * k) AS BIGINT)").alias(
                "chebyshev_bound_ppm"
            ),
            F.expr(
                "CAST(CASE WHEN coalesce(n_beyond, 0) * (k * k) <= n"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("bound_holds"),
        )
        .orderBy("k")
    )


# ===========================================================================
# Within-block rank tests and series-randomness screens
# ===========================================================================

_FRIEDMAN_CTE = """
WITH wk AS (
  SELECT user_id,
         sum(CASE WHEN (CAST(ts AS DATE) - DATE '2024-01-01') // 7 = 0
                  THEN 1 ELSE 0 END) AS v0,
         sum(CASE WHEN (CAST(ts AS DATE) - DATE '2024-01-01') // 7 = 1
                  THEN 1 ELSE 0 END) AS v1,
         sum(CASE WHEN (CAST(ts AS DATE) - DATE '2024-01-01') // 7 = 2
                  THEN 1 ELSE 0 END) AS v2,
         sum(CASE WHEN (CAST(ts AS DATE) - DATE '2024-01-01') // 7 = 3
                  THEN 1 ELSE 0 END) AS v3
  FROM events
  WHERE CAST(ts AS DATE) < DATE '2024-01-29'
  GROUP BY user_id
),
r2 AS (
  SELECT user_id,
         2 * ((CASE WHEN v1 < v0 THEN 1 ELSE 0 END)
            + (CASE WHEN v2 < v0 THEN 1 ELSE 0 END)
            + (CASE WHEN v3 < v0 THEN 1 ELSE 0 END))
         + 1 + (CASE WHEN v1 = v0 THEN 1 ELSE 0 END)
             + (CASE WHEN v2 = v0 THEN 1 ELSE 0 END)
             + (CASE WHEN v3 = v0 THEN 1 ELSE 0 END) + 1 AS r0,
         2 * ((CASE WHEN v0 < v1 THEN 1 ELSE 0 END)
            + (CASE WHEN v2 < v1 THEN 1 ELSE 0 END)
            + (CASE WHEN v3 < v1 THEN 1 ELSE 0 END))
         + 1 + (CASE WHEN v0 = v1 THEN 1 ELSE 0 END)
             + (CASE WHEN v2 = v1 THEN 1 ELSE 0 END)
             + (CASE WHEN v3 = v1 THEN 1 ELSE 0 END) + 1 AS r1,
         2 * ((CASE WHEN v0 < v2 THEN 1 ELSE 0 END)
            + (CASE WHEN v1 < v2 THEN 1 ELSE 0 END)
            + (CASE WHEN v3 < v2 THEN 1 ELSE 0 END))
         + 1 + (CASE WHEN v0 = v2 THEN 1 ELSE 0 END)
             + (CASE WHEN v1 = v2 THEN 1 ELSE 0 END)
             + (CASE WHEN v3 = v2 THEN 1 ELSE 0 END) + 1 AS r2,
         2 * ((CASE WHEN v0 < v3 THEN 1 ELSE 0 END)
            + (CASE WHEN v1 < v3 THEN 1 ELSE 0 END)
            + (CASE WHEN v2 < v3 THEN 1 ELSE 0 END))
         + 1 + (CASE WHEN v0 = v3 THEN 1 ELSE 0 END)
             + (CASE WHEN v1 = v3 THEN 1 ELSE 0 END)
             + (CASE WHEN v2 = v3 THEN 1 ELSE 0 END) + 1 AS r3
  FROM wk
),
sums AS (
  SELECT count(*) AS b,
         sum(r0) AS s0, sum(r1) AS s1, sum(r2) AS s2, sum(r3) AS s3
  FROM r2
)
"""

_FRIEDMAN_ORACLE = (
    _FRIEDMAN_CTE
    + """
SELECT wkk.week, CAST(s.b AS BIGINT) AS n_blocks,
       CAST(CASE wkk.week WHEN 0 THEN s.s0 WHEN 1 THEN s.s1
                          WHEN 2 THEN s.s2 ELSE s.s3 END AS BIGINT) AS r2_sum,
       CAST((CAST(s.s0 AS HUGEINT) * s.s0 * 3000 // (s.b * 4 * 5)
           + CAST(s.s1 AS HUGEINT) * s.s1 * 3000 // (s.b * 4 * 5)
           + CAST(s.s2 AS HUGEINT) * s.s2 * 3000 // (s.b * 4 * 5)
           + CAST(s.s3 AS HUGEINT) * s.s3 * 3000 // (s.b * 4 * 5))
           - 3000 * s.b * 5 AS BIGINT) AS friedman_milli
FROM sums s, (SELECT unnest(range(0, 4)) AS week) wkk
ORDER BY wkk.week
"""
)


@_register("friedman_test_weeks", _FRIEDMAN_ORACLE)
def friedman_test_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: do the 4 full January weeks differ in per-user
    event volume, blocking on the user? Within each user the 4 weekly
    counts get doubled midranks from 16 constant pairwise comparisons
    (r2_j = 2*#less + #eq + 2, ties exact), then chi2_F =
    3*sum(R2_j^2)/(b*k*(k+1)) - 3b(k+1) in milli with per-term
    truncating division. Blocking removes the user's own volume level —
    the repeated-measures complement of kruskal_wallis_by_priority
    (independent groups) and the k-sample big brother of
    wilcoxon_signed_rank. Scale shape: one pivoted per-user rollup
    (conditional sums, no join), rank algebra row-local, one 1-row agg."""
    ev = _t(spark, sf_dir, "events").filter(
        F.to_date("ts") < F.lit("2024-01-29").cast("date")
    )
    wkcol = F.expr(
        "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7 AS INT)"
    )
    wk = ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(wkcol == j, 1).otherwise(0)).alias(f"v{j}")
            for j in range(4)
        ]
    )

    def r2(j: int) -> str:
        less = " + ".join(
            f"(CASE WHEN v{i} < v{j} THEN 1 ELSE 0 END)"
            for i in range(4)
            if i != j
        )
        eq = " + ".join(
            f"(CASE WHEN v{i} = v{j} THEN 1 ELSE 0 END)"
            for i in range(4)
            if i != j
        )
        return f"2 * ({less}) + 1 + ({eq}) + 1"

    ranks = wk.select(
        *[F.expr(r2(j)).alias(f"r{j}") for j in range(4)]
    )
    sums = ranks.agg(
        F.count(F.lit(1)).alias("b"),
        *[F.sum(f"r{j}").cast("decimal(38,0)").alias(f"s{j}") for j in range(4)],
    )
    stat = " + ".join(
        f"(s{j} * s{j} * 3000) div (b * 4 * 5)" for j in range(4)
    )
    weeks = spark.range(4).select(F.col("id").cast("int").alias("week"))
    return (
        F.broadcast(weeks)
        .crossJoin(F.broadcast(sums))
        .select(
            "week",
            F.col("b").cast("long").alias("n_blocks"),
            F.expr(
                "CAST(CASE week WHEN 0 THEN s0 WHEN 1 THEN s1"
                " WHEN 2 THEN s2 ELSE s3 END AS BIGINT)"
            ).alias("r2_sum"),
            F.expr(f"CAST(({stat}) - 3000 * b * 5 AS BIGINT)").alias(
                "friedman_milli"
            ),
        )
        .orderBy("week")
    )


_PAGES_ORACLE = (
    _FRIEDMAN_CTE
    + """
SELECT CAST(s.b AS BIGINT) AS n_blocks,
       CAST(1 * s.s0 + 2 * s.s1 + 3 * s.s2 + 4 * s.s3 AS BIGINT) AS l2,
       CAST(s.b * 4 * 25 // 2 AS BIGINT) AS e_l2,
       CAST(CASE WHEN 1 * s.s0 + 2 * s.s1 + 3 * s.s2 + 4 * s.s3
                      > s.b * 4 * 25 // 2 THEN 1
                 WHEN 1 * s.s0 + 2 * s.s1 + 3 * s.s2 + 4 * s.s3
                      < s.b * 4 * 25 // 2 THEN -1
                 ELSE 0 END AS BIGINT) AS trend_sign
FROM sums s
"""
)


@_register("pages_l_trend_test", _PAGES_ORACLE)
def pages_l_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for a MONOTONE ordered alternative across the 4
    January weeks within user blocks: L = sum_j j*R_j on the same
    doubled-midrank lanes as friedman_test_weeks (L2 = 2L integral),
    against the exact null expectation E[L2] = b*k(k+1)^2/2. Friedman
    asks 'any difference?'; Page asks 'is volume trending up
    week-over-week?' — much more powerful when the alternative is
    ordered (the within-block analog of jonckheere_terpstra_trend).
    Scale shape: identical single rollup + 1-row algebra."""
    ev = _t(spark, sf_dir, "events").filter(
        F.to_date("ts") < F.lit("2024-01-29").cast("date")
    )
    wkcol = F.expr(
        "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7 AS INT)"
    )
    wk = ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(wkcol == j, 1).otherwise(0)).alias(f"v{j}")
            for j in range(4)
        ]
    )

    def r2(j: int) -> str:
        less = " + ".join(
            f"(CASE WHEN v{i} < v{j} THEN 1 ELSE 0 END)"
            for i in range(4)
            if i != j
        )
        eq = " + ".join(
            f"(CASE WHEN v{i} = v{j} THEN 1 ELSE 0 END)"
            for i in range(4)
            if i != j
        )
        return f"2 * ({less}) + 1 + ({eq}) + 1"

    ranks = wk.select(*[F.expr(r2(j)).alias(f"r{j}") for j in range(4)])
    sums = ranks.agg(
        F.count(F.lit(1)).alias("b"),
        *[F.sum(f"r{j}").alias(f"s{j}") for j in range(4)],
    )
    l2 = "1 * s0 + 2 * s1 + 3 * s2 + 4 * s3"
    el2 = "(b * 4 * 25) div 2"
    return sums.select(
        F.col("b").cast("long").alias("n_blocks"),
        F.expr(f"CAST({l2} AS BIGINT)").alias("l2"),
        F.expr(f"CAST({el2} AS BIGINT)").alias("e_l2"),
        F.expr(
            f"CAST(CASE WHEN {l2} > {el2} THEN 1"
            f" WHEN {l2} < {el2} THEN -1 ELSE 0 END AS BIGINT)"
        ).alias("trend_sign"),
    )


_RUNS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY 1
),
med AS (
  SELECT CASE WHEN count(*) % 2 = 1
              THEN 2 * (list_sort(list(y)))[(count(*) + 1) // 2]
              ELSE (list_sort(list(y)))[count(*) // 2]
                 + (list_sort(list(y)))[count(*) // 2 + 1] END AS med2
  FROM daily
),
signs AS (
  SELECT d, CASE WHEN 2 * y > m.med2 THEN 1 ELSE 0 END AS s
  FROM daily, med m
  WHERE 2 * y <> m.med2
),
flips AS (
  SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS NOT NULL
                  AND lag(s) OVER (ORDER BY d) <> s
             THEN 1 ELSE 0 END AS flip
  FROM signs
)
SELECT CAST(sum(s) AS BIGINT) AS n_above,
       CAST(sum(1 - s) AS BIGINT) AS n_below,
       CAST(1 + sum(flip) AS BIGINT) AS n_runs,
       CAST(1000 + 2000 * CAST(sum(s) AS HUGEINT) * sum(1 - s)
            // (sum(s) + sum(1 - s)) AS BIGINT) AS e_runs_milli,
       CAST(CASE WHEN (1 + sum(flip)) * (sum(s) + sum(1 - s)) * 1000
                      > 1000 * (sum(s) + sum(1 - s))
                        + 2000 * CAST(sum(s) AS HUGEINT) * sum(1 - s)
                 THEN 1
                 WHEN (1 + sum(flip)) * (sum(s) + sum(1 - s)) * 1000
                      < 1000 * (sum(s) + sum(1 - s))
                        + 2000 * CAST(sum(s) AS HUGEINT) * sum(1 - s)
                 THEN -1 ELSE 0 END AS BIGINT) AS vs_expected
FROM flips
"""


@_register("runs_test_median", _RUNS_ORACLE)
def runs_test_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily order revenue: code each day
    above/below the doubled-median (exact order statistic; exact-median
    days excluded per the classical recipe), count runs of consecutive
    equal signs, and compare against the exact null mean E[R] = 1 +
    2*n1*n2/(n1+n2) — too FEW runs means positive day-over-day
    dependence, too many means oscillation. The sign-pattern randomness
    screen beside autocorrelation_lag_k (which needs a linear model of
    dependence; runs are distribution-free). The comparison is done on
    cross-multiplied integer lanes, no division at all. Scale shape:
    calendar-bounded daily frame, one array median, one lag window."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(_cents("o_totalprice")).alias("y"))
        .localCheckpoint(eager=False)
    )
    med = daily.agg(
        F.expr(
            "CASE WHEN count(*) % 2 = 1"
            " THEN 2 * element_at(sort_array(collect_list(y)),"
            "        CAST((count(*) + 1) div 2 AS INT))"
            " ELSE element_at(sort_array(collect_list(y)),"
            "        CAST(count(*) div 2 AS INT))"
            "    + element_at(sort_array(collect_list(y)),"
            "        CAST(count(*) div 2 + 1 AS INT)) END"
        ).alias("med2")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.expr("2 * y <> med2"))
        .select("d", F.expr("CASE WHEN 2 * y > med2 THEN 1 ELSE 0 END").alias("s"))
    )
    wlag = W.orderBy("d")
    flips = signs.select(
        "s",
        F.expr(
            "CASE WHEN lag(s) OVER (ORDER BY d) IS NOT NULL"
            " AND lag(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END"
        ).alias("flip"),
    )
    runs = "(1 + sum(flip))"
    n1 = "sum(s)"
    n2 = "sum(1 - s)"
    lhs = f"{runs} * ({n1} + {n2}) * 1000"
    rhs = f"1000 * ({n1} + {n2}) + 2000 * CAST({n1} AS DECIMAL(38,0)) * {n2}"
    return flips.agg(
        F.expr(f"CAST({n1} AS BIGINT)").alias("n_above"),
        F.expr(f"CAST({n2} AS BIGINT)").alias("n_below"),
        F.expr(f"CAST({runs} AS BIGINT)").alias("n_runs"),
        F.expr(
            f"CAST(1000 + (2000 * CAST({n1} AS DECIMAL(38,0)) * {n2})"
            f" div ({n1} + {n2}) AS BIGINT)"
        ).alias("e_runs_milli"),
        F.expr(
            f"CAST(CASE WHEN {lhs} > {rhs} THEN 1"
            f" WHEN {lhs} < {rhs} THEN -1 ELSE 0 END AS BIGINT)"
        ).alias("vs_expected"),
    )


_TURNING_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY 1
),
tp AS (
  SELECT CASE WHEN y > lag(y) OVER w AND y > lead(y) OVER w THEN 1
              WHEN y < lag(y) OVER w AND y < lead(y) OVER w THEN 1
              ELSE 0 END AS is_turn
  FROM daily
  WINDOW w AS (ORDER BY d)
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(is_turn) AS BIGINT) AS n_turning,
       CAST(2000 * (count(*) - 2) // 3 AS BIGINT) AS e_turning_milli,
       CAST(sum(is_turn) * 3000000 // (2 * (count(*) - 2)) AS BIGINT)
         AS ratio_ppm
FROM tp
"""


@_register("turning_points_randomness", _TURNING_ORACLE)
def turning_points_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test on daily order revenue: count
    strict local peaks and troughs; under iid the expectation is EXACTLY
    2(n-2)/3 (any 3 distinct consecutive values turn in 4 of their 6
    orderings). ratio_ppm ~ 1e6 says noise; well below says smooth
    trend/seasonality; above says alternation. Runs (runs_test_median)
    see level persistence; turning points see local shape — the two
    classical complements run on the same calendar-bounded frame.
    Exact integers throughout (cents ties break strictness
    deterministically on both engines). Scale shape: daily rollup + one
    3-row window pass."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(_cents("o_totalprice")).alias("y"))
    )
    tp = daily.select(
        F.expr(
            "CASE WHEN y > lag(y) OVER (ORDER BY d)"
            " AND y > lead(y) OVER (ORDER BY d) THEN 1"
            " WHEN y < lag(y) OVER (ORDER BY d)"
            " AND y < lead(y) OVER (ORDER BY d) THEN 1 ELSE 0 END"
        ).alias("is_turn")
    )
    return tp.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("is_turn").cast("long").alias("n_turning"),
        F.expr("CAST((2000 * (count(*) - 2)) div 3 AS BIGINT)").alias(
            "e_turning_milli"
        ),
        F.expr(
            "CAST((sum(is_turn) * 3000000) div (2 * (count(*) - 2))"
            " AS BIGINT)"
        ).alias("ratio_ppm"),
    )


_DW_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
  FROM events GROUP BY 1
),
xy AS (
  SELECT y, row_number() OVER (ORDER BY d) AS x, d FROM daily
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM xy
),
resid AS (
  SELECT xy.d,
         (s.n * s.sxx - s.sx * s.sx) * CAST(xy.y AS HUGEINT)
         - (s.sy * s.sxx - s.sx * s.sxy)
         - (s.n * s.sxy - s.sx * s.sy) * xy.x AS ed
  FROM xy, s
),
diffs AS (
  SELECT ed, ed - lag(ed) OVER (ORDER BY d) AS de
  FROM resid
)
SELECT (SELECT CAST(n AS BIGINT) FROM s) AS n_days,
       CAST(sum(de * de) FILTER (WHERE de IS NOT NULL) * 1000
            // sum(ed * ed) AS BIGINT) AS dw_milli
FROM diffs
"""


@_register("durbin_watson_daily", _DW_ORACLE)
def durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson autocorrelation statistic on the residuals of the
    daily-purchase-revenue-vs-time OLS line, fully exact: scaling every
    residual by the common OLS denominator D = n*Sxx - Sx^2 makes
    e_i*D = D*y_i - aD - bD*x_i an INTEGER, and DW = sum(diff^2) /
    sum(e^2) is invariant to that scaling — one 128-bit division to
    milli (DW ~ 2 means no lag-1 autocorrelation; <1 positive; >3
    negative). The residual-level check that regression_trend_aggregates'
    fit is trustworthy, sharper than autocorrelation_lag_k because it
    detrends FIRST. Scale shape: calendar-bounded daily frame; one
    1-row sum agg broadcast back; one lag window."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", _cents("value")).otherwise(
                    0
                )
            ).alias("y")
        )
    )
    xy = daily.select(
        "d", "y", F.row_number().over(W.orderBy("d")).alias("x")
    ).localCheckpoint(eager=False)
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    resid = xy.crossJoin(F.broadcast(s)).select(
        "d",
        F.expr(
            "(n * sxx - sx * sx) * CAST(y AS DECIMAL(38,0))"
            " - (sy * sxx - sx * sxy) - (n * sxy - sx * sy) * x"
        ).alias("ed"),
        "n",
    )
    diffs = resid.select(
        "n",
        "ed",
        (F.col("ed") - F.lag("ed").over(W.orderBy("d"))).alias("de"),
    )
    return diffs.agg(
        F.max("n").cast("long").alias("n_days"),
        F.expr(
            "CAST((sum(CASE WHEN de IS NOT NULL THEN de * de END) * 1000)"
            " div sum(ed * ed) AS BIGINT)"
        ).alias("dw_milli"),
    )


# ===========================================================================
# Wave 4: queueing, privacy, inequality curve, forecast eval, panel FE
# ===========================================================================

_ERLANG_C_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT epoch_us(ts) AS t, CAST(round(value * 1000) AS BIGINT) AS s
  FROM events
),
seq AS (SELECT t, s, lag(t) OVER (ORDER BY t, s) AS pt FROM ev),
load_est AS (
  SELECT CAST((SELECT CAST(sum(s) AS HUGEINT) FROM ev) * 1000 * 1000000
              // (SELECT sum(t - pt) FROM seq WHERE pt IS NOT NULL)
              AS BIGINT) AS rho_ppm
),
erlang AS (
  SELECT CAST(0 AS BIGINT) AS k, CAST(1000000 AS BIGINT) AS b_ppm,
         rho_ppm
  FROM load_est
  UNION ALL
  SELECT k + 1,
         CAST((rho_ppm * b_ppm // 1000000) * 1000000
              // ((k + 1) * 1000000 + rho_ppm * b_ppm // 1000000)
              AS BIGINT),
         rho_ppm
  FROM erlang WHERE k < 10
)
SELECT k AS n_servers, rho_ppm AS offered_load_ppm, b_ppm AS erlang_b_ppm,
       CAST(CAST(b_ppm AS HUGEINT) * k * 1000000 * 1000000
            // (CAST(k AS HUGEINT) * 1000000 * 1000000
                - CAST(rho_ppm AS HUGEINT) * (1000000 - b_ppm))
            AS BIGINT) AS erlang_c_wait_ppm
FROM erlang
WHERE k >= 1 AND CAST(k AS HUGEINT) * 1000000 > rho_ppm
ORDER BY n_servers
"""


@_register("erlang_c_wait_probability", _ERLANG_C_ORACLE)
def erlang_c_wait_probability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C probability-of-waiting, derived from the Erlang-B
    recursion via the exact identity C = B*c / (c - rho*(1-B)) — in ppm
    lanes: C_ppm = B*c*1e6 // (c*1e12 - rho_ppm*(1e6 - B_ppm)), one
    128-bit division per (stable) server count c > rho. Erlang-B models
    blocked-calls-LOST (trunks); Erlang-C models blocked-calls-QUEUED
    (worker pools, call centers) — together with kingman_queue_estimate
    they are the complete classical sizing toolkit. Only stable rows
    (c > offered load) are emitted. Scale shape: identical to
    erlang_b_blocking — the summed inter-arrival gap TELESCOPES to
    max(t) - min(t) (the oracle's ordered-lag sum is the semantic
    spec), so no global-order window at all; two mergeable sums feed a
    constant-size fold."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("s"),
    ).localCheckpoint(eager=False)
    tot_gap = ev.agg(
        F.expr("CAST(max(t) - min(t) AS BIGINT)").alias("ga")
    )
    tot_s = ev.agg(F.expr("CAST(sum(s) AS BIGINT)").alias("ss"))
    rho = tot_s.crossJoin(F.broadcast(tot_gap)).select(
        F.expr(
            "CAST(CAST(ss AS DECIMAL(38,0)) * 1000 * 1000000 div ga"
            " AS BIGINT)"
        ).alias("rho_ppm")
    )
    fold = rho.select(
        "rho_ppm",
        F.expr(
            "aggregate(sequence(1, 10),"
            " named_struct('b', CAST(1000000 AS BIGINT),"
            " 'traj', CAST(array() AS ARRAY<BIGINT>)),"
            " (acc, k) -> named_struct("
            "'b', CAST((rho_ppm * acc.b div 1000000) * 1000000"
            " div (k * 1000000 + rho_ppm * acc.b div 1000000) AS BIGINT),"
            "'traj', concat(acc.traj,"
            " array(CAST((rho_ppm * acc.b div 1000000) * 1000000"
            " div (k * 1000000 + rho_ppm * acc.b div 1000000)"
            " AS BIGINT)))),"
            " acc -> acc.traj)"
        ).alias("traj"),
    )
    rows = fold.select(
        "rho_ppm", F.posexplode("traj").alias("k0", "b_ppm")
    ).select(
        F.expr("CAST(k0 + 1 AS BIGINT)").alias("n_servers"),
        F.col("rho_ppm").alias("offered_load_ppm"),
        F.col("b_ppm").alias("erlang_b_ppm"),
    )
    return (
        rows.filter(
            F.expr("CAST(n_servers AS DECIMAL(38,0)) * 1000000 > offered_load_ppm")
        )
        .select(
            "n_servers",
            "offered_load_ppm",
            "erlang_b_ppm",
            F.expr(
                "CAST((CAST(erlang_b_ppm AS DECIMAL(38,0)) * n_servers"
                " * 1000000 * 1000000)"
                " div (CAST(n_servers AS DECIMAL(38,0)) * 1000000 * 1000000"
                "      - CAST(offered_load_ppm AS DECIMAL(38,0))"
                "        * (1000000 - erlang_b_ppm)) AS BIGINT)"
            ).alias("erlang_c_wait_ppm"),
        )
        .orderBy("n_servers")
    )


_LDIV_ORACLE = """
WITH q AS (
  SELECT c_nationkey AS nation,
         CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
         c_mktsegment AS sens
  FROM customer
),
cls AS (
  SELECT nation, bal_band,
         CAST(sum(cnt) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS l_distinct,
         CAST(max(cnt) AS BIGINT) AS max_sens
  FROM (SELECT nation, bal_band, sens, count(*) AS cnt
        FROM q GROUP BY 1, 2, 3) x
  GROUP BY nation, bal_band
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_distinct < 2 THEN n ELSE 0 END) AS BIGINT)
         AS rows_failing_l2,
       CAST(sum(CASE WHEN l_distinct < 3 THEN n ELSE 0 END) AS BIGINT)
         AS rows_failing_l3,
       CAST(min(l_distinct) AS BIGINT) AS min_l,
       CAST(max(max_sens * 1000000 // n) AS BIGINT)
         AS worst_disclosure_ppm
FROM cls
"""


@_register("ldiversity_audit", _LDIV_ORACLE)
def ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al.) completing the privacy
    triad with kanonymity_risk_audit (class sizes) and
    tcloseness_emd_audit (distributional distance): within each
    quasi-identifier class (nation x balance band), how many DISTINCT
    values of the sensitive attribute (market segment) appear? A class
    can be k-anonymous yet expose everyone if all its members share one
    segment — rows_failing_l2 counts exactly those, and
    worst_disclosure_ppm is the best attribute-inference rate an
    attacker gets (max single-segment share in any class). Exact
    integers throughout. Scale shape: two stacked hash aggs on the QI
    key, one 1-row rollup."""
    q = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.expr(
            "CAST(round(c_acctbal * 100) AS BIGINT) div 100000"
        ).alias("bal_band"),
        F.col("c_mktsegment").alias("sens"),
    )
    per_sens = q.groupBy("nation", "bal_band", "sens").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cls = per_sens.groupBy("nation", "bal_band").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("l_distinct"),
        F.max("cnt").alias("max_sens"),
    )
    return cls.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("l_distinct") < 2, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_failing_l2"),
        F.sum(F.when(F.col("l_distinct") < 3, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_failing_l3"),
        F.min("l_distinct").cast("long").alias("min_l"),
        F.max(F.expr("(max_sens * 1000000) div n"))
        .cast("long")
        .alias("worst_disclosure_ppm"),
    )


_LORENZ_ORACLE = """
WITH spend AS (
  SELECT c.c_custkey,
         coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
ranked AS (
  SELECT y, row_number() OVER (ORDER BY y, c_custkey) AS r,
         count(*) OVER () AS n,
         sum(CAST(y AS HUGEINT)) OVER (ORDER BY y, c_custkey) AS cum,
         sum(CAST(y AS HUGEINT)) OVER () AS total
  FROM spend
),
dec AS (
  SELECT CAST(r * 10 // n AS BIGINT) AS decile_reached, cum, total
  FROM ranked
  WHERE r = (r * 10 // n) * n // 10  -- r == floor(k*n/10) boundaries
),
pts AS (
  SELECT decile_reached AS decile,
         CAST(max(cum) * 1000000 // max(total) AS BIGINT) AS lorenz_ppm
  FROM dec
  WHERE decile_reached BETWEEN 1 AND 10
  GROUP BY decile_reached
),
withprev AS (
  SELECT lorenz_ppm,
         coalesce(lag(lorenz_ppm) OVER (ORDER BY decile), 0) AS prev
  FROM pts
),
gini AS (
  SELECT CAST(1000000 - sum(lorenz_ppm + prev) // 10 AS BIGINT) AS gini_ppm
  FROM withprev
)
SELECT p.decile, p.lorenz_ppm, g.gini_ppm
FROM pts p, gini g
ORDER BY p.decile
"""


@_register("lorenz_curve_deciles", _LORENZ_ORACLE)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer lifetime spend sampled at the 10 decile
    boundaries (exact rank cutoffs r = floor(k*n/10)), plus the Gini
    coefficient by trapezoid rule over those points — the CURVE the
    scalar inequality indices summarize (gini_concentration_by_segment
    integrates it exactly; quintile_share_ratio reads two points of it;
    this entry exposes the whole shape so you can SEE where inequality
    lives). All cumulative sums are integers; each Lorenz ordinate is
    one exact division. Scale shape: one rollup, then rank + prefix
    sums via tiered_global_rank over contiguous 4194304-cent (~$42k)
    spend bands (cumsum on a DECIMAL(38,0) lane; band width chosen so
    the offsets frame is bounded by range/width, not customer count);
    the boundary filter keeps 10 rows."""
    spend = (
        _t(spark, sf_dir, "customer")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum(_cents("o_totalprice")), F.lit(0)).alias("y"))
    )
    spend2 = spend.select(
        "c_custkey", "y", F.col("y").cast("decimal(38,0)").alias("yd")
    )
    ranked = tiered_global_rank(
        spend2,
        F.expr("y div 4194304"),
        ["y", "c_custkey"],
        rank_name="r",
        total_name="n",
        cumsum={"yd": "cum"},
        totals={"yd": "total"},
    ).select("r", "n", "cum", "total")
    pts = (
        ranked.filter(
            F.expr("r = ((r * 10) div n) * n div 10")
            & F.expr("(r * 10) div n BETWEEN 1 AND 10")
        )
        .groupBy(F.expr("CAST((r * 10) div n AS BIGINT)").alias("decile"))
        .agg(
            F.expr(
                "CAST((max(cum) * 1000000) div max(total) AS BIGINT)"
            ).alias("lorenz_ppm")
        )
        .localCheckpoint(eager=False)
    )
    gini = pts.select(
        "lorenz_ppm",
        F.coalesce(
            F.lag("lorenz_ppm").over(W.orderBy("decile")), F.lit(0)
        ).alias("prev"),
    ).agg(
        F.expr(
            "CAST(1000000 - sum(lorenz_ppm + prev) div 10 AS BIGINT)"
        ).alias("gini_ppm")
    )
    return (
        pts.crossJoin(F.broadcast(gini))
        .select("decile", "lorenz_ppm", "gini_ppm")
        .orderBy("decile")
    )


_MASE_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, d, y,
         lag(y, 7) OVER (PARTITION BY event_type ORDER BY d) AS y7,
         lag(y, 1) OVER (PARTITION BY event_type ORDER BY d) AS y1
  FROM daily
),
agg AS (
  SELECT event_type,
         count(y7) AS n_s,
         sum(abs(y - y7)) FILTER (WHERE y7 IS NOT NULL) AS sae_s,
         count(y1) AS n_n,
         sum(abs(y - y1)) FILTER (WHERE y1 IS NOT NULL) AS sae_n
  FROM lagged GROUP BY event_type
)
SELECT event_type,
       CAST(n_s AS BIGINT) AS n_forecasts,
       CAST(sae_s AS BIGINT) AS seasonal_abs_err,
       CAST(sae_n AS BIGINT) AS naive_abs_err,
       CAST(CAST(sae_s AS HUGEINT) * n_n * 1000
            // (CAST(sae_n AS HUGEINT) * n_s) AS BIGINT) AS mase_milli
FROM agg
ORDER BY event_type
"""


@_register("mase_forecast_eval", _MASE_ORACLE)
def mase_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (mean absolute scaled error, Hyndman & Koehler 2006) for the
    seasonal-naive weekly forecast of daily event counts, scaled by the
    one-step naive benchmark: MASE = mean|y - y_{t-7}| / mean|y - y_{t-1}|
    as ONE cross-multiplied exact division — under 1000 milli means the
    weekly pattern beats persistence, the unit-free, scale-free answer
    to 'is this forecast any good?' that MAPE can't give on
    zero-crossing series. Completes the eval side of
    seasonal_naive_forecast_eval (which reports raw errors) and
    pinball_loss_quantile_eval (quantile forecasts). Exact integers;
    one window pass on the calendar-bounded frame."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = W.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "y",
        F.lag("y", 7).over(w).alias("y7"),
        F.lag("y", 1).over(w).alias("y1"),
    )
    agg = lagged.groupBy("event_type").agg(
        F.count("y7").alias("n_s"),
        F.sum(
            F.when(F.col("y7").isNotNull(), F.abs(F.col("y") - F.col("y7")))
        ).alias("sae_s"),
        F.count("y1").alias("n_n"),
        F.sum(
            F.when(F.col("y1").isNotNull(), F.abs(F.col("y") - F.col("y1")))
        ).alias("sae_n"),
    )
    return agg.select(
        "event_type",
        F.col("n_s").cast("long").alias("n_forecasts"),
        F.col("sae_s").cast("long").alias("seasonal_abs_err"),
        F.col("sae_n").cast("long").alias("naive_abs_err"),
        F.expr(
            "CAST((CAST(sae_s AS DECIMAL(38,0)) * n_n * 1000)"
            " div (CAST(sae_n AS DECIMAL(38,0)) * n_s) AS BIGINT)"
        ).alias("mase_milli"),
    ).orderBy("event_type")


_CONFUSION_ORACLE = """
WITH scored AS (
  SELECT CASE WHEN n_chars > 250 THEN 1 ELSE 0 END AS pred,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents
),
cm AS (
  SELECT sum(pred * label) AS tp,
         sum(pred * (1 - label)) AS fp,
         sum((1 - pred) * label) AS fn,
         sum((1 - pred) * (1 - label)) AS tn
  FROM scored
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CAST(tp * 1000 // (tp + fp) AS BIGINT) AS precision_milli,
       CAST(tp * 1000 // (tp + fn) AS BIGINT) AS recall_milli,
       CAST(2 * tp * 1000 // (2 * tp + fp + fn) AS BIGINT) AS f1_milli,
       CAST((CAST(tp AS HUGEINT) * 1000000 // (tp + fn)
             + CAST(tn AS HUGEINT) * 1000000 // (tn + fp)) // 2
            AS BIGINT) AS balanced_accuracy_ppm
FROM cm
"""


@_register("confusion_matrix_metrics", _CONFUSION_ORACLE)
def confusion_matrix_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full confusion-matrix metric set for the fixed-threshold
    'length > 250 predicts English' classifier: TP/FP/FN/TN plus
    precision, recall, F1 = 2TP/(2TP+FP+FN) (the harmonic mean
    simplifies to one exact division) and balanced accuracy
    (TPR+TNR)/2, which unlike raw accuracy survives the 44/56 class
    skew. The threshold-FIXED companion of roc_curve_points (all
    thresholds) and cost_threshold_optimization (best threshold):
    together they are the complete decision-quality kit. One conditional
    aggregate over the scan; everything after is 1-row algebra."""
    scored = _t(spark, sf_dir, "documents").select(
        F.when(F.col("n_chars") > 250, 1).otherwise(0).alias("pred"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    cm = scored.agg(
        F.sum(F.col("pred") * F.col("label")).alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("label"))).alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("label")).alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("label"))).alias("tn"),
    )
    return cm.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.expr("CAST((tp * 1000) div (tp + fp) AS BIGINT)").alias(
            "precision_milli"
        ),
        F.expr("CAST((tp * 1000) div (tp + fn) AS BIGINT)").alias(
            "recall_milli"
        ),
        F.expr(
            "CAST((2 * tp * 1000) div (2 * tp + fp + fn) AS BIGINT)"
        ).alias("f1_milli"),
        F.expr(
            "CAST(((CAST(tp AS DECIMAL(38,0)) * 1000000) div (tp + fn)"
            " + (CAST(tn AS DECIMAL(38,0)) * 1000000) div (tn + fp)) div 2"
            " AS BIGINT)"
        ).alias("balanced_accuracy_ppm"),
    )


_FE_ORACLE = """
WITH months AS (
  SELECT DISTINCT date_trunc('month', o_orderdate) AS mo FROM orders
),
panel AS (
  SELECT c.c_custkey, m.mo,
         coalesce(p.x, 0) AS x, coalesce(p.y, 0) AS y
  FROM customer c
  CROSS JOIN months m
  LEFT JOIN (
    SELECT o_custkey, date_trunc('month', o_orderdate) AS mo,
           count(*) AS x,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
    FROM orders GROUP BY 1, 2
  ) p ON p.o_custkey = c.c_custkey AND p.mo = m.mo
),
per AS (
  SELECT c_custkey,
         count(*) AS m,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM panel GROUP BY 1
),
fe AS (
  SELECT max(m) AS m,
         sum(m * sxy - sx * sy) AS a,
         sum(m * sxx - sx * sx) AS b,
         count(*) AS n_entities
  FROM per
)
SELECT CAST(n_entities AS BIGINT) AS n_entities,
       CAST(m AS BIGINT) AS n_periods,
       CAST(1000 * a // b AS BIGINT) AS fe_slope_milli_cents_per_order,
       CAST(a // 1000000 AS BIGINT) AS demeaned_cov_millions,
       CAST(b AS BIGINT) AS demeaned_var_x
FROM fe
"""


@_register("fixed_effects_within_estimator", _FE_ORACLE)
def fixed_effects_within_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Panel fixed-effects (within) estimator of spend-per-order on the
    customer x month panel: demeaning each customer's series removes
    every time-invariant customer effect, and on a BALANCED panel
    (dense customer x month spine, zero-filled) the within slope is
    sum_i(M*Sxy_i - Sx_i*Sy_i) / sum_i(M*Sxx_i - Sx_i^2) — the common
    M makes it ONE exact division, no per-group flooring (the reason
    the spine is dense). The causal-panel sibling of
    difference_in_differences (2 groups x 2 periods) generalized to
    all entities and periods. Scale shape: one rollup, one dense-spine
    left join (customers x months — linear in customers), one 1-row
    combine."""
    orders = _t(spark, sf_dir, "orders")
    months = orders.select(
        F.date_trunc("month", "o_orderdate").alias("spine_mo")
    ).distinct()
    per_cm = orders.groupBy(
        F.col("o_custkey"), F.date_trunc("month", "o_orderdate").alias("cm_mo")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(_cents("o_totalprice")).alias("y"),
    )
    panel = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey")
        .crossJoin(F.broadcast(months))
        .join(
            per_cm,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("cm_mo") == F.col("spine_mo")),
            "left",
        )
        .select(
            "c_custkey",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    per = panel.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    fe = per.agg(
        F.max("m").alias("m"),
        F.sum(
            F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
        ).alias("a"),
        F.sum(
            F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
        ).alias("b"),
        F.count(F.lit(1)).alias("n_entities"),
    )
    return fe.select(
        F.col("n_entities").cast("long").alias("n_entities"),
        F.col("m").cast("long").alias("n_periods"),
        F.expr("CAST((1000 * a) div b AS BIGINT)").alias(
            "fe_slope_milli_cents_per_order"
        ),
        F.expr("CAST(a div 1000000 AS BIGINT)").alias(
            "demeaned_cov_millions"
        ),
        F.col("b").cast("long").alias("demeaned_var_x"),
    )


_HOLM_LADDER = [9550, 9475, 9397, 9315, 9230, 9141, 9047, 8948, 8844,
                8733, 8615, 8490, 8355, 8210, 8052, 7879, 7689, 7477,
                7237, 6960, 6635, 6239, 5731, 5024, 3841]

_HOLM_ORACLE = f"""
WITH lab AS (
  SELECT n.n_name,
         CAST(count(*) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS y1
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n1) AS BIGINT) AS nn, CAST(sum(y1) AS BIGINT) AS yy
  FROM lab
),
z AS (
  SELECT l.n_name, l.n1, l.y1,
         CAST(CAST(l.y1 * (t.nn - l.n1) - (t.yy - l.y1) * l.n1 AS HUGEINT)
              * (l.y1 * (t.nn - l.n1) - (t.yy - l.y1) * l.n1)
              * t.nn * 1000
              // (CAST(l.n1 AS HUGEINT) * (t.nn - l.n1) * t.yy
                  * (t.nn - t.yy)) AS BIGINT) AS z2_milli
  FROM lab l CROSS JOIN tot t
),
rk AS (
  SELECT n_name, n1, y1, z2_milli,
         CAST(row_number() OVER (ORDER BY z2_milli DESC, n_name) AS BIGINT)
           AS rank
  FROM z
),
crit AS (
  SELECT *, ({_HOLM_LADDER})[rank] AS holm_critical_milli
  FROM rk
),
stopper AS (
  SELECT coalesce(min(CASE WHEN z2_milli < holm_critical_milli
                           THEN rank END), 26) AS stop_rank
  FROM crit
)
SELECT c.n_name, c.n1, c.y1, c.z2_milli, c.rank, c.holm_critical_milli,
       CAST(CASE WHEN c.rank < s.stop_rank THEN 1 ELSE 0 END AS BIGINT)
         AS rejected
FROM crit c CROSS JOIN stopper s
ORDER BY c.rank
"""


@_register("holm_bonferroni_screen", _HOLM_ORACLE)
def holm_bonferroni_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-DOWN multiple-testing control over the same 25
    per-nation urgency chi-squares as fdr_bh_screen: hypotheses sorted
    most-significant first must clear a/(m-i+1) IN ORDER, and the first
    failure stops everything after it (BH steps UP and controls FDR;
    Holm controls the stricter familywise error with no independence
    assumption — run both and the gap is the price of FWER). The
    critical ladder is 25 shared chi2(1df) constants in milli; the
    stop rank is one MIN aggregate; everything else rides the exact
    z2 integer lanes. Scale shape: one join-agg to 25 rows, constant
    algebra after."""
    lab = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("y1"),
        )
        .localCheckpoint(eager=False)
    )
    tot = lab.agg(F.sum("n1").alias("nn"), F.sum("y1").alias("yy"))
    num = "(y1 * (nn - n1) - (yy - y1) * n1)"
    z = lab.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "n1",
        "y1",
        F.expr(
            f"CAST((CAST({num} AS DECIMAL(38,0)) * {num} * nn * 1000)"
            " div (CAST(n1 AS DECIMAL(38,0)) * (nn - n1) * yy * (nn - yy))"
            " AS BIGINT)"
        ).alias("z2_milli"),
    )
    ladder = ", ".join(str(v) for v in _HOLM_LADDER)
    crit = z.select(
        "*",
        F.expr(
            "CAST(row_number() OVER (ORDER BY z2_milli DESC, n_name)"
            " AS BIGINT)"
        ).alias("rank"),
    ).select(
        "*",
        F.expr(
            f"element_at(array({ladder}), CAST(rank AS INT))"
        ).alias("holm_critical_milli"),
    ).localCheckpoint(eager=False)
    stopper = crit.agg(
        F.coalesce(
            F.min(
                F.when(
                    F.col("z2_milli") < F.col("holm_critical_milli"),
                    F.col("rank"),
                )
            ),
            F.lit(26),
        ).alias("stop_rank")
    )
    return (
        crit.crossJoin(F.broadcast(stopper))
        .select(
            "n_name",
            "n1",
            "y1",
            "z2_milli",
            "rank",
            F.col("holm_critical_milli").cast("long").alias(
                "holm_critical_milli"
            ),
            F.expr(
                "CAST(CASE WHEN rank < stop_rank THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("rejected"),
        )
        .orderBy("rank")
    )


# ===========================================================================
# Wave 6 (final): PR curve, effect size, odds ratios
# ===========================================================================

_PR_CURVE_ORACLE = """
WITH scored AS (
  SELECT n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
tot AS (SELECT sum(pos) AS p, count(*) AS n FROM scored),
dv AS (
  SELECT score, sum(pos) AS cp, count(*) AS t
  FROM scored GROUP BY score
),
cum AS (
  SELECT score,
         sum(t) OVER (ORDER BY score) AS c_le,
         sum(cp) OVER (ORDER BY score) AS p_le
  FROM dv
),
deciles AS (SELECT unnest(range(1, 10)) AS decile),
thr AS (
  SELECT d.decile, min(c.score) AS threshold
  FROM deciles d, tot, cum c
  WHERE c.c_le >= (d.decile * tot.n + 9) // 10
  GROUP BY d.decile
)
SELECT t.decile, t.threshold,
       CAST(o.p - c.p_le AS BIGINT) AS tp,
       CAST(o.n - c.c_le AS BIGINT) AS n_predicted_pos,
       CAST((o.p - c.p_le) * 1000000 // (o.n - c.c_le) AS BIGINT)
         AS precision_ppm,
       CAST((o.p - c.p_le) * 1000000 // o.p AS BIGINT) AS recall_ppm
FROM thr t
JOIN cum c ON c.score = t.threshold
CROSS JOIN tot o
WHERE o.n > c.c_le
ORDER BY t.decile
"""


@_register("pr_curve_points", _PR_CURVE_ORACLE)
def pr_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall operating points at the same score-decile
    thresholds as roc_curve_points — the view that matters under class
    imbalance, where ROC flatters (FPR's denominator is the big
    negative class; precision's is only what you predicted positive).
    Same cumulative distinct-score frame, exact ppm; thresholds where
    nothing is predicted positive are excluded (precision undefined).
    Together with average_precision_eval (the curve's integral) and
    cost_threshold_optimization (the decision), the PR story is
    complete. Scale shape: identical to the ROC entry."""
    scored = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    tot = scored.agg(
        F.sum("pos").alias("p"), F.count(F.lit(1)).alias("n")
    )
    dv = scored.groupBy("score").agg(
        F.sum("pos").alias("cp"), F.count(F.lit(1)).alias("t")
    )
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = dv.select(
        "score",
        F.sum("t").over(w).alias("c_le"),
        F.sum("cp").over(w).alias("p_le"),
    ).localCheckpoint(eager=False)
    deciles = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    thr = (
        F.broadcast(deciles.crossJoin(tot))
        .join(cum, F.col("c_le") >= F.expr("(decile * n + 9) div 10"))
        .groupBy("decile", "p", "n")
        .agg(F.min("score").alias("threshold"))
    )
    return (
        thr.join(cum, F.col("score") == F.col("threshold"))
        .filter(F.col("n") > F.col("c_le"))
        .select(
            "decile",
            "threshold",
            (F.col("p") - F.col("p_le")).cast("long").alias("tp"),
            (F.col("n") - F.col("c_le")).cast("long").alias("n_predicted_pos"),
            F.expr(
                "CAST(((p - p_le) * 1000000) div (n - c_le) AS BIGINT)"
            ).alias("precision_ppm"),
            F.expr(
                "CAST(((p - p_le) * 1000000) div p AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("decile")
    )


_COHEN_D_ORACLE = """
WITH s AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'view')
),
m AS (
  SELECT grp, count(*) AS n,
         sum(CAST(v AS HUGEINT)) AS sv,
         sum(CAST(v AS HUGEINT) * v) AS qv
  FROM s GROUP BY grp
),
w AS (
  SELECT max(CASE WHEN grp = 1 THEN n END) AS n1,
         max(CASE WHEN grp = 0 THEN n END) AS n2,
         max(CASE WHEN grp = 1 THEN sv END) AS s1,
         max(CASE WHEN grp = 0 THEN sv END) AS s2,
         max(CASE WHEN grp = 1 THEN qv END) AS q1,
         max(CASE WHEN grp = 0 THEN qv END) AS q2
  FROM m
)
SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_view,
       CAST(1000 * s1 // n1 - 1000 * s2 // n2 AS BIGINT)
         AS mean_diff_milli_cents,
       round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / sqrt(CAST((q1 - s1 * s1 // n1) + (q2 - s2 * s2 // n2)
                         AS DOUBLE) / (n1 + n2 - 2)), 6) AS cohens_d_6dp
FROM w
"""


@_register("cohens_d_effect_size", _COHEN_D_ORACLE)
def cohens_d_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size between click and view event
    values: mean difference over the pooled standard deviation — the
    number a significance test (rank_sum_auc, cramer_von_mises) can't
    give you: HOW BIG is the difference in units of spread. Sums of
    squares stay exact integers (the floor in q - s^2//n is shared by
    both engines); the single sqrt + division happen on identical
    doubles, rounded to 6dp (the portable contract). A/A-shaped data:
    expect |d| near 0 — effect sizes resist the big-n significance
    mirage. Scale shape: one 2-group moment agg, 1-row algebra."""
    s = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("grp"),
            _cents("value").alias("v"),
        )
    )
    m = s.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("qv"),
    )
    w = m.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == 1, F.col("sv"))).alias("s1"),
        F.max(F.when(F.col("grp") == 0, F.col("sv"))).alias("s2"),
        F.max(F.when(F.col("grp") == 1, F.col("qv"))).alias("q1"),
        F.max(F.when(F.col("grp") == 0, F.col("qv"))).alias("q2"),
    )
    return w.select(
        F.col("n1").cast("long").alias("n_click"),
        F.col("n2").cast("long").alias("n_view"),
        F.expr(
            "CAST((1000 * s1) div n1 - (1000 * s2) div n2 AS BIGINT)"
        ).alias("mean_diff_milli_cents"),
        F.round(
            F.expr(
                "(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
                " / sqrt(CAST((q1 - (s1 * s1) div n1)"
                " + (q2 - (s2 * s2) div n2) AS DOUBLE) / (n1 + n2 - 2))"
            ),
            6,
        ).alias("cohens_d_6dp"),
    )


_ODDS_ORACLE = """
WITH lab AS (
  SELECT n.n_name,
         sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 0 ELSE 1 END) AS b
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
),
tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM lab)
SELECT l.n_name,
       CAST(l.a AS BIGINT) AS n_urgent, CAST(l.b AS BIGINT) AS n_other,
       CAST(1000 * CAST(l.a AS HUGEINT) * (t.tb - l.b)
            // NULLIF(CAST(l.b AS HUGEINT) * (t.ta - l.a), 0) AS BIGINT)
         AS odds_ratio_milli,
       CAST(1000 * CAST(l.a AS HUGEINT) * (t.ta + t.tb - l.a - l.b)
            // NULLIF(CAST(l.a + l.b AS HUGEINT) * (t.ta - l.a), 0) AS BIGINT)
         AS risk_ratio_milli
FROM lab l CROSS JOIN tot t
ORDER BY l.n_name
"""


@_register("odds_ratio_by_nation", _ODDS_ORACLE)
def odds_ratio_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation odds ratio and risk ratio of urgent-priority ordering
    vs the REST of the population (nation-vs-rest 2x2 tables): OR =
    a*d/(b*c) and RR = (a/(a+b))/(c/(c+d)) are pure cross-multiplied
    rationals — one exact 128-bit division each, in milli. The
    effect-size companions to chisq_independence_screen / fdr_bh /
    holm (which say IS there an association; OR/RR say HOW STRONG, and
    differ exactly when the outcome is common — showing both is the
    epidemiology lesson). A nation with ZERO non-urgent orders (b = 0,
    or degenerate ta = a) makes the OR denominator 0: both lanes emit a
    DEFINED NULL via an explicit NULLIF rather than erroring under ANSI
    division — infinite odds is reported as NULL by design (round-4
    ADVICE). Scale shape: one join-agg to 25 rows, 1-row totals
    broadcast back."""
    lab = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("a"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0
                ).otherwise(1)
            ).alias("b"),
        )
        .localCheckpoint(eager=False)
    )
    tot = lab.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    return (
        lab.crossJoin(F.broadcast(tot))
        .select(
            "n_name",
            F.col("a").cast("long").alias("n_urgent"),
            F.col("b").cast("long").alias("n_other"),
            F.expr(
                "CAST((1000 * CAST(a AS DECIMAL(38,0)) * (tb - b))"
                " div NULLIF(CAST(b AS DECIMAL(38,0)) * (ta - a), 0)"
                " AS BIGINT)"
            ).alias("odds_ratio_milli"),
            F.expr(
                "CAST((1000 * CAST(a AS DECIMAL(38,0)) * (ta + tb - a - b))"
                " div NULLIF(CAST(a + b AS DECIMAL(38,0)) * (ta - a), 0)"
                " AS BIGINT)"
            ).alias("risk_ratio_milli"),
        )
        .orderBy("n_name")
    )
