"""Portable probabilistic data structures as DataFrame operators.

Every structure here is built from md5-derived integer arithmetic so the
whole sketch — not just a tolerance flag — is reproducible on any engine
(the catalog pairs each with a DuckDB oracle). All hot paths are codegen'd
JVM expressions; the sketches themselves are broadcast-size by
construction, which is what makes them the 100 TB shapes:

- bloom_build / bloom_probe — build/probe bloom filter for semi-join
  pruning (the portable analog of Spark's InjectRuntimeFilter).
- kmv_topk — the k-minimum-values sketch rows (the k smallest distinct
  48-bit hashes per group), the mergeable distinct-count /
  theta-set-algebra primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _lane_pos(j, key, m_bits: int):
    """Position of `key` in lane `j`: first 32 md5 hex chars -> bigint
    -> mod m. One md5 per (key, lane)."""
    return (
        F.conv(F.substring(F.md5(F.concat_ws(":", j, key)), 1, 8), 16, 10)
        .cast("long")
        % m_bits
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 16384,
    k: int = 3,
    word_bits: int = 32,
) -> DataFrame:
    """Build an m-bit bloom filter over the (assumed small) key set as a
    (word_idx, word) frame of <= m/word_bits BIGINT words — broadcast-size
    regardless of probe volume. One hash-agg; map-side combine collapses
    the k·n bit stream."""
    lanes = F.explode(F.array([F.lit(j) for j in range(k)])).alias("j")
    return (
        keys.select(F.col(key_col).alias("__key"), lanes)
        .select(_lane_pos(F.col("j"), F.col("__key"), m_bits).alias("__pos"))
        .distinct()
        .groupBy(F.expr(f"__pos div {word_bits}").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {word_bits} AS INT))"
                )
            ).alias("word")
        )
    )


def bloom_probe(
    probe: DataFrame,
    words: DataFrame,
    key_col: str,
    m_bits: int = 16384,
    k: int = 3,
    word_bits: int = 32,
    out_col: str = "bloom_pass",
) -> DataFrame:
    """Append `out_col`: True iff all k filter positions of `key_col` are
    set. Only the WORDS frame (<= m/word_bits rows by construction) is
    broadcast — the per-key verdict frame scales with the probe side, so
    its join back carries no forced hint (round-8 broadcast audit; AQE
    broadcasts it only while the actual size fits). No false negatives
    ever; false-positive rate ~ (1 - e^(-k·n/m))^k."""
    lanes = F.explode(F.array([F.lit(j) for j in range(k)])).alias("j")
    hits = (
        probe.select(F.col(key_col).alias("__key")).distinct()
        .select("__key", lanes)
        .withColumn("__pos", _lane_pos(F.col("j"), F.col("__key"), m_bits))
        .withColumn("word_idx", F.expr(f"__pos div {word_bits}"))
        .join(F.broadcast(words), "word_idx", "left")
        .withColumn(
            "__hit",
            F.coalesce(
                F.expr(
                    f"shiftright(word, CAST(__pos % {word_bits} AS INT))"
                    " & CAST(1 AS BIGINT)"
                ),
                F.lit(0).cast("long"),
            )
            == 1,
        )
        .groupBy("__key")
        .agg(F.bool_and("__hit").alias(out_col))
    )
    return probe.join(
        hits.withColumnRenamed("__key", key_col), key_col, "left"
    )


def kmv_hash(col) -> "F.Column":
    """The 48-bit md5 hash lane shared by every KMV/theta consumer."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10)
        .cast("long")
    )


KMV_M = 281474976710656  # 2^48, the hash-space size for kmv_hash


def kmv_topk(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 64,
    salt: int = 32,
    prehashed: bool = False,
) -> DataFrame:
    """The KMV sketch rows: per group, the k smallest DISTINCT 48-bit
    hashes of `key_col` as (group_cols..., hv). Two-level top-k — a
    salted (group, hv % salt) rank prunes to <= k·salt rows per group
    BEFORE the per-group rank, so no task ever sorts a whole group's
    hash stream. Estimate distinct as (k-1)·KMV_M // max(hv); union
    sketches and re-apply with prehashed=True to merge (min-k lattice:
    merge == direct). `prehashed` means `key_col` already holds kmv_hash
    values (merging sketch rows) — hashing a hash would be wrong."""
    hv_col = (
        F.col(key_col).cast("long") if prehashed else kmv_hash(F.col(key_col))
    )
    h = df.select(*group_cols, hv_col.alias("hv")).distinct()
    w_salt = W.partitionBy(
        *group_cols, F.pmod(F.col("hv"), F.lit(salt))
    ).orderBy("hv")
    w_grp = W.partitionBy(*group_cols).orderBy("hv")
    return (
        h.withColumn("__srn", F.row_number().over(w_salt))
        .filter(F.col("__srn") <= k)
        .withColumn("__rn", F.row_number().over(w_grp))
        .filter(F.col("__rn") <= k)
        .select(*group_cols, "hv")
    )
