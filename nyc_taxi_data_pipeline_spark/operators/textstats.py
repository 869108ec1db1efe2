"""Text-analysis operators over a documents table.

Extension surface (BASELINE.json north star): language-ID, quality scoring,
token counting, fingerprinting — thin DataFrame wrappers over the codegen'd
expressions in functions.text. One projection, zero shuffles: these run at
scan speed over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_spark.functions import text as textfn


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: tokens, bpe-ish tokens, chars, punct ratio,
    stopword ratio, quality score."""
    return df.select(
        F.col(id_col),
        textfn.token_count(text_col).alias("n_tokens"),
        textfn.bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        textfn.char_count(text_col).alias("n_chars"),
        F.round(textfn.punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(textfn.stopword_ratio(text_col), 6).alias("stopword_ratio"),
        textfn.quality_score(text_col).alias("quality_score"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 50,
    stride: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking for context-length-bounded training: each doc
    becomes ceil((n_tokens - overlap) / stride) chunks of `chunk_tokens`
    tokens overlapping by chunk_tokens - stride.

    One projection + one explode — tokens split once, chunk starts
    generated with sequence(), chunk text sliced JVM-side. Chunk rows carry
    (doc_id, chunk_id, n_tokens, chunk_text); empty docs produce no chunks.
    """
    overlap = chunk_tokens - stride
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), toks.alias("__toks")
    )
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("__toks") - overlap, F.lit(1)),
        F.lit(stride),
    )
    exploded = base.select(
        id_col, "__toks", F.explode(starts).alias("__start")
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return exploded.select(
        F.col(id_col),
        ((F.col("__start") - 1) / stride).cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append `lang_pred` from the stopword-marker heuristic."""
    return df.withColumn("lang_pred", textfn.lang_id(text_col))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the 64-bit normalized-text fingerprint (exact-dedup key)."""
    return df.withColumn("fingerprint", textfn.fingerprint(text_col))


def token_budget_by(df: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """Corpus token budget per group (e.g. per source / per language):
    one scan + one tiny aggregate."""
    return (
        df.groupBy(group_col)
        .agg(
            F.sum(textfn.token_count(text_col)).alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(textfn.token_count(text_col)), 4).alias("avg_tokens"),
        )
        .orderBy(group_col)
    )
