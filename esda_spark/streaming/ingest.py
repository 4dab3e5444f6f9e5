"""Structured-streaming ingest: documents stream -> cell aggregates.

The reference has no streaming surface (SURVEY.md §2.5); the engine
adds an append-mode ingest path so the 100 TB pipeline can index
documents incrementally: a stream of (doc_id, ts, x, y, n_chars) rows
is cell-keyed with the same pure-expression grid index used by the
batch path and aggregated per (window, cell) with a watermark for late
data.  Stats jobs stay batch over the checkpointed cell table
(documented non-goal to stream the permutation inference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esda_spark.plans.cells import cell_key


def cell_counts_stream(
    stream: DataFrame,
    cell_size: float,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Windowed per-cell counts + byte sums over a document stream.

    stream must carry (ts timestamp, x double, y double, n_chars long).
    Append-mode compatible: watermark bounds state; the grouping key is
    (event window, cell) so state is naturally partitioned and skewed
    hot cells spread across the 2-level agg (partial aggregation happens
    before the shuffle).
    """
    keyed = stream.withColumn(
        "cell", cell_key(F.col("x"), F.col("y"), cell_size)
    ).withWatermark(ts_col, watermark)
    return keyed.groupBy(
        F.window(F.col(ts_col), window).alias("win"),
        F.col("cell"),
    ).agg(
        F.count("*").alias("doc_count"),
        F.sum("n_chars").alias("char_sum"),
    )


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each content
    hash within the watermark horizon (bounded state; exactly the
    batch `exact_dedup_groups` semantics restricted to the horizon).
    """
    return (
        stream.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
