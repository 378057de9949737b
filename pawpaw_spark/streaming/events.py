"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.9) — its only
streaming-shaped operators, WindowedJoin and StackedReduce, map to
window/session aggregation. This module provides the streaming forms of
those plus a streaming segmentation pass, so the engine covers
continuous ingestion of new source files / events:

* ``windowed_event_counts`` — watermarked tumbling-window agg
  (WindowedJoin's fixed-window analog).
* ``session_counts``        — ``session_window`` gap sessionization
  (StackedReduce's push/pop analog for the time axis).
* ``streaming_segment``     — the same Arrow segmentation kernel under
  ``readStream``: mapInPandas works unchanged in streaming plans.

Tests drive these with the memory sink + ``processAllAvailable`` per
the Structured Streaming testing idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pawpaw_spark.operators.segment import segment
from pawpaw_spark.rules import RuleSet


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    e = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return e.groupBy(win, "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    e = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark("ts", watermark)
    return e.groupBy(F.session_window("ts", gap), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


def streaming_segment(source_stream: DataFrame, rules: RuleSet) -> DataFrame:
    """Segmentation over a streaming source table — identical kernel,
    streaming plan (append mode; segmentation is stateless per row)."""
    return segment(source_stream, rules)
