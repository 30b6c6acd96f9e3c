"""Incremental / streaming processing.

The reference is batch-only (SURVEY.md §2.11): ``warc_ts`` is data, not
event time. The engine still exposes two incremental surfaces because a
Common-Crawl-scale pages table is append-only in practice:

- ``stream_pages_cell_counts``: Structured Streaming over a pages
  directory — extraction runs per micro-batch, watermarked tumbling
  windows count objects per cell per crawl-day. New crawl dumps landing
  in the directory are picked up incrementally with exactly-once sink
  semantics (checkpointed).
- ``events_tumbling_agg``: the same windowed aggregation as a batch
  DataFrame (used for the DuckDB-oracle correctness check; streaming and
  batch share the plan since Structured Streaming is the same DataFrame
  API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_objects
from ..sources.pages import PAGES_SCHEMA


def events_tumbling_agg(events: DataFrame, window: str = "1 day") -> DataFrame:
    """Tumbling-window count/sum per event_type (batch form; identical
    plan under readStream)."""
    return (
        events.groupBy(
            F.window("ts", window).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_pages_cell_counts(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 day",
    window: str = "1 day",
    zoom: int = 12,
):
    """readStream(pages) → extract → watermarked tumbling-window counts
    per (cell, window, source).

    Event time is ``warc_ts``, carried THROUGH the extraction kernel
    (``keep_ts=True``) so the watermark applies to the post-extract
    stream. Append mode + watermark bound the state: a window's counts are
    emitted once the watermark passes its end, and pages later than the
    watermark are dropped — no unbounded ``complete``-mode state on an
    append-only source (round-2 fix; round 1 silently ignored
    ``watermark`` and ran complete-mode global counts).

    The parquet file source gives exactly-once per micro-batch. Returns
    the DataStreamWriter (caller starts/awaits it).
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )
    objects = extract_objects(stream, zoom=zoom, keep_text=False, keep_ts=True)
    counts = (
        objects.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            "cell_id",
            "source",
        )
        .agg(F.count("*").alias("n_objects"))
        .select(
            F.col("w.start").alias("window_start"),
            "cell_id",
            "source",
            "n_objects",
        )
    )
    return (
        counts.writeStream.outputMode("append")
        .format("memory")
        .option("checkpointLocation", checkpoint_dir)
    )


def stream_events_windowed(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "1 day",
    window: str = "1 day",
):
    """File-source streaming variant of ``events_tumbling_agg`` with a
    watermark bounding state for late data."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    return agg.writeStream.outputMode("append").format("memory").option(
        "checkpointLocation", checkpoint_dir
    )
