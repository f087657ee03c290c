"""Watermarked event-time windowed aggregation over a file-stream source.

The reference has no stream semantics (SURVEY.md §2.6) — this is the
training-pipeline streaming surface the brief asks for: Structured
Streaming `readStream` → `withWatermark` → windowed groupBy, with late
events beyond the watermark dropped and closed windows emitted exactly
once (append mode).

Scale notes: the windowed aggregation is a streaming state-store hash agg
keyed by (window, event_type) — state size is bounded by
(#open windows × #types), independent of event volume; the watermark is
what lets Spark evict closed windows. File-stream listing is incremental
(`maxFilesPerTrigger` to bound batch size on a real bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming DataFrame: tumbling event-time windows per event_type —
    (win_start, event_type, n, total_value). Append-mode compatible: a
    window row is emitted only once its window is older than the watermark
    (late events beyond the watermark are dropped)."""
    stream = spark.readStream.schema(EVENTS_DDL).parquet(input_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type",
                "n", "total_value")
    )


def run_windowed_to_memory(
    spark: SparkSession,
    input_dir: str,
    *,
    query_name: str = "win_events",
    window: str = "1 hour",
    watermark: str = "30 minutes",
):
    """Start the windowed aggregation into an in-memory append sink (test /
    demo harness). Returns the StreamingQuery; read results from the
    `query_name` temp view. Caller drives `processAllAvailable()` between
    file drops and `stop()` at the end."""
    df = windowed_event_counts(spark, input_dir, window=window,
                               watermark=watermark)
    return (df.writeStream.outputMode("append").format("memory")
            .queryName(query_name).start())
