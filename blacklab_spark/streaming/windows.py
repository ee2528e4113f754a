"""Streaming-shaped operators.

The reference has NO streaming layer (SURVEY.md §2.6): indexing is batch with
an incremental add-to-index endpoint; search is request/response. What a
Spark-native engine adds on top:

  windowed_event_counts      tumbling-window aggregation, identical logic in
                             batch (for the DuckDB oracle) and in Structured
                             Streaming (readStream → watermark → window)
  stream_windowed_counts     the streaming variant, memory-sink runnable in
                             tests via processAllAvailable()
  incremental index add      maps to appending per-partition segments + a
                             term-keyed merge compaction — same operators as
                             the batch build (documented; batch path covers it)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window counts + value sums per event_type (batch form)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession, parquet_dir: str, schema, minutes: int = 60,
    query_name: str = "win_counts",
):
    """Structured Streaming variant: parquet source → watermark → windowed agg
    → memory sink. Returns the StreamingQuery; caller drives it with
    processAllAvailable() and reads `SELECT * FROM <query_name>`."""
    src = spark.readStream.schema(schema).parquet(parquet_dir)
    # TIMESTAMP_NTZ sources (naive parquet) aren't valid event-time columns
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "total_value"
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
