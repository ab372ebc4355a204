"""Structured Streaming ingestion: pages stream → LSM index segments.

The reference ingests via batch REST (`POST /indexDocs`,
/root/reference/searchapi3/src/Controllers/Indexation.hs:29-31) and
compacts after every batch (Indexer.hs:104). The streaming-native
re-expression: a `readStream` of pages feeds `foreachBatch`; every
micro-batch becomes one immutable segment (exactly the reference's
"component"), and the Fibonacci compaction policy runs after each batch
— so the segment set stays logarithmic in the number of batches while
queries stay available throughout (scatter/gather across segments).

Checkpointing: Spark's streaming checkpoint gives at-least-once delivery
into `foreachBatch`; exactly-once segment registration comes from making
the batch handler idempotent on batch_id — the segment name is derived
from the batch id and index_into_collection records completed names in
the collection's _ingested markers, so a replayed micro-batch (crash
after the segment rename but before the checkpoint commit, or after
compaction already merged the segment away) is a no-op instead of a
duplicate segment.

Also here: watermarked windowed aggregation over an event stream —
the standard late-data-tolerant rollup a training-data pipeline runs
next to ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_suite_spark.sources.registry import index_into_collection

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages_stream(spark: SparkSession, src_dir: str, max_files: int = 1) -> DataFrame:
    """File-source pages stream: each parquet file dropped into src_dir
    becomes (at most max_files per) micro-batch — the streaming analogue
    of one REST ingest call."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def stream_pages_into_collection(
    pages_stream: DataFrame,
    col_dir: str,
    checkpoint_dir: str,
    n_shards: int = 4,
    compact: bool = True,
    available_now: bool = True,
):
    """Run the ingest stream; returns the StreamingQuery.

    available_now=True drains everything currently in the source and
    stops (test/batch-backfill mode); False runs continuously.
    """

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index_into_collection(
            batch_df.sparkSession, batch_df, col_dir,
            n_shards=n_shards, compact=compact,
            # deterministic name per micro-batch → replay-idempotent
            segment_name=f"seg_b{batch_id:012d}",
        )

    writer = (
        pages_stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    On a stream: late rows beyond the watermark are dropped and window
    state is evicted — bounded state at any scale. The same expression
    runs on a batch frame (Spark 4 rejects withWatermark outside
    streaming, so it is attached only when `isStreaming`), which is how
    the DuckDB oracle checks it.
    """
    # watermarks require TIMESTAMP (tz-aware); parquet written with NTZ
    # types must be cast (session tz is pinned UTC, so values are stable)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
