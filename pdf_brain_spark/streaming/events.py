"""Structured Streaming extensions (SURVEY §2.10: the reference has no
streaming; these are flagged beyond-reference, built on the events table
shape). Two pipelines:

  * windowed_event_counts: readStream → watermark → tumbling window agg.
    The batch twin (queries.events_tumbling_window) is the oracle; the
    streaming test runs Trigger.AvailableNow over the same files and
    asserts equality — late rows beyond the watermark would be dropped in
    continuous mode.

  * streaming_ingest: file-source stream of document files → foreachBatch
    running the batch chunk/embed pipeline (operators/ingest.py). This is
    the reference's incremental `ingest` command (J7 dedup included) as a
    continuously-running job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    schema = schema or (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts with late-data bound. In append mode a window
    closes once the watermark passes; AvailableNow processing of a static
    directory yields the batch-equivalent result."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select("event_type", F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str, out_dir: str) -> None:
    """Drain everything currently in the source (Trigger.AvailableNow),
    write parquet, stop. The batch-parity harness for streaming tests."""
    q = (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()


def streaming_ingest(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    markdown: bool = False,
):
    """File-source stream → foreachBatch batch-ingest. Each micro-batch
    reuses the full batch pipeline, so dedup/id/chunk semantics are
    identical to one-shot ingest."""
    from pdf_brain_spark.operators.ingest import ingest

    files = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(watch_dir)
        .select(F.input_file_name().alias("path"), F.col("value").alias("content"))
    )

    def _each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            ingest(spark, batch_df, out_dir, markdown=markdown)

    return (
        files.writeStream.foreachBatch(_each_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
