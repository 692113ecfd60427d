"""Structured Streaming surface: continuous crawl ingestion + event-time
windowed aggregation.

The reference is batch-only (SURVEY.md §2.10), so streaming here extends the
engine rather than mirroring the reference: a file-source stream of page
parquet drops feeds the SAME batch extraction pipeline via foreachBatch,
committing each micro-batch through the snapshot table — streaming becomes
"incremental batch with exactly-once commits", reusing the audit/resume
machinery instead of a second state store. Event analytics use the standard
watermark + tumbling-window aggregation.

Scale notes: foreachBatch keeps the per-batch plan identical to the batch
job (same salting, same Arrow stages); the file source's maxFilesPerTrigger
bounds micro-batch size; watermarks bound window state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages_to_table(
    spark: SparkSession,
    input_dir: str,
    table,  # ocr_spark.io.tableio.SnapshotTable
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    available_now: bool = False,
) -> StreamingQuery:
    """File-source stream of page parquet -> extraction -> snapshot commits.

    Each micro-batch runs the full batch pipeline and lands as one snapshot;
    the source checkpoint gives at-least-once delivery and the committed-
    bucket anti-join inside run_pipeline's table layer makes replays
    idempotent (effectively exactly-once at the snapshot level)."""
    from ocr_spark.io.tableio import part_key
    from ocr_spark.pipeline import run_pipeline

    stream = (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Incremental feeds need URL-level resume, not the batch job's
        # bucket-level filter_uncommitted: a micro-batch touches rows in
        # every bucket, so one committed batch would wrongly mask all later
        # ones. Anti-join against committed urls instead (at scale: the
        # audit table's per-bucket url ranges prune this join's input).
        committed = table.read(spark)
        fresh = (
            batch_df.join(committed.select("url"), "url", "left_anti")
            if committed is not None else batch_df
        )
        if fresh.isEmpty():
            return
        result = run_pipeline(spark, pages_path=None, pages_df=fresh)
        result = result.withColumn("part_key", part_key(F.col("url"), table.n_buckets))
        table.commit(result, metrics={"batch_id": batch_id})

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window aggregation with late-data handling:
    watermark bounds state; output matches the batch events_hourly rollup."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n_events", "value_cents",
        )
    )


def stream_event_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    available_now: bool = True,
) -> StreamingQuery:
    """readStream -> watermark windowed agg -> in-memory sink (for tests /
    dashboards; swap format for kafka/parquet in production)."""
    events = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(events)
    writer = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("event_counts")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
