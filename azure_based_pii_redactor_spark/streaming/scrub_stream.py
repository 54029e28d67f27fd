"""Streaming scrub: identical kernel, micro-batch execution.

Scale notes: the fused ``mapInPandas`` kernel is stateless, so it runs
unchanged under Structured Streaming (narrow stage per micro-batch).
Watermarked event-time windows bound state for the metrics aggregation;
``availableNow`` gives exactly-once batch-backfill semantics with the
same query (the production pattern for reprocessing an Iceberg snapshot
while tailing new WARC drops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.pipeline import run_scrub_pipeline
from ..engine.schema import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def scrub_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 8,
    **pipeline_kwargs,
):
    """readStream -> fused kernel -> parquet sink, availableNow trigger.
    Returns the StreamingQuery (caller awaits/stops)."""
    pages = read_pages_stream(spark, input_path, max_files_per_trigger)
    out = run_scrub_pipeline(pages, **pipeline_kwargs)
    return (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def windowed_quality_metrics(pages_out: DataFrame) -> DataFrame:
    """Event-time windowed keep/drop counts + entity totals: 1-hour
    tumbling windows on warc_ts with a 2-hour watermark for late pages.
    Coarser than the batch ``metrics.drop_reason_counts`` histogram
    (keep/drop boolean, not per-reason buckets -- per-reason granularity
    in a stream would multiply state by the reason cardinality; run the
    batch histogram over the sink output when reasons are needed).

    NOTE: event-time operators require a non-null event time -- rows
    with null ``warc_ts`` are excluded by the window operator (crawl
    sources always stamp WARC-Date; adapters like ``documents_as_pages``
    that emit null timestamps must fill one before streaming here)."""
    return (
        pages_out.withWatermark("warc_ts", "2 hours")
        .groupBy(
            F.window("warc_ts", "1 hour").alias("win"),
            "keep",
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_entities").alias("n_entities"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "keep",
            "n_docs",
            "n_entities",
        )
    )
