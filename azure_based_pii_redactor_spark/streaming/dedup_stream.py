"""Streaming deduplication + exactly-once micro-batch sink.

- ``dedupe_stream``: watermark-bounded ``dropDuplicates`` on url --
  crawl re-fetches within the watermark horizon are dropped in-flight;
  state is evicted past the watermark (bounded memory at 10^12 docs).
- ``write_stream_exactly_once``: ``foreachBatch`` sink with epoch-marker
  idempotence -- a replayed micro-batch (restart between sink-commit and
  checkpoint-commit) is skipped, so downstream parquet sees each batch
  exactly once.  This is the streaming twin of the bucket-lineage
  checkpoint (engine/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedupe_stream(pages_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .dropDuplicates(["url"])
    )


def write_stream_exactly_once(
    out_stream: DataFrame,
    output_path: str,
    marker_path: str,
    checkpoint_path: str,
    run_id: str,
):
    """foreachBatch sink: append each micro-batch once, keyed by
    (run_id, epoch_id) markers.  Returns the started StreamingQuery."""
    spark = out_stream.sparkSession

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        try:
            markers = spark.read.parquet(marker_path)
            done = (
                markers.filter(
                    (F.col("run_id") == run_id)
                    & (F.col("epoch_id") == epoch_id)
                ).count()
                > 0
            )
        except Exception:
            done = False
        if done:  # replayed batch: already committed, skip (exactly-once)
            return
        batch_df.write.mode("append").parquet(output_path)
        spark.createDataFrame(
            [(run_id, epoch_id)], "run_id string, epoch_id long"
        ).write.mode("append").parquet(marker_path)

    return (
        out_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
