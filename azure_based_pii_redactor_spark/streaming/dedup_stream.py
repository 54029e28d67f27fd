"""Streaming deduplication + exactly-once micro-batch sink.

- ``dedupe_stream``: ``dropDuplicatesWithinWatermark`` on url -- crawl
  re-fetches within the watermark horizon are dropped in-flight AND state
  is actually evicted past the watermark (plain ``dropDuplicates`` under a
  watermark never evicts unless the event-time column is a dedup key; its
  url state would grow with every distinct url ever seen).
- ``write_stream_exactly_once``: ``foreachBatch`` sink writing each
  micro-batch into an ``epoch_id=<n>`` partition with dynamic partition
  overwrite -- a replayed epoch (restart between sink commit and
  checkpoint commit) REWRITES its own partition instead of appending a
  duplicate, which is the idempotence that makes foreachBatch
  exactly-once.  (An earlier append+marker design was not atomic: a crash
  between the data append and the marker append duplicated the batch.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedupe_stream(
    pages_stream: DataFrame,
    watermark: str = "1 hour",
    canonicalize: bool = False,
) -> DataFrame:
    """``canonicalize=True`` dedups on the CANONICAL url (scheme/
    fragment/tracking-params collapsed -- engine/operators/urls.py), so
    http/https re-fetches of the same page dedupe in-flight too; the
    canonical key is a JVM projection, so the stateful operator's key
    cardinality shrinks and state stays bounded by the watermark either
    way."""
    key = "url"
    if canonicalize:
        from ..engine.operators.urls import canonical_url

        pages_stream = pages_stream.withColumn(
            "__canon", canonical_url("url")
        )
        key = "__canon"
    out = (
        pages_stream.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark([key])
    )
    return out.drop("__canon") if canonicalize else out


def write_stream_exactly_once(
    out_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
):
    """foreachBatch sink with per-epoch partition overwrite (idempotent on
    replay).  Returns the started StreamingQuery.  Read the result with
    ``spark.read.parquet(output_path)`` (epoch_id is a partition column)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        (
            batch_df.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(output_path)
        )

    return (
        out_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
