"""Structured Streaming tests: streaming scrub == batch scrub, windowed
watermarked metrics, incremental checkpointed restart (SURVEY.md section
2.9 mapping + north-star streaming surface)."""

import pandas as pd

from azure_based_pii_redactor_spark.engine.pipeline import run_scrub_pipeline
from azure_based_pii_redactor_spark.sources.pages import generate_pages
from azure_based_pii_redactor_spark.streaming import (
    scrub_stream,
    windowed_quality_metrics,
)


def _sorted(df):
    return (
        df.select("url", "keep", "drop_reason", "scrubbed_text", "n_entities")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = generate_pages(spark, 200, seed=21, parts=4)
    pages.write.mode("overwrite").parquet(src)

    q = scrub_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    got = _sorted(spark.read.parquet(out))
    want = _sorted(run_scrub_pipeline(spark.read.parquet(src)))
    pd.testing.assert_frame_equal(got, want)


def test_stream_incremental_restart(spark, tmp_path):
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    generate_pages(spark, 100, seed=3, parts=2).write.mode(
        "overwrite").parquet(src)
    q = scrub_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100

    # new files arrive; restarting the same query processes ONLY them
    generate_pages(spark, 50, seed=3, parts=1, start_id=100).write.mode(
        "append").parquet(src)
    q2 = scrub_stream(spark, src, out, ckpt)
    q2.awaitTermination(120)
    total = spark.read.parquet(out)
    assert total.count() == 150
    assert total.select("url").distinct().count() == 150


def test_windowed_metrics_stream(spark, tmp_path):
    src = str(tmp_path / "src3")
    generate_pages(spark, 150, seed=9, parts=2).write.mode(
        "overwrite").parquet(src)
    from azure_based_pii_redactor_spark.streaming.scrub_stream import (
        read_pages_stream,
    )

    stream = read_pages_stream(spark, src)
    out = run_scrub_pipeline(stream)
    metrics = windowed_quality_metrics(out)
    q = (
        metrics.writeStream.outputMode("append")
        .format("memory")
        .queryName("winq")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; availableNow over a
    # finite batch closes all but the max-event-time window.
    got = spark.sql("SELECT * FROM winq").toPandas()
    batch = (
        windowed_quality_metrics(run_scrub_pipeline(spark.read.parquet(src)))
        .toPandas()
    )
    assert len(got) > 0
    merged = got.merge(
        batch, on=["window_start", "keep"], suffixes=("_s", "_b")
    )
    assert (merged["n_docs_s"] == merged["n_docs_b"]).all()
