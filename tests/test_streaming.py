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
    # an empty merge (window-boundary/tz/dtype drift) would make the
    # equality below vacuously true.  Append-mode windowed aggregation
    # only EMITS windows the final watermark has closed, so the stream
    # may withhold the trailing windows inside the 2-hour horizon --
    # every emitted window must match batch exactly, and the withheld
    # tail is bounded by horizon/window_size + 1.
    assert len(merged) == len(got) > 0
    assert len(batch) - len(merged) <= 3
    assert (merged["n_docs_s"] == merged["n_docs_b"]).all()


def test_interval_join_stream(spark, tmp_path):
    """Stream-stream interval join: right events within 1h after a left
    event for the same user; watermarks bound state; result equals the
    batch interval join over the same data."""
    from pyspark.sql import functions as F

    from azure_based_pii_redactor_spark.streaming.interval_join import (
        interval_join_stream,
    )

    base = "2024-01-01 00:00:00"
    lrows = [(1, f"{base}",), (1, "2024-01-01 03:00:00"), (2, f"{base}",)]
    rrows = [
        (1, "2024-01-01 00:30:00", 10.0),   # joins left#1
        (1, "2024-01-01 01:30:00", 20.0),   # outside 1h of left#1
        (1, "2024-01-01 03:59:00", 30.0),   # joins left#2
        (2, "2024-01-01 00:59:59", 40.0),   # joins left#3
        (3, "2024-01-01 00:10:00", 50.0),   # no left key
    ]
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(
        lrows, "user_id long, l_ts string"
    ).select("user_id", F.col("l_ts").cast("timestamp")).write.parquet(ldir)
    spark.createDataFrame(
        rrows, "user_id long, r_ts string, signal double"
    ).select(
        "user_id", F.col("r_ts").cast("timestamp"), "signal"
    ).write.parquet(rdir)

    lschema = "user_id long, l_ts timestamp"
    rschema = "user_id long, r_ts timestamp, signal double"
    lstream = spark.readStream.schema(lschema).parquet(ldir)
    rstream = spark.readStream.schema(rschema).parquet(rdir)
    joined = interval_join_stream(lstream, rstream)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, str(r.l_ts), float(r.signal))
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-01 03:00:00", 30.0),
        (2, "2024-01-01 00:00:00", 40.0),
    ]
    # batch form of the same join gives the same rows
    lb = spark.read.parquet(ldir)
    rb = spark.read.parquet(rdir)
    batch = sorted(
        (r.user_id, str(r.l_ts), float(r.signal))
        for r in interval_join_stream(lb, rb).collect()
    )
    assert batch == got
