"""Streaming dedup + exactly-once foreachBatch sink tests."""

from pyspark.sql import functions as F

from azure_based_pii_redactor_spark.sources.pages import generate_pages
from azure_based_pii_redactor_spark.streaming.dedup_stream import (
    dedupe_stream,
    write_stream_exactly_once,
)
from azure_based_pii_redactor_spark.streaming.scrub_stream import (
    read_pages_stream,
)


def test_stream_dedup_drops_refetches(spark, tmp_path):
    src = str(tmp_path / "src")
    base = generate_pages(spark, 80, seed=13, parts=2)
    base.write.mode("overwrite").parquet(src)
    base.limit(30).write.mode("append").parquet(src)  # re-fetched urls
    assert spark.read.parquet(src).count() == 110

    stream = dedupe_stream(read_pages_stream(spark, src, 99))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory").queryName("dedupq")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) n, count(DISTINCT url) d FROM dedupq").first()
    assert got.n == got.d == 80


def test_stream_dedup_canonical_collapses_url_variants(spark, tmp_path):
    """canonicalize=True dedups http/https + tracking-param variants of
    the same page in-flight; the plain form would keep all three."""
    from datetime import datetime

    src = str(tmp_path / "src_canon")
    rows = [
        ("http://www.a.example/p?utm_source=x", datetime(2024, 1, 1, 0, 0)),
        ("https://a.example/p", datetime(2024, 1, 1, 0, 10)),
        ("https://a.example/p#frag", datetime(2024, 1, 1, 0, 20)),
        ("https://a.example/other", datetime(2024, 1, 1, 0, 30)),
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp"
    ).withColumn("html", F.lit(None).cast("binary")).withColumn(
        "text", F.lit(None).cast("string")
    ).withColumn("lang", F.lit(None).cast("string")).write.mode(
        "overwrite").parquet(src)

    stream = dedupe_stream(read_pages_stream(spark, src, 99),
                           canonicalize=True)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory").queryName("canonq")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT url FROM canonq").collect()
    assert len(got) == 2  # one per canonical page
    assert "__canon" not in stream.columns


def test_foreach_batch_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    generate_pages(spark, 60, seed=2, parts=2).write.mode(
        "overwrite").parquet(src)

    stream = read_pages_stream(spark, src, 99).select("url", "warc_ts")
    q = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 60

    # replayed epoch: re-running the SAME sink body for an epoch id that
    # already committed must REWRITE its partition, not append duplicates
    from pyspark.sql import functions as F

    batch = spark.read.parquet(src).select("url", "warc_ts")
    (
        batch.withColumn("epoch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id").parquet(out)
    )
    assert spark.read.parquet(out).count() == 60  # unchanged (idempotent)

    # restart on the same checkpoint with no new data: nothing appended
    q2 = write_stream_exactly_once(stream, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 60


def test_stream_dedup_under_rocksdb_state_store(spark, tmp_path):
    """The 10^12-scale state-store wiring (VERDICT r3 #4): the same
    watermarked dedup runs under RocksDBStateStoreProvider with
    changelog checkpointing, produces the same result as the default
    provider, and the checkpoint actually contains RocksDB artifacts
    (changelog/zip files, not the HDFS provider's .delta) -- proof the
    provider engaged rather than silently falling back."""
    import glob

    from azure_based_pii_redactor_spark.streaming.stateful import (
        restore_state_store_conf,
        use_rocksdb_state_store,
    )

    src = str(tmp_path / "src_rocks")
    base = generate_pages(spark, 60, seed=17, parts=2)
    base.write.mode("overwrite").parquet(src)
    base.limit(20).write.mode("append").parquet(src)  # re-fetched urls

    ckpt = str(tmp_path / "ckpt_rocks")
    prev = use_rocksdb_state_store(spark)
    try:
        q = (
            dedupe_stream(read_pages_stream(spark, src, 99))
            .writeStream.outputMode("append")
            .format("memory").queryName("rocksq")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
    finally:
        restore_state_store_conf(spark, prev)
    got = spark.sql(
        "SELECT count(*) n, count(DISTINCT url) d FROM rocksq"
    ).first()
    assert got.n == got.d == 60
    state_files = glob.glob(f"{ckpt}/state/**/*", recursive=True)
    assert any(
        f.endswith(".changelog") or f.endswith(".zip") for f in state_files
    ), state_files
    assert not any(f.endswith(".delta") for f in state_files)


def test_streaming_admission_loop(spark, tmp_path):
    """The admission loop as a stream (streaming/admission.py): two
    crawl slices forced into separate micro-batches; epoch-0's
    re-fetch/near-dup of seed history are rejected and its novel doc
    admitted; epoch-1's near-dup OF THE EPOCH-0 ADMISSION is rejected
    (cross-epoch history via the admitted store + band store, which
    grows by exactly the admitted increments); a re-run on the same
    checkpoint is a no-op; and a simulated epoch replay (fresh
    checkpoint over the same inputs) rewrites the same partitions
    instead of duplicating or self-rejecting."""
    from azure_based_pii_redactor_spark.streaming.admission import (
        run_streaming_admission,
        seed_band_store,
    )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls on the quiet village green and children play games")
    novel = ("completely different content about ships and harbors "
             "and tides and the long journey across the cold sea")
    fresh = ("figures on the hillside counting stars before the storm "
             "arrives and the lanterns are lit one by one tonight")
    history = spark.createDataFrame(
        [(i, f"{base} variant{i} tail{i} words{i}") for i in range(8)],
        "doc_id long, text string",
    )
    band_p = str(tmp_path / "bands")
    out_p = str(tmp_path / "admitted")
    in_p = tmp_path / "incoming"
    in_p.mkdir()
    seed_band_store(history, band_p)

    # slice files written one per micro-batch (maxFilesPerTrigger=1)
    # the FIRST slice admits nothing (review r6: a zero-admission
    # epoch-0 leaves output_path as a file-less directory -- later
    # epochs must still read it, which needs the explicit-schema read)
    spark.createDataFrame(
        [(150, history.collect()[2].text)],     # re-fetch only: reject
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(in_p / "slice0"))
    spark.createDataFrame(
        [(100, history.collect()[3].text),      # re-fetch: reject
         (101, f"{base} variant5 tail5 CHANGED"),  # near-dup: reject
         (102, novel)],                         # novel: admit
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(in_p / "slice0b"))
    spark.createDataFrame(
        [(200, novel + " slight change"),       # near-dup of epoch-0
         (201, fresh)],                         # novel: admit
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(in_p / "slice1"))
    # flatten into one source dir, lexicographic order = slice order
    files = sorted(in_p.glob("slice*/part-*.parquet"))
    src = tmp_path / "src"
    src.mkdir()
    for i, f in enumerate(files):
        f.rename(src / f"{i:03d}.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = run_streaming_admission(
        stream, history, band_p, out_p, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    admitted = spark.read.parquet(out_p)
    got = {r.doc_id: r.epoch_id for r in admitted.collect()}
    assert set(got) == {102, 201}
    assert got[102] != got[201]  # two separate epochs
    # band store = seed (epoch -1) + exactly the admitted increments
    bands = spark.read.parquet(band_p)
    assert {r.doc_id for r in bands.filter(F.col("epoch_id") >= 0)
            .select("doc_id").distinct().collect()} == {102, 201}

    # same checkpoint, no new files: no-op
    q2 = run_streaming_admission(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(str(src)),
        history, band_p, out_p, str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_p).count() == 2

    # simulated replay: FRESH checkpoint over the same inputs re-runs
    # both epochs against stores already holding their output -- the
    # current-epoch exclusion must keep the result identical
    q3 = run_streaming_admission(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(str(src)),
        history, band_p, out_p, str(tmp_path / "ckpt2"),
    )
    q3.awaitTermination(120)
    replay = {r.doc_id: r.epoch_id
              for r in spark.read.parquet(out_p).collect()}
    assert replay == got
    assert spark.read.parquet(band_p).filter(
        F.col("epoch_id") >= 0
    ).select("doc_id").distinct().count() == 2
