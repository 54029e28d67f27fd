"""The full web-scale story in one flow, at toy scale: raw .warc.gz
crawl -> url-level dedup (canonical, newest fetch wins) -> fused
quality-filter + PII-scrub pipeline -> checkpointed bucket-partitioned
write with lineage -> idempotent resume.  Every stage is tested on its
own elsewhere; this pins that they COMPOSE."""

from datetime import datetime

from pyspark.sql import functions as F

from azure_based_pii_redactor_spark.engine.checkpoint import run_checkpointed
from azure_based_pii_redactor_spark.engine.operators.urls import (
    dedup_pages_by_url,
)
from azure_based_pii_redactor_spark.sources.warc import encode_warc, read_warc

GOOD = (
    "The children walked to the market in the morning and the weather "
    "was warm. They bought fresh bread and fruit from the vendors. "
    "Contact the organizer at events@example.com for more details. "
    "Everyone agreed that the market was the best place in the town "
    "to spend a morning with the family and friends from the village."
)


def _wrap(text: str) -> bytes:
    return f"<html><body>{text}</body></html>".encode()


def test_warc_to_scrubbed_output_with_resume(spark, tmp_path):
    # -- crawl with url duplicates (http/https + tracking params, the
    # newer fetch carries the email; the older must be dropped) --------
    recs = [
        {"url": "http://www.site.example/page?utm_source=feed",
         "warc_ts": datetime(2024, 1, 1), "html": _wrap("OLD " + GOOD)},
        {"url": "https://site.example/page",
         "warc_ts": datetime(2024, 6, 1), "html": _wrap(GOOD)},
    ] + [
        {"url": f"https://site.example/doc{i}",
         "warc_ts": datetime(2024, 3, i + 1), "html": _wrap(GOOD)}
        for i in range(30)
    ]
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "seg0.warc.gz").write_bytes(
        encode_warc(recs, http_wrap=True)
    )

    pages = dedup_pages_by_url(read_warc(spark, str(warc_dir))).drop(
        "canonical_url"
    )
    assert pages.count() == 31  # 32 fetches, one canonical-url collision

    out_dir = str(tmp_path / "scrubbed")
    lineage = str(tmp_path / "lineage")
    n = run_checkpointed(
        pages, out_dir, lineage, "e2e", n_buckets=8, scrub_all=True
    )
    assert n == 31

    out = spark.read.parquet(out_dir)
    rows = {r.url: r for r in out.collect()}
    # the url-dup resolved to the NEWEST fetch (no "OLD " prefix body)
    assert "https://site.example/page" in rows
    assert "http://www.site.example/page?utm_source=feed" not in rows
    page = rows["https://site.example/page"]
    assert page.keep, page.drop_reason
    # the email was scrubbed out of the kept text
    assert "events@example.com" not in page.scrubbed_text
    assert "[REDACTED_EMAIL]" in page.scrubbed_text

    # -- resume: a second run over the same input is a no-op ----------
    n2 = run_checkpointed(
        pages, out_dir, lineage, "e2e", n_buckets=8, scrub_all=True
    )
    assert n2 == 0
    assert spark.read.parquet(out_dir).count() == 31
    # lineage recorded every bucket exactly once for the run
    lin = spark.read.parquet(lineage).filter(F.col("run_id") == "e2e")
    assert lin.count() > 0
