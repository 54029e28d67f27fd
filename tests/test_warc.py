"""WARC ingestion: pure-stdlib record parsing (plain, gzip-member, and
HTTP-wrapped layouts) and the end-to-end equivalence with the parquet
pages path through the full scrub pipeline."""

from datetime import datetime

import pytest

from azure_based_pii_redactor_spark.sources.warc import (
    encode_warc,
    parse_warc,
    read_warc,
)

PAGES = [
    {"url": "http://a.example/x", "warc_ts": datetime(2024, 1, 2, 3, 4, 5),
     "html": b"<html><body>hello world page one</body></html>"},
    {"url": "http://b.example/y", "warc_ts": datetime(2024, 2, 3, 4, 5, 6),
     "html": "<html><body>unicode café 雪</body></html>".encode()},
    {"url": "http://c.example/z", "warc_ts": None, "html": b""},
]


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("http", [False, True])
def test_warc_roundtrip(gz, http):
    got = parse_warc(encode_warc(PAGES, gzip_members=gz, http_wrap=http))
    assert [(r["url"], r["warc_ts"], r["html"]) for r in got] == [
        (p["url"], p["warc_ts"], p["html"]) for p in PAGES
    ]


def test_warc_skips_non_page_records():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
        b"\r\nblob\r\n\r\n"
    )
    rest = encode_warc(PAGES[:1], gzip_members=False)
    got = parse_warc(info + rest)
    assert len(got) == 1 and got[0]["url"] == PAGES[0]["url"]


def test_warc_tolerates_truncation_and_bad_date():
    rec = encode_warc(PAGES[:1], gzip_members=False)
    assert parse_warc(rec[: len(rec) // 2]) == []  # truncated header/payload
    bad = rec.replace(b"WARC-Date: 2024-01-02T03:04:05Z",
                      b"WARC-Date: not-a-date      ")
    got = parse_warc(bad)
    assert got[0]["warc_ts"] is None  # page kept, ts nulled


def test_read_warc_pipeline_equals_parquet_path(spark, tmp_path):
    """The WARC route and the parquet route must produce identical
    pipeline decisions for the same pages."""
    from azure_based_pii_redactor_spark.engine.pipeline import (
        run_scrub_pipeline,
    )
    from azure_based_pii_redactor_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 200, seed=11, parts=2)
    pdf = pages.toPandas()
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    recs = [
        {"url": r.url, "warc_ts": r.warc_ts, "html": bytes(r.html)}
        for r in pdf.itertuples(index=False)
    ]
    (warc_dir / "part0.warc.gz").write_bytes(
        encode_warc(recs[:100], http_wrap=True)
    )
    (warc_dir / "part1.warc.gz").write_bytes(encode_warc(recs[100:]))

    from_warc = read_warc(spark, str(warc_dir))
    assert from_warc.count() == 200

    def decisions(df):
        return {
            r.url: (r.keep, r.drop_reason, r.n_entities, r.scrubbed_text)
            for r in run_scrub_pipeline(df, scrub_all=True).collect()
        }

    assert decisions(from_warc) == decisions(pages)


def test_run_pipeline_warc_input(tmp_path):
    """The spark-submit entrypoint consumes raw .warc.gz input end to
    end (--input-format warc): scrubbed output + lineage written, JSON
    summary printed.  Runs as a subprocess so the job's own session
    lifecycle doesn't touch the shared test session."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    warc_dir = tmp_path / "warc_in"
    warc_dir.mkdir()
    recs = [
        {"url": f"http://w.example/{i}", "warc_ts": datetime(2024, 3, 1),
         "html": f"<html><body>doc {i} body with some words here"
                 f"</body></html>".encode()}
        for i in range(40)
    ]
    (warc_dir / "in.warc.gz").write_bytes(encode_warc(recs, http_wrap=True))
    env = dict(os.environ, PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "run_pipeline.py"),
         "--input", str(warc_dir), "--input-format", "warc",
         "--output", str(tmp_path / "out"),
         "--lineage", str(tmp_path / "lineage"),
         "--run-id", "warctest"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][0]
    )
    assert summary["n_docs"] == 40


def test_warc_parser_fuzz():
    """The parser must never crash or desynchronize on mangled input:
    random corruption of valid WARC bytes either yields a subset of the
    valid records or nothing -- never an exception or a record with a
    wrong payload for its URI."""
    import random

    base_pages = [
        {"url": f"http://f.example/{i}", "warc_ts": datetime(2024, 5, 1),
         "html": bytes(random.Random(i).randbytes(random.Random(i).randint(0, 200)))}
        for i in range(8)
    ]
    valid = encode_warc(base_pages, gzip_members=False)
    by_url = {p["url"]: p["html"] for p in base_pages}
    rng = random.Random(1234)
    for _ in range(300):
        blob = bytearray(valid)
        for _ in range(rng.randint(1, 6)):
            op = rng.randint(0, 2)
            pos = rng.randrange(len(blob)) if blob else 0
            if op == 0 and blob:
                blob[pos] = rng.randrange(256)
            elif op == 1:
                del blob[pos : pos + rng.randint(1, 40)]
            else:
                blob[pos:pos] = bytes(rng.randbytes(rng.randint(1, 20)))
        got = parse_warc(bytes(blob))  # must not raise
        for r in got:
            if r["url"] in by_url and r["html"] != by_url[r["url"]]:
                # corrupted payloads are acceptable ONLY when the
                # corruption touched that record's own byte range --
                # which we can't cheaply localize, so just require the
                # parse to stay structurally sane:
                assert isinstance(r["html"], bytes)
        assert len(got) <= len(base_pages) + 6  # no runaway record storm


def test_warc_conversion_payload_not_http_stripped():
    """conversion records carry their payload directly: content that
    merely STARTS with 'HTTP/' must not be header-stripped (only
    response records get the HTTP unwrap)."""
    payload = b"HTTP/1.1 tutorial intro\r\n\r\nthe actual lesson body"
    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://t.example/http-tutorial\r\n"
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n" + payload + b"\r\n\r\n"
    )
    got = parse_warc(rec)
    assert got[0]["html"] == payload  # untouched


def test_warc_naive_date_is_utc_and_gzip_corruption_contained():
    """A WARC-Date without an offset is UTC per spec (never host-local);
    a corrupted gzip member stops decoding but keeps prior records."""
    rec = encode_warc(PAGES[:1], gzip_members=False).replace(
        b"WARC-Date: 2024-01-02T03:04:05Z", b"WARC-Date: 2024-01-02T03:04:05 "
    )
    got = parse_warc(rec)
    assert got[0]["warc_ts"] == datetime(2024, 1, 2, 3, 4, 5)

    blob = bytearray(encode_warc(PAGES[:2], gzip_members=True))
    blob[-10] ^= 0xFF  # corrupt the SECOND member's tail
    got = parse_warc(bytes(blob))
    assert [r["url"] for r in got] == [PAGES[0]["url"]]  # first survives


def test_write_warc_corpus_roundtrips(spark, tmp_path):
    """The bench fixture writer: a distributed-written .warc.gz corpus
    reads back page-for-page (url/ts/html) against the parquet-shaped
    generator output, at the one-file-per-task granularity."""
    import os

    from azure_based_pii_redactor_spark.sources.pages import generate_pages
    from azure_based_pii_redactor_spark.sources.warc import (
        read_warc,
        write_warc_corpus,
    )

    d = str(tmp_path / "warc")
    n = write_warc_corpus(spark, d, 300, seed=11, files=8)
    assert n == 300
    assert len([f for f in os.listdir(d) if f.endswith(".warc.gz")]) == 8
    got = read_warc(spark, d + "/*.warc.gz").select(
        "url", "warc_ts", "html").toPandas().set_index("url").sort_index()
    want = generate_pages(spark, 300, seed=11, parts=8).select(
        "url", "warc_ts", "html").toPandas().set_index("url").sort_index()
    assert len(got) == 300
    assert (got.index == want.index).all()
    assert (got["warc_ts"] == want["warc_ts"]).all()
    assert all(
        bytes(a) == bytes(b)
        for a, b in zip(got["html"], want["html"])
    )


def test_write_wet_corpus_roundtrips(spark, tmp_path):
    """The WET bench fixture writer: a distributed-written .wet.gz
    corpus reads back page-for-page with the generator's TEXT in the
    text column (html NULL -- the extraction stage must pass it
    through untouched)."""
    import os

    from azure_based_pii_redactor_spark.sources.pages import generate_pages
    from azure_based_pii_redactor_spark.sources.warc import (
        read_wet,
        write_wet_corpus,
    )

    d = str(tmp_path / "wet")
    n = write_wet_corpus(spark, d, 300, seed=11, files=8)
    assert n == 300
    assert len([f for f in os.listdir(d) if f.endswith(".wet.gz")]) == 8
    got = read_wet(spark, d + "/*.wet.gz").toPandas().set_index(
        "url").sort_index()
    want = generate_pages(spark, 300, seed=11, parts=8).select(
        "url", "warc_ts", "text").toPandas().set_index("url").sort_index()
    assert len(got) == 300
    assert (got.index == want.index).all()
    assert (got["warc_ts"] == want["warc_ts"]).all()
    assert got["html"].isna().all()
    assert (got["text"] == want["text"]).all()


def test_read_wet_conversion_records(spark, tmp_path):
    """WET front door: conversion payloads land in the TEXT column
    (tolerantly decoded, html NULL) so literal '<' and '&' survive
    verbatim (an HTML extraction would mangle them); non-conversion
    records in a mixed stream are skipped; and the frame feeds the
    scrub pipeline directly."""
    from datetime import datetime

    from azure_based_pii_redactor_spark.engine.pipeline import (
        run_scrub_pipeline,
    )
    from azure_based_pii_redactor_spark.sources.warc import (
        encode_warc,
        read_wet,
    )

    text = ("The measured value satisfied x < y & y < z in the trial. "
            * 8)
    wet = encode_warc(
        [
            {"url": "https://a.example/wet1",
             "warc_ts": datetime(2024, 5, 1), "html": text.encode()},
            {"url": "https://a.example/wet2",
             "warc_ts": datetime(2024, 5, 2),
             "html": b"plain text with bad utf8 \xff tail " * 4},
        ],
        record_type="conversion",
    )
    # a stray response record must be SKIPPED by the WET reader
    mixed = wet + encode_warc(
        [{"url": "https://a.example/html", "warc_ts": None,
          "html": b"<html><body>hi</body></html>"}]
    )
    p = tmp_path / "f.warc.wet.gz"
    p.write_bytes(mixed)

    rows = {r.url: r for r in read_wet(spark, str(p)).collect()}
    assert set(rows) == {"https://a.example/wet1",
                         "https://a.example/wet2"}
    r1 = rows["https://a.example/wet1"]
    assert r1.text == text           # '<' and '&' byte-for-byte intact
    assert r1.html is None
    assert "�" in rows["https://a.example/wet2"].text  # tolerant
    # feeds the pipeline directly (extraction passthrough on html NULL)
    out = run_scrub_pipeline(read_wet(spark, str(p))).collect()
    assert {r.url for r in out} == set(rows)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no HTTP envelope"):
        encode_warc([{"url": "u", "warc_ts": None, "html": b"x"}],
                    record_type="conversion", http_wrap=True)
