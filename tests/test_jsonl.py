"""JSON-Lines pages interchange: roundtrip + pipeline-decisions parity
with the parquet path (same contract the WARC reader carries)."""

import pyspark.sql.functions as F

from azure_based_pii_redactor_spark.engine.pipeline import (
    run_scrub_pipeline,
)
from azure_based_pii_redactor_spark.sources.jsonl import (
    read_pages_jsonl,
    write_pages_jsonl,
)
from azure_based_pii_redactor_spark.sources.pages import generate_pages


def test_jsonl_roundtrip_byte_exact(spark, tmp_path):
    d = str(tmp_path / "pages_jsonl")
    pages = generate_pages(spark, 200, seed=23, parts=4)
    write_pages_jsonl(pages, d)
    got = read_pages_jsonl(spark, d).toPandas().set_index("url").sort_index()
    want = pages.toPandas().set_index("url").sort_index()
    assert len(got) == 200
    assert (got.index == want.index).all()
    assert (got["warc_ts"] == want["warc_ts"]).all()
    assert (got["lang"] == want["lang"]).all()
    assert all(
        bytes(a) == bytes(b) for a, b in zip(got["html"], want["html"])
    )


def test_jsonl_pipeline_decisions_match_parquet_path(spark, tmp_path):
    """The format must be transparent to the kernel: keep/drop and
    scrubbed text identical to the parquet-read corpus."""
    pq = str(tmp_path / "pq")
    jl = str(tmp_path / "jl")
    pages = generate_pages(spark, 150, seed=31, parts=2)
    pages.write.mode("overwrite").parquet(pq)
    write_pages_jsonl(pages, jl)
    cols = ["url", "keep", "drop_reason", "scrubbed_text"]
    a = (
        run_scrub_pipeline(spark.read.parquet(pq), scrub_all=True)
        .select(*cols).toPandas().set_index("url").sort_index()
    )
    b = (
        run_scrub_pipeline(read_pages_jsonl(spark, jl), scrub_all=True)
        .select(*cols).toPandas().set_index("url").sort_index()
    )
    assert a.equals(b)


def test_jsonl_tolerates_malformed_base64_and_missing_fields(spark, tmp_path):
    import gzip
    import os

    d = str(tmp_path / "messy")
    os.makedirs(d)
    lines = (
        '{"url":"https://a.example/p","html_b64":"!!!bad!!!","text":"t1"}\n'
        '{"url":"https://b.example/p","extra_field":1,"text":"t2"}\n'
    )
    with gzip.open(os.path.join(d, "part-0.jsonl.gz"), "wt") as f:
        f.write(lines)
    got = {
        r.url: r
        for r in read_pages_jsonl(spark, d).collect()
    }
    assert len(got) == 2
    assert got["https://a.example/p"].html is None  # bad b64 -> NULL
    assert got["https://b.example/p"].html is None  # missing -> NULL
    assert got["https://b.example/p"].text == "t2"


def test_run_pipeline_jsonl_input(spark, tmp_path):
    """The spark-submit entrypoint consumes .jsonl.gz input end to end
    (--input-format jsonl); subprocess so the job's session lifecycle
    doesn't touch the shared test session."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = str(tmp_path / "jl_in")
    write_pages_jsonl(generate_pages(spark, 40, seed=3, parts=2), src)
    env = dict(os.environ, PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "run_pipeline.py"),
         "--input", src, "--input-format", "jsonl",
         "--output", str(tmp_path / "out"),
         "--lineage", str(tmp_path / "lineage"),
         "--run-id", "jsonltest"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][0]
    )
    assert summary["n_docs"] == 40
