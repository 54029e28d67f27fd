"""Oracle-differential test (SURVEY.md section 5 item 1; the BASELINE.json
correctness gate): the Spark pipeline must agree with the single-process
pure-Python oracle byte-for-byte on scrubbed_text per url, and exactly on
keep/drop labels (F1 == 1.0 here, gate is >= 0.99)."""

import pandas as pd
import numpy as np

from azure_based_pii_redactor_spark.engine.pipeline import (
    documents_as_pages,
    extract_text,
    run_scrub_pipeline,
)
from azure_based_pii_redactor_spark.kernel.redact import RedactOptions
from azure_based_pii_redactor_spark.kernel.scrub import scrub_text
from azure_based_pii_redactor_spark.quality.decide import decide
from azure_based_pii_redactor_spark.sources.pages import (
    generate_batch,
    generate_pages,
)

N = 400
FEEDBACK = [
    {"entity_text": "placeholder value", "entity_type": "custom_trained",
     "user_decision": "correct"},
]


def oracle_frame(seed: int, n: int, feedback=()) -> pd.DataFrame:
    """Single-process oracle over the same generated rows."""
    pdf = generate_batch(np.arange(n), seed)
    rows = []
    for r in pdf.itertuples(index=False):
        text = extract_text(r.html)
        d = decide(text)
        scrubbed = None
        n_entities = 0
        if d.keep:
            s = scrub_text(text, feedback_history=list(feedback))
            scrubbed = s.scrubbed_text
            n_entities = len(s.entities)
        rows.append((r.url, text == r.text, d.keep, d.drop_reason,
                     d.lang_pred, scrubbed, n_entities))
    df = pd.DataFrame(rows, columns=[
        "url", "extracted_ok", "keep", "drop_reason", "lang_pred",
        "scrubbed_text", "n_entities"]).sort_values("url").reset_index(drop=True)
    return df.astype({"n_entities": "int32"})  # Spark IntegerType


def spark_frame(spark, seed: int, n: int, feedback=(), parts=8) -> pd.DataFrame:
    pages = generate_pages(spark, n, seed=seed, parts=parts)
    out = run_scrub_pipeline(pages, feedback=list(feedback))
    return (
        out.select("url", "extracted_ok", "keep", "drop_reason", "lang_pred",
                   "scrubbed_text", "n_entities")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_generator_partitioning_invariance(spark):
    a = generate_pages(spark, 120, seed=7, parts=2).toPandas().sort_values("url")
    b = generate_pages(spark, 120, seed=7, parts=8).toPandas().sort_values("url")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_differential_byte_identical(spark):
    want = oracle_frame(42, N, FEEDBACK)
    got = spark_frame(spark, 42, N, FEEDBACK)
    pd.testing.assert_frame_equal(got, want)
    # explicit gate statements
    assert (got["keep"] == want["keep"]).all()  # F1 == 1.0
    kept = want["keep"]
    assert (got.loc[kept, "scrubbed_text"] == want.loc[kept, "scrubbed_text"]).all()
    assert got["extracted_ok"].all()  # byte-identical extraction per url


def test_pipeline_partitioning_invariance(spark):
    a = spark_frame(spark, 11, 150, parts=3)
    b = spark_frame(spark, 11, 150, parts=8)
    pd.testing.assert_frame_equal(a, b)


def test_entities_schema_roundtrip(spark):
    pages = generate_pages(spark, 200, seed=42)
    out = run_scrub_pipeline(pages)
    row = (out.filter("n_entities > 0")
              .select("entities").limit(1).collect())[0]
    e = row["entities"][0]
    assert set(e.asDict()) == {"type", "text", "start", "end",
                               "confidence", "category"}
    assert e["end"] > e["start"] >= 0


def test_scrub_all_flag(spark):
    pages = generate_pages(spark, 100, seed=5)
    out = run_scrub_pipeline(pages, scrub_all=True)
    assert out.filter("scrubbed_text IS NULL").count() == 0


def test_documents_adapter(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = documents_as_pages(docs)
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    out = run_scrub_pipeline(pages.limit(50))
    assert out.count() == 50


def test_redact_options_flow_through(spark):
    pages = generate_pages(spark, 150, seed=42)
    out = run_scrub_pipeline(
        pages, options=RedactOptions(redaction_mode="mask",
                                     custom_labels={"url": "<URL>"})
    )
    texts = [r.scrubbed_text for r in
             out.filter("keep AND n_entities > 0").collect()]
    assert texts, "expected some kept docs with entities"
    joined = "\n".join(texts)
    assert "[EMAIL]" not in joined  # custom default labels still apply
