"""JSON-Lines pages interchange: the ``.jsonl`` / ``.jsonl.gz`` corpus
format most LLM data pipelines exchange (one JSON document per line).

Spark's native json reader handles it distributed (gzip decompressed
per-file; like WARC, a .gz file is one task -- file count is the
parallelism unit).  The only impedance with PAGES_SCHEMA is the binary
``html`` column: JSON has no bytes type, so the payload travels
base64-encoded in an ``html_b64`` field (the same convention the
reference's WebSocket uploads use -- file.go:224-229) and is decoded
back to binary inside the scan projection (JVM ``try_to_binary``:
one malformed row decodes to NULL instead of killing the task).

Schema on read is EXPLICIT -- json inference would both cost an extra
pass and silently type drifting fields; unknown extra fields per line
are ignored, missing fields arrive NULL (the tolerant posture a
heterogeneous crawl dump needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..engine.schema import PAGES_SCHEMA

# wire schema: html carried as base64 text
_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html_b64", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Distributed ``.jsonl[.gz]`` scan -> PAGES_SCHEMA frame."""
    raw = spark.read.schema(_JSONL_SCHEMA).json(path)
    return raw.select(
        "url",
        "warc_ts",
        F.try_to_binary(F.col("html_b64"), F.lit("base64")).alias("html"),
        "text",
        "lang",
    )


def write_pages_jsonl(
    pages: DataFrame, path: str, compression: str | None = "gzip"
) -> None:
    """PAGES_SCHEMA frame -> ``.jsonl[.gz]`` files (html base64-encoded;
    Spark writes one file per partition -- repartition first to control
    the file count, the scan-back parallelism unit)."""
    out = pages.select(
        "url",
        "warc_ts",
        F.base64(F.col("html")).alias("html_b64"),
        "text",
        "lang",
    )
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


__all__ = ["read_pages_jsonl", "write_pages_jsonl"]
