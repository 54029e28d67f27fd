"""Tabular file surface: the reference's CSV/TXT/Excel scans and sinks
re-hosted on Spark readers/writers (SURVEY.md section 2.1 S1-S8).

- S1 delimiter sniff: try ``, ; \\t |`` in order, first parse yielding >1
  record wins (``file.go:262-292``).  The sniff runs driver-side on a
  small head sample (the reference reads the whole file into memory;
  at scale only the head is needed -- delimiters don't change mid-file).
- S2 strict CSV: ``spark.read.csv`` PERMISSIVE with explicit options.
- S3 Excel: plumbing present, decode gated behind import-try (sandbox has
  no xlsx lib) -- ``file.go:2127-2184``.
- S4 TXT lines: each non-blank line one document (``file.go:2220-2251``).
- S5 base64 payload decode (``file.go:224-229``).
- S6 upload validation: extension allowlist + size caps (``file.go:104-114``,
  ``file_processor.go:197-215``).
- S7/S8 CSV/JSON sinks (``file.go:1679-1757``, ``:1242-1277``) -- Spark
  writers; the reference's flush-every-100-rows is native buffering here.
"""

from __future__ import annotations

import csv
import io
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

SNIFF_DELIMITERS = (",", ";", "\t", "|")
ALLOWED_EXTENSIONS = (".csv", ".xlsx", ".xls", ".txt")
MAX_UPLOAD_BYTES = 50 * 1024 * 1024  # handler cap, file.go:112
MAX_PROCESS_BYTES = 100 * 1024 * 1024  # processor cap, file_processor.go:199


def sniff_delimiter(sample: str) -> str:
    """Delimiter sniff, reference order ``, ; \t |`` (file.go:262-292).

    The reference accepts the first delimiter yielding >1 RECORD -- since
    any 2-line sample parses as >=2 one-field records under ANY delimiter,
    that heuristic effectively always picks comma (Go and Python csv
    alike).  Documented resolution: prefer the first delimiter that also
    yields >1 COLUMN in the header row; fall back to the reference rule
    (first with >1 record, else comma) when no delimiter produces columns.
    """
    parsed: list[tuple[str, list[list[str]]]] = []
    for delim in SNIFF_DELIMITERS:
        try:
            records = list(csv.reader(io.StringIO(sample), delimiter=delim))
        except csv.Error:
            continue
        if len(records) > 1:
            parsed.append((delim, records))
    for delim, records in parsed:
        if len(records[0]) > 1:
            return delim
    return parsed[0][0] if parsed else ","


def validate_upload(filename: str, size_bytes: int) -> None:
    """S6 -- extension allowlist + size cap (raises ValueError)."""
    ext = os.path.splitext(filename)[1].lower()
    if ext not in ALLOWED_EXTENSIONS:
        raise ValueError(f"unsupported file type: {ext or '(none)'}")
    if size_bytes > MAX_UPLOAD_BYTES:
        raise ValueError(
            f"file too large: {size_bytes} > {MAX_UPLOAD_BYTES} bytes"
        )


def read_csv_sniffed(
    spark: SparkSession, path: str, sample_lines: int = 20
) -> tuple[DataFrame, str]:
    """S1 -- sniff the delimiter from the file head, then a proper
    distributed CSV scan (header row 0, PERMISSIVE = ragged rows allowed,
    matching FieldsPerRecord=-1)."""
    head = spark.read.text(path).limit(sample_lines).collect()
    sample = "\n".join(r.value for r in head)
    delim = sniff_delimiter(sample)
    df = (
        spark.read.option("header", True)
        .option("delimiter", delim)
        .option("mode", "PERMISSIVE")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    return df, delim


def read_txt_lines(spark: SparkSession, path: str) -> DataFrame:
    """S4 -- each non-blank line is one document.  Line numbers are
    assigned per the file order (the reference is sequential); at scale
    line identity comes from (file, offset), here zipWithIndex on the
    narrow scan."""
    lines = spark.read.text(path)
    rdd = lines.rdd.zipWithIndex().map(
        lambda pair: (pair[1], pair[0].value)
    )
    df = spark.createDataFrame(rdd, schema="line_number long, text string")
    return df.filter(F.length(F.trim("text")) > 0)


def decode_base64_column(df: DataFrame, col: str = "file_content") -> DataFrame:
    """S5 -- ``F.unbase64`` (WebSocket payloads arrive base64)."""
    return df.withColumn(col, F.unbase64(F.col(col)))


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """S3 -- Excel scan plumbing (sheets -> rows -> stringified cells,
    first row per sheet skipped, ``file.go:2127-2184``).  The xlsx decode
    itself needs openpyxl, absent in this sandbox -- the scan shape
    (binary in, (sheet, row_number, cells array) out via mapInPandas) is
    real; decode raises until the lib exists."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover - sandbox path
        raise NotImplementedError(
            "Excel decode requires openpyxl (not in this sandbox); "
            "the mapInPandas scan shape is implemented in "
            "sources/tabular.py:read_excel"
        ) from exc

    import pandas as pd

    binary = spark.read.format("binaryFile").load(path)

    def decode(batches):
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                wb = openpyxl.load_workbook(io.BytesIO(blob), read_only=True)
                for sheet in wb.worksheets:
                    for i, row in enumerate(sheet.iter_rows(values_only=True)):
                        if i == 0:
                            continue  # skip header per sheet (file.go:2160)
                        out.append(
                            (sheet.title, i,
                             [str(c) if c is not None else "" for c in row])
                        )
            yield pd.DataFrame(
                out, columns=["sheet", "row_number", "cells"]
            )

    return binary.mapInPandas(
        decode, schema="sheet string, row_number long, cells array<string>"
    )


def write_csv(df: DataFrame, path: str, delimiter: str = ",") -> None:
    """S7 -- streamed CSV export with the ORIGINAL delimiter restored
    (``file.go:1679-1757``)."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("delimiter", delimiter)
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """S8 -- JSON results export (``file.go:1242-1277``); line-delimited
    JSON rather than a hand-built array (idiomatic for distributed
    writers)."""
    df.write.mode("overwrite").json(path)
