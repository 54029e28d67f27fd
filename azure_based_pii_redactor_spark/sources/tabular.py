"""Tabular file surface: the reference's CSV/TXT/Excel scans and sinks
re-hosted on Spark readers/writers (SURVEY.md section 2.1 S1-S8).

- S1 delimiter sniff: try ``, ; \\t |`` in order, first parse yielding >1
  record wins (``file.go:262-292``).  The sniff runs driver-side on a
  small head sample (the reference reads the whole file into memory;
  at scale only the head is needed -- delimiters don't change mid-file).
- S2 strict CSV: ``spark.read.csv`` PERMISSIVE with explicit options.
- S3 Excel: full stdlib decode (zipfile + xml.etree -- an xlsx is a zip
  of XML), sheets -> rows -> stringified cells, header row skipped per
  sheet -- ``file.go:2127-2184``.
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
    """S6 -- extension allowlist + upload size cap (raises ValueError).
    The processor-stage cap is ``validate_process_size``."""
    ext = os.path.splitext(filename)[1].lower()
    if ext not in ALLOWED_EXTENSIONS:
        raise ValueError(f"unsupported file type: {ext or '(none)'}")
    if size_bytes > MAX_UPLOAD_BYTES:
        raise ValueError(
            f"file too large: {size_bytes} > {MAX_UPLOAD_BYTES} bytes"
        )


def validate_process_size(size_bytes: int) -> None:
    """S6 (second cap) -- the processing-stage limit
    (``file_processor.go:197-215``): applied before a decoded payload
    enters the scrub path (decode can inflate past the upload cap)."""
    if size_bytes > MAX_PROCESS_BYTES:
        raise ValueError(
            f"payload too large to process: {size_bytes} > "
            f"{MAX_PROCESS_BYTES} bytes"
        )


def read_csv_sniffed(
    spark: SparkSession, path: str, sample_lines: int = 20,
    multiline: bool = True,
) -> tuple[DataFrame, str]:
    """S1 -- sniff the delimiter from the file head, then a proper
    distributed CSV scan (header row 0, PERMISSIVE = ragged rows
    allowed).

    Two divergences from Go's ``FieldsPerRecord=-1`` are closed here:

    - PERMISSIVE silently TRUNCATES rows wider than the header (the
      reference scans every field of every record, so a dropped field
      is a missed-PII parity bug): the schema is widened to the widest
      row in the sniff sample (``_extraN`` columns).  Rows wider than
      anything sampled still truncate -- raise ``sample_lines`` for
      pathological files.
    - ``multiLine=True`` parses RFC-4180 quoted embedded newlines as
      one record (Go does); it makes each file single-task, which is
      the right trade for the reference's <=50 MB uploads -- pass
      ``multiline=False`` for crawl-scale splittable scans of files
      known to be newline-free.
    """
    head = spark.read.text(path).limit(sample_lines).collect()
    sample = "\n".join(r.value for r in head)
    delim = sniff_delimiter(sample)
    records = []
    try:
        records = list(csv.reader(io.StringIO(sample), delimiter=delim))
    except csv.Error:
        pass
    header = records[0] if records else []
    width = max((len(r) for r in records), default=0)
    reader = (
        spark.read.option("header", True)
        .option("delimiter", delim)
        .option("mode", "PERMISSIVE")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", bool(multiline))
    )
    if width > len(header) >= 1:
        from pyspark.sql import types as T

        names = list(header) + [
            f"_extra{i}" for i in range(width - len(header))
        ]
        reader = reader.schema(
            T.StructType(
                [T.StructField(n, T.StringType()) for n in names]
            )
        )
    return reader.csv(path), delim


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
    """S5 -- base64 payload decode (WebSocket payloads arrive base64).

    ``try_to_binary``, not ``unbase64``: under Spark 4's ANSI default a
    single malformed payload would throw from ``unbase64`` and kill the
    whole batch job; the reference fails per-file (file.go:224-229), so
    invalid rows decode to NULL for the caller to reject individually.
    """
    return df.withColumn(
        col, F.try_to_binary(F.col(col), F.lit("base64"))
    )


_XLSX_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_XLSX_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _cell_col_index(ref: str) -> int:
    """0-based column index from an A1-style cell ref ('C7' -> 2)."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1 if idx else 0


def _si_text(si) -> str:
    """Text of a sharedStrings <si>: plain <t> or rich-text <r><t> runs."""
    t = si.find(f"{_XLSX_MAIN_NS}t")
    if t is not None:
        return t.text or ""
    return "".join(
        (r.text or "")
        for r in si.iter(f"{_XLSX_MAIN_NS}t")
    )


def _stringify_cell(cell, shared: list[str]) -> str:
    """Stringify one <c> element the way the reference's excelize
    ``GetRows`` does (``file.go:2127-2184`` consumes rows of strings):
    shared/inline/formula strings verbatim, booleans TRUE/FALSE, numbers
    as their stored lexical form."""
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_XLSX_MAIN_NS}is")
        return _si_text(is_el) if is_el is not None else ""
    v = cell.find(f"{_XLSX_MAIN_NS}v")
    if v is None or v.text is None:
        return ""
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    return v.text


def parse_xlsx(blob: bytes) -> list[tuple[str, int, list[str]]]:
    """Pure-stdlib xlsx decode (zipfile + xml.etree): workbook sheet order,
    sharedStrings table, sparse-cell padding via A1 refs.  Yields
    ``(sheet_title, row_index, cells)`` for every row INCLUDING row 0 --
    the header skip is the scan's job, mirroring excelize ``GetRows``
    returning all rows and ``file.go:2160`` skipping the first."""
    import xml.etree.ElementTree as ET
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(blob))

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = [_si_text(si) for si in root.iter(f"{_XLSX_MAIN_NS}si")]

    # rid -> worksheet part path (workbook rels), then workbook sheet order.
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{_PKG_REL_NS}Relationship")
    }
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    out: list[tuple[str, int, list[str]]] = []
    for sheet in wb.iter(f"{_XLSX_MAIN_NS}sheet"):
        title = sheet.get("name") or ""
        target = rid_target.get(sheet.get(f"{_XLSX_REL_NS}id"), "")
        if target.startswith("/"):
            # absolute package path (Apache-POI style): use as-is
            part = target[1:]
        elif target.startswith("xl/"):
            part = target
        else:
            part = f"xl/{target}"  # workbook-relative (the common form)
        ws = ET.fromstring(zf.read(part))
        # Row index comes from the row's r attribute (1-based), NOT from
        # enumerate: Excel OMITS empty rows from the XML, so a sheet whose
        # row 1 is blank stores its first data row as <row r="2"> -- by
        # enumerate it would become index 0 and read_excel would eat it as
        # the header.  Skipped rows are PADDED as empty cell lists to
        # match excelize GetRows semantics (the reference iterates a dense
        # row list, ``file.go:2127-2184``).  Writers that omit r fall
        # back to the running row counter (next_i).
        next_i = 0
        for row in ws.iter(f"{_XLSX_MAIN_NS}row"):
            r_attr = row.get("r")
            i = int(r_attr) - 1 if r_attr else next_i
            while next_i < i:  # pad gap rows (blank in the sheet)
                out.append((title, next_i, []))
                next_i += 1
            cells: list[str] = []
            for cell in row.findall(f"{_XLSX_MAIN_NS}c"):
                ref = cell.get("r")
                col = _cell_col_index(ref) if ref else len(cells)
                while len(cells) <= col:
                    cells.append("")
                cells[col] = _stringify_cell(cell, shared)
            out.append((title, i, cells))
            next_i = i + 1
    return out


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """S3 -- distributed Excel scan (sheets -> rows -> stringified cells,
    first row per sheet skipped, ``file.go:2127-2184``).  Decode is the
    pure-stdlib ``parse_xlsx`` (zipfile + xml.etree) so no xlsx library is
    needed; each file decodes inside one Arrow-batched mapInPandas task --
    at scale many files parallelize across the binaryFile scan's tasks."""
    import pandas as pd

    binary = spark.read.format("binaryFile").load(path)

    def decode(batches):
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                for title, i, cells in parse_xlsx(bytes(blob)):
                    if i == 0:
                        continue  # skip header per sheet (file.go:2160)
                    out.append((title, i, cells))
            yield pd.DataFrame(
                out, columns=["sheet", "row_number", "cells"]
            )

    return binary.mapInPandas(
        decode, schema="sheet string, row_number long, cells array<string>"
    )


def write_csv(df: DataFrame, path: str, delimiter: str = ",") -> None:
    """S7 -- streamed CSV export with the ORIGINAL delimiter restored
    (``file.go:1679-1757``).  Quote/escape pinned to RFC-4180 doubled
    quotes: Spark's default backslash-escape output would corrupt on
    round-trip through Go's encoding/csv, Excel, or this module's own
    read path."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """S8 -- JSON results export (``file.go:1242-1277``); line-delimited
    JSON rather than a hand-built array (idiomatic for distributed
    writers)."""
    df.write.mode("overwrite").json(path)
