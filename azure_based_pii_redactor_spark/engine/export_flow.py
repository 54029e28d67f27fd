"""Distributed review/export flow (SURVEY.md section 3.3): recompute
scrubbed text from STORED entities, honoring human approval decisions.

The reference loads rows + entities from Postgres, groups entities per row
(J3 hand-rolled hash join, ``file.go:1446-1449``), applies approval
overrides, and re-splices with the export-variant replacement
(``buildRowRedaction``, ``file.go:1071-1133``).  Here:

- source of original text: the pages table (re-extracted from html --
  the scrub output deliberately does not duplicate originals at 10^12
  scale);
- stored entities: the scrub output's ``entities`` column, joined back by
  url (broadcast-friendly: the url join is 1:1 and AQE picks the
  strategy);
- approvals: a small DataFrame ``(url, start, end, type, approved)``
  left-joined onto exploded entities; entities without a verdict default
  to approved (the reference's ``approved`` column defaults true,
  db.go:193);
- splice: the kernel's approval-aware ``build_row_redaction`` inside one
  ``mapInPandas`` (export-variant labels, dual bounds checks).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..kernel.entities import Entity
from ..kernel.export import build_row_redaction
from .pipeline import extract_text

EXPORT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("exported_text", T.StringType(), True),
        T.StructField("n_applied", T.IntegerType(), False),
    ]
)


def export_scrubbed(
    pages: DataFrame,
    scrub_out: DataFrame,
    approvals: DataFrame | None = None,
    redaction_mode: str = "replace",
    custom_labels: dict | None = None,
) -> DataFrame:
    """(pages, scrub output, approvals) -> (url, exported_text, n_applied).

    ``approvals`` columns: url, start, end, type, approved(boolean).
    """
    labels = dict(custom_labels or {})
    # export ONLY scrubbed rows: under the default scrub_all=False the
    # quality-dropped docs were never scrubbed, and exporting them would
    # emit their RAW text (with all PII intact) indistinguishable from
    # clean rows
    scrub_out = scrub_out.filter(F.col("scrubbed_text").isNotNull())
    exploded = (
        scrub_out.filter(F.col("n_entities") > 0)
        .select("url", F.explode("entities").alias("e"))
        .select(
            "url",
            F.col("e.type").alias("type"),
            F.col("e.text").alias("text"),
            F.col("e.start").alias("start"),
            F.col("e.end").alias("end"),
            F.col("e.confidence").alias("confidence"),
            F.col("e.category").alias("category"),
        )
    )
    if approvals is not None:
        # conflicting verdicts for one entity (append-shaped review table)
        # must not multiply the exploded row and double-splice; collapse
        # conservatively -- any disapproval wins
        approvals = (
            approvals.groupBy("url", "start", "end", "type")
            .agg(F.min(F.col("approved").cast("boolean")).alias("approved"))
        )
        exploded = (
            exploded.join(
                F.broadcast(
                    approvals.select(
                        "url", "start", "end", "type",
                        F.col("approved").alias("_approved"),
                    )
                ),
                ["url", "start", "end", "type"],
                "left",
            )
            .withColumn(
                "approved", F.coalesce(F.col("_approved"), F.lit(True))
            )
            .drop("_approved")
        )
    else:
        exploded = exploded.withColumn("approved", F.lit(True))

    regrouped = exploded.groupBy("url").agg(
        F.collect_list(
            F.struct("type", "text", "start", "end", "confidence",
                     "category", "approved")
        ).alias("stored")
    )
    src = (
        pages.select("url", "html", "text")
        .join(scrub_out.select("url"), "url", "left_semi")  # scrubbed only
        .join(regrouped, "url", "left")
    )

    def rebuild(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, outs, ns = [], [], []
            for url, html, text, stored in zip(
                pdf["url"], pdf["html"], pdf["text"], pdf["stored"]
            ):
                original = extract_text(html)
                if original is None:
                    original = text or ""
                triples = []
                if stored is not None:
                    for i, e in enumerate(stored):
                        triples.append(
                            (
                                Entity(e["type"], e["text"], e["start"],
                                       e["end"], e["confidence"],
                                       e["category"]),
                                i,
                                bool(e["approved"]),
                            )
                        )
                exported, n = build_row_redaction(
                    original, triples, redaction_mode, labels
                )
                urls.append(url)
                outs.append(exported)
                ns.append(n)
            yield pd.DataFrame(
                {"url": urls, "exported_text": outs, "n_applied": ns}
            )

    return src.mapInPandas(rebuild, schema=EXPORT_SCHEMA)
