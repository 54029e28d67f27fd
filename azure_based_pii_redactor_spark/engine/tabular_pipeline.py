"""Tabular (CSV-shaped) scrub flow: the reference's main batch path
(SURVEY.md section 3.2) and review/export path (section 3.3) on Spark.

Row scrub: PII-enabled cells joined with " " (P1, ``file.go:396-404``),
one kernel pass per row text, per-row entity list kept WITH the row (the
J3 group-join is free because entities never leave their row).

Cell export: three modes --
- ``canonical`` (default): stored entities re-anchored to cell-local
  offsets by substring search -- honors approvals/skip_ids, training-
  injected entities and stored provenance with correct positions.
- ``compat``: the reference's containment splice (row-level offsets
  against the cell string, quirks preserved -- kernel/export.py).
- ``rescrub``: fresh per-cell kernel detection (ignores stored entities
  and approvals by design -- a clean-slate re-run, not a review export).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..kernel.entities import Entity
from ..kernel.export import redact_cell_value, redact_cell_value_anchored
from ..kernel.redact import RedactOptions
from ..kernel.scrub import scrub_text
from .schema import ENTITY_TYPE

ROW_TEXT_COL = "__row_text"


def scrub_tabular(
    df: DataFrame,
    enabled_cols: Sequence[str],
    options: RedactOptions = RedactOptions(),
    feedback: Sequence[dict] = (),
) -> DataFrame:
    """Add (scrubbed_row_text, entities, n_entities) from the joined
    PII-enabled cells.  All original columns pass through."""
    spark = df.sparkSession
    bc_feedback = spark.sparkContext.broadcast(list(feedback))
    cols = list(df.columns)
    unknown = [c for c in enabled_cols if c not in cols]
    if unknown:
        # a typo'd PII-enabled column silently disabling scrubbing is a
        # PII leak; fail loudly instead
        raise ValueError(f"enabled_cols not in DataFrame: {unknown}")
    enabled = [c for c in cols if c in set(enabled_cols)]
    with_text = df.withColumn(
        ROW_TEXT_COL,
        F.concat_ws(" ", *[F.coalesce(F.col(c).cast("string"), F.lit(""))
                           for c in enabled]),
    )

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(with_text.schema.fields)
        + [
            T.StructField("scrubbed_row_text", T.StringType()),
            T.StructField("entities", T.ArrayType(ENTITY_TYPE)),
            T.StructField("n_entities", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fb = bc_feedback.value
        for pdf in batches:
            scrubbed, ents, counts = [], [], []
            for t in pdf[ROW_TEXT_COL]:
                r = scrub_text(t or "", options, feedback_history=fb)
                scrubbed.append(r.scrubbed_text)
                ents.append([e._asdict() for e in r.entities])
                counts.append(len(r.entities))
            yield pdf.assign(
                scrubbed_row_text=scrubbed, entities=ents, n_entities=counts
            )

    return with_text.mapInPandas(run, schema=out_schema).drop(ROW_TEXT_COL)


def export_tabular_cells(
    scrubbed: DataFrame,
    enabled_cols: Sequence[str],
    redaction_mode: str = "replace",
    custom_labels: dict | None = None,
    skip_entities: frozenset[tuple] | None = None,
    row_key: str | None = None,
    mode: str = "canonical",
) -> DataFrame:
    """Per-cell redacted output (the structured CSV export,
    ``file.go:1866-1895``).  Entities come from the stored ``entities``
    column (except ``rescrub``); cells NOT in ``enabled_cols`` pass
    through untouched (``file.go:1884-1886`` semantics).

    Review overrides: ``skip_entities`` is a set of
    ``(row_key_value, start, end, type)`` tuples addressing ONE entity of
    ONE row (the reference's skip set holds globally-unique DB ids;
    per-row indexes would select the i-th entity of EVERY row).
    ``row_key`` names the unique row-id column and is required with
    ``skip_entities``."""
    if mode not in ("canonical", "compat", "rescrub"):
        raise ValueError(f"unknown export mode: {mode}")
    if skip_entities is not None:
        if mode == "rescrub":
            raise ValueError(
                "rescrub mode re-detects from scratch and cannot honor "
                "skip_entities; use 'canonical' for approval-aware export"
            )
        if row_key is None or row_key not in scrubbed.columns:
            raise ValueError(
                "skip_entities requires row_key naming a unique column"
            )
    labels = dict(custom_labels or {})
    enabled = list(enabled_cols)
    cols = list(scrubbed.columns)
    unknown = [c for c in enabled if c not in cols]
    if unknown:
        raise ValueError(f"enabled_cols not in DataFrame: {unknown}")
    options = RedactOptions(redaction_mode=redaction_mode,
                            custom_labels=labels,
                            export_style_fallback=True)

    skips = skip_entities or frozenset()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_cols = {}
            ent_rows = [
                [
                    Entity(e["type"], e["text"], e["start"], e["end"],
                           e["confidence"], e["category"])
                    for e in (ents if ents is not None else [])
                ]
                for ents in pdf["entities"]
            ]
            keys = pdf[row_key] if row_key is not None else [None] * len(pdf)
            for c in enabled:
                if c not in pdf.columns:
                    continue
                vals = []
                for cell, ents, rk in zip(pdf[c], ent_rows, keys):
                    cell = "" if cell is None else str(cell)
                    triples = [
                        (e, i,
                         (rk, e.start, e.end, e.type) not in skips)
                        for i, e in enumerate(ents)
                    ]
                    if not cell.strip():
                        vals.append(cell)  # P2 blank passthrough
                    elif mode == "compat":
                        vals.append(
                            redact_cell_value(
                                cell, triples, redaction_mode, labels
                            )
                        )
                    elif mode == "canonical":
                        vals.append(
                            redact_cell_value_anchored(
                                cell, triples, redaction_mode, labels
                            )
                        )
                    else:  # rescrub
                        vals.append(scrub_text(cell, options).scrubbed_text)
                new_cols[c] = vals
            yield pdf.assign(**new_cols)

    # enabled cells become redaction STRINGS: cast their schema slots to
    # string or Arrow rejects "[REDACTED_*]" written into typed columns
    from pyspark.sql import types as T

    out_fields = [
        T.StructField(f.name, T.StringType(), True)
        if f.name in set(enabled) else f
        for f in scrubbed.schema.fields
    ]
    casted = scrubbed.select(
        *[
            F.col(c).cast("string").alias(c) if c in set(enabled) else F.col(c)
            for c in cols
        ]
    )
    return casted.mapInPandas(run, schema=T.StructType(out_fields))
