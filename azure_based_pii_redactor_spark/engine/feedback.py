"""Training-feedback table ingestion.

The kernel's latest-wins rule (``confidence_scoring.go:211-236``) scans the
feedback list newest-LAST-to-first, so the broadcast list MUST be ordered
by ascending timestamp -- an unordered collect silently breaks conflict
resolution.  This loader pins the ordering (W5 window semantics) and is the
single ingestion point for the ``training_feedback`` table
(TRAINING_FEEDBACK_SCHEMA, db.go:145-155).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schema import TRAINING_FEEDBACK_SCHEMA


def load_training_feedback(
    spark: SparkSession, source: str | DataFrame
) -> list[dict]:
    """Read the feedback table (path or DataFrame) and return the
    kernel-ready list, ordered oldest -> newest.  The table is small by
    construction (human-reviewed corrections); it is collected and
    broadcast into the scrub kernel (J5).

    The required columns (non-nullable fields of
    TRAINING_FEEDBACK_SCHEMA) are VALIDATED, not silently dropped: a
    renamed/mis-cased column would otherwise make every record fail the
    kernel's ``user_decision == 'correct'`` check and silently disable
    all human corrections."""
    df = (
        spark.read.parquet(source) if isinstance(source, str) else source
    )
    required = [
        f.name for f in TRAINING_FEEDBACK_SCHEMA.fields if not f.nullable
    ]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(
            f"training-feedback table is missing required columns "
            f"{missing} (have {sorted(df.columns)}); feedback would be "
            "silently ignored downstream"
        )
    cols = [
        f.name for f in TRAINING_FEEDBACK_SCHEMA.fields
        if f.name in df.columns
    ]
    # deterministic total order: equal timestamps (batch inserts) must not
    # flip latest-wins conflict resolution run-to-run
    order = [c for c in ("timestamp", "session_id", "entity_text",
                         "entity_type", "user_decision") if c in cols]
    rows = df.select(*cols).orderBy(*order).collect()
    return [r.asDict() for r in rows]
