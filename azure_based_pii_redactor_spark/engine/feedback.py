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


def load_training_feedback(
    spark: SparkSession, source: str | DataFrame
) -> list[dict]:
    """Read the feedback table (path or DataFrame) and return the
    kernel-ready list, ordered oldest -> newest.  The table is small by
    construction (human-reviewed corrections); it is collected and
    broadcast into the scrub kernel (J5)."""
    df = (
        spark.read.parquet(source) if isinstance(source, str) else source
    )
    cols = [c for c in (
        "entity_text", "entity_type", "original_score", "user_decision",
        "user_confidence", "context", "timestamp", "session_id",
    ) if c in df.columns]
    # deterministic total order: equal timestamps (batch inserts) must not
    # flip latest-wins conflict resolution run-to-run
    order = [c for c in ("timestamp", "session_id", "entity_text",
                         "entity_type", "user_decision") if c in cols]
    rows = df.select(*cols).orderBy(*order).collect()
    return [r.asDict() for r in rows]
