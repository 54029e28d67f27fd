"""Stream-stream interval join: the Structured Streaming shape a
training-data pipeline needs to attach late-arriving signals (labels,
feedback, fetch results) to in-flight documents.

Semantics: each left event joins right events for the SAME key whose
event time falls inside ``[left.ts, left.ts + window)``.  Both sides are
watermarked so Spark can bound the join state: a buffered left row can
be dropped once the right watermark passes ``left.ts + window``, and
vice versa -- without BOTH watermarks and the time-range condition the
state grows forever (the documented requirement for stream-stream inner
joins).

At 10^12-doc scale the join state is the working set of ONE watermark
window per key, not the corpus; state lives in the state store
(RocksDB in production) keyed by the equi key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """left(key, l_ts, ...) x right(key, r_ts, ...) -> rows where
    ``l_ts <= r_ts < l_ts + window_seconds`` for equal keys.  Both
    inputs may be streaming DataFrames (the supported stream-stream
    inner-join shape) or batch ones (same plan, no state)."""
    lw = left.withWatermark("l_ts", watermark)
    rw = right.withWatermark("r_ts", watermark)
    return lw.join(
        rw,
        (lw[key] == rw[key])
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts")
           < F.col("l_ts") + F.expr(f"INTERVAL {window_seconds} SECOND")),
    ).drop(rw[key])
