"""Structured Streaming surface.

The reference has no data streaming (its 'streaming' is WS/SSE progress
reporting -- SURVEY.md section 2.9); the north star nevertheless wants the
pipeline runnable as a stream.  ``scrub_stream`` runs the SAME fused
kernel on ``readStream`` micro-batches; ``windowed_quality_metrics``
adds event-time windowed keep/drop counts with a watermark for late
pages; ``dedupe_stream`` drops crawl re-fetches in-flight
(``dropDuplicatesWithinWatermark``); ``write_stream_exactly_once`` is
the idempotent per-epoch-overwrite sink; ``running_domain_counts`` is
the custom stateful operator (``applyInPandasWithState``);
``interval_join_stream`` attaches late-arriving signals; the RocksDB
helpers switch the state store for the 10^12-scale state sizes.
"""

from .dedup_stream import dedupe_stream, write_stream_exactly_once
from .interval_join import interval_join_stream
from .scrub_stream import (
    read_pages_stream,
    scrub_stream,
    windowed_quality_metrics,
)
from .stateful import (
    restore_state_store_conf,
    running_domain_counts,
    use_rocksdb_state_store,
)

__all__ = [
    "dedupe_stream",
    "interval_join_stream",
    "read_pages_stream",
    "restore_state_store_conf",
    "running_domain_counts",
    "scrub_stream",
    "use_rocksdb_state_store",
    "windowed_quality_metrics",
    "write_stream_exactly_once",
]
