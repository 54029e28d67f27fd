"""Structured Streaming surface.

The reference has no data streaming (its 'streaming' is WS/SSE progress
reporting -- SURVEY.md section 2.9); the north star nevertheless wants the
pipeline runnable as a stream.  ``scrub_stream`` runs the SAME fused kernel
on ``readStream`` micro-batches; ``windowed_quality_metrics`` adds
event-time windowed keep/drop counts with a watermark for late pages.
"""

from .interval_join import interval_join_stream
from .scrub_stream import scrub_stream, windowed_quality_metrics

__all__ = [
    "interval_join_stream",
    "scrub_stream",
    "windowed_quality_metrics",
]
