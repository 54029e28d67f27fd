"""Relational / dedup / similarity / text-analysis operators.

Each module exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB SQL over the same parquet
views).  ``__spark_entry__`` merges them for the driver's correctness
harness.  Names without an oracle entry are non-SQL-expressible and get
the driver's rows-only check.

Module order is CONTRACT: the driver harness executes only the first 50
``queries()`` entries, so the registration order below (pipeline_gates
first, then similarity, dedup, multimodal, textstats, relational) plus
per-module curation keeps every registered query inside that window.
``__spark_entry__.queries()`` is exactly ``all_queries()`` and enforces
the cap -- do NOT add entries there; register through a module's
``QUERIES`` so the ordering stays auditable in one place.
"""

from . import (
    dedup,
    multimodal,
    pipeline_gates,
    relational,
    similarity,
    textstats,
)

ALL_MODULES = (
    pipeline_gates, similarity, dedup, multimodal, textstats, relational
)

# the driver runs only the first N entries of queries(); keep the
# registered count at or below this so nothing is silently skipped
DRIVER_QUERY_CAP = 50


def all_queries():
    out = {}
    for m in ALL_MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    from .oracle_rounding import duck_round_like_spark

    out = {}
    for m in ALL_MODULES:
        # ONE application point for the cross-engine rounding rewrite
        # (oracle_rounding.py): authors write plain round(); every
        # registered oracle gets Spark's shortest-repr HALF_UP
        # semantics here
        out.update(
            {k: duck_round_like_spark(v) for k, v in m.ORACLES.items()}
        )
    return out
