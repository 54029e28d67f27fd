"""Relational / dedup / similarity / text-analysis operators.

Each module exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB SQL over the same parquet
views).  ``__spark_entry__`` merges them for the driver's correctness
harness.  Names without an oracle entry are non-SQL-expressible and get
the driver's rows-only check.
"""

from . import dedup, multimodal, relational, similarity, textstats

ALL_MODULES = (relational, textstats, dedup, similarity, multimodal)


def all_queries():
    out = {}
    for m in ALL_MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLES)
    return out
