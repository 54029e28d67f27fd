"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` -- flagship fused quality-filter + PII-scrub pipeline over
the sf0.001 documents table.  ``queries()`` / ``oracle_sql()`` -- one entry
per implemented operator from SURVEY.md section 2 plus the
training-pipeline suites (dedup / similarity / text analysis); oracles are
DuckDB SQL over the same parquet views.  Entries without an oracle are
non-SQL-expressible (kernel/LSH/pipeline ops) and take the rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# The package lives next to this file; make imports robust to the harness
# importing us from a different working directory.  The PYTHONPATH export
# matters for the EXECUTOR side: python workers are spawned by the JVM
# with the environment it inherited, not with the driver's runtime
# sys.path -- without it, mapInPandas kernels would die with
# ModuleNotFoundError when cwd != repo root.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)
if _REPO_DIR not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)

from pyspark.sql import DataFrame, SparkSession

from azure_based_pii_redactor_spark.engine.operators import (
    all_oracles,
    all_queries,
)


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline (langid -> perplexity -> Gopher/C4 -> detect -> scrub)
    over the documents table adapted to the pages shape -- the same
    frame the gated driver entries derive from (one definition:
    ``pipeline_gates._scrubbed``)."""
    from azure_based_pii_redactor_spark.engine.operators.pipeline_gates import (
        _scrubbed,
    )

    return _scrubbed(spark, sf_dir).select(
        "url", "lang", "lang_pred", "keep", "drop_reason",
        "n_words", "n_entities", "scrubbed_text",
    ).orderBy("url")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registered driver queries, ORDER IS CONTRACT: the driver harness
    executes only the first 50 entries, so the four pipeline entries
    go first (the value-gated forms from
    ``engine/operators/pipeline_gates.py`` -- since round 4 every
    registered entry carries a DuckDB oracle), then the operator suites
    (similarity, dedup, multimodal, textstats, relational -- every one
    of which is curated so the total stays at or below the cap; merged
    queries cover the demoted single-purpose forms)."""
    from azure_based_pii_redactor_spark.engine.operators import (
        DRIVER_QUERY_CAP,
    )

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = all_queries()
    if len(q) > DRIVER_QUERY_CAP:  # not assert: python -O would strip it
        raise ValueError(
            f"{len(q)} queries registered but the driver harness runs only "
            f"the first {DRIVER_QUERY_CAP}; curate (merge or demote) before "
            "registering more"
        )
    return q


def oracle_sql() -> dict[str, str]:
    return dict(all_oracles())
