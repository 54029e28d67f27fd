"""Run metrics: the reference's observability surface as distributed aggs.

Maps SURVEY.md section 2.9 (per-row WS progress events, session rollups)
and section 2.4 aggregations onto ``groupBy`` jobs over the kernel output,
plus the explicitly-salted skewed-domain aggregation the north rule
requires (SURVEY.md section 4 item 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def with_domain(df: DataFrame) -> DataFrame:
    """Domain = lowercased HOST of the url via ``try_parse_url`` (the
    same parser family operators/urls.py canonicalization uses).  The
    earlier path-slash regexp (``https?://([^/]+)/``) lumped bare-host
    urls ('https://example.com', no trailing slash) and uppercase
    schemes into one '' domain; unparseable urls still map to ''."""
    return df.withColumn(
        "domain",
        F.lower(
            F.coalesce(F.try_parse_url("url", F.lit("HOST")), F.lit(""))
        ),
    )


def drop_reason_counts(out: DataFrame) -> DataFrame:
    """Keep/drop decision histogram (the quality-funnel metric)."""
    return (
        out.groupBy("drop_reason")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc_nulls_first("drop_reason"))
    )


def entity_type_counts(out: DataFrame) -> DataFrame:
    """A1 -- entity counts by type (``file_processor.go:87-91``), exploded
    (entity_type, n) rows rather than a JSON map (SURVEY.md section 1.2)."""
    return (
        out.filter(F.col("n_entities") > 0)
        .select(F.explode("entities").alias("e"))
        .groupBy(F.col("e.type").alias("entity_type"))
        .agg(
            F.count("*").alias("n"),
            F.avg("e.confidence").alias("avg_confidence"),
        )
        .orderBy(F.desc("n"), F.asc("entity_type"))
    )


def domain_counts_salted(out: DataFrame, n_salt: int = 16) -> DataFrame:
    """Per-domain doc/keep counts over a Zipf-skewed domain key.

    Two-phase aggregation with a DETERMINISTIC salt (hash(url) % S, not
    rand -- reproducible runs, SURVEY.md section 4): partial aggregate on
    (domain, salt) spreads each hot domain over S reducers, then the final
    (tiny, one row per (domain,salt)) aggregate collapses the salt.  AQE
    skew handling stays enabled as a backstop.
    """
    salted = with_domain(out).withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(n_salt))
    )
    partial = salted.groupBy("domain", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("keep").cast("long")).alias("pk"),
        F.sum("n_entities").alias("pe"),
    )
    return (
        partial.groupBy("domain")
        .agg(
            F.sum("pn").alias("n_docs"),
            F.sum("pk").alias("n_kept"),
            F.sum("pe").alias("n_entities"),
        )
        .orderBy(F.desc("n_docs"), F.asc("domain"))
    )


def run_summary(out: DataFrame, run_id: str = "run") -> DataFrame:
    """A3/A9-style rollup: totals, keep rate, mean entity confidence."""
    return out.agg(
        F.lit(run_id).alias("run_id"),
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.round(
            F.sum(F.col("keep").cast("long")) * 100.0 / F.count("*"), 2
        ).alias("keep_rate_pct"),
        F.sum("n_entities").alias("total_entities"),
        F.avg("ppl").alias("avg_ppl"),
        # mean over ENTITIES, not over docs (per-doc averaging counted
        # every zero-entity doc as 0.0 and diluted the metric to noise)
        (
            F.sum(
                F.aggregate(
                    F.coalesce(F.col("entities"), F.array()),
                    F.lit(0.0),
                    lambda acc, e: acc + e["confidence"],
                )
            )
            / F.greatest(F.sum("n_entities"), F.lit(1))
        ).alias("avg_entity_confidence"),
    )
