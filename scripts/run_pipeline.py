"""spark-submit entrypoint for the quality-filter + PII-scrub pipeline.

Cluster usage (the north-rule packaging contract):

    cd /root/repo && zip -qr /tmp/app.zip azure_based_pii_redactor_spark
    spark-submit --py-files /tmp/app.zip scripts/run_pipeline.py \\
        --input  <pages parquet/iceberg path> \\
        --output <scrubbed output path> \\
        --lineage <lineage table path> \\
        --run-id run42 [--mode replace] [--scrub-all] \\
        [--generate N]   # synthesize the input corpus first (demo/bench)

Resume is implicit: re-launching with the same --run-id/--lineage skips
every bucket whose lineage row committed (no flag needed).

On a real cluster pass ``--master yarn``/k8s and executor sizing to
spark-submit; the job itself only sets SQL-level configs (AQE, split
sizing, shuffle partitions come from the session defaults and can be
overridden with --conf).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "warc", "jsonl"],
                    help="parquet pages table (default), raw "
                         ".warc/.warc.gz files (Common-Crawl layout), or "
                         ".jsonl[.gz] pages interchange (base64 html)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--mode", default="replace",
                    choices=["replace", "mask", "remove"])
    ap.add_argument("--scrub-all", action="store_true",
                    help="scrub dropped docs too (default: kept only)")
    ap.add_argument("--dedup-urls", action="store_true",
                    help="pre-pipeline url-level dedup: canonicalize "
                         "(scheme/fragment/tracking-params) and keep the "
                         "newest fetch per canonical url")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic pages into --input first")
    ap.add_argument("--feedback", help="training_feedback parquet path")
    args = ap.parse_args(argv)

    from azure_based_pii_redactor_spark.engine.checkpoint import run_checkpointed
    from azure_based_pii_redactor_spark.engine.metrics import (
        drop_reason_counts,
        entity_type_counts,
        run_summary,
    )
    from azure_based_pii_redactor_spark.engine.progress import ProgressReporter
    from azure_based_pii_redactor_spark.engine.session import build_session
    from azure_based_pii_redactor_spark.kernel.redact import RedactOptions

    # Under spark-submit a session already exists config-wise; build_session
    # getOrCreate()s and applies our SQL-level defaults.
    spark = build_session(app_name=f"scrub_{args.run_id}")

    if args.generate:
        if args.input_format != "parquet":
            ap.error("--generate writes a PARQUET corpus; it cannot be "
                     "combined with a non-parquet --input-format (the "
                     "warc/jsonl scans would silently decode 0 records "
                     "from parquet files)")
        from azure_based_pii_redactor_spark.sources.pages import (
            write_pages_corpus,
        )

        write_pages_corpus(spark, args.input, args.generate)

    if args.input_format == "warc":
        from azure_based_pii_redactor_spark.sources.warc import read_warc

        pages = read_warc(spark, args.input)
    elif args.input_format == "jsonl":
        from azure_based_pii_redactor_spark.sources.jsonl import (
            read_pages_jsonl,
        )

        pages = read_pages_jsonl(spark, args.input)
    else:
        pages = spark.read.parquet(args.input)
    feedback = []
    if args.feedback:
        from azure_based_pii_redactor_spark.engine.feedback import (
            load_training_feedback,
        )

        # ordered oldest->newest: latest-wins conflict resolution depends
        # on list order (confidence_scoring.go:211-236)
        feedback = load_training_feedback(spark, args.feedback)

    if args.dedup_urls:
        from azure_based_pii_redactor_spark.engine.operators.urls import (
            dedup_pages_by_url,
        )

        pages = dedup_pages_by_url(pages).drop("canonical_url")

    t0 = time.time()
    with ProgressReporter(spark, args.run_id) as rep:
        n = run_checkpointed(
            pages,
            args.output,
            args.lineage,
            args.run_id,
            n_buckets=args.buckets,
            options=RedactOptions(redaction_mode=args.mode),
            feedback=feedback,
            scrub_all=args.scrub_all,
        )
    wall = time.time() - t0

    # target-aware read: run_checkpointed may have routed the output to
    # an Iceberg table identifier; read it back the same way
    from azure_based_pii_redactor_spark.engine.tableio import default_writer

    out = default_writer(spark, args.output).read(spark, args.output)
    summary = run_summary(out, args.run_id).collect()[0].asDict()
    summary["processed_this_run"] = n
    summary["wall_sec"] = round(wall, 2)
    summary["docs_per_sec"] = round(n / wall, 1) if n else 0.0
    summary["status"] = rep.state.status
    print(json.dumps(summary, default=str))
    drop_reason_counts(out).show(30, truncate=False)
    entity_type_counts(out).show(25, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
