"""Dump explain('formatted') for the queries touched in optimization
round 8, into plans/r08/<name>_<tag>.txt.

Usage: python scripts/dump_r08_plans.py <repo_root> <tag> [out_dir]

Run once with the round-start tree (tag=before) and once with the
optimized tree (tag=after); the judge checks plan claims against these.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.abspath(sys.argv[1])
TAG = sys.argv[2]
OUT = os.path.abspath(
    sys.argv[3] if len(sys.argv) > 3 else
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r08")
)
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get(
    "PYTHONPATH", "")

SF = "/root/testdata/sf0.001"


def main() -> None:
    from azure_based_pii_redactor_spark.engine.session import build_session

    os.makedirs(OUT, exist_ok=True)
    spark = build_session(app_name=f"plans_{TAG}", master="local[4]",
                          shuffle_partitions=4)

    from pyspark.sql import functions as F

    import azure_based_pii_redactor_spark.engine.operators.dedup as dd
    import azure_based_pii_redactor_spark.engine.operators.relational as rel
    import azure_based_pii_redactor_spark.engine.operators.textstats as ts
    import azure_based_pii_redactor_spark.engine.operators.urls as urls
    from azure_based_pii_redactor_spark.sources.warc import read_warc

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def pagerank(spark, sf_dir):
        edges = spark.createDataFrame(
            [(f"s{i % 5}", f"d{(i + 3) % 11}") for i in range(200)],
            "src_domain string, dst_domain string",
        )
        return urls.domain_pagerank(edges)

    def incremental(spark, sf_dir):
        d = docs.select("doc_id", "text")
        return dd.minhash_dedup_incremental(
            d.filter(F.col("doc_id") % 2 == 1),
            d.filter(F.col("doc_id") % 2 == 0),
        )

    entries = {
        "text_doc_features": lambda s, d: ts.text_doc_features(s, d),
        "scalar_mask": lambda s, d: rel.scalar_mask(s, d),
        "scalar_mask_email": lambda s, d: rel.scalar_mask_email(s, d),
        "text_dedup_passage_removal":
            lambda s, d: ts.text_dedup_passage_removal(s, d),
        "dedup_minhash_lsh_slot":
            lambda s, d: dd.dedup_minhash_verified_with_incremental(s, d),
        "minhash_dedup_incremental": incremental,
        "domain_pagerank": pagerank,
        "warc_read": lambda s, d: read_warc(
            s, "/root/repo/.bench_scratch/warc_50000/*.warc.gz"
        ) if os.path.exists(
            "/root/repo/.bench_scratch/warc_50000"
        ) else None,
    }
    for name, fn in entries.items():
        try:
            df = fn(spark, SF)
            if df is None:
                continue
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # keep going; note the failure
            plan = f"FAILED to build plan: {e!r}"
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{TAG}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
