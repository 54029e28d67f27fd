"""North-rule gate as ONE runnable artifact: keep/drop F1 and scrubbed-
text byte-identity of the Spark pipeline vs the single-process reference
kernel, on a deterministic generated corpus.

The north rule requires matching the reference's keep/drop decision and
scrubbed text per document at F1 >= 0.99.  The pytest differential
(tests/test_pipeline_differential.py) asserts the strict form (F1 == 1.0,
byte identity) on every run of the suite; this script computes and prints
the same comparison as one JSON line so the gate is inspectable without
reading test internals.

Usage: python scripts/north_gate.py [n_docs]   (default 2000)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    from azure_based_pii_redactor_spark.engine.pipeline import (
        extract_text,
        run_scrub_pipeline,
    )
    from azure_based_pii_redactor_spark.engine.session import build_session
    from azure_based_pii_redactor_spark.kernel.scrub import scrub_text
    from azure_based_pii_redactor_spark.quality.decide import decide
    from azure_based_pii_redactor_spark.sources.pages import (
        generate_batch,
        generate_pages,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = build_session(app_name="north_gate", master="local[8]",
                          shuffle_partitions=8)

    got = {
        r["url"]: r
        for r in run_scrub_pipeline(generate_pages(spark, n, seed=42))
        .select("url", "keep", "scrubbed_text")
        .collect()
    }

    pdf = generate_batch(np.arange(n), 42)
    tp = fp = fn = tn = 0
    byte_identical = 0
    scrubbed_total = 0
    for r in pdf.itertuples(index=False):
        text = extract_text(r.html)
        d = decide(text)
        g = got[r.url]
        if d.keep and g.keep:
            tp += 1
        elif d.keep and not g.keep:
            fn += 1
        elif not d.keep and g.keep:
            fp += 1
        else:
            tn += 1
        if d.keep:
            scrubbed_total += 1
            if g.scrubbed_text == scrub_text(text).scrubbed_text:
                byte_identical += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    result = {
        "metric": "keep_drop_f1",
        "value": round(f1, 6),
        "gate": 0.99,
        "passes": f1 >= 0.99,
        "n_docs": n,
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "scrubbed_byte_identical": byte_identical,
        "scrubbed_total": scrubbed_total,
        "byte_identity_ok": byte_identical == scrubbed_total,
    }
    print(json.dumps(result))
    spark.stop()
    if not (result["passes"] and result["byte_identity_ok"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
