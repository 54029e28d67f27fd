"""PySpark-native web-text quality-filter + PII-redaction engine.

A from-scratch re-expression of the query/data-processing capabilities of
RomanGod6/Azure-Based-PII-Redactor (reference at /root/reference, read-only)
as an idiomatic PySpark pipeline, extended with the language-ID, perplexity
and Gopher/C4 quality-filter stages the north star prescribes.

Layout:
    kernel/   pure-Python detection/redaction kernel (no Spark imports) --
              simultaneously the pandas-UDF payload and the test oracle.
    quality/  deterministic language-ID, n-gram perplexity, heuristic rules.
    engine/   Spark-side pipeline, schemas, session, checkpoint, operators.
    sources/  synthetic page corpus generator (distributed, seeded).
"""

__version__ = "0.1.0"
