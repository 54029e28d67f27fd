"""The fused quality-filter + PII-scrub pipeline stage.

One ``mapInPandas`` stage runs extract -> langid -> perplexity ->
heuristics -> detect -> scrub per Arrow batch (single Python exchange per
batch, SURVEY.md section 4 item 3 -- chaining separate pandas UDFs would
pay one JVM<->Python round-trip per stage).  Everything upstream and
downstream (filters, projections, aggregations, writes) stays JVM-side.

Scale design:
- narrow stage: no shuffle; input split sizing via
  ``spark.sql.files.maxPartitionBytes`` (session.py) keeps Arrow batches
  uniform.
- the expensive kernel runs AFTER any cheap relational filters the caller
  applies (UDFs are pushdown barriers; callers filter first).
- scrubbing runs only on kept docs by default (``scrub_all=False``) --
  dropped docs carry null scrubbed_text; at a 25-30% drop rate this saves
  the regex bank on a quarter of 10^12 docs.
- training feedback is a broadcast variable (small table, J5 broadcast
  nested-loop semantics -- detector.go:319-389).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..kernel.column_config import ColumnConfig
from ..kernel.redact import RedactOptions
from ..kernel.scrub import scrub_text, scrub_text_advanced
from ..quality.decide import ALLOWED_LANGS, MAX_PERPLEXITY, MIN_LANG_SCORE, decide
from ..quality.langid import predict_language_batch
from ..quality.perplexity import perplexity_batch
from .schema import SCRUB_OUTPUT_SCHEMA

_WRAP_PREFIX = b"<html><body>"
_WRAP_SUFFIX = b"</body></html>"

# JVM-side extraction fast path: strip the canonical wrapper and decode
# inside whole-stage codegen.  The re-encode equality proves the bytes
# were valid UTF-8, i.e. the JVM cast is byte-identical to Python's
# decode; malformed or non-wrapper rows fall back to the Python kernel
# (errors='replace' / html.parser extraction), preserving exact semantics.
#
# Arrow-exchange effect: on the dominant path (wrapper html whose
# extraction equals the text column -- the dataset invariant) Python
# receives ONE BOOLEAN instead of the html bytes; the extracted string
# ships only when it differs from text, html bytes only on the fallback.
# Net: the html column's bytes leave the JVM only for malformed or
# non-wrapper rows.
_SUB = "substring(html, 13, length(html) - 26)"
_PRE_EXTRACT_SQL = f"""
    CASE WHEN html IS NULL THEN NULL
         WHEN left(html, 12) = X'3C68746D6C3E3C626F64793E'
          AND right(html, 14) = X'3C2F626F64793E3C2F68746D6C3E'
          AND encode(cast({_SUB} AS string), 'UTF-8') = {_SUB}
         THEN cast({_SUB} AS string)
         ELSE NULL END
"""


def extract_text(html: bytes | None) -> str | None:
    """Recover the extracted text from the html payload.

    Fast path: strip the canonical wrapper (byte-identical round-trip --
    the per-row invariant from BASELINE.json input_hint).  Fallback for
    arbitrary crawled html: a real html.parser extraction
    (script/style subtrees dropped, entities decoded, block boundaries
    as newlines -- a bare tag-strip would leak JS/CSS into the training
    text).
    """
    if html is None:
        return None
    if html.startswith(_WRAP_PREFIX) and html.endswith(_WRAP_SUFFIX):
        # tolerant decode: one malformed Common-Crawl payload must not
        # kill the task; invalid bytes become U+FFFD and the byte-identity
        # flag (extracted_ok) records the mismatch downstream
        return html[len(_WRAP_PREFIX) : -len(_WRAP_SUFFIX)].decode(
            "utf-8", errors="replace")
    from .html_text import html_to_text

    return html_to_text(html.decode("utf-8", errors="replace"))


def _scrub_batch(
    pdf: pd.DataFrame,
    options: RedactOptions,
    feedback: Sequence[dict],
    allowed_langs: frozenset[str],
    min_lang_score: float,
    max_perplexity: float,
    scrub_all: bool,
    column_config: "ColumnConfig | None" = None,
    gpt_validator=None,
    external_detector=None,
) -> pd.DataFrame:
    n = len(pdf)
    out: dict[str, list] = {
        "url": pdf["url"].tolist(),
        "warc_ts": pdf["warc_ts"].tolist(),
        "lang": pdf["lang"].tolist(),
        "lang_pred": [None] * n,
        "lang_score": [0.0] * n,
        "ppl": [0.0] * n,
        "keep": [False] * n,
        "drop_reason": [None] * n,
        "n_words": [0] * n,
        "extracted_ok": [False] * n,
        "entities": [None] * n,
        "n_entities": [0] * n,
        "scrubbed_text": [None] * n,
    }
    texts = pdf["text"].tolist()
    # JVM pre-extraction columns: "__ext_eq_text" is True when the JVM
    # fast path extracted a string equal to the text column (the dataset
    # invariant; Python receives just this boolean), "__extracted_pre"
    # carries the extraction only when it DIFFERS from text, and
    # "__html_fallback" is non-null only for rows the JVM could not
    # handle (malformed UTF-8 / non-wrapper).  Plain "html" appears when
    # the kernel is fed directly (tests / library use) -- full Python
    # extraction then.
    if "__ext_eq_text" in pdf.columns:
        eqs = pdf["__ext_eq_text"].tolist()
        pres = pdf["__extracted_pre"].tolist()
        htmls = pdf["__html_fallback"].tolist()
        had_html = [
            e is True or p is not None or h is not None
            for e, p, h in zip(eqs, pres, htmls)
        ]
    else:
        eqs = [None] * n
        pres = [None] * n
        htmls = pdf["html"].tolist()
        had_html = [h is not None for h in htmls]
    extracted_all: list[str] = [""] * n
    for i in range(n):
        if eqs[i] is True:
            extracted = texts[i] or ""
        elif pres[i] is not None:
            extracted = pres[i]
        else:
            extracted = extract_text(htmls[i])
        if extracted is None or not had_html[i]:
            # No html payload: nothing to extract, fall back to the text
            # column; the invariant is vacuously satisfied.
            extracted = texts[i] or ""
            out["extracted_ok"][i] = True
        else:
            out["extracted_ok"][i] = extracted == (texts[i] or "")
        extracted_all[i] = extracted
    # language ID and perplexity for the whole Arrow batch in one
    # vectorized pass each (single numpy pipeline instead of per-doc
    # calls)
    langs = predict_language_batch(extracted_all)
    ppls = perplexity_batch(extracted_all)
    for i in range(n):
        extracted = extracted_all[i]
        d = decide(
            extracted,
            allowed_langs=allowed_langs,
            min_lang_score=min_lang_score,
            max_perplexity=max_perplexity,
            lang=langs[i],
            ppl=ppls[i],
        )
        out["lang_pred"][i] = d.lang_pred
        out["lang_score"][i] = d.lang_score
        out["ppl"][i] = d.ppl
        out["keep"][i] = d.keep
        out["drop_reason"][i] = d.drop_reason
        out["n_words"][i] = int(d.metrics["n_words"])
        if d.keep or scrub_all:
            if column_config is None and gpt_validator is None \
                    and external_detector is None:
                r = scrub_text(extracted, options, feedback_history=feedback)
            else:
                # advanced path: column filtering + external stages +
                # confidence-adjusted entities (detector.go:138-191)
                r = scrub_text_advanced(
                    extracted, options, feedback_history=feedback,
                    column_config=column_config,
                    gpt_validator=gpt_validator,
                    external_detector=external_detector,
                )
            out["scrubbed_text"][i] = r.scrubbed_text
            out["n_entities"][i] = len(r.entities)
            out["entities"][i] = [e._asdict() for e in r.entities]
    return pd.DataFrame(out)


def run_scrub_pipeline(
    pages: DataFrame,
    options: RedactOptions = RedactOptions(),
    feedback: Sequence[dict] = (),
    allowed_langs: frozenset[str] = ALLOWED_LANGS,
    min_lang_score: float = MIN_LANG_SCORE,
    max_perplexity: float = MAX_PERPLEXITY,
    scrub_all: bool = False,
    repartition_to: int | None = None,
    column_config: ColumnConfig | None = None,
    gpt_validator=None,
    external_detector=None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> SCRUB_OUTPUT_SCHEMA rows.

    Passing ``column_config`` / ``gpt_validator`` / ``external_detector``
    switches the scrub to the reference's advanced path
    (``DetectWithColumn``): filtered, externally validated (fail-open),
    confidence-adjusted entities.  Callables must be picklable."""
    spark = pages.sparkSession
    bc_feedback = spark.sparkContext.broadcast(list(feedback))

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fb = bc_feedback.value
        for pdf in batches:
            if len(pdf):
                yield _scrub_batch(
                    pdf, options, fb, allowed_langs,
                    min_lang_score, max_perplexity, scrub_all,
                    column_config, gpt_validator, external_detector,
                )

    if repartition_to is not None:
        # Round-robin repartition: uniform Arrow batches for the kernel
        # regardless of upstream file-split skew.
        pages = pages.repartition(repartition_to)
    from pyspark.sql import functions as F

    # JVM pre-extraction: html bytes cross into Python ONLY for rows the
    # codegen fast path could not decode (non-wrapper or malformed UTF-8).
    pre = (
        pages.withColumn("__ext", F.expr(_PRE_EXTRACT_SQL))
        .withColumn(
            "__ext_eq_text",
            F.when(
                F.col("__ext").isNotNull(),
                F.col("__ext") == F.coalesce(F.col("text"), F.lit("")),
            ),
        )
        .withColumn(
            "__extracted_pre",
            F.when(F.col("__ext_eq_text") == F.lit(False), F.col("__ext")),
        )
        .withColumn(
            "__html_fallback",
            F.when(
                F.col("__ext").isNull() & F.col("html").isNotNull(),
                F.col("html"),
            ),
        )
        .select("url", "warc_ts", "text", "lang", "__ext_eq_text",
                "__extracted_pre", "__html_fallback")
    )
    return pre.mapInPandas(fused, schema=SCRUB_OUTPUT_SCHEMA)


def documents_as_pages(documents: DataFrame) -> DataFrame:
    """Adapt the driver's ``documents`` testdata table (doc_id, text, lang,
    source, n_chars) to the pages shape so the same pipeline runs on it."""
    from pyspark.sql import functions as F

    return documents.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def build_session(*args, **kwargs) -> SparkSession:  # convenience re-export
    from .session import build_session as _b

    return _b(*args, **kwargs)
