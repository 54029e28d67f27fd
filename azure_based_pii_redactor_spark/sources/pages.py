"""Distributed deterministic Common-Crawl-style pages generator.

Produces the BASELINE.json input_hint table
``(url, warc_ts, html, text, lang)`` at any row count, fully determined by
``(seed, row_id)`` and INDEPENDENT of partitioning: each row seeds its own
``numpy`` PCG64 stream via ``SeedSequence([seed, row_id])``, so
``generate_pages(spark, n, parts=8)`` and ``parts=32`` yield identical rows
(tested).  Domains are Zipf-skewed (a few hot domains dominate) to exercise
salted repartitioning; text mixes language prose, PII spans (valid +
near-miss invalid), and quality-drop axes per FIXTURES.md section 1.

Scale note: generation is a narrow ``mapInPandas`` over ``spark.range`` --
no shuffle, no driver data; at 10^12 rows it is bounded only by cluster
width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..engine.schema import PAGES_SCHEMA
from ..quality.corpora import CORPORA
from .piigen import GENERATORS, PII_TEMPLATES

N_DOMAINS = 500
ZIPF_A = 1.2

_LANGS = ("en", "es", "de", "fr", "it", "pt", "zh", "gib")
_LANG_P = (0.64, 0.07, 0.06, 0.04, 0.04, 0.04, 0.05, 0.06)

# Quality-drop axes (FIXTURES.md: one axis per drop-reason family).
_AXES = ("none", "short", "symbols", "repetition", "bullets",
         "lorem", "code", "toxic", "numeric")
_AXES_P = (0.72, 0.05, 0.04, 0.05, 0.03, 0.02, 0.03, 0.03, 0.03)

_TS_LO = np.datetime64("2024-01-01T00:00:00")
_TS_RANGE_S = 366 * 24 * 3600


def _zipf_cdf() -> np.ndarray:
    w = 1.0 / np.arange(1, N_DOMAINS + 1) ** ZIPF_A
    return np.cumsum(w / w.sum())


_ZIPF_CDF = _zipf_cdf()


def _make_text(rng: np.random.Generator) -> tuple[str, str]:
    """Return (lang_label, text) for one page."""
    lang = str(rng.choice(_LANGS, p=_LANG_P))
    if lang == "gib":
        alphabet = list("qwxzjkvbdfgh")
        words = [
            "".join(rng.choice(alphabet, size=int(rng.integers(3, 9))))
            for _ in range(int(rng.integers(60, 120)))
        ]
        return "unk", " ".join(words) + "."
    corpus = CORPORA[lang]
    k = int(rng.integers(5, 13))
    # Sample WITHOUT replacement: duplicate sentences would trip the
    # Gopher dup-n-gram rules on docs meant to be kept.
    idx = rng.choice(len(corpus), size=min(k, len(corpus)), replace=False)
    sentences = [corpus[i] for i in idx]

    # PII injection (~60% of docs, 1-4 spans, 15% invalid near-misses).
    if rng.random() < 0.6:
        n_pii = int(rng.integers(1, 5))
        t_idx = rng.choice(len(PII_TEMPLATES), size=min(n_pii, len(PII_TEMPLATES)),
                           replace=False)
        for j in range(len(t_idx)):
            name, gen = GENERATORS[int(rng.integers(0, len(GENERATORS)))]
            valid = rng.random() > 0.15
            snippet = gen(rng, valid=valid)
            template = PII_TEMPLATES[int(t_idx[j])]
            pos = int(rng.integers(0, len(sentences) + 1))
            sentences.insert(pos, template.format(pii=snippet))

    axis = str(rng.choice(_AXES, p=_AXES_P))
    if axis == "short":
        sentences = sentences[:1]
    elif axis == "symbols":
        sentences.append("# " * int(rng.integers(20, 60)))
    elif axis == "repetition":
        line = sentences[0]
        sentences.extend([line] * int(rng.integers(10, 25)))
        return lang, "\n".join(sentences)
    elif axis == "bullets":
        sentences = [f"- bullet item {i}" for i in range(int(rng.integers(30, 60)))]
        return lang, "\n".join(sentences)
    elif axis == "lorem":
        sentences.append("And then lorem ipsum dolor sit amet follows here.")
    elif axis == "code":
        sentences.append("var config = { enabled: true };")
    elif axis == "toxic":
        sentences.append("Honestly this whole thing is complete shit today.")
    elif axis == "numeric":
        sentences = [" ".join(str(d) for d in rng.integers(0, 999, 80)) + "."]
    return lang, " ".join(sentences)


def generate_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    """Generate pages for an array of row ids (pure function of (seed,id))."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for row_id in ids:
        rng = np.random.Generator(np.random.PCG64(
            np.random.SeedSequence([seed, int(row_id)])))
        dom_idx = int(np.searchsorted(_ZIPF_CDF, rng.random())) + 1
        lang, text = _make_text(rng)
        urls.append(f"https://domain{dom_idx}.example/page/{int(row_id)}")
        tss.append(_TS_LO + np.timedelta64(int(rng.integers(0, _TS_RANGE_S)), "s"))
        htmls.append(b"<html><body>" + text.encode("utf-8") + b"</body></html>")
        texts.append(text)
        langs.append(lang)
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(np.array(tss, dtype="datetime64[us]")),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def generate_pages(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    parts: int | None = None,
    start_id: int = 0,
) -> DataFrame:
    """Distributed generation: ``spark.range`` -> ``mapInPandas``.
    ``start_id`` offsets the row-id range so incremental corpora get
    disjoint urls."""
    parts = parts or spark.sparkContext.defaultParallelism

    def gen(iterator):
        for pdf in iterator:
            yield generate_batch(pdf["id"].to_numpy(), seed)

    return (
        spark.range(start_id, start_id + n_rows, numPartitions=parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def write_pages_corpus(
    spark: SparkSession, path: str, n_rows: int, seed: int = 42
) -> None:
    generate_pages(spark, n_rows, seed).write.mode("overwrite").parquet(path)
