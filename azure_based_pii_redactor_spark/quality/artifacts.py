"""Quality-model artifacts: persist/load the langid profiles and the
perplexity LM counts as parquet tables.

SURVEY.md section 7 item 2: model tables are generated deterministically
at import from the embedded corpora; for a production cluster the SAME
scoring code paths load real fastText-reduction / KenLM-count tables from
parquet artifacts shipped alongside the job.  This module is that
round-trip: ``save_models`` exports the in-memory tables; ``verify_roundtrip``
proves the exported artifact reproduces the live model exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession

import importlib

# NB: the package __init__ rebinds the name ``perplexity`` to the function,
# so attribute-style submodule import would return the function.
_langid = importlib.import_module(f"{__package__}.langid")
_ppl = importlib.import_module(f"{__package__}.perplexity")


def langid_table() -> pd.DataFrame:
    """Trigram log-prob rows PLUS the unknown-trigram floor row (stored
    with the empty-string key) -- without it a loaded artifact has no
    defined score for OOV trigrams."""
    rows = [
        {"trigram": "",
         **{f"logp_{lang}": _langid._MATRIX[0][i]
            for i, lang in enumerate(_langid.LANGUAGES)}}
    ] + [
        {"trigram": tg,
         **{f"logp_{lang}": _langid._MATRIX[idx][i]
            for i, lang in enumerate(_langid.LANGUAGES)}}
        for tg, idx in _langid._INDEX.items()
    ]
    return pd.DataFrame(rows)


def lm_tables() -> tuple[pd.DataFrame, pd.DataFrame]:
    uni = pd.DataFrame(
        [{"word": w, "count": c} for w, c in _ppl._UNI.items()]
    )
    bi = pd.DataFrame(
        [{"w1": a, "w2": b, "count": c} for (a, b), c in _ppl._BI.items()]
    )
    return uni, bi


def save_models(spark: SparkSession, base_path: str) -> None:
    spark.createDataFrame(langid_table()).write.mode("overwrite").parquet(
        f"{base_path}/langid_trigrams"
    )
    uni, bi = lm_tables()
    spark.createDataFrame(uni).write.mode("overwrite").parquet(
        f"{base_path}/lm_unigrams"
    )
    spark.createDataFrame(bi).write.mode("overwrite").parquet(
        f"{base_path}/lm_bigrams"
    )


def verify_roundtrip(spark: SparkSession, base_path: str) -> bool:
    """Exported artifact == live in-memory model (exactness check)."""
    lt = spark.read.parquet(f"{base_path}/langid_trigrams").toPandas()
    ok = len(lt) == len(_langid._INDEX) + 1  # + the floor row
    for r in lt.itertuples(index=False):
        if r.trigram == "":
            idx = 0  # the documented OOV-floor sentinel row
        elif r.trigram in _langid._INDEX:
            idx = _langid._INDEX[r.trigram]
        else:
            return False  # unknown key: NOT silently mapped to the
            # floor row (a corrupted sentinel would otherwise verify)
        for i, lang in enumerate(_langid.LANGUAGES):
            ok = ok and getattr(r, f"logp_{lang}") == _langid._MATRIX[idx][i]
            if not ok:
                return False
    uni = spark.read.parquet(f"{base_path}/lm_unigrams").toPandas()
    bi = spark.read.parquet(f"{base_path}/lm_bigrams").toPandas()
    ok = ok and dict(zip(uni.word, uni["count"])) == dict(_ppl._UNI)
    ok = ok and {
        (r.w1, r.w2): r.count for r in bi.itertuples(index=False)
    } == dict(_ppl._BI)
    return bool(ok)
