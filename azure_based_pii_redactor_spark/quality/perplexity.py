"""KenLM-style interpolated bigram perplexity, trained deterministically.

A word-bigram language model with Jelinek-Mercer interpolation
(lambda_bi * p_bigram + lambda_uni * p_unigram + lambda_floor * p_floor),
trained at import time from the embedded English seed corpus.  Fluent
English scores low; gibberish and wrong-language text hit the uniform
floor and score orders of magnitude higher -- which is all the quality
gate needs.  On a production cluster the count tables would be loaded
from a parquet artifact instead (same scoring code path).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from .corpora import EN_SENTENCES

_WORD = re.compile(r"[a-z']+")

_L_BI = 0.70
_L_UNI = 0.25
_L_FLOOR = 0.05

BOS = "<s>"


def tokenize(text: str) -> list[str]:
    return _WORD.findall(text.lower())


def _train() -> tuple[Counter, Counter, int, float]:
    uni: Counter = Counter()
    bi: Counter = Counter()
    for sentence in EN_SENTENCES:
        words = [BOS] + tokenize(sentence)
        uni.update(words)
        bi.update(zip(words, words[1:]))
    total = sum(uni.values())
    vocab = len(uni)
    floor = 1.0 / (vocab * 10.0)
    return uni, bi, total, floor


_UNI, _BI, _TOTAL, _FLOOR = _train()


def _vectorize_model():
    """Integer-keyed scoring tables: one dict hash per WORD instead of
    three string hashes plus a tuple build (the profiled hot spot).  OOV
    words map to id 0; ids are shifted by 1 so the packed bigram key
    (prev_id * stride + w_id) never collides across the OOV boundary.
    Bigram counts live in a SORTED key array looked up via one
    vectorized searchsorted per document (no per-word Python)."""
    import numpy as np

    words = sorted(_UNI)
    wid = {w: i + 1 for i, w in enumerate(words)}
    stride = len(words) + 1
    uni_counts = np.zeros(stride, dtype=np.float64)
    for w, c in _UNI.items():
        uni_counts[wid[w]] = c
    bi_keys = np.array(
        [wid[p] * stride + wid[w] for (p, w) in _BI], dtype=np.int64
    )
    bi_vals = np.array([float(c) for c in _BI.values()], dtype=np.float64)
    order = np.argsort(bi_keys)
    return wid, stride, uni_counts, bi_keys[order], bi_vals[order]


_WID, _STRIDE, _UNI_ARR, _BI_KEYS, _BI_VALS = _vectorize_model()
_BOS_ID = _WID[BOS]


# true worst case: every word hits only the interpolation floor term
WORST_PERPLEXITY = 1.0 / (_L_FLOOR * _FLOOR)


def perplexity(text: str) -> float:
    """Interpolated bigram perplexity; ``inf``-safe (capped by the floor).

    Empty/wordless documents return ``WORST_PERPLEXITY`` (the score of
    all-OOV text -- they must never outscore gibberish).  Scoring is
    vectorized (id-array gathers + one ``np.log`` over the batch); the
    scalar reference formulation survives as ``perplexity_scalar`` and
    the two are pinned equal-decision in tests.
    """
    import numpy as np

    words = tokenize(text)
    if not words:
        return WORST_PERPLEXITY
    from itertools import repeat

    # map(dict.get, words, repeat(0)) stays in C -- the genexpr form was
    # the profiled hot spot (one Python frame per word)
    ids = np.fromiter(map(_WID.get, words, repeat(0)), np.int64, len(words))
    prev = np.empty_like(ids)
    prev[0] = _BOS_ID
    prev[1:] = ids[:-1]
    keys = prev * _STRIDE + ids
    pos = np.minimum(np.searchsorted(_BI_KEYS, keys), len(_BI_KEYS) - 1)
    bi = np.where(_BI_KEYS[pos] == keys, _BI_VALS[pos], 0.0)
    c_prev = _UNI_ARR[prev]
    p_bi = np.divide(bi, c_prev, out=np.zeros_like(bi), where=c_prev > 0)
    p = _L_BI * p_bi + _L_UNI * (_UNI_ARR[ids] / _TOTAL) + _L_FLOOR * _FLOOR
    return float(math.exp(-np.log(p).sum() / len(words)))


def perplexity_batch(texts: list[str]) -> list[float]:
    """Whole-Arrow-batch perplexity: token ids for every document are
    concatenated into ONE numpy pipeline (one searchsorted, one log, one
    segmented reduceat) instead of ~10 small numpy calls per document --
    the same batching ``predict_language_batch`` uses.  Per-document
    results match ``perplexity`` to float noise (the segment sum
    associates additions differently); decisions are pinned identical in
    tests."""
    import numpy as np
    from itertools import repeat

    results = [WORST_PERPLEXITY] * len(texts)
    id_arrays: list[np.ndarray] = []
    doc_meta: list[tuple[int, int]] = []  # (output index, n_words)
    wid_get = _WID.get
    for i, t in enumerate(texts):
        words = tokenize(t)
        if not words:
            continue
        id_arrays.append(
            np.fromiter(map(wid_get, words, repeat(0)), np.int64, len(words))
        )
        doc_meta.append((i, len(words)))
    if not id_arrays:
        return results
    ids = np.concatenate(id_arrays)
    lens = np.array([n for _, n in doc_meta], dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    prev = np.empty_like(ids)
    prev[1:] = ids[:-1]
    prev[starts] = _BOS_ID  # each document begins at <s>
    keys = prev * _STRIDE + ids
    pos = np.minimum(np.searchsorted(_BI_KEYS, keys), len(_BI_KEYS) - 1)
    bi = np.where(_BI_KEYS[pos] == keys, _BI_VALS[pos], 0.0)
    c_prev = _UNI_ARR[prev]
    p_bi = np.divide(bi, c_prev, out=np.zeros_like(bi), where=c_prev > 0)
    p = _L_BI * p_bi + _L_UNI * (_UNI_ARR[ids] / _TOTAL) + _L_FLOOR * _FLOOR
    sums = np.add.reduceat(np.log(p), starts)
    for (i, n), s in zip(doc_meta, sums):
        results[i] = float(math.exp(-s / n))
    return results


def perplexity_scalar(text: str) -> float:
    """Reference formulation (the semantics contract; tests assert the
    vectorized path matches it)."""
    words = tokenize(text)
    if not words:
        return WORST_PERPLEXITY
    prev = BOS
    log_sum = 0.0
    for w in words:
        c_prev = _UNI.get(prev, 0)
        p_bi = _BI.get((prev, w), 0) / c_prev if c_prev else 0.0
        p_uni = _UNI.get(w, 0) / _TOTAL
        p = _L_BI * p_bi + _L_UNI * p_uni + _L_FLOOR * _FLOOR
        log_sum += math.log(p)
        prev = w
    return math.exp(-log_sum / len(words))
