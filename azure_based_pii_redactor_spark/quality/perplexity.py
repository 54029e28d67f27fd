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


# true worst case: every word hits only the interpolation floor term
WORST_PERPLEXITY = 1.0 / (_L_FLOOR * _FLOOR)


def perplexity(text: str) -> float:
    """Interpolated bigram perplexity; ``inf``-safe (capped by the floor).

    Empty/wordless documents return ``WORST_PERPLEXITY`` (the score of
    all-OOV text -- they must never outscore gibberish).
    """
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
