"""Deterministic character-trigram language identification.

A fastText-style linear model over hashed character n-grams, reduced to its
deterministic core: per-language char-trigram log-probability profiles with
add-one smoothing, trained at import time from the embedded seed corpora
(quality/corpora.py).  Chinese is additionally gated by CJK codepoint
fraction (trigram profiles are sparse for ideographic scripts).

Replaces the reference's hardcoded ``language: "en"`` Azure call parameter
(``azure.go:104-112``) with a real per-document language decision, per the
north star.

Scoring: TOTAL log-likelihood of the document's trigrams under each
language profile; prediction = argmax; score = softmax margin of the
winner over the totals (in (0,1], higher = more confident).  Because
the softmax runs over totals rather than per-trigram means, the margin
grows with document length: any clear winner saturates to ~1.0 beyond
a few hundred characters, and the ``MIN_LANG_SCORE`` gate effectively
filters short or genuinely ambiguous documents (the intended behavior
-- a long document with a consistent trigram profile IS high
confidence).  Documents with fewer than ``MIN_TRIGRAMS`` usable
trigrams predict ``("unk", 0.0)``.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from .corpora import CORPORA

LANGUAGES: tuple[str, ...] = tuple(sorted(CORPORA))
MIN_TRIGRAMS = 8

_STRIP = re.compile(r"[0-9\W_]+", re.UNICODE)


LANGID_MAX_CHARS = 1000


def _trigrams(text: str) -> list[str]:
    """Lowercase, collapse digits/punct/space runs to single spaces, then
    slide a 3-char window (word-boundary markers included via the spaces).

    Scoring input is capped at ``LANGID_MAX_CHARS``: web pages are
    overwhelmingly monolingual and per-trigram evidence saturates the
    posterior long before 1000 chars -- a 3x kernel saving on long docs
    (documented semantics: language is decided on the document head)."""
    norm = " " + _STRIP.sub(" ", text[:LANGID_MAX_CHARS].lower()).strip() + " "
    return [norm[i : i + 3] for i in range(len(norm) - 2)]


def _build_profiles() -> tuple[dict[str, list[float]], list[float]]:
    per_lang_counts: dict[str, Counter] = {}
    vocab: set[str] = set()
    for lang in LANGUAGES:
        c: Counter = Counter()
        for sentence in CORPORA[lang]:
            c.update(_trigrams(sentence))
        per_lang_counts[lang] = c
        vocab.update(c)
    v = len(vocab)
    denoms = {
        lang: sum(per_lang_counts[lang].values()) + v + 1
        for lang in LANGUAGES
    }
    # NEUTRAL unknown-trigram penalty: a per-language floor of
    # log(1/denom) would make out-of-vocabulary text drift toward the
    # language with the smallest corpus; unseen trigrams carry no
    # language evidence, so they get one shared floor.
    shared_floor = math.log(1.0 / max(denoms.values()))
    floors = [shared_floor] * len(LANGUAGES)
    # trigram -> per-language log-prob vector (dense per key, tiny vocab)
    table: dict[str, list[float]] = {
        tg: [
            math.log((per_lang_counts[lang].get(tg, 0) + 1.0) / denoms[lang])
            for lang in LANGUAGES
        ]
        for tg in vocab
    }
    return table, floors


_TABLE, _FLOORS = _build_profiles()

# Dense scoring matrix: row 0 = the unknown-trigram floor vector, rows 1..V
# = known trigrams (numpy gather beats per-trigram dict-of-list loops ~5x).
import numpy as _np

_INDEX: dict[str, int] = {tg: i + 1 for i, tg in enumerate(sorted(_TABLE))}
_MATRIX = _np.vstack(
    [_np.array(_FLOORS)] + [_np.array(_TABLE[tg]) for tg in sorted(_TABLE)]
)

_CJK = re.compile(r"[一-鿿㐀-䶿]")

# Integer-key trigram table for fully-vectorized scoring: a trigram's key
# is its three codepoints in base 0x110000 (bijective with the string
# form), looked up via binary search over the sorted key array -- no
# per-trigram Python objects or dict hashing at all.
_CODEPOINT_BASE = 0x110000


def _int_key_table() -> tuple["_np.ndarray", "_np.ndarray"]:
    keys = _np.empty(len(_INDEX), _np.int64)
    rows = _np.empty(len(_INDEX), _np.int64)
    for n, (tg, i) in enumerate(_INDEX.items()):
        a, b, c = (ord(ch) for ch in tg)
        keys[n] = (a * _CODEPOINT_BASE + b) * _CODEPOINT_BASE + c
        rows[n] = i
    order = _np.argsort(keys)
    return keys[order], rows[order]


_KEYS, _ROWS = _int_key_table()


def _trigram_keys(text: str) -> "_np.ndarray | None":
    """Normalized-head trigrams as an int64 key array (None if the doc is
    too short to score).  One regex sub + one encode per doc; the slide
    is three vectorized shifts over the codepoint array."""
    norm = " " + _STRIP.sub(" ", text[:LANGID_MAX_CHARS].lower()).strip() + " "
    cps = _np.frombuffer(norm.encode("utf-32-le"), dtype=_np.uint32).astype(
        _np.int64
    )
    if len(cps) - 2 < MIN_TRIGRAMS:
        return None
    return (cps[:-2] * _CODEPOINT_BASE + cps[1:-1]) * _CODEPOINT_BASE + cps[2:]


def _rows_for(keys: "_np.ndarray") -> "_np.ndarray":
    """Matrix row index per trigram key (row 0 = unknown floor)."""
    pos = _np.minimum(_np.searchsorted(_KEYS, keys), len(_KEYS) - 1)
    return _np.where(_KEYS[pos] == keys, _ROWS[pos], 0)


def predict_language_batch(texts) -> list[tuple[str, float]]:
    """Batch form of ``predict_language`` -- one concatenated searchsorted
    + segmented ``reduceat`` per ~1M trigrams instead of per-doc numpy
    call overhead (the Arrow-batch hot path; ~2x over the per-doc form).
    Returns one (lang, score) per input, identical decisions."""
    out: list = [None] * len(texts)
    segs: list[tuple[int, "_np.ndarray"]] = []
    for j, t in enumerate(texts):
        if cjk_fraction(t) > 0.3:
            out[j] = ("zh", 1.0)
            continue
        tk = _trigram_keys(t)
        if tk is None:
            out[j] = ("unk", 0.0)
            continue
        segs.append((j, tk))
    i = 0
    while i < len(segs):
        chunk: list[tuple[int, "_np.ndarray"]] = []
        total = 0
        while i < len(segs) and total < 1_000_000:  # bound the row gather
            chunk.append(segs[i])
            total += len(segs[i][1])
            i += 1
        allk = _np.concatenate([k for _, k in chunk])
        starts = _np.zeros(len(chunk), _np.int64)
        _np.cumsum([len(k) for _, k in chunk[:-1]], out=starts[1:])
        rows = _rows_for(allk)
        # per-language 1D take+reduceat beats one (N, L) 2D gather with
        # an axis-0 reduceat ~4x (the 2D row-gather materializes N*L
        # doubles and the axis-0 segmented sum iterates rows in C but
        # strides across columns); identical sums
        sums = _np.empty((len(chunk), _MATRIX.shape[1]))
        for j in range(_MATRIX.shape[1]):
            sums[:, j] = _np.add.reduceat(_MATRIX[:, j].take(rows), starts)
        best = _np.argmax(sums, axis=1)
        mx = sums[_np.arange(len(chunk)), best]
        z = _np.exp(sums - mx[:, None]).sum(axis=1)
        for (j, _), b, zz in zip(chunk, best, z):
            out[j] = (LANGUAGES[b], 1.0 / zz)
    return out


def cjk_fraction(text: str) -> float:
    """CJK codepoint fraction of the document HEAD (same
    ``LANGID_MAX_CHARS`` cap as trigram scoring -- language is decided on
    the head everywhere, and a 1 MB doc must not pay a full-text scan for
    the zh gate)."""
    head = text[:LANGID_MAX_CHARS]
    if not head:
        return 0.0
    return len(_CJK.findall(head)) / len(head)


def predict_language(text: str) -> tuple[str, float]:
    """Return ``(lang, score)``; ``("unk", 0.0)`` when undecidable."""
    if cjk_fraction(text) > 0.3:
        return "zh", 1.0
    tk = _trigram_keys(text)
    if tk is None:
        return "unk", 0.0
    # vectorized scoring: int-key trigrams, binary-searched row indices,
    # one matrix gather-sum (identical decisions to the string-trigram
    # dict form, which survives in tests as the reference).  Measured
    # dead ends kept out: Counter-dedup + weighted matmul loses (unique
    # trigram ratio is only ~0.67, Counter overhead dominates), as does
    # np.fromiter over the index genexpr.
    sums = _MATRIX[_rows_for(tk)].sum(axis=0)
    best = max(range(len(LANGUAGES)), key=sums.__getitem__)
    # Posterior probability under a uniform language prior = softmax of the
    # TOTAL log-likelihoods (saturates toward 1.0 as evidence accumulates;
    # short or out-of-model docs stay near 1/|LANGUAGES|).
    mx = sums[best]
    z = sum(math.exp(s - mx) for s in sums)
    score = 1.0 / z
    return LANGUAGES[best], score
