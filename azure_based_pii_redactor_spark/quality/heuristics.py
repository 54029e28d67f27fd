"""Gopher/C4-style heuristic quality rules.

Thresholds follow the published Gopher rules (Rae et al. 2021, appendix A)
and C4 heuristics (Raffel et al. 2020), both public.  Each document yields
a metrics dict; ``first_failing_rule`` evaluates the rules in a FIXED order
and returns the first violated rule's name (the ``drop_reason``), or None.

Rule order is part of the oracle contract -- changing it changes
drop_reason labels, so it is pinned by tests.
"""

from __future__ import annotations

import re
from collections import Counter

# one C-level pass counting whitespace-tokens that contain an alpha char
# (same segmentation as str.split) -- replaces a per-word Python loop
# with ~75 re.search calls per document
_ALPHA_WORD = re.compile(r"\S*[A-Za-zÀ-ÖØ-öø-ÿ]\S*")
# r8 complement form: tokens with NO alpha char.  Normal text is almost
# all alpha tokens, so counting the (rare) complement and subtracting
# builds a near-empty match list instead of one string per word --
# alpha_count == n_words - no_alpha_count exactly, because every
# whitespace-delimited token either contains an alpha char or does not
# (pinned by a differential property test against _ALPHA_WORD).
_NO_ALPHA_WORD = re.compile(
    r"(?<!\S)[^\sA-Za-zÀ-ÖØ-öø-ÿ]+(?!\S)"
)
_BULLET_PREFIXES = ("- ", "* ", "• ", "· ")

# Gopher word-count bounds.
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.10
MAX_BULLET_LINE_FRAC = 0.90
MAX_ELLIPSIS_LINE_FRAC = 0.30
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOPWORD_HITS = 2
MAX_DUP_LINE_FRAC = 0.30
MAX_DUP_LINE_CHAR_FRAC = 0.20
MAX_DUP_PARA_FRAC = 0.30
MAX_DUP_PARA_CHAR_FRAC = 0.20
MAX_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
MAX_DUP_NGRAM_CHAR_FRAC = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
# word-boundary matchers: stopwords adjacent to newlines/punctuation count
# (space-padded containment missed them and wrongly dropped line-formatted
# docs); same for toxicity terms (substring matching had the classic
# Scunthorpe false-positive problem)
_STOPWORD_RES = tuple(
    re.compile(rf"\b{sw}\b", re.ASCII) for sw in GOPHER_STOPWORDS
)
# single-pass form: ONE C-level findall + set() replaces 8 full-text
# scans; counts DISTINCT matched stopwords, identical to summing the
# per-word search() booleans (pinned by a differential property test)
_STOPWORD_ALL = re.compile(
    r"\b(?:" + "|".join(GOPHER_STOPWORDS) + r")\b", re.ASCII
)

# C4-style content filters.  The first two entries are bound to the
# has_lorem_ipsum / has_curly_brace metric names below (gopher_c4_metrics
# indexes this tuple -- extending it requires adding a metric + rule, and
# the indexing makes that coupling break loudly instead of silently
# no-opping).
C4_BAD_SUBSTRINGS = ("lorem ipsum", "{")
MIN_SENTENCES = 3

# A small toxicity blocklist (C4 uses the public "List of Dirty, Naughty ...";
# here a deterministic embedded subset -- swap for the full list in prod).
TOXICITY_WORDS = ("fuck", "shit", "bitch", "asshole", "bastard", "dickhead")
_TOXICITY_RES = tuple(
    re.compile(rf"\b{w}\b", re.ASCII) for w in TOXICITY_WORDS
)
# fast path: one combined scan decides the (overwhelmingly common)
# zero-hit case; per-word counting only runs when something matched
_TOXICITY_ANY = re.compile(
    r"\b(?:" + "|".join(TOXICITY_WORDS) + r")\b", re.ASCII
)


def _ngram_char_fractions(words: list[str], text_len: int) -> dict[str, float]:
    """Top n-gram (n=2..4) and duplicated n-gram (n=5..10) character
    fractions, per the Gopher repetition rules.

    zip-tuple Counters are the fastest formulation measured here: they
    beat both index-slice genexprs and np.unique(axis=0) row-counting
    (whose lexsort overhead loses even at 20k-word docs).

    Uniqueness cascades: two equal (n+1)-grams contain two equal n-grams,
    so once every n-gram is unique all longer n-grams are unique too and
    their fractions are exactly 0.0 -- most clean documents build ONE
    Counter instead of nine (measured ~3x on this stage)."""
    from itertools import islice

    out: dict[str, float] = {}
    nw = len(words)
    all_unique = False
    for n in (2, 3, 4):
        if nw < n or all_unique:
            out[f"top_{n}gram_char_frac"] = 0.0
            continue
        grams = Counter(zip(*(islice(words, i, None) for i in range(n))))
        # NOT most_common(1): its insertion-order tie-break could pick a
        # SHORTER gram among count ties and understate the char fraction
        # (letting a repetitive doc pass the gate); take the max by
        # (count, chars, gram) -- deterministic and conservative.
        # Two-pass form of that max: find the max COUNT first (C-level),
        # then evaluate the char-length key only on the ties -- the
        # single-pass lambda computed sum(len(w)) for EVERY distinct
        # gram and was the hottest line of the heuristics stage
        # (profiled r5: ~0.9 s of 2.7 s on 4k docs).  Result identical:
        # argmax by (count, chars, gram) == argmax by (chars, gram)
        # restricted to count == max.
        count = max(grams.values())
        if count == 1:
            # every gram ties at 1 and the fraction is 0.0 whichever
            # wins the tie-break -- skip the per-gram key entirely
            all_unique = True  # all longer n-grams unique as well
            out[f"top_{n}gram_char_frac"] = 0.0
            continue
        gram = max(
            (g for g, c in grams.items() if c == count),
            key=lambda g: (sum(len(w) for w in g), g),
        )
        chars = sum(len(w) for w in gram)
        out[f"top_{n}gram_char_frac"] = (
            (count * chars) / text_len if text_len else 0.0
        )
    for n in range(5, 11):
        key = f"dup_{n}gram_char_frac"
        if nw < n or all_unique:
            out[key] = 0.0
            continue
        counts = Counter(zip(*(islice(words, i, None) for i in range(n))))
        if len(counts) == nw - n + 1:  # all unique: no dups
            out[key] = 0.0
            all_unique = True
            continue
        dup_chars = sum(
            (c - 1) * sum(len(w) for w in g)
            for g, c in counts.items()
            if c > 1
        )
        out[key] = dup_chars / text_len if text_len else 0.0
    return out


def gopher_c4_metrics(text: str) -> dict[str, float]:
    """Compute every heuristic metric for one document."""
    words = text.split()
    n_words = len(words)
    text_len = len(text)
    lines = [ln for ln in text.split("\n") if ln.strip()]
    n_lines = len(lines)
    lower = text.lower()

    mean_word_len = (sum(map(len, words)) / n_words) if n_words else 0.0
    symbol_hits = sum(lower.count(s) for s in ("#", "…")) + lower.count("...")
    symbol_ratio = symbol_hits / n_words if n_words else 0.0
    bullet_frac = (
        sum(1 for ln in lines if ln.lstrip().startswith(_BULLET_PREFIXES)) / n_lines
        if n_lines
        else 0.0
    )
    ellipsis_frac = (
        sum(1 for ln in lines if ln.rstrip().endswith(("...", "…"))) / n_lines
        if n_lines
        else 0.0
    )
    alpha_word_frac = (
        (n_words - len(_NO_ALPHA_WORD.findall(text))) / n_words
        if n_words
        else 0.0
    )
    stopword_hits = len(set(_STOPWORD_ALL.findall(lower)))

    # r8 fast path: dup numerator sum(c-1 for c>1) == n - n_distinct, so
    # a set() (one C pass, no per-key counts) decides the no-dup case
    # and only docs WITH dup lines build the Counter for char fractions
    n_distinct_lines = len(set(lines))
    if n_distinct_lines == n_lines:
        dup_line_frac = dup_line_char_frac = 0.0
    else:
        line_counts = Counter(lines)
        dup_line_frac = (
            (n_lines - n_distinct_lines) / n_lines if n_lines else 0.0
        )
        dup_line_char_frac = (
            sum((c - 1) * len(ln) for ln, c in line_counts.items() if c > 1)
            / text_len
            if text_len
            else 0.0
        )
    # paragraph twins of the line rules (Gopher has both levels)
    paras = [p for p in text.split("\n\n") if p.strip()]
    n_paras = len(paras)
    n_distinct_paras = len(set(paras))
    if n_distinct_paras == n_paras:
        dup_para_frac = dup_para_char_frac = 0.0
    else:
        para_counts = Counter(paras)
        dup_para_frac = (
            (n_paras - n_distinct_paras) / n_paras if n_paras else 0.0
        )
        dup_para_char_frac = (
            sum((c - 1) * len(pp) for pp, c in para_counts.items() if c > 1)
            / text_len
            if text_len
            else 0.0
        )

    # sentence-terminator count: per-char str.count stays in C and builds
    # no match list.  Equals len(re.findall(r"[.!?。!?]", text)) -- NOTE
    # that class spells ASCII ! and ? twice; its members are exactly
    # {. ! ? 。} (pinned by a differential test).
    sentences = (
        text.count(".") + text.count("!") + text.count("?")
        + text.count("。")
    )
    toxicity_hits = (
        sum(1 for rx in _TOXICITY_RES if rx.search(lower))
        if _TOXICITY_ANY.search(lower)
        else 0
    )

    metrics: dict[str, float] = {
        "n_words": float(n_words),
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_word_frac,
        "stopword_hits": float(stopword_hits),
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "dup_para_frac": dup_para_frac,
        "dup_para_char_frac": dup_para_char_frac,
        "n_sentences": float(sentences),
        "toxicity_hits": float(toxicity_hits),
        "has_lorem_ipsum": float(C4_BAD_SUBSTRINGS[0] in lower),
        "has_curly_brace": float(C4_BAD_SUBSTRINGS[1] in text),
    }
    metrics.update(_ngram_char_fractions(words, text_len))
    return metrics


# (rule_name, predicate over metrics) -- FIXED evaluation order.
RULES: tuple[tuple[str, object], ...] = (
    ("gopher_word_count", lambda m: not MIN_WORDS <= m["n_words"] <= MAX_WORDS),
    ("gopher_mean_word_length",
     lambda m: not MIN_MEAN_WORD_LEN <= m["mean_word_len"] <= MAX_MEAN_WORD_LEN),
    ("gopher_symbol_ratio", lambda m: m["symbol_word_ratio"] > MAX_SYMBOL_WORD_RATIO),
    ("gopher_bullet_lines", lambda m: m["bullet_line_frac"] > MAX_BULLET_LINE_FRAC),
    ("gopher_ellipsis_lines",
     lambda m: m["ellipsis_line_frac"] > MAX_ELLIPSIS_LINE_FRAC),
    ("gopher_alpha_words", lambda m: m["alpha_word_frac"] < MIN_ALPHA_WORD_FRAC),
    ("gopher_stopwords", lambda m: m["stopword_hits"] < MIN_STOPWORD_HITS),
    ("repetition_dup_lines", lambda m: m["dup_line_frac"] > MAX_DUP_LINE_FRAC),
    ("repetition_dup_line_chars",
     lambda m: m["dup_line_char_frac"] > MAX_DUP_LINE_CHAR_FRAC),
    ("repetition_dup_paragraphs",
     lambda m: m["dup_para_frac"] > MAX_DUP_PARA_FRAC),
    ("repetition_dup_paragraph_chars",
     lambda m: m["dup_para_char_frac"] > MAX_DUP_PARA_CHAR_FRAC),
    *(
        (f"repetition_top_{n}gram",
         (lambda n: lambda m: m[f"top_{n}gram_char_frac"] > MAX_TOP_NGRAM_CHAR_FRAC[n])(n))
        for n in (2, 3, 4)
    ),
    *(
        (f"repetition_dup_{n}gram",
         (lambda n: lambda m: m[f"dup_{n}gram_char_frac"] > MAX_DUP_NGRAM_CHAR_FRAC[n])(n))
        for n in range(5, 11)
    ),
    ("c4_lorem_ipsum", lambda m: m["has_lorem_ipsum"] > 0),
    ("c4_curly_brace", lambda m: m["has_curly_brace"] > 0),
    ("c4_min_sentences", lambda m: m["n_sentences"] < MIN_SENTENCES),
    ("c4_toxicity", lambda m: m["toxicity_hits"] > 0),
)

RULE_NAMES: tuple[str, ...] = tuple(name for name, _ in RULES)


def first_failing_rule(metrics: dict[str, float]) -> str | None:
    for name, pred in RULES:
        if pred(metrics):
            return name
    return None
