"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID, fingerprinting (training-data-pipeline ops
the task brief requires as first-class components)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from .urls import PAGERANK_SCALE
from .dsir import (
    DSIR_BUCKETS,
    DSIR_TARGET_MOD,
    DSIR_TOP_K,
    dsir_lean_score,
    dsir_select_topk,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def text_token_stats(spark, sf_dir):
    """Per-language corpus DATA CARD -- the summary row every corpus
    release ships (token/char stats since r1; r7 adds exact unique-doc
    counts via the md5 fingerprint and the mean hashed-linear
    classifier score, so dedup health and model-scored quality are in
    the same per-language rollup).  Whitespace tokenization and the
    classifier fold stay JVM-side in the scan projection.  The
    count_distinct makes this a two-phase aggregate whose FIRST
    shuffle carries (lang, fingerprint) keys -- one per unique doc,
    corpus-cardinality, not tiny; at 10^12 docs swap it for
    hll_sketch_agg (the mergeable path ``agg_count_distinct`` proves)
    and the rollup collapses back to a tiny-key agg -- exact kept
    here because the oracle compares values."""
    d = _docs(spark, sf_dir)
    toks = F.size(F.split("text", " "))
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(toks), 4).alias("avg_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum(toks).alias("total_tokens"),
            F.count_distinct(F.md5(F.lower("text"))).alias(
                "n_unique_docs"
            ),
            F.round(F.avg(hashed_linear_score()), 4).alias(
                "avg_clf_score"
            ),
        )
        .orderBy("lang")
    )


def text_quality_sql(spark, sf_dir):
    """SQL-expressible slice of the Gopher rules (word count, mean word
    length, stopword presence) -- the full rule chain runs in the fused
    kernel; this exercises the relational expression of the same math."""
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    n_words = F.size(words)
    mean_len = (F.length("text") - n_words + 1) / n_words  # spaces removed
    return (
        d.select(
            "doc_id",
            n_words.alias("n_words"),
            F.round(mean_len, 4).alias("mean_word_len"),
            (
                (n_words >= 50)
                & (n_words <= 100000)
                & F.col("text").contains(" the ")
            ).alias("keep_simple"),
        )
        .orderBy("doc_id")
    )


def text_fingerprint_md5(spark, sf_dir):
    """Document fingerprint: md5 of normalized text (JVM-side md5; the
    rolling-hash variant lives in dedup.simhash)."""
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "doc_id",
            F.md5(F.lower(F.col("text"))).alias("fingerprint"),
        )
        .orderBy("doc_id")
    )


WINDOW_N = 8  # the n-word window width: default of every window-based
# op (dup passages, passage removal, decontamination, word_windows_sql)
# AND the literal the f-string oracles interpolate -- one knob


def _word_windows(n: int, with_pos: bool = False):
    """The ONE definition of an ``n``-word window over the ``__words``
    column, shared by the duplicated-passage DETECTOR and the REMOVER so
    the signal and the excision can never disagree on segmentation.
    ``with_pos`` wraps each window in struct(pos, win).

    r8 formulation: a ``zip_with`` chain -- window k-prefixes extended
    one word per pass -- instead of a per-position ``slice`` +
    ``concat_ws``.  The old form allocated an 8-element array per
    window position; the chain does n-1 linear passes of plain string
    concats.  Values are identical (differential-pinned and
    mismatch-checked over the bench corpus); measured ~20% off every
    window explode (passage removal, dup-passage signal, bloom,
    decontamination all sit on this)."""
    expr = "__words"
    for k in range(1, n):
        expr = (
            f"zip_with(slice({expr}, 1, greatest(size(__words) - {k}, 0)),"
            f" slice(__words, {k + 1}, greatest(size(__words) - {k}, 0)),"
            f" (x, y) -> concat(x, ' ', y))"
        )
    if with_pos:
        expr = f"transform({expr}, (w, i) -> struct(i AS pos, w AS win))"
    return F.expr(expr)


def word_windows_sql(n: int = WINDOW_N) -> str:
    """The ONE DuckDB definition of the ``n``-word window list over a
    pre-split ``ws`` column -- the SQL twin of ``_word_windows`` above,
    shared by every window-based oracle (decontaminate, dup passages,
    passage removal, the corpus-builder funnel) so an oracle can never
    disagree with the others on segmentation."""
    return (
        f"[array_to_string(ws[i:i+{n - 1}], ' ')"
        f" for i in range(1, greatest(len(ws) - {n - 2}, 1))]"
    )


def text_dup_passages(spark, sf_dir, n: int = WINDOW_N):
    """Cross-document duplicated passages: every ``n``-word window (with
    multiplicity -- positions matter, unlike set-shingle dedup) grouped by
    content; windows appearing in >= 2 DISTINCT docs are boilerplate /
    copied-passage candidates (the passage-level dedup signal of Lee et
    al. 2022, "Deduplicating Training Data...", arXiv:2107.06499).
    One explode + one hash agg -- no join, so no quadratic fan-out; at
    10^12 docs group on ``xxhash64(window)`` instead of the window text
    to shrink the shuffle payload (same plan)."""
    d = _docs(spark, sf_dir)
    with_words = d.withColumn("__words", F.split("text", " "))
    windows = with_words.select(
        "doc_id", F.explode(_word_windows(n)).alias("passage")
    )
    return (
        windows.groupBy("passage")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            F.md5("passage").alias("passage_md5"),
            "n_docs", "n_occurrences", "first_doc",
        )
        .orderBy("passage_md5")
    )


def text_ngram_top(spark, sf_dir):
    """Top word bigrams per language (repetition-analysis shape):
    explode bigrams -> two-key hash agg -> rank window."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).withColumn("__words", F.split("text", " "))
    # split bound once: re-evaluating split() inside the lambda is
    # O(words^2) (no CSE in interpreted higher-order functions)
    bigrams = F.expr(
        "transform(slice(__words, 1, size(__words) - 1),"
        " (w, i) -> concat(w, ' ', element_at(__words, i + 2)))"
    )
    exploded = d.select("lang", F.explode(bigrams).alias("bigram"))
    counts = exploded.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "rnk", "bigram", "n")
        .orderBy("lang", "rnk")
    )


def text_langid_kernel(spark, sf_dir):
    """Kernel language-ID over documents (vectorized mapInPandas; no SQL
    oracle -- rows-only check).  The same langid the fused pipeline uses."""
    from ...quality.langid import predict_language

    d = _docs(spark, sf_dir).select("doc_id", "text", "lang")

    def run(batches):
        for pdf in batches:
            preds = [predict_language(t or "") for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "lang_pred": [p[0] for p in preds],
                    "lang_score": [p[1] for p in preds],
                }
            )

    out = d.mapInPandas(
        run, schema="doc_id long, lang string, lang_pred string, lang_score double"
    )
    return (
        out.groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "lang_pred")
    )


# explicit whitespace class: Java's \s includes \x0B, RE2's does not --
# the same \s-vs-\v parity class round 1 fixed in the kernel; spelling
# the class out makes Spark and the DuckDB oracle agree by construction
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0B\f\r]"

# Python str.split() separator class (the full str.isspace() set),
# spelled out for RE2: the kernel computes n_words with text.split(),
# which splits on ALL Unicode whitespace (\x0B, \x85, NBSP, ideographic
# space, ...), while RE2's \s is ASCII-only -- the same dialect gap
# _BPE_RE closes above.  Every oracle that recomputes a Python-split
# word count interpolates THIS constant instead of '\s' so a corpus
# containing exotic whitespace cannot desynchronize the hash compare
# (parity fuzz-tested against str.split() over the whole isspace set in
# tests/test_merged_queries.py::test_py_ws_class_matches_str_split).
PY_WS_CLASS = (
    r"[ \t\n\x0B\f\r\x1C-\x1F\x{0085}\x{00A0}\x{1680}"
    r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]"
)

# C4 kept-line rule, shared by text_c4_clean_lines and the merged
# text_doc_features projection (ONE definition): >=5 words AND terminal
# punctuation as the LAST CHARACTER -- right(.,1) IN (...) instead of a
# regex '$' anchor, whose semantics differ between Java (matches before
# a final \r) and RE2 (end of string only)
_KEPT_LINES_SQL = """filter(split(text, '\n'),
               l -> size(split(trim(l), ' ')) >= 5
                    AND right(trim(l), 1) IN ('.', '!', '?', '\"'))"""

_STOPWORD_MARKERS = {
    "en": ("the", "and", "with", "that"),
    "es": ("el", "la", "los", "que"),
    "de": ("der", "die", "und", "das"),
}


def _stopword_votes():
    """(en_hits, es_hits, de_hits, vote) column expressions over a
    lowercased space-padded text -- the ONE definition shared by
    text_lang_stopword_vote and the merged text_doc_features."""
    low = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))

    def hits(words):
        expr = F.lit(0)
        for w in words:
            expr = expr + F.when(low.contains(f" {w} "), 1).otherwise(0)
        return expr

    en = hits(_STOPWORD_MARKERS["en"])
    es = hits(_STOPWORD_MARKERS["es"])
    de = hits(_STOPWORD_MARKERS["de"])
    vote = (
        F.when((en >= es) & (en >= de), "en")
        .when(es >= de, "es")
        .otherwise("de")
    )
    return en, es, de, vote


def text_token_bpe(spark, sf_dir):
    """BPE-ish pre-tokenization count (GPT-2-style piece regex, simplified
    to the RE2/Java-common subset): letter runs, single digits, single
    punctuation -- JVM-side regexp_extract_all."""
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias(
                "n_bpe_tokens"
            ),
        )
        .orderBy("doc_id")
    )


def text_lang_stopword_vote(spark, sf_dir):
    """SQL-expressible language vote: count language-marker stopwords and
    pick the majority (the relational cousin of the kernel langid; exact
    oracle).  Ties resolve by fixed order en > es > de."""
    d = _docs(spark, sf_dir)
    en, es, de, vote = _stopword_votes()
    return (
        d.select("doc_id", en.alias("en_hits"), es.alias("es_hits"),
                 de.alias("de_hits"), vote.alias("lang_vote"))
        .orderBy("doc_id")
    )


def text_c4_clean_lines(spark, sf_dir):
    """C4 line-level cleaning (Raffel et al. 2020): keep lines with >= 5
    words that end in terminal punctuation; rejoin.  Pure JVM array
    lambdas -- the transform stage that precedes doc-level filtering in a
    C4-style pipeline."""
    d = _docs(spark, sf_dir)
    kept = F.expr(_KEPT_LINES_SQL)  # bound ONCE (no CSE in interpreted
    # higher-order functions -- see the split note above)
    return (
        d.select(
            "doc_id",
            F.size(kept).alias("n_kept_lines"),
            F.length(F.array_join(kept, "\n")).alias("cleaned_len"),
        )
        .orderBy("doc_id")
    )


def text_tfidf_top(spark, sf_dir, k: int = 3):
    """Top-k TF-IDF terms per document (first 100 docs): tf from a
    per-(doc, word) count, idf = ln(N/df) joined from the document
    frequencies.  Everything JVM-side: explode -> two hash aggs -> one
    broadcast-able join -> rank window.  At 10^12 docs the df table is
    vocabulary-sized (small) and broadcast; the heavy (doc, word) agg is
    a single shuffle with map-side partial aggregation."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    n_docs = d.count()  # scalar, one job on parquet metadata
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = words.select("doc_id", "word").distinct().groupBy("word").agg(
        F.count("*").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .filter(F.col("doc_id") < 100)
        .withColumn(
            "raw_score",
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("raw_score", 6)), F.asc("word")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id", "rnk", "word",
            F.round("raw_score", 4).alias("tfidf"),
        )
        .orderBy("doc_id", "rnk")
    )


CLF_BUCKETS = 65_536  # hashed-feature space of the linear scorer
CLF_WEIGHT_MULT = 2_654_435_761  # Knuth 2^32 golden-ratio multiplier
CLF_WEIGHT_MOD = 1_001  # stand-in weights span [-500, 500]

# the DuckDB form of hashed_linear_score, shared by every oracle that
# recomputes the classifier (one definition; hand-copied SQL fragments
# desynchronize silently -- the word_windows_sql precedent)
CLF_SCORE_SQL = (
    "coalesce(list_sum(list_transform("
    "list_filter(string_split(text, ' '), t -> t <> ''), "
    f"t -> ((('0x' || substr(md5(t), 1, 15))::BIGINT % {CLF_BUCKETS})"
    f" * {CLF_WEIGHT_MULT}) % {CLF_WEIGHT_MOD} - {CLF_WEIGHT_MOD // 2}"
    ")), 0)"
)


def hashed_linear_score(text_col: str = "text", n_buckets: int = CLF_BUCKETS):
    """Model-based quality score, the FineWeb-Edu / fastText-classifier
    pattern (arXiv:2406.17557 uses a trained classifier's score to
    select training data): a linear model over HASHED bag-of-words
    features, evaluated as pure column arithmetic in the scan
    projection -- no explode, no shuffle, no Python.  Each token maps
    to a bucket (the cross-engine md5 form), each bucket to a weight,
    and the doc score is the fold-sum.  The stand-in weight table is a
    pure function of the bucket id (``(b * MULT) % MOD - MOD//2`` --
    deterministic, exactly recomputable by DuckDB and by host-side
    tests); serving a REAL trained model swaps ``weight`` for a
    broadcast-map / literal-array lookup of learned coefficients, same
    plan shape.  All arithmetic BIGINT: bucket < 2^16 times the 2^32
    multiplier stays far under 2^63.  NULL text scores 0 like empty
    text (split(NULL) is NULL and the fold would propagate it --
    diverging from the oracle's coalesce)."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != F.lit(""),
    )

    def weight(t):
        b = md5_bucket(t, n_buckets, null_sentinel=False)
        return (b * F.lit(CLF_WEIGHT_MULT)) % CLF_WEIGHT_MOD - (
            CLF_WEIGHT_MOD // 2
        )

    return F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + weight(t)
    )


def text_doc_features(spark, sf_dir):
    """Single-scan per-document feature projection merging the five
    per-doc text ops (quality rules, BPE token count, stopword language
    vote, C4 line cleaning, md5 fingerprint) into ONE pass over
    ``documents`` -- at 10^12 docs five separate feature queries mean
    five corpus scans; a feature-extraction stage computes every
    per-document column in the same projection (zero shuffles, one scan,
    whole-stage codegen).  The five single-purpose forms above stay
    public API + pytest surface; this merged projection is the driver
    entry, exact-oracle-checked column for column."""
    # r8: sort FIRST, project after.  With the projection below the
    # global sort, the range exchange's key-sampling pass re-executes
    # the scan stage INCLUDING the whole feature projection (the
    # expensive clf/regex columns were computed twice); sorting the
    # narrow (doc_id, text) input and projecting above the sort runs
    # every feature exactly once -- identical rows in identical order
    # (unique sort key; projection preserves order).  Measured 1.2 s ->
    # 0.7 s at sf0.1.
    d = _docs(spark, sf_dir).select("doc_id", "text").orderBy("doc_id")
    words = F.split("text", " ")
    n_words = F.size(words)
    mean_len = (F.length("text") - n_words + 1) / n_words
    en, es, de, vote = _stopword_votes()
    kept_lines = F.expr(_KEPT_LINES_SQL)
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        (
            (n_words >= 50)
            & (n_words <= 100000)
            & F.col("text").contains(" the ")
        ).alias("keep_simple"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        en.alias("en_hits"),
        es.alias("es_hits"),
        de.alias("de_hits"),
        vote.alias("lang_vote"),
        F.size(kept_lines).alias("n_kept_lines"),
        F.length(F.array_join(kept_lines, "\n")).alias("cleaned_len"),
        F.md5(F.lower(F.col("text"))).alias("fingerprint"),
        # r7: hashed-linear classifier score (FineWeb-Edu pattern),
        # same scan, pure arithmetic -- see hashed_linear_score
        hashed_linear_score().alias("clf_score"),
    )


def text_dedup_passage_removal(spark, sf_dir, n: int = WINDOW_N):
    """Exact duplicated-passage REMOVAL (the ExactSubstr operation of Lee
    et al. 2022, arXiv:2107.06499, at window granularity): every ``n``-word
    window occurring more than once in the corpus is excised from all but
    its first occurrence (keeper = lexicographically min (doc_id, pos));
    overlapping duplicated windows merge naturally because removal is the
    per-doc UNION of word indexes.  ``text_dup_passages`` reports the
    signal; this op applies it.

    Entirely JVM-side -- no Python stage, TWO corpus scans total (one
    for windows, one for words): window explode -> count+rank windows
    over the window text -> explode removal spans to word indexes ->
    distinct -> LEFT join onto the (doc, idx, word) table -> one
    conditional aggregation yields words-before, words-removed, AND the
    cleaned text in the same pass (every doc has >= 1 word row, so no
    docs-table re-scan is needed to restore untouched rows).
    10^12-doc notes: group on xxhash64(win) instead of the window text
    to shrink the shuffle payload (kept as text here so the DuckDB
    oracle can recompute removal exactly); the removal-index explode is
    bounded by the duplicated-window coverage, not the corpus; the word
    join co-partitions on doc_id.  Returns one row per document: words
    before/after, MERGED removed-span statistics (n_spans /
    max_span_len / mean_span_len -- DuckDB-recomputed evidence that a
    long duplicate is excised as ONE unit, not 8-word confetti), and
    the md5 of the cleaned text (exact oracle compares all of them)."""
    cleaned = remove_duplicate_passages(
        _docs(spark, sf_dir), "doc_id", n=n, span_stats=True
    )
    return (
        cleaned.select(
            "doc_id", "n_words", "n_removed", "n_spans", "max_span_len",
            *_span_report_cols(),
        )
        .orderBy("doc_id")
    )


def _span_report_cols():
    """Mean merged-span length + cleaned-text md5 -- the shared
    finalization of BOTH legs of the passage/lines driver slot (one
    definition, so a rounding or NULL-policy tweak cannot desync the
    legs of one oracle)."""
    return (
        F.when(
            F.col("n_spans") > 0,
            F.round(
                F.col("n_removed").cast("double") / F.col("n_spans"), 4
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_span_len"),
        F.md5("cleaned_text").alias("cleaned_md5"),
    )


def remove_duplicate_passages(
    df, key: str, n: int = 8, text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
    span_stats: bool = False,
):
    """The keyed removal core shared by the driver query above and the
    corpus builder: returns one row per ``key`` with ``carry_cols``
    preserved plus (n_words, n_removed, cleaned_text).  See
    ``text_dedup_passage_removal`` for the plan/scale notes -- this IS
    that plan, parameterized over the document key and the carried
    metadata columns (which ride the word-table aggregation as extra
    group keys; they must be functionally dependent on ``key``).

    ``span_stats=True`` additionally emits (n_spans, max_span_len):
    statistics over the MERGED removed spans -- maximal runs of
    consecutive removed word indexes, i.e. adjacent duplicated windows
    fused into one excision unit.  Computed by a JVM ``aggregate`` fold
    over the sorted per-doc removed-index array (zero extra scans or
    shuffles): a long duplicate is evidenced as ONE long span, not
    ``len/n`` pieces of 8-word confetti.

    r8 plan (output bit-identical to the r7 window/word-explode form,
    differential-pinned): the sort-window rank over every exploded
    window and the corpus-wide word-table join/collect_list rebuild are
    both gone.  (1) one window explode, lazily localCheckpointed (two
    consumers, one materialization; the explode itself -- 5.5M
    concat_ws slices on the bench corpus -- was the single biggest
    cost, and a lazy checkpoint keeps the operator
    construction-time-silent); (2) keeper choice is a HASH aggregate
    ``min(struct(key, pos))`` per window (same ordering row_number used)
    with map-side partial aggregation -- no sort, and the hot-window
    shuffle collapses per-partition; (3) the (tiny, cnt>=2) keeper set
    broadcasts back onto the windows to emit removed occurrences --
    at corpus scales where the duplicated-window set outgrows a
    broadcast, drop the hint and this becomes one shuffle-join keyed by
    window; (4) per-doc removed-index arrays are built by a HOF
    flatten/distinct/sort (shuffling only (key, pos) pairs, never the
    n-exploded indexes), and the cleaned text is rebuilt by ONE
    ``array_except`` over the doc's own (idx, word) structs -- the word
    table is never exploded or shuffled at all.  Measured 19.1 s ->
    7.5 s over the 50k-page bench corpus; the corpus-builder passage
    stage drops with it.
    """
    group = [key, *carry_cols]
    # the NULL-text guard keeps parity with the exploded form, where
    # posexplode(split(NULL)) dropped such docs from the output
    with_words = df.where(F.col(text_col).isNotNull()).withColumn(
        "__words", F.split(text_col, " ")
    )
    wins = with_words.select(
        key, F.explode(_word_windows(n, with_pos=True)).alias("g")
    ).select(key, "g.pos", "g.win").localCheckpoint(eager=False)
    keepers = (
        wins.groupBy("win")
        .agg(
            F.count("*").alias("__cnt"),
            F.min(
                F.struct(F.col(key).alias("k"), F.col("pos").alias("p"))
            ).alias("__kp"),
        )
        .where(F.col("__cnt") >= 2)
        .select("win", "__kp")
    )
    rm_occ = (
        wins.join(F.broadcast(keepers), "win")
        .where(
            ~(
                (F.col(key) == F.col("__kp.k"))
                & (F.col("pos") == F.col("__kp.p"))
            )
        )
        .select(key, "pos")
    )
    rm_arr = (
        rm_occ.groupBy(key)
        .agg(F.collect_list("pos").alias("__poss"))
        .select(
            key,
            F.array_sort(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            "__poss",
                            lambda p: F.sequence(p, p + F.lit(n - 1)),
                        )
                    )
                )
            ).alias("__rm"),
        )
    )
    joined = with_words.join(rm_arr, key, "left")
    words = F.col("__words")
    idxw = F.transform(
        words, lambda w, i: F.struct(i.alias("idx"), w.alias("word"))
    )
    rm_structs = F.transform(
        "__rm",
        lambda i: F.struct(
            i.alias("idx"), F.element_at(words, i + 1).alias("word")
        ),
    )
    # array_except hashes the removed structs once per doc and keeps
    # left order; (idx, word) structs are unique per idx, so no kept
    # duplicate can be dropped
    kept_structs = F.when(F.col("__rm").isNull(), idxw).otherwise(
        F.array_except(idxw, rm_structs)
    )
    cleaned = F.concat_ws(
        " ", F.transform(kept_structs, lambda s: s.word)
    ).alias("cleaned_text")
    n_words = F.size(words).alias("n_words")
    n_removed = F.coalesce(F.size("__rm"), F.lit(0)).alias("n_removed")
    if not span_stats:
        return joined.select(*group, n_words, n_removed, cleaned)
    # gaps-and-islands over the SORTED removed-index array: runs of
    # consecutive indexes ARE the merged spans (cheaper than folding
    # the full word array -- |removed| <= |words|)
    run = lambda acc, i: (  # noqa: E731 - run length through index i
        F.when(i == acc.prev + 1, acc.cur + 1).otherwise(F.lit(1))
    )
    fold = F.aggregate(
        F.coalesce(F.col("__rm"), F.expr("cast(array() as array<int>)")),
        F.struct(
            F.lit(-2).alias("prev"),
            F.lit(0).alias("cur"),
            F.lit(0).alias("mx"),
            F.lit(0).alias("n"),
        ),
        lambda acc, i: F.struct(
            i.alias("prev"),
            run(acc, i).alias("cur"),
            F.greatest(acc.mx, run(acc, i)).alias("mx"),
            (
                acc.n + F.when(i == acc.prev + 1, 0).otherwise(1)
            ).alias("n"),
        ),
    )
    return joined.select(
        *group, n_words, n_removed,
        fold.n.alias("n_spans"),
        fold.mx.alias("max_span_len"),
        cleaned,
    )


def _marked_array_tail(agg, group, n_before: str, sep: str, span_stats: bool):
    """Shared rebuild+span-stats tail for removal operators that mark
    units for excision: ``agg`` carries ``__arr`` (array of structs
    (idx, word) sorted by idx, word NULL = removed unit) plus the
    already-aggregated ``n_before``-named count and ``n_removed``.
    Rebuilds the cleaned text by joining kept units with ``sep`` and,
    when ``span_stats``, computes MERGED removed-span statistics with a
    single gaps-and-islands fold over the same array (zero extra scans
    or shuffles).  Units are words for passage removal (sep ' ') and
    lines for boilerplate removal (sep newline)."""
    cleaned_text = F.concat_ws(
        sep,
        F.transform(
            F.filter(F.col("__arr"), lambda s: s.word.isNotNull()),
            lambda s: s.word,
        ),
    ).alias("cleaned_text")
    if not span_stats:
        return agg.select(*group, n_before, "n_removed", cleaned_text)
    # gaps-and-islands over the sorted unit array: entries are every
    # consecutive idx, so runs of word-IS-NULL entries ARE the merged
    # removed spans.  One fold, computed beside the cleaned text.
    cur = lambda acc, s: (  # noqa: E731 - run length after this entry
        F.when(
            s.word.isNull(), F.when(acc.cur > 0, acc.cur + 1).otherwise(1)
        ).otherwise(F.lit(0))
    )
    fold = F.aggregate(
        F.col("__arr"),
        F.struct(
            F.lit(0).alias("cur"),
            F.lit(0).alias("mx"),
            F.lit(0).alias("n"),
        ),
        lambda acc, s: F.struct(
            cur(acc, s).alias("cur"),
            F.greatest(acc.mx, cur(acc, s)).alias("mx"),
            (
                acc.n
                + F.when(s.word.isNull() & (acc.cur == 0), 1).otherwise(0)
            ).alias("n"),
        ),
    )
    return agg.select(
        *group, n_before, "n_removed",
        fold.n.alias("n_spans"),
        fold.mx.alias("max_span_len"),
        cleaned_text,
    )


BOILER_MIN_DOCS = 3  # a line key in >= this many DISTINCT docs is
# boilerplate; CCNet/RefinedWeb prune at parts-per-thousand of the crawl,
# but the rule is the same shape -- the threshold is a parameter
LINE_CHUNK_WORDS = 12  # _lined_docs body-line width (words)
NAV_LINE = "home | about | contact us"
TAG_LINE = "follow us on example social"
PROMO_PREFIX = "subscribe to our newsletter no. "
LINE_NORM_RE = "[0-9]+"  # digit runs collapse to one token so
# counter-varying boilerplate ("... no. 3" vs "... no. 5") still buckets
# together -- the digit-masking half of CCNet's paragraph normalization


def normalize_line(line) -> "F.Column":
    """CCNet-style line key: trim, casefold, collapse digit runs.  Kept
    SQL-expressible (same form interpolated into the DuckDB oracle) so
    the whole removal decision is cross-engine recomputable."""
    return F.regexp_replace(F.lower(F.trim(line)), LINE_NORM_RE, "0")


def remove_boilerplate_lines(
    df, key: str, min_docs: int = BOILER_MIN_DOCS, text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
    span_stats: bool = False,
):
    """CROSS-document boilerplate line removal (the line-dedup step of
    CCNet, arXiv:1911.00359 sec 3.1, and RefinedWeb, arXiv:2306.01116):
    a normalized line occurring in >= ``min_docs`` DISTINCT documents is
    navigation/footer/cookie-banner boilerplate and is removed from ALL
    documents -- unlike passage removal (`remove_duplicate_passages`),
    which keeps the first occurrence, boilerplate has no keeper: every
    copy is noise.  Blank/whitespace-only lines are never candidates
    (they would trivially exceed any threshold and destroy paragraph
    structure).

    Plan: one line explode -> per-doc-DISTINCT line keys -> tiny-result
    hash agg (count >= min_docs) -> LEFT join back on the key -> one
    conditional aggregation rebuilds the cleaned text and (optionally)
    merged removed-span stats via the shared `_marked_array_tail` fold.
    10^12-doc notes: the boilerplate key set is bounded by lines
    crossing the threshold (a tiny fraction of distinct lines) --
    broadcast it when under the autoBroadcast threshold, else it is one
    shuffle on the line key; group on xxhash64(key) instead of the line
    text to shrink that shuffle's payload (kept as text here so the
    DuckDB oracle recomputes removal exactly); the rebuild aggregation
    co-partitions on the doc key like passage removal's word join.
    Returns one row per ``key``: (n_lines, n_removed, [n_spans,
    max_span_len,] cleaned_text)."""
    group = [key, *carry_cols]
    # coalesce: split(NULL) explodes to ZERO rows, which would silently
    # drop NULL-text documents from the output ("one row per key")
    lines = df.select(
        *group,
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("idx", "line"),
    )
    keyed = lines.withColumn(
        "__k",
        F.when(F.trim(F.col("line")) != "", normalize_line(F.col("line"))),
    )
    boiler = (
        keyed.where(F.col("__k").isNotNull())
        .select(key, "__k")
        .distinct()
        .groupBy("__k")
        .agg(F.count("*").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__k", F.lit(True).alias("__rm"))
    )
    kept_line = F.when(F.col("__rm").isNull(), F.col("line"))
    agg = (
        keyed.join(boiler, "__k", "left")
        .groupBy(*group)
        .agg(
            F.count("*").cast("int").alias("n_lines"),
            F.count(F.col("__rm")).cast("int").alias("n_removed"),
            F.array_sort(
                F.collect_list(F.struct("idx", kept_line.alias("word")))
            ).alias("__arr"),
        )
    )
    return _marked_array_tail(agg, group, "n_lines", "\n", span_stats)


def _lined_docs(spark, sf_dir):
    """The documents table re-lined deterministically for the boilerplate
    leg (the testdata corpus is single-line, so line structure is
    synthesized from doc_id arithmetic exactly like the links leg's
    synthetic html): a 2-line boilerplate header (NAV_LINE + TAG_LINE --
    ADJACENT, so their removal must merge into one 2-line span), the
    document text chunked into LINE_CHUNK_WORDS-word body lines (unique
    per doc except for genuine cross-doc repetition, which the oracle
    recomputes identically), and a promo footer whose trailing counter
    varies per doc (doc_id % 7) -- it only becomes boilerplate AFTER
    digit-collapse normalization, so the leg exercises the normalizer,
    not just exact matching."""
    d = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    c = LINE_CHUNK_WORDS
    n_chunks = F.floor((F.size(ws) + F.lit(c - 1)) / F.lit(c)).cast("int")
    body = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(ws, i * c + 1, c), " "),
    )
    lined = F.concat(
        F.array(F.lit(NAV_LINE), F.lit(TAG_LINE)),
        body,
        F.array(
            F.concat(
                F.lit(PROMO_PREFIX), (F.col("doc_id") % 7).cast("string")
            )
        ),
    )
    return d.select("doc_id", F.array_join(lined, "\n").alias("text"))


def text_passage_and_line_dedup(spark, sf_dir, n: int = WINDOW_N):
    """Driver slot: tagged union of the two cross-document text-removal
    granularities under one schema -- ``leg='passage'`` is
    `text_dedup_passage_removal` unchanged (word units, keeper =
    first occurrence) and ``leg='lines'`` is `remove_boilerplate_lines`
    over `_lined_docs` (line units, NO keeper -- boilerplate is removed
    everywhere).  Columns are per-leg unit counts (words vs lines);
    cleaned_md5 is the exact rebuilt text either way, so both removal
    semantics are hash-checked end-to-end."""
    passage = text_dedup_passage_removal(spark, sf_dir, n).select(
        F.lit("passage").alias("leg"), "*"
    )
    ln = remove_boilerplate_lines(
        _lined_docs(spark, sf_dir), "doc_id", span_stats=True
    )
    lines_leg = ln.select(
        F.lit("lines").alias("leg"),
        "doc_id",
        F.col("n_lines").alias("n_words"),
        "n_removed",
        "n_spans",
        "max_span_len",
        *_span_report_cols(),
    )
    return passage.unionByName(lines_leg).orderBy("leg", "doc_id")


def decontaminate(
    docs, eval_docs, n: int = 8, text_col: str = "text",
    id_col: str = "doc_id",
):
    """Train/test DECONTAMINATION (the GPT-3-appendix / Pile procedure):
    flag every training document sharing at least one ``n``-word window
    with any document of an evaluation/benchmark set, so benchmark
    passages cannot leak into training data and inflate scores.  Distinct
    from dedup: cross-corpus and asymmetric (the eval set is authoritative
    and SMALL -- thousands of benchmark items vs 10^12 training docs), so
    the eval windows are BROADCAST and the training side never shuffles:
    windows explode in the scan projection, the broadcast LEFT SEMI join
    marks contaminated ids, one distinct bounds the output by the
    training-doc count.  Returns (id_col, n_contaminated_windows) per
    contaminated training doc; callers anti-join it to drop them."""
    t = docs.withColumn("__words", F.split(text_col, " ")).select(
        F.col(id_col), F.explode(_word_windows(n)).alias("win")
    )
    e = (
        eval_docs.withColumn("__words", F.split(text_col, " "))
        .select(F.explode(_word_windows(n)).alias("win"))
        .distinct()
    )
    return (
        t.join(F.broadcast(e), "win", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_windows"))
        .orderBy(id_col)
    )


def contamination_overlap(
    train_docs, eval_docs, n: int = 8, text_col: str = "text",
    id_col: str = "doc_id",
):
    """The EVAL-side contamination report: per benchmark document, how
    many of its distinct ``n``-word windows appear ANYWHERE in the
    training corpus -- the "X% of this eval set is contaminated"
    number the GPT-3 appendix / Pile / GPT-4 reports publish
    (``decontaminate`` answers the converse: which TRAINING docs to
    drop).  Returns one row per eval doc -- ``(id, n_windows,
    n_leaked, leak_frac)`` -- including zero-leak and shorter-than-n
    docs, so the output IS the full report.

    Scale shape (train is 10^12 docs, eval is thousands): the eval
    (id, window) pairs are distinct'd and BROADCAST; the training side
    explodes windows in the scan projection and left-semi-joins against
    the broadcast window set, so it never shuffles -- the only
    exchanges are over matched-window sets bounded by the EVAL suite's
    size.  One pass over train, one over eval."""
    ew = (
        eval_docs.withColumn("__words", F.split(text_col, " "))
        .select(F.col(id_col), F.explode(_word_windows(n)).alias("win"))
        .distinct()
        .localCheckpoint()  # eval-sized by contract; consumed 3x below
    )
    wset = ew.select("win").distinct()
    hit = (
        train_docs.withColumn("__words", F.split(text_col, " "))
        .select(F.explode(_word_windows(n)).alias("win"))
        .join(F.broadcast(wset), "win", "left_semi")
        .distinct()  # <= |eval windows| rows: bounded by eval, not train
    )
    leaked = (
        ew.join(F.broadcast(hit), "win")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_leaked"))
    )
    totals = ew.groupBy(id_col).agg(F.count("*").alias("n_windows"))
    return (
        eval_docs.select(id_col)
        .distinct()
        # totals/leaked are eval-sized: broadcast (the RIGHT side of a
        # left join broadcasts; hinting the left side is a silent no-op)
        .join(F.broadcast(totals), id_col, "left")
        .join(F.broadcast(leaked), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("long")
            .alias("n_windows"),
            F.coalesce("n_leaked", F.lit(0)).cast("long")
            .alias("n_leaked"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.coalesce("n_leaked", F.lit(0))
                / F.col("n_windows"),
            )
            .otherwise(F.lit(0.0))
            .alias("leak_frac"),
        )
        .orderBy(id_col)
    )


BLOOM_K = 5  # bloom probe count; with m sized by _bloom_m_bits the
# configured fpp holds at k=5 (fewer probes than the information-
# theoretic optimum trades a slightly larger m for fewer hash evals per
# window on the 10^12-row training side)
_BLOOM_SEED = 0x51AB  # xxhash64 seed base for the k probe functions


def _bloom_m_bits(n_items: int, fpp: float) -> int:
    """Filter size (bits, multiple of 64, >= 64) so a k=BLOOM_K bloom
    holds ``n_items`` at false-positive rate ``fpp``:
    solve fpp = (1 - e^(-k*n/m))^k for m."""
    import math

    if n_items <= 0:
        return 64
    m = -BLOOM_K * n_items / math.log(1.0 - fpp ** (1.0 / BLOOM_K))
    return max(64, (int(m) + 63) // 64 * 64)


def _bloom_positions(col, m: int):
    """The k probe bit-positions of a (string) column: independent
    seeded xxhash64 values mod m -- all JVM-side."""
    return [
        F.pmod(F.xxhash64(col, F.lit(_BLOOM_SEED + i)), F.lit(m))
        for i in range(BLOOM_K)
    ]


def build_window_bloom(
    docs, n: int = WINDOW_N, text_col: str = "text", fpp: float = 1e-3,
    max_words: int | None = None,
) -> tuple[list, int]:
    """Aggregate the DISTINCT n-word windows of ``docs`` into a Bloom
    filter, returned as ``(words, m)`` -- a python list of ``m // 64``
    int64 bit-words.  ONE aggregation builds it: window explode ->
    k probe positions -> per-64-bit-word ``bit_or`` -- and the driver
    collect is bounded by ``m // 64`` rows, a function of the CHOSEN
    capacity, never of the eval corpus size (the property that makes
    this the scale path: a 10^9-window eval suite at fpp 1e-3 is a
    ~2 GB filter regardless of how its windows are distributed).  The
    window frame is persisted so the sizing count and the probe
    aggregation share one eval-corpus scan (ADVICE r6)."""
    bits_df, m, n_wins, wins = _bloom_bits_frame(
        docs, n, text_col, fpp, persist_windows=True
    )
    try:
        if max_words is not None and m // 64 > max_words:
            # guard BEFORE the probe aggregation and the m//64-row
            # collect -- the expensive work the cap exists to prevent
            # (review r6: a post-collect check would OOM the driver
            # first)
            raise ValueError(
                f"bloom filter needs {m // 64} words for {n_wins}"
                f" windows at fpp={fpp} (> {max_words}): too large to"
                " embed as a plan literal -- use"
                " decontaminate_bloom(mode='table') (the"
                " broadcast-join probe) for this capacity"
            )
        return _assemble_bloom_words(bits_df, m), m
    finally:
        wins.unpersist()


def _assemble_bloom_words(bits_df, m: int) -> list:
    """Collect a (w, bits) frame into the dense ``m // 64``-word list
    the literal probe embeds -- <= m // 64 tiny rows, bounded by the
    CHOSEN capacity, never by corpus size."""
    words = [0] * (m // 64)
    for r in bits_df.collect():
        words[r.w] = r.bits
    return words


def _bloom_bits_frame(
    docs, n: int, text_col: str, fpp: float, persist_windows: bool = False
) -> tuple["DataFrame", int, int, "DataFrame"]:
    """The filter's (w, bits) rows as an (unmaterialized) DataFrame plus
    (m, n_distinct_windows, windows_frame): the shared build under both
    probe modes -- the literal path collects it (bounded by m // 64),
    the table path broadcasts it as-is (bounded by executor memory, the
    10^9-window regime).  ``persist_windows`` caches the distinct-window
    frame so the sizing count and the downstream probe aggregation scan
    the eval corpus once -- right for the literal/auto regime, wrong
    for a 10^9-window table build (the caller owns the unpersist)."""
    wins = (
        docs.withColumn("__words", F.split(F.col(text_col), " "))
        .select(F.explode(_word_windows(n)).alias("win"))
        .distinct()
    )
    if persist_windows:
        wins = wins.persist()
    n_wins = wins.count()
    m = _bloom_m_bits(n_wins, fpp)
    pos = F.explode(F.array(*_bloom_positions(F.col("win"), m)))
    bits_df = (
        wins.select(pos.alias("p"))
        .select(
            F.shiftrightunsigned("p", 6).alias("w"),
            # F.shiftleft only takes a literal shift; the by-column
            # form exists in SQL
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return bits_df, m, n_wins, wins


MAX_BLOOM_LITERAL_WORDS = 1 << 13  # 8192 words = 512 Kbit filter
# (~36k eval windows at fpp 1e-3): above this, embedding the filter as
# a plan literal bloats codegen -- see decontaminate_bloom's docstring
# for the broadcast-join escape at larger capacities


def decontaminate_bloom(
    train_docs,
    eval_docs,
    n: int = WINDOW_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    fpp: float = 1e-3,
    mode: str = "auto",
):
    """Benchmark decontamination, BLOOM-FILTER form -- the scale path
    when the eval suite's distinct-window set is too large to broadcast
    as an exact semi-join set (the GPT-3 appendix / Pile procedure used
    bloom filters for exactly this).  Flags every training doc with at
    least one window the filter claims eval membership for, returning
    ``(doc_id, n_flagged_windows)`` like ``decontaminate``.

    Guarantees: NO false negatives (every exactly-contaminated window
    is flagged -- bloom filters cannot miss an inserted element), so
    the flagged set is a SUPERSET of ``decontaminate``'s; false
    positives at rate ``fpp`` OVER-drop, the safe direction for
    decontamination (a clean doc is discarded, never a contaminated
    doc kept).

    Two probe modes, IDENTICAL results (pinned in tests):

    - ``'literal'`` (small filters): the bit-words embed as an
      array<long> LITERAL in the scan projection, so the probe -- k
      seeded xxhash64 mods, an element_at and a bitwiseAND per probe
      -- is pure JVM codegen over the training windows: no UDF, no
      join, no shuffle on the training side.  Capped at
      MAX_BLOOM_LITERAL_WORDS (512 Kbit) to keep codegen sane.
    - ``'table'`` (the 10^9-window regime): the (w, bits) rows stay a
      DataFrame and the probe is k BROADCAST hash joins on
      ``shiftrightunsigned(pos, 6)`` -- same arithmetic, filter size
      bounded by executor memory (a ~2 GB filter broadcasts; a plan
      literal that size would not compile), training side still never
      shuffles before the per-doc rollup.  A probe word absent from
      the table means those 64 bits are all zero (left join,
      coalesce 0).

    ``'auto'`` (default) picks literal while the filter fits the cap,
    table above it.  Raising ``fpp`` shrinks the filter linearly if
    over-dropping is cheap."""
    if mode not in ("auto", "literal", "table"):
        raise ValueError(f"unknown bloom probe mode {mode!r}")
    if mode == "literal":
        words, m = build_window_bloom(
            eval_docs, n, text_col, fpp,
            max_words=MAX_BLOOM_LITERAL_WORDS,
        )
        bits_df = None
    else:
        # auto persists the window frame (it will likely collect the
        # small-filter words); an explicit 'table' caller knows the
        # eval suite is 10^9-window scale, where persisting the frame
        # just to count it is the wrong trade
        bits_df, m, _, wins = _bloom_bits_frame(
            eval_docs, n, text_col, fpp, persist_windows=(mode == "auto")
        )
        if mode == "auto":
            if m // 64 <= MAX_BLOOM_LITERAL_WORDS:
                words = _assemble_bloom_words(bits_df, m)
                bits_df = None
            wins.unpersist()  # over-cap: lazy bits_df recomputes at
            # broadcast time, same shape as mode='table'
    t = (
        train_docs.withColumn("__words", F.split(F.col(text_col), " "))
        .select(F.col(id_col), F.explode(_word_windows(n)).alias("win"))
    )
    for i, p in enumerate(_bloom_positions(F.col("win"), m)):
        t = t.withColumn(f"__p{i}", p)
    if bits_df is None:
        t = t.withColumn(
            "__bf", F.array(*[F.lit(w).cast("long") for w in words])
        )
        tests = [
            f"(element_at(__bf,"
            f" CAST(shiftrightunsigned(__p{i}, 6) + 1 AS INT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 64 AS INT)))"
            f" != 0"
            for i in range(BLOOM_K)
        ]
    else:
        tests = []
        for i in range(BLOOM_K):
            bt = bits_df.select(
                F.col("w").alias(f"__w{i}"),
                F.col("bits").alias(f"__b{i}"),
            )
            t = t.join(
                F.broadcast(bt),
                F.shiftrightunsigned(F.col(f"__p{i}"), 6)
                == F.col(f"__w{i}"),
                "left",
            )
            tests.append(
                f"(coalesce(__b{i}, CAST(0 AS BIGINT))"
                f" & shiftleft(CAST(1 AS BIGINT),"
                f" CAST(__p{i} % 64 AS INT))) != 0"
            )
    hit = F.expr(" AND ".join(tests))
    return (
        t.filter(hit)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_flagged_windows"))
        .orderBy(id_col)
    )


def md5_hash60(col) -> "F.Column":
    """The repo's cross-engine-exact 60-bit hash of a (string-castable)
    column: ``conv(substr(md5(x), 1, 15), 16, 10)`` as a BIGINT, equal
    to DuckDB's ``('0x' || substr(md5(x), 1, 15))::BIGINT`` (verified
    incl. unicode/empty strings).  The shared primitive under
    ``md5_bucket``, simhash's token hash, and ``cap_per_domain``'s
    keeper rank."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
    ).cast("long")


def md5_bucket(col, n: int, null_sentinel: bool = True) -> "F.Column":
    """Deterministic 0..n-1 bucket of a key column: md5-derived 60-bit
    hash mod ``n`` -- the ONE definition of the reproducible sampling
    decision (pure function of the key, retry/resume-safe), shared by
    every sampler here.  With ``null_sentinel`` (the default for the
    non-oracle callers), NULL keys bucket as the string ``'__null__'``
    -- a raw NULL would bucket to NULL and silently fall out of every
    range predicate, corrupting budget accounting.  The oracle-checked
    percent form (``md5_bucket100``) disables it: DuckDB's
    ``md5(NULL)`` is NULL, and cross-engine parity outranks NULL-key
    convenience there.  At 10^12 rows swap for
    ``pmod(xxhash64(col), n)`` -- same plan, faster hash, losing only
    the cross-engine oracle."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    if null_sentinel:
        c = F.coalesce(c, F.lit("__null__"))
    return F.pmod(md5_hash60(c), F.lit(n))


def md5_bucket100(col) -> "F.Column":
    """``md5_bucket(col, 100)`` without the NULL sentinel -- the
    percent-granularity form the stratified sampler and corpus builder
    interpolate into DuckDB oracles (which see ``md5(NULL) = NULL``)."""
    return md5_bucket(col, 100, null_sentinel=False)


EVAL_MOD = 41  # deterministic stand-in benchmark: every 41st document
# plays the eval set in the driver-checked decontamination query


def text_decontaminate(spark, sf_dir, n: int = WINDOW_N):
    """Driver entry for benchmark DECONTAMINATION (the GPT-3-appendix /
    Pile n-gram-overlap procedure) -- previously pytest-only because the
    50-slot cap was full (VERDICT r3 missing #2).  The eval set is a
    deterministic subset of ``documents`` (doc_id % EVAL_MOD == 0 -- a
    stand-in benchmark the DuckDB oracle reconstructs exactly), and the
    result is every contaminated training doc with its contaminated-
    window count.  Fully SQL-expressible, so the oracle recomputes the
    8-word-window semi-join in full; the Spark plan keeps the scale
    shape (eval windows broadcast, training side never shuffles --
    plan-pinned in tests/test_plans.py)."""
    d = _docs(spark, sf_dir)
    eval_docs = d.filter(F.col("doc_id") % EVAL_MOD == 0)
    return decontaminate(d, eval_docs, n=n)


BLOOM_FPP = 1e-3  # driver-leg bloom false-positive budget


def text_decontaminate_with_bloom(spark, sf_dir, n: int = WINDOW_N):
    """The ``text_decontaminate`` driver slot, THREE TAGGED LEGS
    (r6 exact/bloom, r7 overlap):

    - ``leg='exact'``: ``text_decontaminate`` unchanged (one row per
      contaminated doc, DuckDB recomputes the semi-join in full);
    - ``leg='bloom'``: ONE summary row gating ``decontaminate_bloom``
      -- ``doc_id = -1``, ``n_contaminated_windows = 1`` iff BOTH
      scale-path invariants hold (requirement-stating oracle, the ANN
      recall-gate pattern): (a) SUPERSET -- every exactly-contaminated
      doc is bloom-flagged with at least as many windows (bloom filters
      cannot produce false negatives; a probe/seed regression breaks
      this); (b) FPR -- the extra flagged windows stay within
      5 x BLOOM_FPP x total corpus windows (floor 5).  Both are
      deterministic (seeded xxhash64 over a fixed corpus), so a
      regression flips the value and fails the driver's hash compare.
    """
    d = _docs(spark, sf_dir)
    eval_docs = d.filter(F.col("doc_id") % EVAL_MOD == 0)
    exact = decontaminate(d, eval_docs, n=n).localCheckpoint()
    # ^ tiny (contaminated docs); consumed three times below
    bloom = decontaminate_bloom(
        d, eval_docs, n=n, fpp=BLOOM_FPP
    ).localCheckpoint()
    ex = exact.select("doc_id",
                      F.col("n_contaminated_windows").alias("ne"))
    bl = bloom.select("doc_id", F.col("n_flagged_windows").alias("nb"))
    superset_ok = (
        ex.join(bl, "doc_id", "left")
        .agg(
            F.min(
                F.coalesce(F.col("nb") >= F.col("ne"), F.lit(False))
            ).alias("ok")
        )
        .collect()[0][0]
    )
    superset_ok = bool(superset_ok) if superset_ok is not None else True
    total_windows = (
        d.withColumn("__words", F.split("text", " "))
        .select(F.explode(_word_windows(n)).alias("w"))
        .count()
    )
    sums = [
        df.agg(F.coalesce(F.sum(c), F.lit(0))).collect()[0][0]
        for df, c in ((bl, "nb"), (ex, "ne"))
    ]
    fpr_ok = (sums[0] - sums[1]) <= max(5, 5 * BLOOM_FPP * total_windows)
    bloom_row = spark.createDataFrame(
        [("bloom", -1, 1 if (superset_ok and fpr_ok) else 0)],
        "leg string, doc_id long, n_contaminated_windows long",
    )
    # leg='overlap' (r7): the EVAL-side report -- per benchmark doc,
    # its distinct-window leak count into the NON-eval training half
    # (contamination_overlap; the 'X% of the benchmark is contaminated'
    # number).  One row per eval doc incl. zero-leak ones; the oracle
    # recomputes every count exactly.
    overlap = contamination_overlap(
        d.filter(F.col("doc_id") % EVAL_MOD != 0), eval_docs, n=n
    ).select(
        F.lit("overlap").alias("leg"),
        "doc_id",
        F.col("n_leaked").alias("n_contaminated_windows"),
    )
    return (
        exact.select(
            F.lit("exact").alias("leg"),
            "doc_id",
            F.col("n_contaminated_windows").cast("long")
            .alias("n_contaminated_windows"),
        )
        .unionByName(bloom_row)
        .unionByName(overlap)
        .orderBy("leg", "doc_id")
    )


CCNET_BUCKETS = ("head", "middle", "tail")  # ascending score order:
# head = best (CCNet ranks by LM perplexity, lower = more fluent)


def bucket_by_score(
    df, score_col: str, by: str = "lang", key: str = "doc_id",
    mode: str = "threshold", accuracy: int = 10_000, cuts_df=None,
):
    """CCNet-style per-language quality bucketing (arXiv:1911.00359
    sec 4.4): rank documents WITHIN each language by a quality score
    (CCNet uses KenLM perplexity; any ascending-is-better numeric column
    works -- compose with ``quality``'s perplexity output) and split
    into equal thirds head/middle/tail.  Downstream recipes keep head
    (+middle) or mixture-sample per bucket.  Adds a ``bucket`` column.

    Two modes, pinned against each other in tests:

    - ``mode='ntile'``: EXACT equal-count split -- ``ntile(3)`` over
      (partition by language, order by score THEN key).  The total
      order is deterministic, so re-runs and both engines agree
      bit-for-bit (this is the oracle-checked reference semantics).
      Costs one hash shuffle on the language key plus a per-language
      sort: fine into the 10^9-docs-per-language range.
    - ``mode='threshold'``: the 10^12-doc path.  Two approximate
      percentile cuts per language (``percentile_approx`` sketch --
      map-side combined, bounded driver rows) broadcast back as a
      CASE projection: NO sort, NO window, one scan over the corpus.
      Bucket sizes are approximate within the sketch error, and tied
      scores cannot straddle a cut (every doc with score == the cut
      lands in the lower bucket), so boundary docs may land one
      bucket over vs ntile -- the agreement test quantifies it.
      The sketch's merge order is shuffle-dependent, so cut VALUES
      are not bit-stable across reruns; for retry/resume-identical
      selection (this repo's invariant for every other sampler),
      persist the tiny cuts frame (one row per language) and pass it
      back as ``cuts_df`` -- which is also how a production pipeline
      holds thresholds fixed across crawl snapshots.

    NULL policy, identical in both modes: a NULL ``by`` key is its own
    group (null-safe join / its own window partition), and a NULL score
    (e.g. perplexity of an empty doc) is 'tail' -- a doc the scorer
    cannot vouch for must never outrank a scored one.
    """
    labels = F.array(*[F.lit(b) for b in CCNET_BUCKETS])
    null_tail = F.when(
        F.col(score_col).isNull(), F.lit(CCNET_BUCKETS[-1])
    )
    if mode == "ntile":
        from pyspark.sql import Window

        t = F.ntile(len(CCNET_BUCKETS)).over(
            Window.partitionBy(by).orderBy(
                F.col(score_col).asc_nulls_last(), F.col(key)
            )
        )
        return df.withColumn(
            "bucket", null_tail.otherwise(F.element_at(labels, t))
        )
    if mode != "threshold":
        raise ValueError(f"unknown mode {mode!r}")
    n = len(CCNET_BUCKETS)
    if cuts_df is None:
        cuts_df = df.groupBy(by).agg(
            F.percentile_approx(
                score_col,
                [i / n for i in range(1, n)],
                accuracy,
            ).alias("__cuts")
        )
    b = null_tail.when(
        F.col(score_col) <= F.col("__cuts")[0], F.lit(CCNET_BUCKETS[0])
    )
    for i in range(1, n - 1):
        b = b.when(
            F.col(score_col) <= F.col("__cuts")[i], F.lit(CCNET_BUCKETS[i])
        )
    b = b.otherwise(F.lit(CCNET_BUCKETS[-1]))
    cuts_df = F.broadcast(cuts_df.withColumnRenamed(by, "__by"))
    return (
        df.join(cuts_df, F.col(by).eqNullSafe(F.col("__by")))
        .withColumn("bucket", b)
        .drop("__cuts", "__by")
    )


SAMPLE_PCT = 20  # stratified-sampling default, interpolated into its oracle


def sample_stratified_deterministic(spark, sf_dir, pct: int = SAMPLE_PCT):
    """Reproducible stratified downsampling -- the training-data staple
    for rebalancing a corpus (e.g. cap English at N%, keep every doc of
    a low-resource language).  The sampling decision is a PURE FUNCTION
    of the row key: md5-derived 60-bit hash of doc_id mod 100 < pct, so
    re-runs, retries, and resumes select the SAME rows (rand()-based
    sampling is non-reproducible across task retries -- a silent
    training-data bug at 10^12 docs), and the DuckDB oracle recomputes
    the selection exactly.  At 10^12 rows swap the md5 derivation for
    ``pmod(xxhash64(key), 100)`` -- same plan, faster hash, losing only
    the cross-engine oracle.  Per-language keep counts prove the
    stratification; the hash is uniform so each stratum keeps ~pct%."""
    d = _docs(spark, sf_dir)
    kept = d.withColumn(
        "__b", md5_bucket100(F.col("doc_id").cast("string"))
    ).filter(F.col("__b") < pct)
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id"))
            ).alias("kept_ids"),
        )
        .orderBy("lang")
    )


MIXTURE_DENOM = 1_000_000  # mixture-rate granularity: 1e-6 (a 0.4%
# common-crawl downweight or a 0.0001 contamination trickle both
# survive quantization; percent granularity would zero them out)

MIXTURE_WEIGHTS = {"en": 0.5, "de": 1.0, "es": 0.04, "zh": 0.004}
# the mixture leg's per-source keep fractions, chosen to exercise every
# interesting regime on the shipped corpus: full keep (de), half (en),
# a few-percent downweight (es), a SUB-percent rate that percent
# granularity would quantize to zero (zh), and an OMITTED source (fr --
# explicit mixes drop unlisted sources).  Interpolated into the oracle
# as a CASE at MIXTURE_DENOM granularity -- one knob.


def sample_stratified_with_mixture(spark, sf_dir, pct: int = SAMPLE_PCT):
    """The ``sample_stratified_deterministic`` driver slot, THREE
    TAGGED LEGS (r5 VERDICT #3 pulled mixture sampling under the exact
    oracle without a new 50-cap slot; r6 adds DSIR selection the same
    way):

    - ``leg='strat'``: ``sample_stratified_deterministic`` unchanged
      (uniform md5-bucket pct% keep, per-language kept counts + sorted
      id lists);
    - ``leg='mix'``: ``sample_mixture`` with ``MIXTURE_WEIGHTS`` keyed
      on ``lang`` as the source column -- each language kept at its own
      deterministic rate (the CASE-in-scan-projection form), same
      per-language rollup.  A language kept at rate 0 in a small
      corpus simply has no row, identically on both engines.
    - ``leg='dsir'``: DSIR-style targeted selection
      (``operators/dsir.py``) -- hashed-unigram bucket statistics over
      a deterministic stand-in target corpus
      (``doc_id % DSIR_TARGET_MOD == 0``), integer-exact
      target-leaning score per raw doc, top-``DSIR_TOP_K`` by
      ``(score DESC, doc_id ASC)``, same per-language rollup.  Every
      arithmetic step is exact integer (decimal/HUGEINT
      cross-multiplied shares, +/-1 token scores), so DuckDB
      recomputes the selected ids bit-for-bit.
    - ``leg='links'`` (r7): ``extract_outlinks`` + ``domain_link_stats``
      over SYNTHETIC pages whose html is pure doc_id arithmetic (each
      doc links to ``d{(id+1)%17}.example`` absolutely and
      ``d{(id+7)%17}.example`` protocol-relative from source host
      ``s{id%5}.example``, plus four TRAP links -- same-host nav,
      relative, ``data-href``, and an unterminated-quote anchor placed
      BEFORE a real one -- that must all be excluded without losing the
      anchor that follows the broken one).  ``lang`` carries the target
      domain, ``n_kept`` its in-link count from ``domain_link_stats``,
      and ``kept_ids`` is ``<n_src_domains>|<sorted source doc ids>``,
      so the oracle recomputes the whole in-degree table exactly; a
      regex regression (traps captured, post-broken anchor lost) or a
      stats regression (same-host edges counted, referrers double-
      counted) flips a hash.
    - ``leg='pack'`` (r7): ``pack_sequences`` at ``PACK_SEQ_LEN`` --
      one row per training window, ``lang`` carrying the zero-padded
      bin label (``bin:00000007`` -- this leg's GROUP KEY, reusing the
      slot's column the way the loop legs reuse ``doc_b = -1``),
      ``n_kept``/``kept_ids`` = the docs occupying that window
      (bin-SPANNING docs appear in every window they touch).  The
      whole tape layout is integer arithmetic over md5 order, so the
      oracle recomputes every window's membership exactly -- any
      off-by-one in the offset math or the span explode flips a
      hash.
    - ``leg='ccnet'`` (r7): ``bucket_by_score`` in its exact ntile
      mode -- per-language head/middle/tail thirds ordered by a
      DuckDB-recomputable score (whitespace token count; the real
      pipeline feeds kernel perplexity, pytest-pinned since floats
      cannot hash cross-engine).  ``lang`` carries
      ``<language>/<bucket>`` and ``kept_ids`` the exact sorted
      membership of each third, so a tie-break or remainder-
      distribution regression in the bucketer flips a hash.  The
      Sort-free threshold mode is pinned against this leg's ntile
      semantics in ``test_ccnet_buckets.py``.
    - ``leg='pagerank'`` (r7): ``domain_pagerank`` over the SAME
      synthetic link graph as the links leg -- 3 integer-arithmetic
      power iterations (exact rational damping 85/100, every division
      floored), ``n_kept`` carrying each domain's final rank in 1e-9
      units and ``kept_ids`` the iteration-2 rank (``r2:<rank>``), so
      the oracle checks the iteration STRUCTURE, not just a fixed
      point.  The same-host nav trap must be dropped as a self-loop
      or every source domain gains in-edges and the hashes flip.

    All legs are pure functions of the row keys, so the DuckDB oracle
    recomputes the exact kept-id lists for each.  The strat leg IS
    ``sample_stratified_deterministic`` by construction (called, not
    re-implemented -- an edit to the single-purpose sampler's keep rule
    cannot silently diverge the driver slot); the other legs apply the
    same rollup to their own selections."""
    strat = sample_stratified_deterministic(spark, sf_dir, pct).select(
        F.lit("strat").alias("leg"), "lang", "n_kept", "kept_ids"
    )
    mix = (
        sample_mixture(
            _docs(spark, sf_dir), MIXTURE_WEIGHTS,
            source_col="lang", key_col="doc_id",
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id"))
            ).alias("kept_ids"),
        )
        .select(F.lit("mix").alias("leg"), "lang", "n_kept", "kept_ids")
    )
    d = _docs(spark, sf_dir).withColumn(
        "__t", F.col("doc_id") % DSIR_TARGET_MOD == 0
    )
    dsir = (
        dsir_select_topk(
            dsir_lean_score(d, "__t", keep_cols=("lang",)), DSIR_TOP_K
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id"))
            ).alias("kept_ids"),
        )
        .select(F.lit("dsir").alias("leg"), "lang", "n_kept", "kept_ids")
    )
    from .urls import domain_link_stats, extract_outlinks

    did = F.col("doc_id")
    synth_html = F.concat(
        # real link 1: absolute
        F.lit('<a href="https://d'), ((did + 1) % 17).cast("string"),
        F.lit('.example/p'), did.cast("string"), F.lit('">t1</a>'),
        # trap: same-host navigation (excluded by domain_link_stats)
        F.lit('<a href="https://s'), (did % 5).cast("string"),
        F.lit('.example/nav">self</a>'),
        # trap: relative + data-href (excluded by extract_outlinks)
        F.lit('<a href="/rel">r</a>'),
        F.lit('<a data-href="https://trap.example/x">d</a>'),
        # trap: unterminated quote -- and the REAL link 2 right after
        # it must still be seen (protocol-relative form)
        F.lit('<a href="https://broken.trap/x>oops '),
        F.lit("<a href='//d"), ((did + 7) % 17).cast("string"),
        F.lit(".example/q"), did.cast("string"), F.lit("'>t2</a>"),
    )
    pages_synth = _docs(spark, sf_dir).select(
        F.concat(
            F.lit("https://s"), (did % 5).cast("string"),
            F.lit(".example/p"), did.cast("string")
        ).alias("url"),
        synth_html.alias("html"),
    )
    edges = extract_outlinks(pages_synth)
    src_id = F.regexp_extract("src", r"/p(\d+)$", 1).cast("long")
    from .urls import collapsed_authority

    ids = (
        edges.select(
            collapsed_authority(F.col("href")).alias("domain"),
            src_id.alias("__sid"),
        )
        .groupBy("domain")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("__sid"))
            ).alias("__idlist")
        )
    )
    links = (
        domain_link_stats(edges)
        .join(ids, "domain")
        .select(
            F.lit("links").alias("leg"),
            F.col("domain").alias("lang"),
            F.col("n_inlinks").alias("n_kept"),
            F.concat_ws(
                "|", F.col("n_src_domains").cast("string"),
                F.col("__idlist"),
            ).alias("kept_ids"),
        )
    )
    pack = (
        pack_sequences(_docs(spark, sf_dir), PACK_SEQ_LEN)
        .select(
            "doc_id",
            F.explode(F.sequence("first_bin", "last_bin")).alias("__bin"),
        )
        .groupBy("__bin")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id"))
            ).alias("kept_ids"),
        )
        .select(
            F.lit("pack").alias("leg"),
            F.concat(
                F.lit("bin:"),
                F.lpad(F.col("__bin").cast("string"), 8, "0"),
            ).alias("lang"),
            "n_kept",
            "kept_ids",
        )
    )
    from .urls import collapsed_authority as _ca
    from .urls import domain_pagerank

    pr_edges = edges.select(
        _ca(F.col("src")).alias("src_domain"),
        _ca(F.col("href")).alias("dst_domain"),
    )
    pagerank = domain_pagerank(pr_edges, trace_iteration=2).select(
        F.lit("pagerank").alias("leg"),
        F.col("domain").alias("lang"),
        F.col("rank").alias("n_kept"),
        F.concat(F.lit("r2:"), F.col("rank_trace").cast("string")).alias(
            "kept_ids"
        ),
    )
    ccnet = (
        bucket_by_score(
            _docs(spark, sf_dir).select(
                "lang", "doc_id",
                F.size(F.split("text", " ")).alias("__score"),
            ),
            "__score", by="lang", key="doc_id", mode="ntile",
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id"))
            ).alias("kept_ids"),
        )
        .select(
            F.lit("ccnet").alias("leg"),
            F.concat_ws("/", "lang", "bucket").alias("lang"),
            "n_kept", "kept_ids",
        )
    )
    return (
        strat.unionByName(mix)
        .unionByName(dsir)
        .unionByName(links)
        .unionByName(pack)
        .unionByName(ccnet)
        .unionByName(pagerank)
        .orderBy("leg", "lang")
    )


N_BUDGET_BUCKETS = 10_000  # token-budget selection granularity: the kept
# set's total misses the budget by at most one bucket (~0.01% of corpus
# tokens at uniform hashing)

PACK_SEQ_LEN = 512  # driver-leg packing window: small enough that docs
# straddle bin boundaries at every driver sf (bin-spanning is the part
# of the packing math worth driver-checking), far below a production
# 2k-8k context so the leg exercises MORE boundary cases, not fewer


QUERIES = {
    "text_tfidf_top": text_tfidf_top,
    "text_dup_passages": text_dup_passages,
    "text_ngram_top": text_ngram_top,
    "text_token_stats": text_token_stats,
    "text_doc_features": text_doc_features,
    # r7: the passage-removal slot carries a second tagged leg for
    # CCNet/RefinedWeb-style cross-document boilerplate LINE removal
    # (no-keeper semantics, digit-collapse normalization)
    "text_dedup_passage_removal": text_passage_and_line_dedup,
    # r6: the decontamination slot carries a second gated leg for the
    # bloom-filter scale path (superset + fpr invariants)
    "text_decontaminate": text_decontaminate_with_bloom,
    # r6: the stratified slot carries a second tagged leg exercising
    # per-source mixture sampling (sample_mixture) under the same oracle
    "sample_stratified_deterministic": sample_stratified_with_mixture,
    # scalar_line_split's F6 semantics (size(split(text,' '))) are the
    # n_words column of text_doc_features, oracle-checked there; its
    # standalone slot was freed for the passage-removal op.
    # text_quality_sql / text_token_bpe / text_lang_stopword_vote /
    # text_c4_clean_lines / text_fingerprint_md5 are merged into
    # text_doc_features for the driver contract (one scan, same exprs);
    # text_langid_kernel stays pytest-only (the flagship pipeline's
    # lang_pred column exercises the same kernel in its driver entry).
}

def _pagerank_iter_sql(i: int) -> str:
    """One unrolled integer power-iteration CTE pair for the pagerank
    leg's oracle -- same floor arithmetic as ``urls.domain_pagerank``:
    teleport + uniformly redistributed dangling mass + per-edge floored
    contributions, all over the constants the Spark side uses."""
    from .urls import PAGERANK_DAMPING, PAGERANK_SCALE

    num, den = PAGERANK_DAMPING
    return f"""
        , pr_d{i} AS (
            SELECT coalesce(sum(r), 0) AS dm FROM pr_r{i - 1}
            WHERE dom NOT IN (SELECT sdom FROM pr_outw)
        ), pr_r{i} AS (
            SELECT p.dom,
                   ({den - num}::BIGINT * {PAGERANK_SCALE})
                       // ({den} * pn.n)
                   + ({num}::BIGINT * d.dm) // ({den} * pn.n)
                   + coalesce(c.s, 0) AS r
            FROM pr_nodes p CROSS JOIN pr_n pn CROSS JOIN pr_d{i} d
            LEFT JOIN (
                SELECT e.ddom AS dom,
                       sum(({num} * r.r * e.w) // ({den} * o.ow)) AS s
                FROM pr_edges e
                JOIN pr_r{i - 1} r ON r.dom = e.sdom
                JOIN pr_outw o ON o.sdom = e.sdom
                GROUP BY e.ddom
            ) c ON c.dom = p.dom
        )"""


ORACLES = {
    # the bloom leg is a requirement-stating row (the recall-gate
    # pattern): DuckDB cannot recompute seeded-xxhash64 probes, so the
    # oracle states the invariants hold and a Spark-side regression
    # flips the value
    "text_decontaminate": f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), twin AS (
            SELECT doc_id,
                   unnest({word_windows_sql()})
                       AS win
            FROM w
        )
        SELECT * FROM (
            SELECT 'exact' AS leg, t.doc_id,
                   count(*) AS n_contaminated_windows
            FROM twin t
            WHERE t.win IN (SELECT win FROM twin
                            WHERE doc_id % {EVAL_MOD} = 0)
            GROUP BY t.doc_id
            UNION ALL
            SELECT 'bloom', CAST(-1 AS BIGINT), CAST(1 AS BIGINT)
            UNION ALL
            -- eval-side overlap report: per eval doc, its DISTINCT
            -- windows found anywhere in the non-eval training half
            SELECT 'overlap', d.doc_id,
                   coalesce(x.cnt, 0)
            FROM (SELECT doc_id FROM documents
                  WHERE doc_id % {EVAL_MOD} = 0) d
            LEFT JOIN (
                SELECT doc_id, count(*) AS cnt FROM (
                    SELECT DISTINCT doc_id, win FROM twin
                    WHERE doc_id % {EVAL_MOD} = 0
                )
                WHERE win IN (SELECT win FROM twin
                              WHERE doc_id % {EVAL_MOD} <> 0)
                GROUP BY doc_id
            ) x USING (doc_id)
        ) ORDER BY leg, doc_id
    """,
    "text_dedup_passage_removal": f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), wins AS (
            SELECT doc_id,
                   unnest(range(0, greatest(len(ws) - {WINDOW_N - 1}, 0)))
                       AS pos,
                   unnest({word_windows_sql()})
                       AS win
            FROM w
        ), ranked AS (
            SELECT doc_id, pos,
                   count(*) OVER (PARTITION BY win) AS cnt,
                   row_number() OVER (PARTITION BY win
                       ORDER BY doc_id, pos) AS rn
            FROM wins
        ), rm AS (
            SELECT DISTINCT doc_id,
                   unnest(range(pos, pos + {WINDOW_N})) AS idx
            FROM ranked WHERE cnt >= 2 AND rn > 1
        ), words AS (
            SELECT doc_id, unnest(range(0, len(ws))) AS idx,
                   unnest(ws) AS word
            FROM w
        ), kept AS (
            SELECT words.doc_id, words.idx, words.word FROM words
            WHERE NOT EXISTS (SELECT 1 FROM rm
                              WHERE rm.doc_id = words.doc_id
                                AND rm.idx = words.idx)
        ), cleaned AS (
            SELECT doc_id, count(*) AS n_kept,
                   md5(string_agg(word, ' ' ORDER BY idx)) AS cleaned_md5
            FROM kept GROUP BY doc_id
        ), span_g AS (
            -- gaps-and-islands: consecutive removed idx runs share
            -- (idx - rank), i.e. the MERGED excision spans
            SELECT doc_id,
                   idx - row_number() OVER (PARTITION BY doc_id
                       ORDER BY idx) AS grp
            FROM rm
        ), spans AS (
            SELECT doc_id, count(*) AS span_len
            FROM span_g GROUP BY doc_id, grp
        ), sp AS (
            SELECT doc_id, count(*) AS n_spans,
                   max(span_len) AS max_span_len
            FROM spans GROUP BY doc_id
        )
        -- lines leg: re-line every doc EXACTLY as _lined_docs does
        -- (2-line header, {LINE_CHUNK_WORDS}-word body chunks,
        -- digit-varying promo footer), then remove lines whose
        -- normalized key (trim/lower/digit-collapse) appears in >=
        -- {BOILER_MIN_DOCS} distinct docs -- from ALL docs, no keeper
        , lb AS (
            SELECT doc_id,
                   unnest(range(0, (len(ws) + {LINE_CHUNK_WORDS - 1})
                                   // {LINE_CHUNK_WORDS})) AS ci,
                   ws
            FROM w
        ), lraw AS (
            SELECT doc_id, 0 AS ln, '{NAV_LINE}' AS line FROM w
            UNION ALL
            SELECT doc_id, 1, '{TAG_LINE}' FROM w
            UNION ALL
            SELECT doc_id, ci + 2,
                   array_to_string(
                       ws[ci * {LINE_CHUNK_WORDS} + 1 :
                          ci * {LINE_CHUNK_WORDS} + {LINE_CHUNK_WORDS}],
                       ' ')
            FROM lb
            UNION ALL
            SELECT doc_id,
                   (len(ws) + {LINE_CHUNK_WORDS - 1})
                       // {LINE_CHUNK_WORDS} + 2,
                   '{PROMO_PREFIX}' || (doc_id % 7)::VARCHAR
            FROM w
        ), lkey AS (
            SELECT doc_id, ln, line,
                   CASE WHEN trim(line) <> '' THEN
                       regexp_replace(lower(trim(line)),
                                      '{LINE_NORM_RE}', '0', 'g')
                   END AS k
            FROM lraw
        ), lboiler AS (
            SELECT k FROM (SELECT DISTINCT doc_id, k FROM lkey
                           WHERE k IS NOT NULL)
            GROUP BY k HAVING count(*) >= {BOILER_MIN_DOCS}
        ), lrm AS (
            SELECT doc_id, ln FROM lkey
            WHERE k IN (SELECT k FROM lboiler)
        ), lkept AS (
            SELECT doc_id, ln, line FROM lkey
            WHERE NOT EXISTS (SELECT 1 FROM lrm
                              WHERE lrm.doc_id = lkey.doc_id
                                AND lrm.ln = lkey.ln)
        ), lclean AS (
            SELECT doc_id, count(*) AS n_kept,
                   md5(string_agg(line, chr(10) ORDER BY ln))
                       AS cleaned_md5
            FROM lkept GROUP BY doc_id
        ), lspan_g AS (
            SELECT doc_id,
                   ln - row_number() OVER (PARTITION BY doc_id
                       ORDER BY ln) AS grp
            FROM lrm
        ), lspans AS (
            SELECT doc_id, count(*) AS span_len
            FROM lspan_g GROUP BY doc_id, grp
        ), lsp AS (
            SELECT doc_id, count(*) AS n_spans,
                   max(span_len) AS max_span_len
            FROM lspans GROUP BY doc_id
        ), ltot AS (
            SELECT doc_id, count(*) AS n_lines FROM lraw GROUP BY doc_id
        )
        SELECT * FROM (
            SELECT 'passage' AS leg, w.doc_id,
                   CAST(len(w.ws) AS INT) AS n_words,
                   CAST(len(w.ws) - coalesce(c.n_kept, 0) AS INT)
                       AS n_removed,
                   CAST(coalesce(sp.n_spans, 0) AS INT) AS n_spans,
                   CAST(coalesce(sp.max_span_len, 0) AS INT)
                       AS max_span_len,
                   coalesce(round((len(w.ws) - coalesce(c.n_kept, 0)) * 1.0
                                  / sp.n_spans, 4), 0.0) AS mean_span_len,
                   coalesce(c.cleaned_md5, md5('')) AS cleaned_md5
            FROM w LEFT JOIN cleaned c ON w.doc_id = c.doc_id
                 LEFT JOIN sp ON w.doc_id = sp.doc_id
            UNION ALL
            SELECT 'lines', t.doc_id,
                   CAST(t.n_lines AS INT),
                   CAST(t.n_lines - coalesce(lc.n_kept, 0) AS INT),
                   CAST(coalesce(lsp.n_spans, 0) AS INT),
                   CAST(coalesce(lsp.max_span_len, 0) AS INT),
                   coalesce(round((t.n_lines - coalesce(lc.n_kept, 0))
                                  * 1.0 / lsp.n_spans, 4), 0.0),
                   coalesce(lc.cleaned_md5, md5(''))
            FROM ltot t LEFT JOIN lclean lc ON t.doc_id = lc.doc_id
                 LEFT JOIN lsp ON t.doc_id = lsp.doc_id
        ) ORDER BY leg, doc_id
    """,
    # both legs are generated from the SAME constants the Spark query
    # uses (SAMPLE_PCT; MIXTURE_WEIGHTS quantized at MIXTURE_DENOM, the
    # exact thresholds sample_mixture compiles into its CASE)
    "sample_stratified_deterministic": f"""
        WITH strat AS (
            SELECT lang, doc_id FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                  % 100 < {SAMPLE_PCT}
        ), mix AS (
            SELECT lang, doc_id FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                  % {MIXTURE_DENOM} <
                  CASE lang {' '.join(
                      f"WHEN '{s}' THEN {int(round(w * MIXTURE_DENOM))}"
                      for s, w in MIXTURE_WEIGHTS.items())}
                  ELSE 0 END
        ), dtoks AS (
            SELECT doc_id, lang, doc_id % {DSIR_TARGET_MOD} = 0 AS is_t,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), db AS (
            SELECT doc_id, lang, is_t,
                   ('0x' || substr(md5(tok), 1, 15))::BIGINT
                       % {DSIR_BUCKETS} AS bkt
            FROM dtoks WHERE tok <> ''
        ), dstats AS (
            SELECT bkt, count(*) FILTER (is_t) AS ct,
                   count(*) FILTER (NOT is_t) AS cr
            FROM db GROUP BY bkt
        ), dtot AS (
            SELECT sum(ct) AS tt, sum(cr) AS tr FROM dstats
        ), dlean AS (
            SELECT bkt, (ct::HUGEINT * tr::HUGEINT
                         > cr::HUGEINT * tt::HUGEINT) AS lean
            FROM dstats, dtot
        ), dscore AS (
            SELECT doc_id, lang,
                   sum(CASE WHEN lean THEN 1 ELSE -1 END) AS score
            FROM db JOIN dlean USING (bkt) WHERE NOT is_t
            GROUP BY doc_id, lang
        ), dtop AS (
            SELECT lang, doc_id FROM dscore
            ORDER BY score DESC, doc_id LIMIT {DSIR_TOP_K}
        ), lkedges AS (
            -- links leg: the synthetic html is pure doc_id arithmetic,
            -- so the edge list IS this union (two real links per doc;
            -- the four traps contribute nothing by construction)
            SELECT doc_id,
                   'd' || ((doc_id + 1) % 17)::VARCHAR || '.example'
                       AS dom
            FROM documents
            UNION ALL
            SELECT doc_id,
                   'd' || ((doc_id + 7) % 17)::VARCHAR || '.example'
            FROM documents
        ), pk AS (
            -- pack leg: tape order = (md5 bucket, 60-bit md5 hash,
            -- doc_id), PY_WS_CLASS token counts -- the operator's
            -- two-phase cumsum collapses to ONE global window here
            SELECT doc_id,
                   len(list_filter(
                       string_split_regex(text, '{PY_WS_CLASS}+'),
                       x -> x <> '')) AS tk,
                   ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                       AS h
            FROM documents
        ), pc AS (
            SELECT doc_id, tk,
                   coalesce(sum(tk) OVER (
                       ORDER BY h % {N_BUDGET_BUCKETS}, h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS st
            FROM pk
        ), pbins AS (
            SELECT doc_id,
                   unnest(generate_series(
                       (st // {PACK_SEQ_LEN})::BIGINT,
                       (CASE WHEN tk > 0
                             THEN (st + tk - 1) // {PACK_SEQ_LEN}
                             ELSE st // {PACK_SEQ_LEN} END)::BIGINT))
                       AS bin
            FROM pc
        ), ccn AS (
            -- ccnet leg: exact per-language thirds by whitespace token
            -- count, ntile tie-broken by doc_id (both engines implement
            -- standard NTILE: earlier groups take the remainder)
            SELECT lang, doc_id,
                   ['head', 'middle', 'tail'][ntile(3) OVER (
                       PARTITION BY lang
                       ORDER BY len(string_split(text, ' ')), doc_id)]
                       AS bucket
            FROM documents
        ), pr_e AS (
            -- pagerank leg: page-level domain edges from the same
            -- doc_id arithmetic as lkedges; the same-host nav trap is
            -- ABSENT here because domain_pagerank must drop self-loops
            SELECT 's' || (doc_id % 5)::VARCHAR || '.example' AS sdom,
                   'd' || ((doc_id + 1) % 17)::VARCHAR || '.example'
                       AS ddom
            FROM documents
            UNION ALL
            SELECT 's' || (doc_id % 5)::VARCHAR || '.example',
                   'd' || ((doc_id + 7) % 17)::VARCHAR || '.example'
            FROM documents
        ), pr_edges AS (
            SELECT sdom, ddom, count(*) AS w FROM pr_e GROUP BY sdom, ddom
        ), pr_nodes AS (
            SELECT sdom AS dom FROM pr_edges
            UNION
            SELECT ddom FROM pr_edges
        ), pr_n AS (
            SELECT count(*) AS n FROM pr_nodes
        ), pr_outw AS (
            SELECT sdom, sum(w) AS ow FROM pr_edges GROUP BY sdom
        ), pr_r0 AS (
            SELECT dom, {PAGERANK_SCALE} // n AS r
            FROM pr_nodes CROSS JOIN pr_n
        ){_pagerank_iter_sql(1)}{_pagerank_iter_sql(2)}{_pagerank_iter_sql(3)}
        SELECT * FROM (
            SELECT 'strat' AS leg, lang, count(*) AS n_kept,
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
                       AS kept_ids
            FROM strat GROUP BY lang
            UNION ALL
            SELECT 'mix', lang, count(*),
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
            FROM mix GROUP BY lang
            UNION ALL
            SELECT 'dsir', lang, count(*),
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
            FROM dtop GROUP BY lang
            UNION ALL
            SELECT 'links', dom, count(*),
                   count(DISTINCT doc_id % 5)::VARCHAR || '|' ||
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
            FROM lkedges GROUP BY dom
            UNION ALL
            SELECT 'pack', 'bin:' || lpad(bin::VARCHAR, 8, '0'),
                   count(*),
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
            FROM pbins GROUP BY bin
            UNION ALL
            SELECT 'ccnet', lang || '/' || bucket, count(*),
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
            FROM ccn GROUP BY lang, bucket
            UNION ALL
            -- HUGEINT (sum-promoted) must come back to BIGINT or the
            -- whole union's n_kept turns float in pandas
            SELECT 'pagerank', r3.dom, CAST(r3.r AS BIGINT),
                   'r2:' || r2.r::VARCHAR
            FROM pr_r3 r3 JOIN pr_r2 r2 ON r2.dom = r3.dom
        ) ORDER BY leg, lang
    """,
    "text_dup_passages": f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), windows AS (
            SELECT doc_id,
                   unnest({word_windows_sql()})
                       AS passage
            FROM w
        )
        SELECT md5(passage) AS passage_md5,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_occurrences,
               min(doc_id) AS first_doc
        FROM windows GROUP BY passage HAVING count(DISTINCT doc_id) >= 2
        ORDER BY passage_md5
    """,
    "text_tfidf_top": """
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ), w AS (
            SELECT doc_id, word FROM words WHERE word != ''
        ), tf AS (
            SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2
        ), df AS (
            SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY 1
        ), n AS (
            SELECT count(*) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.word,
                   tf.tf * ln(n.n_docs * 1.0 / df.df) AS raw_score
            FROM tf JOIN df USING (word), n
            WHERE tf.doc_id < 100
        ), ranked AS (
            SELECT doc_id, word, raw_score,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY round(raw_score, 6) DESC, word ASC) AS rnk
            FROM scored
        )
        SELECT doc_id, rnk, word, round(raw_score, 4) AS tfidf
        FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk
    """,
    "text_doc_features": rf"""
        WITH base AS (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_words,
                   ' ' || lower(text) || ' ' AS low,
                   list_filter(string_split(text, chr(10)),
                       l -> len(string_split(trim(l), ' ')) >= 5
                            AND right(trim(l), 1) IN ('.', '!', '?', '"'))
                       AS kept
            FROM documents
        ), v AS (
            SELECT doc_id, text, n_words, kept,
                   (CASE WHEN contains(low, ' the ') THEN 1 ELSE 0 END +
                    CASE WHEN contains(low, ' and ') THEN 1 ELSE 0 END +
                    CASE WHEN contains(low, ' with ') THEN 1 ELSE 0 END +
                    CASE WHEN contains(low, ' that ') THEN 1 ELSE 0 END)
                       AS en_hits,
                   (CASE WHEN contains(low, ' el ') THEN 1 ELSE 0 END +
                    CASE WHEN contains(low, ' la ') THEN 1 ELSE 0 END +
                    CASE WHEN contains(low, ' los ') THEN 1 ELSE 0 END +
                    CASE WHEN contains(low, ' que ') THEN 1 ELSE 0 END)
                       AS es_hits,
                   (CASE WHEN contains(low, ' der ') THEN 1 ELSE 0 END +
                    CASE WHEN contains(low, ' die ') THEN 1 ELSE 0 END +
                    CASE WHEN contains(low, ' und ') THEN 1 ELSE 0 END +
                    CASE WHEN contains(low, ' das ') THEN 1 ELSE 0 END)
                       AS de_hits
            FROM base)
        SELECT doc_id,
               n_words,
               round((length(text) - n_words + 1) * 1.0 / n_words, 4)
                   AS mean_word_len,
               (n_words BETWEEN 50 AND 100000)
                   AND contains(text, ' the ') AS keep_simple,
               len(regexp_extract_all(text,
                   '{_BPE_RE}')) AS n_bpe_tokens,
               en_hits, es_hits, de_hits,
               CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
                    WHEN es_hits >= de_hits THEN 'es'
                    ELSE 'de' END AS lang_vote,
               CAST(len(kept) AS INT) AS n_kept_lines,
               CAST(coalesce(length(array_to_string(kept, chr(10))), 0)
                    AS INT) AS cleaned_len,
               md5(lower(text)) AS fingerprint,
               CAST({CLF_SCORE_SQL} AS BIGINT) AS clf_score
        FROM v ORDER BY doc_id
    """,
    "text_token_stats": f"""
        SELECT lang, count(*) AS n_docs,
               round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
               round(avg(n_chars), 4) AS avg_chars,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS total_tokens,
               count(DISTINCT md5(lower(text))) AS n_unique_docs,
               round(avg({CLF_SCORE_SQL}), 4) AS avg_clf_score
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "text_ngram_top": """
        WITH toks AS (
            SELECT lang, string_split(text, ' ') AS w FROM documents
        ), grams AS (
            SELECT lang, unnest([w[i] || ' ' || w[i+1]
                                 for i in range(1, len(w))]) AS bigram
            FROM toks
        ), counts AS (
            SELECT lang, bigram, count(*) AS n FROM grams GROUP BY 1, 2
        )
        SELECT lang, rnk, bigram, n FROM (
            SELECT lang, bigram, n,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY n DESC, bigram ASC) AS rnk
            FROM counts) WHERE rnk <= 5 ORDER BY lang, rnk
    """,
}



def sample_to_token_budget(
    docs, budget_tokens: int, key_col: str = "doc_id",
    text_col: str = "text", n_buckets: int = N_BUDGET_BUCKETS,
):
    """Deterministically select a subset whose total whitespace-token
    count is as close to ``budget_tokens`` as bucket granularity allows
    -- the "give me a 100B-token slice of this corpus" training staple.

    Selection order is the md5-hash order of the key (the same pure-
    function-of-the-key rule every sampler here uses): each doc lands in
    one of ``n_buckets`` hash buckets; ONE map-side-combined aggregation
    yields per-bucket token sums (``n_buckets`` rows -- driver-safe);
    the cumulative sum over bucket ids picks the smallest prefix of
    buckets reaching the budget, and docs in those buckets are kept.
    Reproducible across runs/retries/resumes, two jobs total (the
    bucket-sum pass + the consumer's), no global sort, no window over
    the corpus.  Quantization: the kept total overshoots the budget by
    LESS THAN the cutoff bucket's tokens (~corpus/n_buckets); raise
    ``n_buckets`` for tighter tracking (the sums frame stays tiny).

    NULL keys bucket deterministically (md5_bucket sentinel) and NULL
    texts count 0 tokens, so both stay in the accounting instead of
    silently corrupting it.

    Tokens are counted with the ``PY_WS_CLASS`` whitespace class -- the
    kernel's ``text.split()`` convention (full Unicode whitespace), NOT
    Java's ASCII-leaning ``\\s`` -- so the budget's token totals agree
    with ``n_words`` on corpora containing NBSP / ideographic space /
    U+2028 (ADVICE r5: the budget previously split on ``\\s+`` and
    diverged from ``n_words`` on exactly those).

    Returns ``(kept_docs, kept_token_total)``."""
    toks = F.coalesce(
        F.size(
            F.filter(
                F.split(F.col(text_col), PY_WS_CLASS + "+"),
                lambda w: w != "",
            )
        ),
        F.lit(0),
    )
    with_b = docs.withColumn("__b", md5_bucket(key_col, n_buckets))
    sums = (
        with_b.groupBy("__b")
        .agg(F.sum(toks).alias("t"))
        .orderBy("__b")
        .collect()  # <= n_buckets tiny rows
    )
    total = 0
    cutoff = -1  # empty selection if even bucket 0 overshoots a 0 budget
    for r in sums:
        if total >= budget_tokens:
            break
        total += r.t
        cutoff = r["__b"]
    kept = with_b.filter(F.col("__b") <= cutoff).drop("__b")
    return kept, total


def pack_sequences(
    docs, seq_len: int, key_col: str = "doc_id",
    text_col: str = "text", n_buckets: int = N_BUDGET_BUCKETS,
):
    """Concat-and-chunk SEQUENCE PACKING: lay every document out on one
    global token tape in a deterministic order and chunk the tape into
    fixed ``seq_len`` training windows -- the standard LLM pretraining
    step (GPT-style packing: concatenate, then split into context-length
    blocks).  Each doc gets its absolute ``start_token`` offset and the
    inclusive ``first_bin``/``last_bin`` window ids it occupies, which
    is everything a writer needs to emit shard files per bin.

    Order is the repo's one reproducible rule -- a pure function of the
    key (md5 bucket, then 60-bit md5 hash, then the key itself), so
    retries/resumes/replans produce the identical tape.  PRECONDITION:
    keys are unique and non-null (doc ids / urls after dedup -- every
    caller here).  Duplicate keys (or >= 2 NULL keys, which share the
    sentinel) tie on the whole sort key, making their relative tape
    order shuffle-dependent; dedup first.  Scale shape
    (the same two-phase cumulative sum as ``sample_to_token_budget``,
    generalized from a cutoff to per-row offsets): ONE map-side-combined
    aggregation yields per-bucket token sums (<= ``n_buckets`` tiny rows
    driver-side), cumulative bucket offsets broadcast back, and the
    intra-bucket running sum is a window over each hash bucket --
    bounded partitions (~corpus/n_buckets docs), NO global sort, no
    window over the whole corpus.  Raise ``n_buckets`` to shrink window
    partitions at trillion-doc scale; the sums frame stays tiny.

    Token counts use ``PY_WS_CLASS`` (the kernel's ``str.split()``
    dialect, == ``n_words``).  Zero-token docs occupy no tape but stay
    addressable: ``first_bin == last_bin`` = the bin their offset falls
    in (callers packing real shards filter them first).  Offsets are
    BIGINT-exact; bin division is integer ``div`` (no float in the
    path), good to 2^63 tokens.

    Returns ``docs`` plus ``n_tokens``, ``start_token``, ``first_bin``,
    ``last_bin``."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    from pyspark.sql import Window

    toks = F.coalesce(
        F.size(
            F.filter(
                F.split(F.col(text_col), PY_WS_CLASS + "+"),
                lambda w: w != "",
            )
        ),
        F.lit(0),
    ).cast("long")
    key_s = F.coalesce(F.col(key_col).cast("string"), F.lit("__null__"))
    base = (
        docs.withColumn("__t", toks)
        .withColumn("__h", md5_hash60(key_s))
        .withColumn("__b", F.pmod(F.col("__h"), F.lit(n_buckets)))
    )
    sums = (
        base.groupBy("__b")
        .agg(F.sum("__t").alias("t"))
        .orderBy("__b")
        .collect()  # <= n_buckets tiny rows
    )
    spark = docs.sparkSession
    acc = 0
    offs = []
    for r in sums:
        offs.append((r["__b"], acc))
        acc += r["t"]
    off_df = spark.createDataFrame(offs, "__b long, __off long")
    w = (
        Window.partitionBy("__b")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spanned = (
        base.join(F.broadcast(off_df), "__b")
        .withColumn(
            "__start",
            F.col("__off") + F.coalesce(F.sum("__t").over(w), F.lit(0)),
        )
        .withColumn("n_tokens", F.col("__t"))
        .withColumn("start_token", F.col("__start"))
        .withColumn("first_bin", F.expr(f"__start div {int(seq_len)}"))
        .withColumn(
            "last_bin",
            F.when(
                F.col("__t") > 0,
                F.expr(f"(__start + __t - 1) div {int(seq_len)}"),
            ).otherwise(F.expr(f"__start div {int(seq_len)}")),
        )
    )
    return spanned.drop("__t", "__h", "__b", "__off", "__start")


def assemble_packed_windows(
    packed, seq_len: int, key_col: str = "doc_id", text_col: str = "text",
):
    """Materialize the training windows ``pack_sequences`` laid out:
    one row per window (``bin``) carrying its EXACT ``seq_len``-token
    text -- the shard-writer side of packing (``df.write.parquet`` on
    the result, partitioned or bucketed by ``bin div windows_per_shard``,
    IS the pretraining-shard job).  Input is ``pack_sequences`` output
    (needs ``start_token``/``first_bin``/``last_bin``/``n_tokens``).

    Every window except the tape's last has exactly ``seq_len`` tokens;
    a bin-spanning doc contributes the precise token slice falling in
    each window it touches.  Tokens are re-joined with single spaces:
    the packing unit is the PY_WS_CLASS token, so original whitespace
    flavor is normalized -- the same contract a tokenizer-side packer
    has (token ids carry no whitespace either).

    Scale shape: the doc->window explode is bounded (a doc touches
    ~n_tokens/seq_len + 1 windows), the per-window regroup shuffles on
    ``bin`` with <= ``seq_len`` tokens per group, and window assembly
    is a JVM fold (sort_array over (start, piece) structs -- starts are
    unique within a window because the tape is gapless), no Python in
    the path.  Returns ``(bin, n_tokens, text)``."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    L = int(seq_len)
    words = F.filter(
        F.split(F.col(text_col), PY_WS_CLASS + "+"), lambda w: w != ""
    )
    # grid-consistency guard: ``seq_len`` must be the SAME value the
    # pack ran with -- a smaller one would silently DROP tokens (a doc
    # whose last_bin was computed on a coarser grid stops contributing
    # at its stale last_bin).  The packed frame fully determines its
    # grid, so re-derive last_bin on THIS grid and raise per-row on
    # mismatch (pure column arithmetic; no extra scan).
    grid_ok = (
        F.expr(f"(start_token + n_tokens - 1) div {L}")
        == F.col("last_bin")
    ) & (F.expr(f"start_token div {L}") == F.col("first_bin"))
    checked_last = F.when(grid_ok, F.col("last_bin")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "assemble_packed_windows: seq_len="
                    f"{L} does not match the grid this frame was"
                    " packed with (doc start_token="
                ),
                F.col("start_token").cast("string"),
                F.lit(", n_tokens="),
                F.col("n_tokens").cast("string"),
                F.lit(")"),
            )
        ).cast("long")
    )
    spans = (
        packed.filter(F.col("n_tokens") > 0)
        .select(
            F.col("start_token"),
            F.col("n_tokens"),
            words.alias("__ws"),
            F.explode(
                F.sequence("first_bin", checked_last)
            ).alias("bin"),
        )
        # doc-local slice boundaries of the piece landing in this bin
        .withColumn(
            "__lo",
            F.greatest(
                F.col("bin") * L - F.col("start_token"), F.lit(0)
            ),
        )
        .withColumn(
            "__hi",
            F.least(
                F.col("n_tokens"),
                (F.col("bin") + 1) * L - F.col("start_token"),
            ),
        )
    )
    piece = F.slice(
        F.col("__ws"),
        (F.col("__lo") + 1).cast("int"),
        (F.col("__hi") - F.col("__lo")).cast("int"),
    )
    return (
        spans.select(
            "bin",
            F.struct(
                F.col("start_token").alias("s"), piece.alias("p")
            ).alias("__sp"),
            (F.col("__hi") - F.col("__lo")).alias("__n"),
        )
        .groupBy("bin")
        .agg(
            F.sum("__n").alias("n_tokens"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.sort_array(F.collect_list("__sp")),
                        lambda s: s["p"],
                    )
                ),
                " ",
            ).alias("text"),
        )
        .select("bin", F.col("n_tokens").cast("long").alias("n_tokens"),
                "text")
    )


def sample_mixture(
    docs, weights: dict, source_col: str = "source",
    key_col: str = "doc_id",
):
    """Per-source mixture sampling: keep each source at its own
    deterministic rate (``weights``: source -> keep fraction in [0, 1],
    validated; quantized to 1e-6), the data-mixing step that
    up/down-weights sources in a training mix.  Sources absent from
    ``weights`` are DROPPED (explicit mixes only).  The keep decision
    is the same md5-bucket pure function of the key as the stratified
    sampler -- reproducible everywhere; one scan, no shuffle (the
    weight map compiles to a CASE expression in the scan projection)."""
    for src, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(
                f"weight for {src!r} is {w}: keep fractions live in"
                " [0, 1]"
            )
    thresh = None
    for src, w in weights.items():
        lit = F.lit(int(round(w * MIXTURE_DENOM)))
        cond = F.col(source_col) == src
        thresh = (
            F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
        )
    thresh = (
        thresh.otherwise(F.lit(0)) if thresh is not None else F.lit(0)
    )
    return docs.filter(md5_bucket(key_col, MIXTURE_DENOM) < thresh)
