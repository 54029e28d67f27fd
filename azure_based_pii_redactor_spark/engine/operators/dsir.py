"""DSIR-style data selection via hashed n-gram importance weights.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) picks pretraining documents that look like a small
high-quality TARGET corpus: estimate target and raw unigram
distributions over HASHED token buckets (so the feature space is fixed
at ``n_buckets`` regardless of vocabulary size), weight every raw doc
by its log importance ratio, and resample by weight.  This module is
the from-scratch Spark shape of that recipe -- the reference app has no
counterpart (it is a per-file desktop redactor); this is part of the
beyond-reference LLM-training-data surface, same tier as
decontamination and minhash dedup.

Two forms, one bucket statistic:

- :func:`dsir_lean_score` -- the INTEGER-EXACT variant the driver
  oracle checks: a bucket is *target-leaning* iff its target share
  strictly exceeds its raw share (``ct * total_raw > cr * total_target``
  -- exact integer arithmetic, cross-multiplied in decimal so the
  product cannot overflow int64 at web scale, no floats, so DuckDB
  recomputes every score bit-for-bit via HUGEINT), and a doc scores ``+1`` per target-leaning token,
  ``-1`` otherwise.  Selection is top-k by ``(score DESC, id ASC)``.
- :func:`dsir_importance_weights` + :func:`dsir_resample` -- the
  paper-faithful float variant: per-doc log importance weight
  ``sum_t log p_target(b(t)) - log p_raw(b(t))`` with add-``alpha``
  smoothing, resampled WITHOUT replacement via Gumbel-top-k where the
  Gumbel noise derives from an md5 hash of ``(id, seed)`` -- a pure
  function of the row key, so retries/resumes re-draw the SAME sample
  (``rand()`` would not survive task retry).  Floats cannot be hashed
  cross-engine, so this form is pytest-pinned (determinism, ranking
  sanity) rather than oracle-checked; the lean score is its
  sign-quantized twin over the same buckets.

Scale shape (the part that must survive 10^12 docs):

- bucket statistics are ONE token-level hash aggregation whose output
  is bounded by ``n_buckets`` (256 here, ~10^5-10^6 in production) --
  never by corpus size -- and flow back through a BROADCAST join;
- per-doc scoring is ONE doc-level aggregation (the only corpus-sized
  shuffle, same cardinality as any per-doc rollup);
- top-k compiles to TakeOrderedAndProject (per-partition heaps + a
  k-row driver merge).  At 10^12 docs selection should switch from a
  global top-k to a score THRESHOLD -- :func:`dsir_select_threshold`
  (percentile sketch + plain filter, two tiny passes) -- and the
  scores frame returned here feeds either.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DSIR_TARGET_MOD = 23  # deterministic stand-in target corpus: every
# 23rd document plays the high-quality target set in the driver leg
# (the EVAL_MOD pattern from decontamination; a different modulus so
# the two stand-in subsets are not the same docs)
DSIR_BUCKETS = 256  # hashed-unigram feature buckets in the driver leg
DSIR_TOP_K = 10  # docs the driver leg selects


def _bucket(col, n_buckets: int):
    """Hashed token bucket 0..n_buckets-1, md5-derived for cross-engine
    exactness (DuckDB: ``('0x'||substr(md5(tok),1,15))::BIGINT % n``).
    At 10^12 tokens swap for ``pmod(xxhash64(tok), n)`` -- same plan,
    faster hash, losing only the DuckDB oracle."""
    from .textstats import md5_hash60

    return F.pmod(md5_hash60(col), F.lit(n_buckets))


def _tokens(docs, text_col: str, cols):
    """One exploded token row per word, plus the carried columns.
    Space tokenization (the corpus convention shared by the window
    ops); empties filtered on both engines."""
    return docs.select(
        *cols, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")


def dsir_bucket_stats(docs, is_target_col, n_buckets: int = DSIR_BUCKETS,
                      text_col: str = "text"):
    """Per-bucket token counts on each side: ``(bkt, ct, cr)`` with
    ``ct`` = target-token occurrences, ``cr`` = raw.  Output bounded by
    ``n_buckets`` rows -- the frame every downstream step broadcasts."""
    t = _tokens(docs, text_col, [F.col(is_target_col).alias("__t")])
    return (
        t.withColumn("bkt", _bucket(F.col("tok"), n_buckets))
        .groupBy("bkt")
        .agg(
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("ct"),
            F.sum(F.when(F.col("__t"), 0).otherwise(1)).alias("cr"),
        )
    )


def dsir_lean_score(docs, is_target_col, n_buckets: int = DSIR_BUCKETS,
                    text_col: str = "text", id_col: str = "doc_id",
                    keep_cols=()):
    """Integer-exact DSIR score per RAW doc (target docs are the
    reference distribution, never candidates).  A bucket is
    target-leaning iff ``ct * total_raw > cr * total_target`` --
    cross-multiplied shares, strict, exact decimal/HUGEINT -- and a
    doc scores
    ``sum(+1 if leaning else -1)`` over its tokens.  Returns
    ``(id, *keep_cols, score)``; feed :func:`dsir_select_topk` or a
    threshold filter."""
    stats = dsir_bucket_stats(docs, is_target_col, n_buckets, text_col)
    totals = stats.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    dec = "decimal(20,0)"  # count * total can reach ~10^12 * 10^15 at
    # web scale -- int64 would overflow SILENTLY (non-ANSI wraps).
    # Exactness ceiling, precisely scoped (ADVICE r6): ct/cr/tt/tr are
    # BIGINT sums, so each cast here is lossless by construction (a
    # bigint has <= 19 digits; decimal(20,0) can NOT return NULL for
    # it) and the product is at most (2^63)^2 ~= 8.5e37, inside the
    # decimal(38,0) Spark caps the multiply at -- no overflow-to-NULL
    # path exists while the inputs are int64.  The int64 sums are the
    # real ceiling: exact while either side's TOTAL token count stays
    # below 2^63 (~9.2e18; a 10^12-doc corpus at 10^4 tokens/doc is
    # 10^16, three orders inside).  DuckDB mirrors with HUGEINT
    # (exact 128-bit).
    lean = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "bkt",
            (F.col("ct").cast(dec) * F.col("tr").cast(dec)
             > F.col("cr").cast(dec) * F.col("tt").cast(dec))
            .alias("lean"),
        )
    )
    toks = _tokens(
        docs.filter(~F.col(is_target_col)),
        text_col,
        [F.col(id_col), *[F.col(c) for c in keep_cols]],
    ).withColumn("bkt", _bucket(F.col("tok"), n_buckets))
    return (
        toks.join(F.broadcast(lean), "bkt")
        .groupBy(id_col, *keep_cols)
        .agg(
            F.sum(F.when(F.col("lean"), 1).otherwise(-1))
            .cast("long")
            .alias("score")
        )
    )


def dsir_select_topk(scores, k: int = DSIR_TOP_K, id_col: str = "doc_id"):
    """Top-k docs by ``(score DESC, id ASC)`` -- deterministic total
    order, compiles to TakeOrderedAndProject (no global sort)."""
    return scores.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def dsir_select_threshold(scores, keep_frac: float, score_col: str = "score",
                          accuracy: int = 10000):
    """The 10^12-doc selection path the top-k docstring promises: a
    global top-k needs every partition's heap merged driver-side, but
    at web scale "the best 10%" is a THRESHOLD, not a rank.  Two tiny
    passes: (1) a mergeable ApproximatePercentile sketch (one
    map-side-combined aggregation to a single driver row) estimates
    the ``1 - keep_frac`` score quantile, (2) a plain
    ``Filter score >= cutoff`` in the scan projection keeps the top
    fraction -- no global sort, no rank window, no driver merge
    proportional to k.  Ties at the cutoff are ALL kept (dropping a
    tie would need a global order; over a +/-1-per-token integer
    score, boundary ties are the common case and over-keeping is the
    safe direction), so the kept fraction is >= keep_frac up to
    sketch error.  Exact boundary invariant either way: every kept
    doc scores >= every dropped doc."""
    row = scores.agg(
        F.percentile_approx(score_col, 1.0 - keep_frac, accuracy)
        .alias("c")
    ).collect()[0]  # 1-row driver fetch, sketch-sized -- never corpus-sized
    if row["c"] is None:  # empty scores frame
        return scores
    return scores.filter(F.col(score_col) >= F.lit(row["c"]))


def dsir_importance_weights(docs, is_target_col,
                            n_buckets: int = DSIR_BUCKETS,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            alpha="auto", keep_cols=()):
    """Paper-faithful per-doc log importance weight over RAW docs:
    ``log_w = sum_tokens [ln((ct+a)/(tt+a*B)) - ln((cr+a)/(tr+a*B))]``
    with add-``alpha`` smoothing (an unseen-in-target bucket downweights
    instead of sending the doc to -inf).  Float, so pytest-pinned, not
    oracle-hashed -- :func:`dsir_lean_score` is the integer-exact twin
    the driver checks over the same bucket statistics.

    ``alpha`` sizing matters when the target corpus is much smaller
    than the raw pool (always, in practice).  A FIXED ``alpha`` makes
    a bucket seen once in raw and never in target score
    ``ln([a/(1+a)] * [(tr+aB)/(tt+aB)])`` -- POSITIVE whenever
    ``a > ~tt/tr``, i.e. unseen garbage (random strings, gibberish)
    reads as *target-like* purely through smoothing mass, and at
    ``alpha=1`` gibberish documents outrank every real candidate
    (measured on the pages corpus: 'unk' docs fill 100% of the top-3%
    slice).  The default ``alpha='auto'`` scales the pseudo-count to
    the corpus-mass ratio ``tt/tr``, which makes never-seen buckets
    exactly NEUTRAL (the two smoothed probabilities coincide at
    ct=cr=0) and restores the paper's intent at any target size.  It
    stays pure column arithmetic over the 1-row totals broadcast --
    no extra pass, no driver collect."""
    stats = dsir_bucket_stats(docs, is_target_col, n_buckets, text_col)
    totals = stats.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    a = (
        F.col("tt").cast("double") / F.col("tr")
        if alpha == "auto"
        else F.lit(float(alpha))
    )
    lw = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "bkt",
            (
                F.log((F.col("ct") + a)
                      / (F.col("tt") + a * n_buckets))
                - F.log((F.col("cr") + a)
                        / (F.col("tr") + a * n_buckets))
            ).alias("lw"),
        )
    )
    toks = _tokens(
        docs.filter(~F.col(is_target_col)),
        text_col,
        [F.col(id_col), *[F.col(c) for c in keep_cols]],
    ).withColumn("bkt", _bucket(F.col("tok"), n_buckets))
    return (
        toks.join(F.broadcast(lw), "bkt")
        .groupBy(id_col, *keep_cols)
        .agg(F.sum("lw").alias("log_weight"))
    )


def dsir_resample(weights, k: int, seed: int = 0, id_col: str = "doc_id"):
    """Gumbel-top-k resampling WITHOUT replacement: take the k largest
    ``log_weight + Gumbel(0,1)`` keys, which samples k docs with
    probability proportional to their (unnormalized) importance weights
    (Vieira 2014 "Gumbel-max trick").  The uniform under each Gumbel
    draw is ``(md5_hash60(id || ':' || seed) + 0.5) / 2^60`` -- a pure
    function of the row key and seed, so retries, resumes, and re-runs
    draw the IDENTICAL sample; strictly inside (0, 1) so neither log
    can overflow.  TakeOrderedAndProject again -- no global sort."""
    from .textstats import md5_hash60

    u = (
        md5_hash60(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
        )
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    key = F.col("log_weight") + -F.log(-F.log(u))
    return (
        weights.withColumn("__gk", key)
        .orderBy(F.col("__gk").desc(), F.col(id_col))
        .limit(k)
        .drop("__gk")
    )
