"""SURVEY.md section 2 relational operators over the driver testdata,
each with a DuckDB oracle.

Every aggregate/computed column is aliased IDENTICALLY in the Spark plan
and the oracle SQL (driver compares sorted-by-name columns).  Floating
aggregates are rounded to 4 decimals on both sides; money sums go through
DECIMAL(18,2) so they are exact in both engines.

Scale notes are inline per operator: what shuffles, what broadcasts, what
would change at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Aggregations (SURVEY.md section 2.4)
# --------------------------------------------------------------------------

def agg_counts_by_type(spark, sf_dir):
    """A1 -- entity-counts-by-type shape (``file_processor.go:87-91``):
    one hash-agg, map-side partial combine, shuffle only the distinct
    keys (|event_type| tiny) -- scales to any row count."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("event_type")
    )


def agg_sum_coalesce(spark, sf_dir):
    """A2 -- COALESCE(SUM(..),0) over a filtered slice (``file.go:775-789``)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .agg(
            F.coalesce(
                F.round(F.sum("value"), 4), F.lit(0.0)
            ).alias("total_value"),
            F.count("*").alias("n_rows"),
        )
    )


def agg_analytics_rollup(spark, sf_dir):
    """A3 -- analytics rollup (``pii.go:291-334``): COUNT(*), SUM,
    success-rate = completed/total*100, filtered AVG -- plus the A2
    COALESCE(SUM(..),0)-over-a-filtered-slice shape (``file.go:775-789``,
    the standalone ``agg_sum_coalesce``) cross-joined in as two more
    columns: both are single-row global rollups, so one driver entry
    checks both without a second scan slot."""
    o = _t(spark, sf_dir, "orders")
    orders_roll = o.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .alias("sum_price"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            * 100.0
            / F.count("*"),
            4,
        ).alias("success_rate"),
        F.round(
            F.avg(F.when(F.col("o_totalprice") > 1000, F.col("o_totalprice"))),
            4,
        ).alias("avg_big_price"),
    )
    err_roll = agg_sum_coalesce(spark, sf_dir).select(
        F.col("total_value").alias("err_total_value"),
        F.col("n_rows").alias("n_err_rows"),
    )
    return orders_roll.crossJoin(err_roll)


def agg_session_rollup(spark, sf_dir):
    """A4 -- per-session viewer rollup (``file.go:1293-1310``), grouped by
    user: hash-agg on user_id; at 10^12 events user_id is high-cardinality
    so the shuffle is wide but balanced (no hot key by construction)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("user_id")
    )


def agg_weighted_average(spark, sf_dir):
    """A6 -- weighted signal average sum(v*w)/sum(w), 0.5 default on zero
    weight, clamped [0,1]-free here (``confidence_scoring.go:321-335``)."""
    li = _t(spark, sf_dir, "lineitem")
    w_sum = F.sum("l_discount")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.when(w_sum == 0, 0.5).otherwise(
                    F.sum(F.col("l_extendedprice") * F.col("l_discount")) / w_sum
                ),
                4,
            ).alias("weighted_avg_price"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


def agg_type_stats(spark, sf_dir):
    """A7 -- per-type TP/FP running stats (``confidence_scoring.go:353-388``):
    total, positives, accuracy=TP/total, average score."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("value") > 10, 1).otherwise(0)).alias("positives"),
            F.round(
                F.sum(F.when(F.col("value") > 10, 1).otherwise(0))
                / F.count("*"),
                4,
            ).alias("accuracy"),
            F.round(F.avg("value"), 4).alias("avg_score"),
        )
        .orderBy("event_type")
    )


def agg_tpch_q1(spark, sf_dir):
    """A9/batch-summary showcase -- TPC-H Q1 shape: 2-key hash agg with 6
    aggregates; whole-stage codegen end-to-end, partial agg before the
    shuffle means the exchange carries ~|flag x status| rows per task."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Joins (SURVEY.md section 2.3)
# --------------------------------------------------------------------------

def join_rows_history(spark, sf_dir):
    """J1 -- rows x history equi-join (``file.go:1293-1302``): orders joined
    to the small customer dim.  customer is BROADCAST (dim tables stay
    <100MB even at SF where lineitem is 100TB) -- no shuffle of the big
    side."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


def join_snowflake(spark, sf_dir):
    """J2-style multi-key chain: customer -> nation -> region, both dims
    broadcast; the probe side never shuffles."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .orderBy("r_name")
    )


def join_grouped_rollup(spark, sf_dir):
    """J3 -- entities-grouped-by-row hand-rolled hash join
    (``file.go:1446-1449``) as groupBy+collect_list; list sorted for
    determinism.  In the scrub pipeline entities never leave their row, so
    this shape only appears for export-style reshaping."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.concat_ws(",",
                        F.sort_array(F.collect_list("l_linenumber")))
             .alias("line_numbers"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )


def join_latest_per_key(spark, sf_dir):
    """J6/W6 -- correlated latest-row lookup (``pii.go:250-265``) as a rank
    window: partitionBy customer, newest order wins.  At scale: window
    shuffle on o_custkey; no skew (keys uniform); AQE splits stragglers."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Windows / sorts / limits (SURVEY.md section 2.5)
# --------------------------------------------------------------------------

def window_latest_feedback_wins(spark, sf_dir):
    """W5 -- latest-feedback-wins (``confidence_scoring.go:211-236``):
    newest row per (user_id, event_type) decides."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type",
                F.col("value").alias("latest_value"))
        .orderBy("user_id", "event_type")
    )


def window_pagination(spark, sf_dir):
    """W3 (reference-parity form) -- LIMIT/OFFSET pagination
    (``file.go:828-869``), made deterministic with a total order
    (ts, event_id).  Global sort+offset is inherently driver-anchored;
    the PRIMARY scale form is ``window_pagination_keyset`` below."""
    return (
        _t(spark, sf_dir, "events")
        .orderBy("ts", "event_id")
        .offset(50)
        .limit(100)
        .select("event_id", "ts", "value")
    )


def page_after(df, last_ts, last_id, page_size: int = 100):
    """Keyset pagination page: rows strictly after the (ts, event_id)
    cursor in the total order, first ``page_size`` of them.  The cursor
    arrives as LITERALS (the client echoes back the last row it saw), so
    the ts bound is a pushed-down parquet range predicate and the limit
    plans as TakeOrderedAndProject -- no global sort, no offset skip, no
    driver anchor.  This is W3's 10^12-row form."""
    return (
        df.filter(
            (F.col("ts") > F.lit(last_ts))
            | ((F.col("ts") == F.lit(last_ts))
               & (F.col("event_id") > F.lit(last_id)))
        )
        .orderBy("ts", "event_id")
        .limit(page_size)
    )


def window_pagination_keyset(spark, sf_dir):
    """W3 (primary form) -- keyset pagination: page 2 fetched via the
    cursor of page 1's last row.  The cursor fetch is a bounded 1-row
    collect (TakeOrderedAndProject), same class as the CSV sniff sample;
    production clients pass the cursor back themselves."""
    e = _t(spark, sf_dir, "events")
    cur_rows = (
        e.orderBy("ts", "event_id")
        .offset(49)
        .limit(1)
        .select("ts", "event_id")
        .collect()
    )
    if not cur_rows:  # table shorter than one page: nothing after it
        return e.filter(F.lit(False)).select("event_id", "ts", "value")
    cur = cur_rows[0]
    return (
        page_after(e, cur.ts, cur.event_id)
        .select("event_id", "ts", "value")
    )


def window_pagination_both(spark, sf_dir):
    """Merged W3 driver entry: the OFFSET parity form and the keyset
    primary-scale form fetch the SAME page (rows 51-150 of the total
    order) by construction, tagged by mode -- one oracle checks that both
    plans produce it.  The keyset leg keeps its pushed-down literal-
    cursor plan (plan-pinned in tests); the offset leg keeps reference
    LIMIT/OFFSET parity."""
    off = window_pagination(spark, sf_dir).select(
        F.lit("offset").alias("mode"), "event_id", "ts", "value"
    )
    key = window_pagination_keyset(spark, sf_dir).select(
        F.lit("keyset").alias("mode"), "event_id", "ts", "value"
    )
    return off.unionByName(key).orderBy("mode", "ts", "event_id")


def window_recent_first_limit(spark, sf_dir):
    """W2 -- ORDER BY ts DESC LIMIT 50 (``pii.go:192-219``): Spark plans
    this as TakeOrderedAndProject (per-partition top-k + driver merge),
    no full sort."""
    return (
        _t(spark, sf_dir, "events")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
        .select("event_id", "ts", "event_type")
    )


def window_topk_per_group(spark, sf_dir):
    """Top-3 events by value per type -- rank window with deterministic
    tiebreak (the reference has only global LIMIT; this is the per-group
    generalization every pipeline needs)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        e.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "rnk", "event_id", "value")
        .orderBy("event_type", "rnk")
    )


def window_topk(spark, sf_dir):
    """Merged driver entry for the two top-k shapes: the W2 global
    recent-50 (TakeOrderedAndProject -- per-partition top-k, no full
    sort; plan-pinned via ``window_recent_first_limit``) and the
    per-group rank-window top-3, schema-aligned and tagged by scope.
    The recent leg emits rnk 0 ("not ranked" -- NOT NULL, which pandas
    would alias to NaN and break value hashing): the driver compare is
    order-insensitive, and computing a global row_number would force
    the single-partition window this operator exists to avoid."""
    e = _t(spark, sf_dir, "events")
    recent = (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
        .select(
            F.lit("recent50").alias("scope"),
            "event_type",
            F.lit(0).cast("int").alias("rnk"),
            "event_id",
            "value",
        )
    )
    topk = window_topk_per_group(spark, sf_dir).select(
        F.lit("topk").alias("scope"), "event_type", "rnk", "event_id", "value"
    )
    return recent.unionByName(topk).orderBy(
        "scope", "event_type", "event_id"
    )


def window_time_bucket(spark, sf_dir):
    """Event-time windowed aggregation (streaming shape, batch semantics):
    1-hour tumbling buckets.  The streaming variant (readStream +
    watermark) runs in tests/test_streaming.py; the bucketing logic is
    identical."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("bucket", "event_type")
    )


# --------------------------------------------------------------------------
# Set ops (SURVEY.md section 2.6) & scalar functions (section 2.7)
# --------------------------------------------------------------------------

def set_union_distinct(spark, sf_dir):
    """unionByName + distinct (metrics-row assembly shape)."""
    e = _t(spark, sf_dir, "events")
    hot = e.filter(F.col("value") > 18).select("user_id")
    err = e.filter(F.col("event_type") == "error").select("user_id")
    return hot.unionByName(err).distinct().orderBy("user_id")


def set_intersect_except(spark, sf_dir):
    """INTERSECT / EXCEPT completeness: users who both purchased and
    errored, minus users who also signed up.  intersect plans as a
    distinct + left-semi join; subtract (EXCEPT-distinct -- the left
    side is already distinct here) plans as a left-anti join, avoiding
    ExceptAll's union+count rewrite."""
    e = _t(spark, sf_dir, "events")
    purchased = e.filter(F.col("event_type") == "purchase").select("user_id")
    errored = e.filter(F.col("event_type") == "error").select("user_id")
    signed = e.filter(F.col("event_type") == "signup").select("user_id")
    return (
        purchased.intersect(errored)
        .subtract(signed)
        .orderBy("user_id")
    )


def set_ops(spark, sf_dir):
    """Merged driver entry for section 2.6: the union-distinct and
    INTERSECT/EXCEPT shapes above, tagged by op so one oracle checks
    both plans (union-distinct and the semi/anti-join rewrites).

    r7 adds ``op='delta_*'`` legs: ``urls.crawl_delta`` between two
    SYNTHETIC crawl snapshots of the documents table (old = doc_id
    % 3 != 0, new = doc_id % 5 != 0 with every 7th doc's text
    mutated) -- added/gone/changed/unchanged per key, all pure
    doc_id arithmetic so DuckDB recomputes the full diff exactly.
    The Spark side compares md5-derived content hashes (the
    xxhash64-at-scale / md5-for-oracle split); the oracle compares
    the texts themselves -- identical verdicts unless the hash
    comparison is broken, which is exactly what the leg checks."""
    u = set_union_distinct(spark, sf_dir).select(
        F.lit("union").alias("op"), "user_id"
    )
    ie = set_intersect_except(spark, sf_dir).select(
        F.lit("int_exc").alias("op"), "user_id"
    )
    from .textstats import md5_hash60
    from .urls import crawl_delta

    d = _t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" r7"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    delta = crawl_delta(
        old, new, key_col="doc_id", content_cols=("text",),
        hash_fn=md5_hash60,
    ).select(
        F.concat(F.lit("delta_"), F.col("status")).alias("op"),
        F.col("doc_id").cast("long").alias("user_id"),
    )
    return (
        u.unionByName(ie).unionByName(delta).orderBy("op", "user_id")
    )


def agg_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT) per group -- Spark plans this as Expand + two-phase
    aggregate (distinct keys partially deduped map-side before the
    shuffle).  At 10^12 rows swap ``approx_count_distinct`` (HLL++,
    fixed-size sketch, mergeable -- no exact distinct shuffle); exact kept
    here because the oracle compares values."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


def agg_salted_skew(spark, sf_dir, n_salt: int = 16):
    """Skew-safe two-phase aggregation over a HOT key (event_type has
    only 5 values, each ~2000x the average key at this SF -- the shape a
    Zipf-skewed domain column takes at web scale).  A deterministic salt
    (hash(event_id) % S, not rand -- reproducible runs) spreads each hot
    key over S reducers for the partial aggregate; the final aggregate
    collapses S tiny rows per key.  Same result as the plain GROUP BY
    (the oracle), different shuffle: no reducer ever receives a whole
    hot key."""
    e = _t(spark, sf_dir, "events")
    salted = e.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salt))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum("value").alias("pv"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("pv"), 4).alias("sum_value"),
        )
        .orderBy("event_type")
    )


def agg_percentiles(spark, sf_dir):
    """Exact percentiles (median / p90 / p99) of event values per type --
    ``percentile`` with linear interpolation, the same definition as
    ANSI ``percentile_cont`` (DuckDB ``quantile_cont``).  Exact
    percentile sorts per group; at 10^12 rows swap in
    ``percentile_approx`` (t-digest) -- same call shape."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


def agg_approx_count_distinct(spark, sf_dir, rsd: float = 0.05):
    """The documented 10^12-row swap for ``agg_count_distinct``, shipped
    as a DRIVER-CHECKED query: HLL++ (``approx_count_distinct``) next to
    the exact distinct count, with ``approx_ok`` asserting relative error
    <= 3*rsd (the sketch's standard-error bound with generous margin).
    The oracle recomputes the exact count and expects approx_ok TRUE, so
    a sketch regression fails the value-hash compare.  At scale the HLL
    sketch is fixed-size and mergeable -- no exact-distinct Expand
    shuffle."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id", rsd=rsd).alias("n_approx"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_users_exact"))
                <= F.col("n_users_exact") * (3 * rsd)
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


def agg_approx_percentiles(spark, sf_dir, accuracy: int = 10000):
    """The documented swap for ``agg_percentiles`` at 10^12 rows, shipped
    as a DRIVER-CHECKED query: ``percentile_approx`` (Greenwald-Khanna,
    rank error <= 1/accuracy) checked against the exact quantile
    ENVELOPE [q-0.01, q+0.01] -- a rank-error bound 100x looser than the
    sketch guarantees, so the booleans are robustly TRUE unless the
    sketch actually breaks.  The oracle recomputes the envelope bounds
    implicitly by expecting TRUE."""
    e = _t(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n")]
    checks = []
    for q in (0.5, 0.9, 0.99):
        lo, hi = max(q - 0.01, 0.0), min(q + 0.01, 1.0)
        aggs += [
            F.expr(f"percentile_approx(value, {q}, {accuracy})")
            .alias(f"a{int(q*100)}"),
            F.expr(f"percentile(value, {lo})").alias(f"lo{int(q*100)}"),
            F.expr(f"percentile(value, {hi})").alias(f"hi{int(q*100)}"),
        ]
        checks.append(
            (
                (F.col(f"a{int(q*100)}") >= F.col(f"lo{int(q*100)}") - 1e-9)
                & (F.col(f"a{int(q*100)}") <= F.col(f"hi{int(q*100)}") + 1e-9)
            ).alias(f"ok_p{int(q*100)}")
        )
    return (
        e.groupBy("event_type")
        .agg(*aggs)
        .select("event_type", "n", *checks)
        .orderBy("event_type")
    )


def agg_count_distinct_gated(spark, sf_dir, rsd: float = 0.05):
    """Merged driver form of ``agg_count_distinct`` +
    ``agg_approx_count_distinct`` (one scan, one slot -- the r4 merge
    that freed a cap slot for the corpus-builder entry): exact distinct
    counts oracle-recomputed, plus the HLL++ sketch's ``approx_ok``
    bound gate.  Both single-purpose forms stay public functions
    (pytest + bench surface); ``tests/test_merged_queries.py`` pins
    this form equal to its parts.

    r6 adds ``sketch_merge_ok``: the MERGEABILITY property the plain
    approx gate cannot see.  Per-shard Datasketches HLL sketches
    (``hll_sketch_agg`` over ``xxhash64(event_id) % 8`` shards -- the
    stand-in for the per-day/per-partition sketch files a 10^12-row
    pipeline stores) are combined with ``hll_union_agg``, and the
    merged estimate must land within 5% of the exact distinct count
    (default lgConfigK=12 -> ~1.6% standard error, so 5% is a
    3-sigma-wide gate).  This is the operation that lets daily corpus
    stats be maintained WITHOUT rescanning history: store the sketch
    per ingest batch, union on read."""
    e = _t(spark, sf_dir, "events")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.approx_count_distinct("user_id", rsd=rsd).alias("__approx"),
    )
    merged_est = (
        e.withColumn(
            "__shard", F.pmod(F.xxhash64("event_id"), F.lit(8))
        )
        .groupBy("event_type", "__shard")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("__sk"))
        .groupBy("event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(__sk))")
            .alias("__merged_est")
        )
    )
    return (
        exact.join(merged_est, "event_type")
        .select(
            "event_type",
            "n_users",
            "n_events",
            (
                F.abs(F.col("__approx") - F.col("n_users"))
                <= F.col("n_users") * (3 * rsd)
            ).alias("approx_ok"),
            (
                F.abs(F.col("__merged_est") - F.col("n_users"))
                <= F.col("n_users") * 0.05
            ).alias("sketch_merge_ok"),
        )
        .orderBy("event_type")
    )


def agg_percentiles_gated(spark, sf_dir, accuracy: int = 10000):
    """Merged driver form of ``agg_percentiles`` +
    ``agg_approx_percentiles`` (one scan, one slot): exact
    percentile_cont values oracle-recomputed, plus the Greenwald-Khanna
    sketch's envelope gates."""
    e = _t(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n")]
    outs = []
    checks = []
    for q in (0.5, 0.9, 0.99):
        lo, hi = max(q - 0.01, 0.0), min(q + 0.01, 1.0)
        p = int(q * 100)
        aggs += [
            F.round(F.expr(f"percentile(value, {q})"), 4).alias(f"p{p}"),
            F.expr(f"percentile_approx(value, {q}, {accuracy})")
            .alias(f"a{p}"),
            F.expr(f"percentile(value, {lo})").alias(f"lo{p}"),
            F.expr(f"percentile(value, {hi})").alias(f"hi{p}"),
        ]
        outs.append(f"p{p}")
        checks.append(
            (
                (F.col(f"a{p}") >= F.col(f"lo{p}") - 1e-9)
                & (F.col(f"a{p}") <= F.col(f"hi{p}") + 1e-9)
            ).alias(f"ok_p{p}")
        )
    return (
        e.groupBy("event_type")
        .agg(*aggs)
        .select("event_type", *outs, "n", *checks)
        .orderBy("event_type")
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}"


def scalar_mask_email(spark, sf_dir):
    """The SQL-expressible core of the scrub kernel: regex replacement
    with the reference email pattern (``patterns.go:40``, quirk included)
    over text constructed from customer names.  JVM-side regexp_replace --
    the fast path the full kernel falls back from only when validators /
    training are needed."""
    # sort-first: projecting above the global sort keeps the regex off
    # the range exchange's sampling re-execution (see
    # textstats.text_doc_features r8 note); identical rows and order
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    ).orderBy("c_custkey")
    text = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" at "),
        F.lower(F.regexp_replace("c_name", " ", ".")),
        F.lit("@corp.example.com or admin@corp.example.com now"),
    )
    return c.select(
        "c_custkey",
        F.regexp_replace(text, _EMAIL_RE, "[EMAIL]").alias("masked"),
    )


def scalar_concat_project(spark, sf_dir):
    """P1/F5 -- PII-enabled projection + space-join (``file.go:396-404``)
    with P2 empty-cell passthrough (``file_processor.go:71-74``)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.concat_ws(" ", "p_brand", "p_type").alias("joined"),
            F.when(F.length(F.trim(F.col("p_name"))) == 0, F.col("p_name"))
            .otherwise(F.upper("p_name"))
            .alias("name_or_upper"),
        )
        .orderBy("p_partkey")
    )


def scalar_mask_repeat(spark, sf_dir):
    """F3 -- mask mode '*' x len (``detector.go:503``)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.repeat(F.lit("*"), F.length("c_name")).alias("masked_name"),
        )
        .orderBy("c_custkey")
    )


def scalar_mask(spark, sf_dir):
    """Merged driver entry for the two mask shapes: the F3 repeat-mask
    and the email-regex fast path, both over customer in ONE projection
    (one scan instead of two driver slots)."""
    # sort-first, same rationale as scalar_mask_email above
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    ).orderBy("c_custkey")
    text = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" at "),
        F.lower(F.regexp_replace("c_name", " ", ".")),
        F.lit("@corp.example.com or admin@corp.example.com now"),
    )
    return c.select(
        "c_custkey",
        F.regexp_replace(text, _EMAIL_RE, "[EMAIL]").alias("masked"),
        F.repeat(F.lit("*"), F.length("c_name")).alias("masked_name"),
    )


def scalar_json_extract(spark, sf_dir):
    """F4 -- JSON decode of settings blobs (``file.go:2369-2383``)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .orderBy("event_id")
    )


def scalar_line_split(spark, sf_dir):
    """F6 -- line/token split + per-doc token count (``file.go:2227``)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )




# --------------------------------------------------------------------------
# Advanced patterns beyond the reference (task brief: windows/sessionize/
# as-of -- the ops a large-scale pipeline needs; each with a DuckDB oracle)
# --------------------------------------------------------------------------

def window_running_sum(spark, sf_dir):
    """Cumulative per-user running sum (window frame: unbounded preceding
    .. current row) -- frame-based windows are absent in the reference and
    added here as a first-class op."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w), 4).alias("running_value"),
        )
        .orderBy("event_id")
    )


def window_sessionize(spark, sf_dir):
    """Sessionization: a new session starts after a >30 min gap per user
    (lag + cumsum-free counting); returns sessions per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_s = F.when(
        lag_ts.isNull()
        | (F.col("ts") - lag_ts > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    return (
        e.withColumn("new_s", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"))
        .orderBy("user_id")
    )


def join_semi_exists(spark, sf_dir):
    """LEFT SEMI (EXISTS): customers with at least one big order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def join_anti_not_exists(spark, sf_dir):
    """LEFT ANTI (NOT EXISTS): customers with no high-value order
    (unfiltered anti is vacuous on this dataset -- every customer
    orders)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def join_semi_anti(spark, sf_dir):
    """Merged driver entry for the EXISTS / NOT EXISTS pair above, tagged
    by op -- one oracle checks both the left-semi and left-anti plans."""
    c = _t(spark, sf_dir, "customer")
    semi = join_semi_exists(spark, sf_dir).select(
        F.lit("semi").alias("op"), "c_custkey", "c_mktsegment"
    )
    # anti leg REUSES the public form (single source for the threshold);
    # the broadcast dim join only re-attaches c_mktsegment, which
    # join_anti_not_exists deliberately does not project
    anti = (
        join_anti_not_exists(spark, sf_dir)
        .join(F.broadcast(c.select("c_custkey", "c_mktsegment")), "c_custkey")
        .select(F.lit("anti").alias("op"), "c_custkey", "c_mktsegment")
    )
    return semi.unionByName(anti).orderBy("op", "c_custkey")


def pivot_event_counts(spark, sf_dir):
    """Pivot: per-user event-type count matrix (explicit value list keeps
    the plan static -- no driver-side distinct scan)."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "error", "login"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0)
        .orderBy("user_id")
    )
    return out.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in types]
    )


def cube_order_stats(spark, sf_dir):
    """CUBE over (status, priority): grouping-set totals with NULL
    subtotal markers (absent in the reference; standard OLAP surface)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .alias("sum_price"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


RANGE_WINDOW_SEC = 3600


def join_range_bucketed(spark, sf_dir):
    """Pure range join (no equi key): for each purchase event, count and
    total the events in the following hour.

    Spark plans a bare ``x.ts > p.ts AND x.ts <= p.ts + 1h`` condition
    as BroadcastNestedLoopJoin -- O(N*M) and a driver-memory bomb at
    scale.  The scale form buckets both sides by the window width: a
    window starting in bucket b ends in b or b+1 (width == bucket), so
    each probe explodes to exactly two bucket keys, the join becomes an
    EQUI join on bucket (shuffle-hash/SMJ, AQE-skewable), and the exact
    interval predicate refines the candidates.  Bucketing uses integer
    epoch micros (exact); the refine compares native timestamps (exact
    in both engines -- double epoch seconds cannot represent micros)."""
    e = _t(spark, sf_dir, "events")
    w_us = RANGE_WINDOW_SEC * 1_000_000
    probes = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("probe_id"),
        F.col("ts").alias("p_ts"),
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / w_us)
        .alias("b0"),
    )
    probe_b = probes.withColumn(
        "bkt", F.explode(F.array(F.col("b0"), F.col("b0") + 1))
    )
    build = e.select(
        F.col("event_id").alias("x_id"),
        F.col("ts").alias("x_ts"),
        F.col("value").alias("x_value"),
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / w_us)
        .alias("bkt"),
    )
    hits = (
        probe_b.join(build, "bkt")
        .filter(
            (F.col("x_ts") > F.col("p_ts"))
            & (F.col("x_ts") <= F.col("p_ts")
               + F.expr(f"INTERVAL {RANGE_WINDOW_SEC} SECOND"))
        )
        .groupBy("probe_id")
        .agg(
            F.count("*").alias("n_next_hour"),
            F.round(F.sum("x_value"), 4).alias("total_value"),
        )
    )
    return (
        probes.select("probe_id")
        .join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_next_hour", F.lit(0)).alias("n_next_hour"),
            F.round(F.coalesce("total_value", F.lit(0.0)), 4)
            .alias("total_value"),
        )
        .orderBy("probe_id")
    )


def join_asof_latest_order(spark, sf_dir):
    """AS-OF join (Spark has no native one): for every event, the latest
    order date of the same key at-or-before the event time.  Implemented
    with the scalable union+window pattern: tag both sides, sort within
    key by (time, side), carry the last seen order date forward -- one
    shuffle, no range explosion.  Oracle: DuckDB ASOF LEFT JOIN."""
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        "event_id",
        F.lit(None).cast("date").alias("odate"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("odate"),
    )
    # orders sort BEFORE events at the same instant => >= semantics
    w = (
        Window.partitionBy("key")
        .orderBy(F.asc("t"), F.desc("is_order"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = e.unionByName(o).withColumn(
        "latest_order_date", F.last("odate", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("is_order") == 0)
        .select("event_id", "latest_order_date")
        .orderBy("event_id")
    )


QUERIES = {
    # merged entries keep the full operator surface inside the driver's
    # 50-query window: each single-purpose form stays a public function
    # (pytest / bench surface); the driver slot is the merged query.
    "agg_analytics_rollup": agg_analytics_rollup,   # + agg_sum_coalesce
    "agg_session_rollup": agg_session_rollup,
    "agg_weighted_average": agg_weighted_average,
    "agg_type_stats": agg_type_stats,  # subsumes agg_counts_by_type
    "agg_tpch_q1": agg_tpch_q1,
    "join_rows_history": join_rows_history,
    "join_snowflake": join_snowflake,
    "join_grouped_rollup": join_grouped_rollup,
    "join_latest_per_key": join_latest_per_key,
    "join_semi_anti": join_semi_anti,  # join_semi_exists + join_anti_not_exists
    "join_asof_latest_order": join_asof_latest_order,
    "join_range_bucketed": join_range_bucketed,
    "window_latest_feedback_wins": window_latest_feedback_wins,
    "window_pagination": window_pagination_both,  # offset + keyset forms
    "window_topk": window_topk,  # recent-50 + per-group top-3
    "window_time_bucket": window_time_bucket,
    "window_running_sum": window_running_sum,
    "window_sessionize": window_sessionize,
    "set_ops": set_ops,  # set_union_distinct + set_intersect_except
    # exact + approx twins merged into one gated scan each (r4): the
    # single-purpose forms stay public for pytest/bench
    "agg_percentiles": agg_percentiles_gated,
    "agg_salted_skew": agg_salted_skew,
    "agg_count_distinct": agg_count_distinct_gated,
    "scalar_mask": scalar_mask,  # scalar_mask_email + scalar_mask_repeat
    "scalar_concat_project": scalar_concat_project,
    "scalar_json_extract": scalar_json_extract,
    # scalar_line_split (F6) demoted: its expression is the n_words
    # column of text_doc_features (oracle-checked); slot freed for
    # text_dedup_passage_removal.
    "pivot_event_counts": pivot_event_counts,
    "cube_order_stats": cube_order_stats,
}

ORACLES = {
    "agg_analytics_rollup": """
        SELECT * FROM (
            SELECT count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_price,
                   round(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                         * 100.0 / count(*), 4) AS success_rate,
                   round(avg(CASE WHEN o_totalprice > 1000
                                  THEN o_totalprice END), 4) AS avg_big_price
            FROM orders
        ) CROSS JOIN (
            SELECT coalesce(round(sum(value), 4), 0.0) AS err_total_value,
                   count(*) AS n_err_rows
            FROM events WHERE event_type = 'error'
        )
    """,
    "set_ops": """
        SELECT 'union' AS op, user_id FROM (
            SELECT DISTINCT user_id FROM (
                SELECT user_id FROM events WHERE value > 18
                UNION ALL
                SELECT user_id FROM events WHERE event_type = 'error'
            )
        )
        UNION ALL
        SELECT 'int_exc' AS op, user_id FROM (
            SELECT user_id FROM (
                SELECT user_id FROM events WHERE event_type = 'purchase'
                INTERSECT
                SELECT user_id FROM events WHERE event_type = 'error'
            )
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'signup'
        )
        UNION ALL
        -- crawl_delta legs: the oracle diffs the TEXTS the synthetic
        -- snapshots carry; the Spark side diffs md5 content hashes
        SELECT 'delta_' || CASE
                 WHEN o.doc_id IS NULL THEN 'added'
                 WHEN n.doc_id IS NULL THEN 'gone'
                 WHEN o.text <> n.text THEN 'changed'
                 ELSE 'unchanged' END AS op,
               CAST(coalesce(o.doc_id, n.doc_id) AS BIGINT) AS user_id
        FROM (SELECT doc_id, text FROM documents
              WHERE doc_id % 3 <> 0) o
        FULL OUTER JOIN
             (SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN text || ' r7'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 5 <> 0) n
        ON o.doc_id = n.doc_id
        ORDER BY op, user_id
    """,
    "join_semi_anti": """
        SELECT 'semi' AS op, c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
        UNION ALL
        SELECT 'anti' AS op, c_custkey, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 450000)
        ORDER BY op, c_custkey
    """,
    "window_pagination": """
        WITH page AS (
            SELECT event_id, ts, value FROM events
            ORDER BY ts, event_id LIMIT 100 OFFSET 50)
        SELECT 'offset' AS mode, event_id, ts, value FROM page
        UNION ALL
        SELECT 'keyset' AS mode, event_id, ts, value FROM page
        ORDER BY mode, ts, event_id
    """,
    "window_topk": """
        SELECT 'recent50' AS scope, event_type, CAST(0 AS INT) AS rnk,
               event_id, value
        FROM (SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 50)
        UNION ALL
        SELECT 'topk' AS scope, event_type, rnk, event_id, value FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC) AS rnk
            FROM events) WHERE rnk <= 3
        ORDER BY scope, event_type, event_id
    """,
    "scalar_mask": r"""
        SELECT c_custkey,
               regexp_replace(
                   'contact ' || c_name || ' at ' ||
                   lower(replace(c_name, ' ', '.')) ||
                   '@corp.example.com or admin@corp.example.com now',
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}',
                   '[EMAIL]', 'g') AS masked,
               repeat('*', length(c_name)) AS masked_name
        FROM customer ORDER BY c_custkey
    """,
    "agg_session_rollup": """
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 4) AS sum_value,
               round(avg(value), 4) AS avg_value
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "agg_weighted_average": """
        SELECT l_returnflag,
               round(CASE WHEN sum(l_discount) = 0 THEN 0.5
                          ELSE sum(l_extendedprice * l_discount)
                               / sum(l_discount) END, 4)
                   AS weighted_avg_price,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg_type_stats": """
        SELECT event_type, count(*) AS total,
               CAST(sum(CASE WHEN value > 10 THEN 1 ELSE 0 END) AS BIGINT) AS positives,
               round(sum(CASE WHEN value > 10 THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS accuracy,
               round(avg(value), 4) AS avg_score
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "agg_tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "join_rows_history": """
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "join_snowflake": """
        SELECT r_name, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "join_grouped_rollup": """
        SELECT l_orderkey,
               string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_numbers,
               count(*) AS n_lines
        FROM lineitem WHERE l_orderkey <= 100
        GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    "join_latest_per_key": """
        SELECT o_custkey, latest_orderkey, latest_orderdate FROM (
            SELECT o_custkey, o_orderkey AS latest_orderkey,
                   o_orderdate AS latest_orderdate,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) WHERE rn = 1 ORDER BY o_custkey
    """,
    "window_latest_feedback_wins": """
        SELECT user_id, event_type, latest_value FROM (
            SELECT user_id, event_type, value AS latest_value,
                   row_number() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1 ORDER BY user_id, event_type
    """,
    "agg_count_distinct": """
        SELECT event_type, count(DISTINCT user_id) AS n_users,
               count(*) AS n_events, TRUE AS approx_ok,
               TRUE AS sketch_merge_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "agg_salted_skew": """
        SELECT event_type, count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "agg_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99,
               count(*) AS n,
               TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "window_time_bucket": """
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY bucket, event_type
    """,
    "scalar_concat_project": """
        SELECT p_partkey,
               concat_ws(' ', p_brand, p_type) AS joined,
               CASE WHEN length(trim(p_name)) = 0 THEN p_name
                    ELSE upper(p_name) END AS name_or_upper
        FROM part ORDER BY p_partkey
    """,
    "scalar_json_extract": """
        SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
        FROM events ORDER BY event_id
    """,
    "window_running_sum": """
        SELECT event_id, user_id,
               round(sum(value) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS running_value
        FROM events ORDER BY event_id
    """,
    "window_sessionize": """
        WITH g AS (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                                > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events)
        SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions
        FROM g GROUP BY user_id ORDER BY user_id
    """,
    "pivot_event_counts": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'login' THEN 1 ELSE 0 END) AS BIGINT) AS n_login
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "cube_order_stats": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "join_range_bucketed": """
        SELECT p.event_id AS probe_id,
               count(x.event_id) AS n_next_hour,
               round(coalesce(sum(x.value), 0), 4) AS total_value
        FROM events p LEFT JOIN events x
          ON x.ts > p.ts AND x.ts <= p.ts + INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase'
        GROUP BY 1 ORDER BY 1
    """,
    "join_asof_latest_order": """
        SELECT e.event_id, o.o_orderdate AS latest_order_date
        FROM events e ASOF LEFT JOIN
             (SELECT o_custkey, o_orderdate,
                     CAST(o_orderdate AS TIMESTAMP) AS odate_ts
              FROM orders) o
          ON e.user_id = o.o_custkey AND e.ts >= o.odate_ts
        ORDER BY e.event_id
    """,
}

