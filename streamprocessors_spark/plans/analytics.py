"""Event-stream analytics the reference's dashboard hints at but cannot
compute, plus an edit-distance dedup tier.

The reference surfaces per-second rate series to a JS dashboard
(assets/html/js/system.js, es_proc.js — SURVEY §2.5 A3-A7) but has no
query engine behind it: no funnels, no inter-arrival statistics, no
gap-filled resampling. These are the idiomatic Spark restatements, each
with a DuckDB oracle.

Scale notes (100 TB):
- funnel + inter-arrival both shuffle ONCE on user_id (high cardinality,
  well spread); everything after the shuffle is per-group;
- the resample spine (hours x event_type) is tiny and generated, so the
  gap-fill join broadcasts the spine side — no extra shuffle of the fact
  aggregate;
- levenshtein is O(len^2) per pair, so candidate pairs are blocked on
  (source, length-band) BEFORE the quadratic metric — the same
  block-then-verify shape as the MinHash/LSH tiers (plans/llm_ops.py);
  at scale the self-join is an equi-join on the block key, and the DP
  runs only inside blocks.

Float parity: gaps are computed in integer MICROSECONDS (exact in both
engines; see functions/dialect.py for why raw double round() is unsafe),
averages floor-quantized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamprocessors_spark.functions import money as M
from streamprocessors_spark.plans.registry import register
from streamprocessors_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _fr(col: Column, decimals: int) -> Column:
    scale = 10**decimals
    return F.floor(col * scale) / F.lit(float(scale))


@register(
    "funnel_view_click_purchase",
    oracle="""
    SELECT count(*) FILTER (WHERE t_view IS NOT NULL)  AS n_view,
           count(*) FILTER (WHERE t_view < t_click)    AS n_click_after_view,
           count(*) FILTER (WHERE t_view < t_click AND t_click < t_purchase)
                                                       AS n_full_funnel
    FROM (
      SELECT user_id,
             min(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    """,
    doc="Conversion funnel view->click->purchase: per-user first-touch "
    "timestamps via conditional min (one shuffle on user_id, map-side "
    "partial agg), then ordered-stage counts in a single-row reduce. The "
    "reference's dashboard plots raw per-PID series (es_proc.js:754-810) "
    "— cross-event sequencing like this needs a real query engine.",
    tags=("agg", "funnel"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return first.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("t_view") < F.col("t_click"), 1)).alias(
            "n_click_after_view"
        ),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).alias("n_full_funnel"),
    )


# Quantized average over exact integer-microsecond gaps: the bigint sum is
# order-independent, the division text is shared by both engines (the
# avg()-based form relied on both engines computing avg(bigint) as exactly
# sum/count — true today, but structurally unverifiable; canon_audit flags
# quantizers over float aggregates).
_AVG_GAP_S = (
    "floor(cast(sum(gap_us) as bigint) * cast(1 as double) / count(*)"
    " / cast(10000 as double)) / cast(100 as double)"
)


@register(
    "event_interarrival_stats",
    oracle=f"""
    SELECT user_id,
           count(*)                                   AS n_gaps,
           {_AVG_GAP_S}                               AS avg_gap_s,
           max(gap_us)                                AS max_gap_us
    FROM (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="Per-user inter-arrival gaps via lag() over (user, time-ordered) "
    "windows — the T1 per-key-ordering discipline (ts_dec.c:98-108 CC "
    "check generalized from 4-bit counters to wall-clock gaps). Gaps are "
    "integer microseconds (exact cross-engine); the unique event_id "
    "tiebreak pins frame order under equal timestamps. One shuffle on "
    "user_id; window + aggregate reuse the same clustering.",
    tags=("window", "agg"),
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr(_AVG_GAP_S).alias("avg_gap_s"),
        F.max("gap_us").alias("max_gap_us"),
    )


@register(
    "resample_1h_gapfill",
    oracle=f"""
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events
    ),
    hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
    types AS (SELECT DISTINCT event_type FROM events),
    c AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             count(*) AS n_events,
             {M.money_sum("value")} AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT hours.hour, types.event_type,
           coalesce(c.n_events, 0)    AS n_events,
           coalesce(c.sum_value, 0.0) AS sum_value
    FROM hours CROSS JOIN types
    LEFT JOIN c ON c.hour = hours.hour AND c.event_type = types.event_type
    """,
    doc="Time-series resample with gap filling: a generated (hour x "
    "event_type) spine left-joined to hourly aggregates, so silent hours "
    "appear as explicit zero rows (what a dashboard needs to draw gaps — "
    "the reference's 60-slot ring buffer, stats.c:57-68, gets this for "
    "free by preallocating slots). The spine is tiny and broadcast; the "
    "fact side aggregates with one shuffle.",
    tags=("window", "gapfill", "join"),
)
def resample_1h_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("c_hour"),
        F.col("event_type").alias("c_type"),
    ).agg(
        F.count(F.lit(1)).alias("c_n"),
        F.expr(M.money_sum("value")).alias("c_sv"),
    )
    # bounded: calendar-hours x distinct event types (a gap-fill grid,
    # thousands of rows for any window the rollup serves)
    spine = F.broadcast(hours.crossJoin(types))
    return spine.join(
        counts,
        (F.col("c_hour") == F.col("hour")) & (F.col("c_type") == F.col("event_type")),
        "left",
    ).select(
        "hour",
        "event_type",
        F.coalesce(F.col("c_n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("c_sv"), F.lit(0.0)).alias("sum_value"),
    )


@register(
    "dedup_levenshtein_pairs",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.text, b.text) AS edit_dist
    FROM documents a JOIN documents b
      ON a.source = b.source
     AND floor(a.n_chars / 50) = floor(b.n_chars / 50)
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.text, b.text) <= 0.2 * greatest(a.n_chars, b.n_chars)
    """,
    doc="Edit-distance near-dup tier: candidate pairs blocked on (source, "
    "50-char length band) — an equi-join, NOT a cross product — then the "
    "O(len^2) Levenshtein DP verifies only inside blocks, accepting pairs "
    "within 20% relative distance. Complements the shingle/MinHash/SimHash "
    "tiers (plans/llm_ops.py) with a character-level metric both engines "
    "implement identically. At 100 TB the block key spreads the self-join "
    "shuffle; band width trades recall vs candidate count.",
    tags=("dedup", "join", "llm"),
)
def dedup_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("text_a"),
        F.col("source").alias("src_a"),
        F.floor(F.col("n_chars") / 50).alias("band_a"),
        F.col("n_chars").alias("nc_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
        F.col("source").alias("src_b"),
        F.floor(F.col("n_chars") / 50).alias("band_b"),
        F.col("n_chars").alias("nc_b"),
    )
    pairs = a.join(
        b,
        (F.col("src_a") == F.col("src_b"))
        & (F.col("band_a") == F.col("band_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    )
    # Bounded Levenshtein: the 3-arg form runs a banded DP that only fills
    # a 2k+1-wide diagonal strip and bails out (returning -1) the moment
    # the distance provably exceeds the threshold — O(len*k) instead of
    # O(len^2) per pair, which is the difference between 105 s and 9 s on
    # the sf0.1 blocks. lev <= 0.2*max is equivalent to
    # lev <= floor(0.2*max) because lev is integral, so the kept pairs and
    # their distances are bit-identical to the oracle's unbounded form.
    # (F.levenshtein only takes an int literal threshold; the SQL form
    # accepts a per-row expression)
    dist = F.expr(
        "levenshtein(text_a, text_b,"
        " cast(floor(0.2 * greatest(nc_a, nc_b)) as int))"
    )
    return (
        pairs.select("doc_a", "doc_b", dist.alias("edit_dist"))
        .where(F.col("edit_dist") >= 0)
    )


@register(
    "running_value_cents",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT)
             AS running_cents
    FROM (SELECT event_id, user_id, ts,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events)
    """,
    doc="Running total per user: a ROWS UNBOUNDED PRECEDING window frame "
    "(A2's peak gauge, app_prog_proc.c:110-115, generalized to a full "
    "prefix series). Values are quantized to integer cents BEFORE the "
    "cumulative sum — integer prefix sums are order-exact in both engines, "
    "where a raw double cumsum would drift (DuckDB computes window sums "
    "over a segment tree, Spark left-to-right; float association differs). "
    "One shuffle on user_id.",
    tags=("window", "frame"),
)
def running_value_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("running_cents"),
    )


@register(
    "grouping_sets_event_rollup",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS hour,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY GROUPING SETS ((event_type), (date_trunc('hour', ts)), ())
    """,
    doc="Explicit GROUPING SETS — the third grouping-analytics surface "
    "next to ROLLUP (agg_rollup_region_nation) and CUBE "
    "(cube_events_by_type_hour): per-type totals, per-hour totals, and a "
    "grand total in ONE pass (Catalyst expands the sets over a single "
    "shuffle; naive UNION ALL would scan three times). Sums in integer "
    "cents for cross-engine exactness.",
    tags=("agg", "groupingsets"),
)
def grouping_sets_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return ev.groupingSets(
        [[F.col("event_type")], [F.col("hour")], []],
        F.col("event_type"),
        F.col("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )


_NRM_DUCK = "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
# avg over doubles is order-dependent; quantize each norm to 1e-6 units
# (bit-identical per-row), sum exactly, then floor-quantize the average.
# min/max are order-independent, so floor over them is already safe.
_NRM_AVG = lambda x: M.avg_quant(M.sum_units(x, 1000000), 4, 1000000)  # noqa: E731


@register(
    "embedding_norm_stats",
    oracle=f"""
    SELECT label, count(*) AS n_vectors,
           floor(min({_NRM_DUCK}) * 10000) / 10000 AS min_norm,
           floor(max({_NRM_DUCK}) * 10000) / 10000 AS max_norm,
           {_NRM_AVG(_NRM_DUCK)} AS avg_norm
    FROM embeddings GROUP BY label
    """,
    doc="Higher-order array functions on the embedding column: L2 norm as "
    "aggregate(zip_with(v, v, *)) — pure JVM expressions inside "
    "whole-stage codegen, no Python in the loop — then per-label "
    "min/max/avg. The norm is the building block the ANN queries "
    "(ann_*_topk) reuse; pinning its distribution per label catches "
    "encoder drift in a training-data pipeline. Single shuffle on label.",
    tags=("llm", "vectors", "agg"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessors_spark.functions import dialect as D

    emb = _t(spark, sf_dir, "embeddings")
    norm = F.expr(f"sqrt({D.dot_double(D.SPARK, 'embedding', 'embedding')})")
    return emb.select("label", norm.alias("nrm")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        _fr(F.min("nrm"), 4).alias("min_norm"),
        _fr(F.max("nrm"), 4).alias("max_norm"),
        F.expr(_NRM_AVG("nrm")).alias("avg_norm"),
    )
