"""Feature-engineering & physical-layout query family.

The reference keeps only instantaneous state (latest PSI version, 60 s
stat rings — SURVEY §2.3 R7, §2.5 A2/A3); it has no notion of historical
change capture, ranking distributions, smoothed series, or storage layout.
These are the operations a warehouse/training-data pipeline layers on top,
each expressed Spark-first with a DuckDB oracle:

- `scd2_purchase_tier_history` — slowly-changing-dimension type-2 build
  (change capture) from an event stream: the generalization of the
  reference's "latest version register" (psi_proc.c:362-390) to *full
  validity-interval history*.
- `topk_orders_per_customer` — per-group top-k via window rank (the
  reference's global top-k analog `topk_orders_by_value` already exists;
  per-key rank is the partitioned variant that scales with keys).
- `ema_daily_order_value` — exponentially-weighted moving average over a
  date-grain aggregate (truncated 20-tap EMA as a single window pass).
- `percent_rank_orders` — percent_rank / cume_dist ranking distributions.
- `zorder_locality_tiles` — Morton (Z-order) interleave of two dimensions
  into one clustering key; the layout primitive behind multi-dimensional
  data skipping (Delta OPTIMIZE ZORDER et al.).

Scale notes (100 TB):
- SCD2 and per-group top-k shuffle ONCE on their partition key (user_id /
  o_custkey — high cardinality, well spread); the window passes after the
  shuffle are partition-local. Catalyst reuses one Exchange for the two
  stacked windows in SCD2 because both key on user_id.
- The EMA's global-order window runs over the *date-grain aggregate*
  (one row per day — a few thousand rows at any fact scale), never the
  fact table, so the single-partition window is deliberately tiny.
  Aggregate-then-window is the pattern; windowing the raw facts would
  serialize the job.
- Z-order keys are pure JVM bit arithmetic (shiftleft/and/or — inside
  whole-stage codegen); at 100 TB the zkey becomes the sort key of a
  write, so range scans on EITHER dimension prune files. The query here
  computes per-tile stats to demonstrate locality (each tile maps to a
  contiguous zkey range).

Float parity: money is quantized to integer cents BEFORE any aggregate
(order-exact in both engines); EMA weights multiply integer cents with a
literal left-to-right term chain (identical association both engines);
rank ratios are floor-quantized (see functions/dialect.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamprocessors_spark.plans.registry import register
from streamprocessors_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _fr(col: Column, decimals: int) -> Column:
    scale = 10**decimals
    return F.floor(col * scale) / F.lit(float(scale))


# ---------------------------------------------------------------------------
# SCD2 change capture
# ---------------------------------------------------------------------------


@register(
    "scd2_purchase_tier_history",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id,
             CAST(LEAST(FLOOR(value / 100), 4) AS INT) AS tier
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, event_id, tier,
             lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_tier
      FROM p
    ), chg AS (
      SELECT user_id, ts, event_id, tier
      FROM c WHERE prev_tier IS NULL OR prev_tier <> tier
    )
    SELECT user_id, tier,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL) AS is_current
    FROM chg
    """,
    doc="SCD2 dimension build from an event stream: per-user purchase-value "
    "tier with full validity intervals. Generalizes the reference's "
    "latest-version register (psi_proc.c:362-390 keeps only the current "
    "table; here every version gets [valid_from, valid_to)). Two stacked "
    "windows on the same key -> one shuffle; consecutive-duplicate states "
    "are collapsed by the lag() change filter before interval assignment.",
    tags=("scd2", "window", "state"),
)
def scd2_purchase_tier_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    tier = F.least(F.floor(F.col("value") / 100), F.lit(4)).cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        ev.select("user_id", "ts", "event_id", tier.alias("tier"))
        .withColumn("prev_tier", F.lag("tier").over(w))
        .where(F.col("prev_tier").isNull() | (F.col("prev_tier") != F.col("tier")))
    )
    valid_to = F.lead("ts").over(w)
    return changed.select(
        "user_id",
        "tier",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Per-group top-k
# ---------------------------------------------------------------------------


@register(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey)
               AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Per-group top-k: top-3 orders per customer via row_number with a "
    "deterministic unique-key tie-break. One shuffle on o_custkey; the "
    "rank + filter is partition-local, so the plan scales with the number "
    "of customers (vs. the global TakeOrderedAndProject of "
    "topk_orders_by_value).",
    tags=("topk", "window"),
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# EMA over a date-grain aggregate
# ---------------------------------------------------------------------------

_EMA_ALPHA = 0.125
_EMA_TAPS = 20


def _ema_exprs() -> tuple[str, str]:
    """Numerator/denominator of a truncated EMA as literal lag-term chains.

    EMA_t = sum_j w_j * x_{t-j} / sum_j w_j over AVAILABLE taps, with
    w_j = alpha*(1-alpha)^j. Both engines evaluate the literal +-chain
    left-to-right, and x is integer cents, so the doubles are bit-identical.
    The window text is valid verbatim in Spark SQL and DuckDB.
    """
    num, den = [], []
    zero = "CAST(0 AS DOUBLE)"
    for j in range(_EMA_TAPS):
        # CAST .. AS DOUBLE: bare decimal literals parse as DECIMAL in both
        # Spark SQL and DuckDB, and decimal division rounds differently.
        w = f"CAST({_EMA_ALPHA * (1.0 - _EMA_ALPHA) ** j!r} AS DOUBLE)"
        lagx = f"lag(day_cents, {j}) OVER (ORDER BY d)"
        num.append(f"CASE WHEN {lagx} IS NOT NULL THEN {w} * {lagx} ELSE {zero} END")
        den.append(f"CASE WHEN {lagx} IS NOT NULL THEN {w} ELSE {zero} END")
    return " + ".join(num), " + ".join(den)


@register(
    "ema_daily_order_value",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
      FROM orders GROUP BY 1
    )
    SELECT d, day_cents,
           floor(({_ema_exprs()[0]}) / ({_ema_exprs()[1]}) * 100)
             / CAST(100 AS DOUBLE) AS ema_cents
    FROM daily
    """,
    doc="Exponentially-weighted moving average (alpha=0.125, 20 taps) of "
    "daily order value: the smoothing pass of a time-series feature "
    "pipeline. Aggregate-then-window: the global-order window runs over "
    "the date-grain rollup (one row/day), never the fact table, so the "
    "single-partition stage is a few KB at any fact scale. The EMA itself "
    "is one window pass (20 lag() calls over one WindowSpec -> a single "
    "sort, no self-joins).",
    tags=("window", "timeseries"),
)
def ema_daily_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "day_cents"
        )
    )
    num, den = _ema_exprs()
    return daily.selectExpr(
        "d",
        "day_cents",
        f"floor(({num}) / ({den}) * 100) / cast(100 as double) as ema_cents",
    )


# ---------------------------------------------------------------------------
# Ranking distributions
# ---------------------------------------------------------------------------


@register(
    "percent_rank_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           floor(percent_rank() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice) * 1000000)
             / 1000000.0 AS pr,
           floor(cume_dist() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice) * 1000000)
             / 1000000.0 AS cd
    FROM orders
    """,
    doc="Ranking-distribution window functions (percent_rank, cume_dist) "
    "per order priority — the normalized-rank features a training pipeline "
    "derives per stratum. Tie-stable by definition (equal values share a "
    "rank), so no tie-break column is needed; both ratios are "
    "floor-quantized at 1e-6 for cross-engine float parity. One shuffle "
    "on the partition key; both functions share a single WindowSpec.",
    tags=("window", "rank"),
)
def percent_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        _fr(F.percent_rank().over(w), 6).alias("pr"),
        _fr(F.cume_dist().over(w), 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key
# ---------------------------------------------------------------------------


def _interleave8(d: str, a: str, b: str) -> str:
    """16-bit Morton interleave of two 8-bit values (a even bits, b odd).

    Emitted as a literal OR-chain of masked shifts so the whole expression
    stays inside whole-stage codegen on Spark; DuckDB uses the native shift
    operators.
    """
    terms = []
    for i in range(8):
        if d == "spark":
            terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _zorder_sql(d: str) -> str:
    if d == "spark":
        u8 = "cast(user_id % 256 as int)"
        h8 = "cast((unix_micros(ts) div 3600000000) % 256 as int)"
        tile = f"shiftright({_interleave8(d, 'u8', 'h8')}, 6)"
    else:
        u8 = "CAST(user_id % 256 AS INT)"
        h8 = "CAST((epoch_us(ts) // 3600000000) % 256 AS INT)"
        tile = f"(({_interleave8(d, 'u8', 'h8')}) >> 6)"
    return f"""
    WITH keyed AS (
      SELECT {tile} AS tile,
             user_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM (SELECT {u8} AS u8, {h8} AS h8, user_id, value FROM events) t
    )
    SELECT CAST(tile AS INT) AS tile,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(cents) AS BIGINT) AS value_cents
    FROM keyed GROUP BY tile
    """


@register(
    "zorder_locality_tiles",
    oracle=_zorder_sql("duck"),
    doc="Morton (Z-order) clustering key: interleave the low 8 bits of "
    "user_id with the low 8 bits of the event's epoch-hour into one 16-bit "
    "key, then aggregate per 64-key tile. This is the layout primitive "
    "behind multi-dimensional data skipping: writing a 100 TB table sorted "
    "by zkey makes file-level min/max prune range scans on EITHER "
    "dimension. The interleave is a literal chain of shift/mask ops — "
    "fully inside whole-stage codegen, no Python, no shuffle beyond the "
    "final per-tile aggregate.",
    tags=("layout", "zorder"),
)
def zorder_locality_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__zorder_events")
    return spark.sql(_zorder_sql("spark").replace("FROM events", "FROM __zorder_events"))
