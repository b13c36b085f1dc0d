"""Relational query surface over the standard fixture tables.

Each query is the idiomatic-Spark restatement of an operator family from
SURVEY.md §2 (file:line citations in each docstring point at the reference
behavior being re-expressed), exercised on the driver's TPC-H-ish fixtures
so DuckDB can oracle-check it.

Scale notes (100 TB design intent):
- dimension joins (region/nation/customer-sized sides) rely on broadcast
  hash join — Catalyst picks it via size estimation; `F.broadcast` is used
  where the dim side is guaranteed small;
- aggregations are expressed as plain groupBy so map-side partial
  aggregation applies;
- window functions partition on high-cardinality keys (user_id, orderkey)
  so the shuffle is well-spread; no global order-by without a limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamprocessors_spark.functions import money as M
from streamprocessors_spark.plans.registry import register
from streamprocessors_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# Exact-cents revenue fragment shared by the Spark plans (via F.expr) and
# the DuckDB oracles — money sums quantize per ROW to integer cents and sum
# BIGINTs, so the aggregate is order-independent and bit-identical across
# engines (functions/money.py; the round-2 q22 driver red row was the
# floor-over-double-sum form of this).
_REV = M.money_sum("l_extendedprice * (1 - l_discount)")


# ---------------------------------------------------------------------------
# Aggregation surface (SURVEY §2.5 A1-A8 analogs)
# ---------------------------------------------------------------------------


# q1 aggregate fragments (identical text on both sides). Quantities are
# integer-valued doubles — quantized at scale 1 they sum as exact BIGINTs
# (canon_audit-clean by construction); money columns go through exact
# cents; avg_disc uses 1e6 "micro" units for its 6-decimal output.
_Q1_AGGS = {
    "sum_qty": M.sum_units("l_quantity", 1),
    "sum_base_price": M.money_sum("l_extendedprice"),
    "sum_disc_price": _REV,
    "sum_charge": M.money_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)"),
    "avg_qty": M.avg_quant(M.sum_units("l_quantity", 1), 4, 1),
    "avg_price": M.avg_quant(M.sum_units("l_extendedprice"), 4),
    "avg_disc": M.avg_quant(M.sum_units("l_discount", 1000000), 6, 1000000),
    "count_order": "count(*)",
}


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {", ".join(f'{frag} AS {name}' for name, frag in _Q1_AGGS.items())}
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship scan+agg: TPC-H-Q1-style pricing summary. Exercises map-side "
    "partial aggregation and full-scan throughput (the reference's per-second "
    "accumulate loop, mpeg2ts/src/mpeg2_sp.c:910-916, generalized). Money "
    "aggregates are exact integer cents (functions/money.py).",
    tags=("agg",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *[F.expr(frag).alias(name) for name, frag in _Q1_AGGS.items()]
        )
    )


@register(
    "window_1min_event_rate",
    oracle=f"""
    SELECT date_trunc('minute', ts)        AS window_start,
           event_type,
           count(*)                        AS n_events,
           {M.money_sum("value")}          AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="A1 input-bitrate analog (mpeg2ts/src/mpeg2_sp.c:910-916; 1 s tumbling "
    "window -> 1 min tumbling window over the events stream).",
    tags=("agg", "window"),
)
def window_1min_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("window_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(M.money_sum("value")).alias("sum_value"),
    )


@register(
    "peak_rate_per_user",
    oracle="""
    SELECT user_id, max(n) AS peak_events_per_hour
    FROM (
      SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY 1, 2
    ) GROUP BY user_id
    """,
    doc="A2 bitrate-peak analog (app_prog_proc.c:110-115): running max over "
    "windowed rates.",
    tags=("agg", "window"),
)
def peak_rate_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return hourly.groupBy("user_id").agg(F.max("n").alias("peak_events_per_hour"))


@register(
    "log_trace_rollup",
    oracle="""
    SELECT event_type AS code, count(*) AS log_trace_counter, max(ts) AS last_date
    FROM events GROUP BY event_type
    """,
    doc="A8 log-trace dedup counter (mpeg2ts/src/mpeg2_sp.c:961-991): collapse "
    "repeated codes to count + latest date.",
    tags=("agg",),
)
def log_trace_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("code")).agg(
        F.count(F.lit(1)).alias("log_trace_counter"),
        F.max("ts").alias("last_date"),
    )


@register(
    "agg_rollup_region_nation",
    oracle=f"""
    SELECT r_name, n_name, count(*) AS n_customers,
           {M.money_sum("c_acctbal")} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="Hierarchical rollup (free-from-Spark-SQL surface, SURVEY §2 'absent in "
    "reference' list): region -> nation -> grand total.",
    tags=("agg", "rollup"),
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    # bounded: nation/region are fixed 25/5-row dims at any SF
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr(M.money_sum("c_acctbal")).alias("sum_acctbal"),
    )


# ---------------------------------------------------------------------------
# Join / lookup surface (SURVEY §2.4 J1-J12 analogs)
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REV} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="Three-way equi-join + agg + top-k (J4/J5 composed-lookup analog, "
    "psi_table.c:213-268). Deterministic tie-break on l_orderkey.",
    tags=("join", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .where((F.col("o_orderdate") < cutoff) & (F.col("l_shipdate") > cutoff))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(_REV).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_REV} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="Five-way join with dim-table pruning (J11 periodic PAT*PMT composition "
    "analog, mpeg2_sp.c:1484-1558): Catalyst broadcast + join reordering.",
    tags=("join",),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        # bounded: nation (25 rows) and the 1-row region slice
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(_REV).alias("revenue"))
    )


@register(
    "left_join_programs_summary",
    oracle="""
    SELECT c_custkey AS program_number,
           coalesce(n_name, '') AS service_name,
           count(o_orderkey)    AS n_orders
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey AND n_regionkey = 0
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY 1, 2
    """,
    doc="J10 programs-summary analog (mpeg2_sp.c:1103-1235): left join with "
    "empty-string default for the missing service name, plus existence count.",
    tags=("join",),
)
def left_join_programs_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(
            # bounded: nation is a fixed 25-row dim at any SF
            F.broadcast(n),
            (c.c_nationkey == n.n_nationkey) & (n.n_regionkey == 0),
            "left",
        )
        .join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(
            F.col("c_custkey").alias("program_number"),
            F.coalesce(F.col("n_name"), F.lit("")).alias("service_name"),
        )
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )


@register(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderstatus = 'O')
    """,
    doc="J10 processor-probe analog (mpeg2_sp.c:1192-1203): existence test as "
    "left-semi join.",
    tags=("join",),
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o.where(F.col("o_orderstatus") == "O"),
        c.c_custkey == o.o_custkey,
        "left_semi",
    ).select("c_custkey", "c_name")


@register(
    "anti_join_idle_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Disassociated-processor purge analog (flag_purge_disassociated_"
    "processors, mpeg2_sp.c:111-132): anti join.",
    tags=("join",),
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "set_intersect_both_status",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Set operations (absent in reference; free from Spark SQL).",
    tags=("setop",),
)
def set_intersect_both_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except_open_only",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus IN ('F', 'P')
    """,
    doc="Set difference (EXCEPT): customers with open orders and nothing "
    "finished or pending — completes the set-op surface next to INTERSECT "
    "(set_intersect_both_status). Spark plans EXCEPT as a left-anti join "
    "after per-side dedup; one shuffle on the key either way.",
    tags=("setop",),
)
def set_except_open_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.where(F.col("o_orderstatus").isin("F", "P")).select("o_custkey")
    return a.subtract(b)  # EXCEPT DISTINCT (exceptAll would keep surplus dups)


@register(
    "topk_orders_by_value",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="Top-k with deterministic tie-break (absent in reference; Spark "
    "TakeOrderedAndProject avoids a global sort).",
    tags=("topk",),
)
def topk_orders_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Ordering / state / versioning surface (SURVEY §2.3 R7, §2.6 T1-T4 analogs)
# ---------------------------------------------------------------------------


@register(
    "cc_continuity_check",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN prev_us IS NOT NULL AND epoch_us(ts) - prev_us > 3600000000
                THEN TRUE ELSE FALSE END AS gap_error
    FROM (
      SELECT event_id, user_id, ts,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    )
    """,
    doc="P6 continuity-counter check (ts_dec.c:98-172): per-key lag() compare; "
    "violations flagged, never reordered (T1, SURVEY §2.6).",
    tags=("window", "state"),
)
def cc_continuity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.when(
            prev.isNotNull() & ((F.unix_micros(F.col("ts")) - prev) > 3_600_000_000),
            F.lit(True),
        )
        .otherwise(F.lit(False))
        .alias("gap_error"),
    )


@register(
    "latest_version_per_key",
    oracle="""
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="R7 current-table register (psi_proc.c:362-390): latest version per key "
    "via row_number over version order.",
    tags=("window", "state"),
)
def latest_version_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@register(
    "dedup_first_event",
    oracle="""
    SELECT user_id, event_type, min(event_id) AS first_event_id
    FROM events GROUP BY user_id, event_type
    """,
    doc="T4 duplicate handling / R7 dropDuplicates analog, expressed "
    "deterministically as min-per-group.",
    tags=("dedup", "state"),
)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id")
    )


# ---------------------------------------------------------------------------
# Parsing / projection surface (SURVEY §2.2 P9 analog)
# ---------------------------------------------------------------------------


@register(
    "json_settings_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
    doc="P9 dual-format settings parse (mpeg2_sp.c:692-826): JSON doc -> typed "
    "column via from_json/get_json_object.",
    tags=("parse",),
)
def json_settings_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k_value"),
    )


@register(
    "querystring_settings_parse",
    oracle="""
    SELECT event_id,
           CAST(props_map['k'][1] AS BIGINT) AS k_value,
           props_map['tag'][1] AS tag
    FROM (
      SELECT event_id,
             map_from_entries(list_transform(
               string_split('k=' || CAST(CAST(json_extract_string(props,'$.k') AS BIGINT) AS VARCHAR) || '&tag=ev' || CAST(event_id % 10 AS VARCHAR), '&'),
               s -> struct_pack(k := string_split(s, '=')[1], v := string_split(s, '=')[2])
             )) AS props_map
      FROM events
    )
    """,
    doc="P9 query-string settings format (format guess at mpeg2_sp.c:716): "
    "str_to_map over a synthesized query string.",
    tags=("parse",),
)
def querystring_settings_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    qs = F.concat(
        F.lit("k="),
        F.get_json_object(F.col("props"), "$.k").cast("bigint").cast("string"),
        F.lit("&tag=ev"),
        (F.col("event_id") % 10).cast("string"),
    )
    m = F.str_to_map(qs, F.lit("&"), F.lit("="))
    return ev.select(
        "event_id",
        m.getItem("k").cast("bigint").alias("k_value"),
        m.getItem("tag").alias("tag"),
    )


@register(
    "sliding_60min_stats",
    oracle=f"""
    WITH g AS (
      SELECT date_trunc('minute', ts) AS slot, event_type,
             count(*) AS n, {M.sum_units("value")} AS vc
      FROM events GROUP BY 1, 2
    )
    SELECT slot, event_type,
           CAST(sum(n) OVER w AS BIGINT)   AS n_window,
           CAST(sum(vc) OVER w AS BIGINT) / cast(100 as double) AS v_window,
           CAST(count(*) OVER w AS BIGINT) AS slots_present
    FROM g
    WINDOW w AS (
      PARTITION BY event_type ORDER BY slot
      RANGE BETWEEN INTERVAL 59 MINUTE PRECEDING AND CURRENT ROW
    )
    """,
    doc="A3-A5 stats ring buffer (60-slot sliding window over 1-slot "
    "resolution, stats/src/stats.c:57-68, stats.h:31; minutes stand in for "
    "seconds on the fixture time axis): tumbling pre-aggregate, then a "
    "range-frame sliding sum — two-level aggregation so the sliding pass "
    "touches slots, not raw events (the at-scale shape).",
    tags=("agg", "window"),
)
def sliding_60min_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    slots = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("slot"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(M.sum_units("value")).alias("vc"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("slot"))
        .rangeBetween(-59 * 60, 0)
    )
    return slots.select(
        "slot",
        "event_type",
        F.sum("n").over(w).alias("n_window"),
        (F.sum("vc").over(w) / F.lit(100.0)).alias("v_window"),
        F.count(F.lit(1)).over(w).alias("slots_present"),
    )


@register(
    "stats_endpoint_json",
    oracle="""
    WITH g AS (
      SELECT event_type, date_trunc('minute', ts) AS slot, count(*) AS n
      FROM events GROUP BY 1, 2
    ), last60 AS (
      SELECT event_type, slot, n,
             row_number() OVER (PARTITION BY event_type ORDER BY slot DESC)
               AS rdesc
      FROM g
    ), idx AS (
      SELECT event_type, n,
             row_number() OVER (PARTITION BY event_type ORDER BY slot ASC) - 1
               AS i
      FROM last60 WHERE rdesc <= 60
    )
    SELECT event_type,
           CAST(count(*) AS INT) AS n_slots,
           '{"code":200,"status":"OK","data":[' ||
           string_agg('[' || i || ',' || n || ']', ',' ORDER BY i) ||
           ']}' AS body
    FROM idx GROUP BY event_type
    """,
    doc="S8 stats endpoints (GET cpu_stats.json / net_stats.json, "
    "main/stream_procs_api_http.c:304-329; serialization "
    "stats/src/stats.c:232-267): the last 60 window slots per series "
    "rendered as the [index, value] JSON pairs the dashboard plots, inside "
    "the {code,status,data} envelope. Two-level: tumbling pre-aggregate, "
    "rank-trim to the ring size, one ordered string fold per series — the "
    "raw events are touched once.",
    tags=("agg", "json"),
)
def stats_endpoint_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("slot")
    ).agg(F.count(F.lit(1)).alias("n"))
    wd = Window.partitionBy("event_type").orderBy(F.col("slot").desc())
    wa = Window.partitionBy("event_type").orderBy(F.col("slot").asc())
    idx = (
        g.withColumn("rdesc", F.row_number().over(wd))
        .where(F.col("rdesc") <= 60)
        .withColumn("i", F.row_number().over(wa) - 1)
    )
    # bounded: the rdesc <= 60 filter above caps each group at 60 slots
    pairs = F.array_sort(F.collect_list(F.struct("i", "n")))
    series = F.array_join(
        F.transform(
            pairs, lambda x: F.concat(F.lit("["), x["i"], F.lit(","), x["n"], F.lit("]"))
        ),
        ",",
    )
    return idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("int").alias("n_slots"),
        F.concat(
            F.lit('{"code":200,"status":"OK","data":['), series, F.lit("]}")
        ).alias("body"),
    )


@register(
    "packet_quarantine_split",
    oracle="""
    SELECT CAST(event_id % 97 = 0 AS BOOLEAN) AS corrupted,
           count(*)                           AS n_packets,
           CAST(sum(CASE WHEN event_id % 97 = 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_parseable
    FROM events GROUP BY 1
    """,
    doc="P3 compliance checks as a quarantine split (ts_dec.c:257-419's "
    "log-and-reject re-expressed as boolean columns + filter): packets with "
    "a corrupted sync byte (every 97th, injected deterministically) are "
    "counted into a side output instead of killing the pipeline — loss is "
    "data, not an error path.",
    tags=("ts", "parse"),
)
def packet_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessors_spark.plans.ts_pipeline import _event_packet_expr
    from streamprocessors_spark.sources import packets_from_binary_column

    ev = _t(spark, sf_dir, "events")
    corrupt = F.when(
        F.col("base_idx") % 97 == 0,
        F.concat(F.unhex(F.lit("00")), F.expr("substring(pkt, 2, 187)")),
    ).otherwise(F.col("pkt"))
    per_event = ev.select(
        F.col("event_id").cast("string").alias("stream_id"),
        F.col("event_id").alias("base_idx"),
        _event_packet_expr().alias("pkt"),
    ).select(
        "stream_id", "base_idx", corrupt.alias("value")
    ).repartition(spark.sparkContext.defaultParallelism)
    pkts = packets_from_binary_column(per_event, index_col="base_idx")
    return pkts.groupBy((~F.col("sync_ok")).alias("corrupted")).agg(
        F.count(F.lit(1)).alias("n_packets"),
        F.sum(F.col("sync_ok").cast("int")).cast("long").alias("n_parseable"),
    )


@register(
    "cube_events_by_type_hour",
    oracle=f"""
    SELECT event_type,
           CAST(extract(hour FROM ts) AS INT) AS hr,
           count(*)            AS n,
           {M.money_sum("value")} AS v,
           CAST(grouping(event_type) AS INT) + 2 * CAST(grouping(extract(hour FROM ts)) AS INT) AS gid
    FROM events
    GROUP BY CUBE (event_type, extract(hour FROM ts))
    """,
    doc="CUBE over (type, hour) with grouping ids — the grouping-sets "
    "surface the reference lacks entirely (SURVEY §2 end-note); partial "
    "aggregation applies per grouping set, one shuffle total.",
    tags=("agg", "cube"),
)
def cube_events_by_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "hr", F.hour("ts").cast("int")
    )
    return (
        ev.cube("event_type", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(M.money_sum("value")).alias("v"),
            (
                F.grouping("event_type").cast("int")
                + 2 * F.grouping("hr").cast("int")
            ).alias("gid"),
        )
        .select("event_type", "hr", "n", "v", "gid")
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {M.money_sum("l_extendedprice * l_discount")} AS revenue,
           count(*)                                      AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate <  TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure filter->scalar-agg — the pushdown showcase. All "
    "four predicates must reach the parquet scan (PushedFilters) so row "
    "groups outside the ship-date year are skipped entirely; the agg is "
    "one map-side partial + a single-row exchange.",
    tags=("agg", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(M.money_sum("l_extendedprice * l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "hypertable_rollup_1h",
    oracle=f"""
    WITH minute_agg AS (
      SELECT date_trunc('minute', ts) AS m, event_type,
             count(*) AS n, {M.sum_units("value")} AS vc
      FROM events GROUP BY 1, 2
    )
    SELECT date_trunc('hour', m) AS hour_start,
           event_type,
           CAST(sum(n) AS BIGINT)   AS n_events,
           CAST(sum(vc) AS BIGINT) / cast(100 as double) AS sum_value,
           count(*)                 AS n_active_minutes
    FROM minute_agg GROUP BY 1, 2
    """,
    doc="Hypertable-style continuous-aggregate rollup: the hourly table is "
    "computed FROM the 1-minute aggregate, not from raw events — the "
    "timescale pattern where coarse resolutions re-aggregate fine partials. "
    "In Spark both levels collapse into one shuffle: the minute agg's "
    "partials combine map-side, and the hour agg re-keys the (already "
    "tiny) minute rows; n_active_minutes is only expressible from the "
    "fine level.",
    tags=("agg", "rollup", "timeseries"),
)
def hypertable_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("m"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(M.sum_units("value")).alias("vc"),
    )
    return minute.groupBy(
        F.date_trunc("hour", "m").alias("hour_start"), "event_type"
    ).agg(
        F.sum("n").alias("n_events"),
        F.expr("cast(sum(vc) as bigint) / cast(100 as double)").alias("sum_value"),
        F.count(F.lit(1)).alias("n_active_minutes"),
    )


# KMV sketch size; estimate = (K-1) * 2^60 / h_K over 60-bit md5 hashes.
_KMV_K = 32
_KMV_M = 1 << 60


@register(
    "approx_distinct_kmv",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
               AS hv
      FROM events
    ),
    k AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}),
    s AS (SELECT max(hv) AS hk, count(*) AS nk FROM k),
    t AS (SELECT count(*) AS n_exact FROM h)
    SELECT CASE WHEN s.nk < {_KMV_K} THEN t.n_exact
                ELSE CAST(FLOOR(({_KMV_K} - 1.0) * {_KMV_M} / s.hk) AS BIGINT)
           END AS est_distinct,
           t.n_exact AS n_exact
    FROM s, t
    """,
    doc="Approximate distinct count as a deterministic KMV (k minimum "
    "values) sketch — unlike HLL the estimator is a pure function of the "
    "data, so it hash-matches across engines. Hash = first 60 bits of "
    "md5 (shared dialect helper); estimate (K-1)*2^60/h_K. At 100 TB the "
    "k-smallest pass is a TakeOrdered (no full shuffle) and sketches "
    "merge by union+re-truncate — mergeable partials like any agg.",
    tags=("agg", "approx", "sketch"),
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessors_spark.functions import dialect as D
    from streamprocessors_spark.functions.dialect import SPARK

    ev = _t(spark, sf_dir, "events")
    h = ev.selectExpr(
        f"{D.md5int(SPARK, 'cast(user_id as string)')} as hv"
    ).distinct()
    k = h.orderBy("hv").limit(_KMV_K)
    s = k.agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("nk"))
    t = h.agg(F.count(F.lit(1)).alias("n_exact"))
    return s.crossJoin(t).select(
        F.when(F.col("nk") < _KMV_K, F.col("n_exact"))
        .otherwise(
            F.floor((_KMV_K - 1.0) * _KMV_M / F.col("hk")).cast("bigint")
        )
        .alias("est_distinct"),
        "n_exact",
    )


# HyperLogLog (Flajolet et al. '07) with every step INTEGER-exact so the
# estimate is a deterministic pure function of the data (the classic
# float formulation is not ulp-stable across engines):
#  - bucket = top 8 of the 60-bit md5 hash; register word = low 20 bits
#  - rho = leading zeros in the 20-bit word + 1 = 21 - bit_length(w)
#    (bit_length via length(bin(w)) — exact in both engines)
#  - the harmonic sum is scaled by 2^21: every 2^-M_j becomes the exact
#    BIGINT 2^(21-M_j), so the sum is exact and order-independent
#  - alpha_256 * m^2 is the exact rational floor
#    (7213*256000*m^2*1000) // (10000*257079), a compile-time constant
# Raw estimator only (no ln-based linear-counting branch — ln is the
# very thing being avoided); valid in the n >> 2.5m regime every fixture
# SF exercises.
_HLL_M = 256
_HLL_W = 20
_HLL_BUCKET_DIV = 1 << 52
_HLL_ALPHA_M2_X1000 = (7213 * 256000 * _HLL_M * _HLL_M * 1000) // (
    10000 * 257079
)
_HLL_EST_NUM = _HLL_ALPHA_M2_X1000 << (_HLL_W + 1)


@register(
    "approx_distinct_hll",
    oracle=f"""
    WITH h AS (
      SELECT ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT AS hv
      FROM events
    ),
    b AS (SELECT hv // {_HLL_BUCKET_DIV} AS bucket,
                 hv % {1 << _HLL_W} AS w FROM h),
    r AS (SELECT bucket,
                 max(CASE WHEN w = 0 THEN {_HLL_W + 1}
                          ELSE {_HLL_W + 1} - length(bin(w)) END) AS m_reg
          FROM b GROUP BY bucket),
    a AS (SELECT unnest(range(0, {_HLL_M})) AS bucket),
    f AS (SELECT a.bucket, coalesce(r.m_reg, 0) AS m_reg
          FROM a LEFT JOIN r USING (bucket))
    SELECT CAST({_HLL_EST_NUM} // sum(1::BIGINT << ({_HLL_W + 1} - m_reg))
                AS BIGINT) AS est_distinct_x1000,
           CAST(sum(CASE WHEN m_reg > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonempty_buckets
    FROM f
    """,
    doc="Approximate distinct count as an integer-exact HyperLogLog (see "
    "block comment): KMV's mergeable-sketch sibling with O(m) state "
    "instead of O(k) but the same determinism guarantee, so it "
    "hash-matches across engines. Scale shape: the register build is a "
    "map-side partial max over 256 groups — each task reduces to <= 256 "
    "rows before a 256-row exchange; registers merge by element-wise "
    "max, the textbook distributed-sketch combine.",
    tags=("agg", "approx", "sketch"),
)
def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessors_spark.functions import dialect as D
    from streamprocessors_spark.functions.dialect import SPARK

    ev = _t(spark, sf_dir, "events")
    regs = hll_registers(
        ev.selectExpr(
            f"{D.md5int(SPARK, 'cast(event_id as string)')} as hv"
        )
    )
    return hll_estimate(regs)


def hll_rhos(hashed: DataFrame) -> DataFrame:
    """(bucket, rho) projection from a 60-bit `hv` hash column — pure
    JVM, shared by the batch register build and the streaming twin."""
    return hashed.selectExpr(
        f"hv div {_HLL_BUCKET_DIV} as bucket",
        f"hv % {1 << _HLL_W} as w",
    ).selectExpr(
        "bucket",
        f"cast(case when w = 0 then {_HLL_W + 1} "
        f"else {_HLL_W + 1} - length(bin(w)) end as bigint) as rho",
    )


def hll_registers(hashed: DataFrame) -> DataFrame:
    """(bucket, m_reg) max-registers from a 60-bit `hv` hash column."""
    return hll_rhos(hashed).groupBy("bucket").agg(F.max("rho").alias("m_reg"))


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Fold (bucket, m_reg) registers into the scaled-integer estimate."""
    spark = regs.sparkSession
    allb = spark.range(0, _HLL_M).withColumnRenamed("id", "bucket")
    filled = allb.join(regs, "bucket", "left").selectExpr(
        "bucket", "coalesce(m_reg, 0) as m_reg"
    )
    return filled.agg(
        F.expr(
            f"cast({_HLL_EST_NUM} div "
            f"sum(shiftleft(cast(1 as bigint), {_HLL_W + 1} - m_reg)) "
            "as bigint)"
        ).alias("est_distinct_x1000"),
        F.expr(
            "cast(sum(case when m_reg > 0 then 1 else 0 end) as bigint)"
        ).alias("n_nonempty_buckets"),
    )


@register(
    "order_priority_quartiles",
    oracle="""
    SELECT o_orderpriority, q,
           count(*)              AS n_orders,
           min(o_totalprice)     AS min_price,
           max(o_totalprice)     AS max_price
    FROM (
      SELECT o_orderpriority, o_totalprice,
             ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS q
      FROM orders
    )
    GROUP BY 1, 2
    """,
    doc="Ranking-family coverage beyond row_number/lag: ntile(4) buckets "
    "each priority class into price quartiles (unique-key tiebreak keeps "
    "bucket boundaries deterministic), then per-bucket min/max — the "
    "classic distribution-summary query. One shuffle on the partition "
    "key; the aggregate reuses the window's clustering.",
    tags=("window", "rank"),
)
def order_priority_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_orderpriority", "o_totalprice", F.ntile(4).over(w).alias("q"))
        .groupBy("o_orderpriority", "q")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "pivot_events_by_type",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events GROUP BY user_id
    """,
    doc="Pivot (long->wide): per-user event counts spread over one column "
    "per type. With the pivot values enumerated up front Spark compiles "
    "this to a single-shuffle hash aggregate of conditional counts — same "
    "plan as the FILTER-clause formulation, no second pass to discover "
    "the distinct keys.",
    tags=("agg", "pivot"),
)
def pivot_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL where a (user, type) pair never occurred; the
    # FILTER-clause oracle counts 0 there.
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


@register(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderpriority,
           median(o_totalprice)                               AS median_price,
           quantile_cont(o_totalprice, 0.9)                   AS p90_price,
           count(*)                                           AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact percentiles (interpolated): median and p90 of order value "
    "per priority class. Spark's percentile() and DuckDB's quantile_cont "
    "share the linear-interpolation definition, so exact equality holds. "
    "At 100 TB swap in approx_percentile (t-digest) and a tolerance gate; "
    "the exact form is the oracle-friendly variant.",
    tags=("agg", "percentile"),
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "histogram_event_values",
    oracle="""
    SELECT CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 1000 THEN 21
                     ELSE FLOOR(value / 50.0) + 1 END AS BIGINT) AS bucket,
           count(*)                          AS n,
           min(value)                        AS lo,
           max(value)                        AS hi
    FROM events GROUP BY 1
    """,
    doc="Equi-width histogram via width_bucket over the event value "
    "distribution (20 buckets on [0,1000], out-of-range values land in "
    "the 0/21 overflow buckets per the SQL spec). DuckDB has no "
    "width_bucket, so the oracle spells out the same floor arithmetic. "
    "Single-shuffle aggregate; the bucket expression stays in "
    "whole-stage codegen.",
    tags=("agg", "histogram"),
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.width_bucket("value", F.lit(0), F.lit(1000), F.lit(20)).alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


_FMT_CHECK_COLS = """count(*) AS n_rows,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(n_chars) AS BIGINT) AS nchar_sum"""


@register(
    "source_format_roundtrip",
    oracle=f"""
    SELECT 'csv' AS fmt, {_FMT_CHECK_COLS},
           CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000003)
                AS BIGINT) AS text_sum
    FROM documents
    UNION ALL
    SELECT 'jsonl', {_FMT_CHECK_COLS},
           CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000003)
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'parquet', {_FMT_CHECK_COLS},
           CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000003)
                AS BIGINT)
    FROM documents
    """,
    doc="Source/sink format surface: the documents table round-trips "
    "through JSON-lines and CSV (write to a scratch dir, read back with "
    "an explicit schema — the crawl-pipeline interchange formats next "
    "to the parquet the fixtures use), and each format's resurrected "
    "rows must reproduce the SAME row count, id/char sums and text "
    "md5-checksum as the original parquet (emitted as the control row). "
    "A quoting/escaping/encoding bug in either writer or reader breaks "
    "the checksum, so the oracle gate covers the full encode+decode "
    "path, not just row counts. Scratch output goes to a per-call temp "
    "dir; at scale this is the standard parquet<->JSONL shard "
    "conversion step.",
    tags=("source", "format"),
)
def source_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    schema = "doc_id bigint, text string, lang string, n_chars bigint"
    # The readers below are lazy; returning a plan over the scratch dir
    # would force the cleanup to leak (the ADVICE r8 finding: one
    # corpus-sized /tmp dir per invocation). Instead force the THREE
    # per-format aggregate rows here (a bounded control-plane collect),
    # remove the scratch dir in finally, and serve the verdict rows as
    # a VALUES literal — the full encode+decode path still executes.
    base = tempfile.mkdtemp(prefix="spgraft_fmt_")
    try:
        docs.write.mode("overwrite").json(f"{base}/jsonl")
        (
            docs.write.mode("overwrite")
            .option("header", True)
            .option("quote", '"')
            .option("escape", '"')
            .csv(f"{base}/csv")
        )
        back = {
            "jsonl": spark.read.schema(schema).json(f"{base}/jsonl"),
            # multiLine + RFC-4180 quote-doubling escape: a text cell
            # with an embedded newline is written quoted and must parse
            # back as ONE row, not break the gate on multi-line corpora
            "csv": spark.read.schema(schema)
            .option("header", True)
            .option("multiLine", True)
            .option("quote", '"')
            .option("escape", '"')
            .csv(f"{base}/csv"),
            "parquet": docs,
        }
        verdicts = []
        for fmt in ["csv", "jsonl", "parquet"]:
            row = back[fmt].selectExpr(f"'{fmt}' as fmt", "*").groupBy(
                "fmt"
            ).agg(
                F.expr("count(*)").alias("n_rows"),
                F.expr("cast(sum(doc_id) as bigint)").alias("id_sum"),
                F.expr("cast(sum(n_chars) as bigint)").alias("nchar_sum"),
                F.expr(
                    "cast(sum(cast(conv(substr(md5(text),1,15),16,10) as"
                    " bigint) % 1000003) as bigint)"
                ).alias("text_sum"),
            )
            # control-plane collect: exactly one verdict row per format
            r = row.collect()[0]
            verdicts.append(
                (r.fmt, r.n_rows, r.id_sum, r.nchar_sum, r.text_sum)
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    rows = ", ".join(
        f"('{fmt}', CAST({n} AS BIGINT), CAST({i} AS BIGINT),"
        f" CAST({c} AS BIGINT), CAST({t} AS BIGINT))"
        for fmt, n, i, c, t in verdicts
    )
    return spark.sql(
        "SELECT col1 AS fmt, col2 AS n_rows, col3 AS id_sum,"
        f" col4 AS nchar_sum, col5 AS text_sum FROM (VALUES {rows})"
    )
