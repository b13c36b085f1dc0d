"""TPC-H-adapted decision-support queries over the fixture tables.

The reference engine has no SQL surface at all (SURVEY.md §2 end note:
sorts/limits, set ops, subqueries are "deliberately absent" — our engine
gets them from Spark SQL). This module pins the classic decision-support
shapes the reference *cannot* express, adapted to the driver's fixture
schema (no partsupp/commitdate/phone columns, so predicates are re-derived
from the columns that exist):

- existential semi-join with a non-equi correlated predicate (Q4 shape)
- multi-way fact/dim join with group + top-k (Q10 shape)
- outer join with join-condition filter + aggregate-of-aggregate (Q13)
- conditional-aggregate ratio over a broadcast dim join (Q14 shape)
- correlated scalar aggregate subquery, decorrelated (Q17 shape)
- HAVING-subquery join-back (Q18 shape)
- scalar-subquery threshold + anti join (Q22 shape)

Scale notes (100 TB): every dim side (part, customer at SF-proportional
size) is broadcast; the fact-side aggregates are plain groupBy so
map-side partial aggregation applies; Q17's correlated subquery is
decorrelated into a per-key aggregate joined back on the *already
brand-filtered* lineitem subset (partkey functionally determines brand,
so filtering before the aggregate is semantics-preserving and cuts the
shuffle from full-table to the filtered slice); top-k orders by the
quantized measure + unique-key tiebreak (cross-engine determinism).

Float parity: quantities are integer-valued doubles (exact sums, any
order); money sums are floor-quantized via the same floor(x*10^n)/10^n
form both engines evaluate bit-identically (functions/dialect.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocessors_spark.plans.registry import register
from streamprocessors_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _fr(col: Column, decimals: int) -> Column:
    """floor-quantize a double: bit-identical in Spark and DuckDB (unlike
    round(); see functions/dialect.py::floor_round)."""
    scale = 10**decimals
    return F.floor(col * scale) / F.lit(float(scale))


@register(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="Q4 shape: orders with at least one late shipment (>60 days after "
    "order date), counted per priority. The EXISTS becomes a LEFT SEMI join "
    "with a non-equi conjunct — one shuffle on orderkey, dedup handled by "
    "the semi join itself (no DISTINCT pass). The reference can only filter "
    "per-record (psi_table.c:151-211 lookups); existential quantification "
    "over a child table is new surface.",
    tags=("join", "semi", "subquery"),
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q10_returned_item_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           floor(sum(l_extendedprice * (1 - l_discount)) * 100) / 100 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="Q10 shape: top-20 customers by lost revenue from returned items in "
    "one quarter. Fact-to-fact join (orders⋈lineitem) shuffles on orderkey; "
    "customer and nation ride broadcast hash joins; top-k is TakeOrdered "
    "(no global sort). Ordering key is the floor-quantized revenue + "
    "custkey tiebreak so both engines pick the identical 20 rows.",
    tags=("join", "topk", "agg"),
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _fr(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="Q13 shape: distribution of non-urgent order counts per customer. "
    "The filter lives in the OUTER JOIN condition (not WHERE — customers "
    "with only urgent orders must survive with count 0), then a second "
    "aggregate over the first. Two shuffles total: custkey, then c_count; "
    "count(o_orderkey) counts only matched rows per SQL null semantics.",
    tags=("join", "outer", "agg"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT floor(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)) * 10000) / 10000
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
    doc="Q14 shape: percentage of one month's revenue from PROMO parts. "
    "part is a broadcast dim (no shuffle at any scale: lineitem streams "
    "through map-side join + partial agg to a single row). The ratio of "
    "two same-order sums is quantized to 4 places for cross-engine float "
    "parity.",
    tags=("join", "agg", "broadcast"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(_fr(F.lit(100.0) * F.sum(promo) / F.sum(disc), 4).alias("promo_revenue_pct"))
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT floor(sum(l_extendedprice) / 7.0 * 100) / 100 AS avg_yearly
    FROM lineitem l JOIN part p ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="Q17 shape: revenue from unusually-small orders of one brand's "
    "parts. The correlated scalar subquery decorrelates into a per-partkey "
    "avg joined back; because partkey determines brand, the brand filter "
    "is applied BEFORE the aggregate (identical per-key avg, shuffle over "
    "the ~1/25 filtered slice instead of the full fact table). Quantities "
    "are integer-valued doubles, so the 0.2*avg threshold is exact in both "
    "engines.",
    tags=("join", "subquery", "agg"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    small = li.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("a_partkey")
    ).where(F.col("l_quantity") < F.col("qty_threshold"))
    return small.agg(_fr(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    doc="Q18 shape: orders whose total quantity exceeds 150, joined back to "
    "orders+customer. The HAVING subquery is a groupBy + filter whose "
    "output (~0.5% of orders) then drives the joins — at scale the "
    "aggregate side shrinks enough that AQE converts the orders join to "
    "broadcast at runtime. Quantity sums are exact (integer-valued "
    "doubles), so the >150 cut is deterministic.",
    tags=("join", "agg", "having"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH thresh AS (
      SELECT floor(avg(c_acctbal) * 100) / 100 AS t
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           count(*) AS n_cust,
           floor(sum(c_acctbal) * 100) / 100 AS total_bal
    FROM customer, thresh
    WHERE c_acctbal > t
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
    doc="Q22 shape: above-average-balance customers with no recent orders "
    "(the fixture has no fully-orderless customers, so 'idle' = no order "
    "since 2000). The scalar avg subquery is a 1-row broadcast cross join; "
    "NOT EXISTS is a LEFT ANTI join against date-filtered orders. The "
    "threshold is floor-quantized to 2 places so last-ulp avg differences "
    "between engines cannot flip a boundary row.",
    tags=("join", "anti", "subquery"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thresh = c.where(F.col("c_acctbal") > 0).agg(
        _fr(F.avg("c_acctbal"), 2).alias("t")
    )
    rich = c.join(F.broadcast(thresh)).where(F.col("c_acctbal") > F.col("t"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        _fr(F.sum("c_acctbal"), 2).alias("total_bal"),
    )
