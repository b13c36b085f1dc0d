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
order); money aggregates are EXACT — each row quantizes to integer cents
first (bit-identical per-row in both engines), the BIGINT sum is
order-independent, and every derived double is computed from those
identical bigints with identical expression text (functions/money.py).
The earlier floor(sum(double)) form was order-DEPENDENT: a last-ulp sum
difference between engines flipped a full cent on q22 in round 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocessors_spark.functions import money as M
from streamprocessors_spark.plans.registry import register
from streamprocessors_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# Shared fragment: exact-cents revenue sum emitted as dollars (double).
_REV = M.money_sum("l_extendedprice * (1 - l_discount)")


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
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {_REV} AS revenue
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
    "(no global sort). Ordering key is the exact-cents revenue + custkey "
    "tiebreak so both engines pick the identical 20 rows.",
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
        # customer scales with SF — unhinted, AQE picks at runtime
        .join(c, o.o_custkey == c.c_custkey)
        # bounded: nation is a fixed 25-row dim at any SF
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(_REV).alias("revenue"))
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


_Q14_PROMO = (
    "cast(sum(case when p_type = 'PROMO' then "
    + M.units("l_extendedprice * (1 - l_discount)")
    + " else 0 end) as bigint)"
)
_Q14_PCT = M.ratio_quant(
    _Q14_PROMO, M.sum_units("l_extendedprice * (1 - l_discount)"), 4, pct=True
)


@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT {_Q14_PCT} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
    doc="Q14 shape: percentage of one month's revenue from PROMO parts. "
    "part is a broadcast dim (no shuffle at any scale: lineitem streams "
    "through map-side join + partial agg to a single row). The ratio runs "
    "over two exact-cents BIGINT sums, then floor-quantizes to 4 places — "
    "bit-identical across engines by construction.",
    tags=("join", "agg", "broadcast"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    return (
        # part scales with SF — unhinted, AQE picks at runtime
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(F.expr(_Q14_PCT).alias("promo_revenue_pct"))
    )


_Q17_AVG_YEARLY = (
    f"floor({M.sum_units('l_extendedprice')} / cast(7 as double))"
    " / cast(100 as double)"
)


@register(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT {_Q17_AVG_YEARLY} AS avg_yearly
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
    # the brand slice of part still scales with SF — unhinted
    li = _t(spark, sf_dir, "lineitem").join(
        p, F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    # per_part is one row per brand part — scales with SF, unhinted
    small = li.join(
        per_part, F.col("l_partkey") == F.col("a_partkey")
    ).where(F.col("l_quantity") < F.col("qty_threshold"))
    return small.agg(F.expr(_Q17_AVG_YEARLY).alias("avg_yearly"))


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
        # customer scales with SF — unhinted
        .join(c, c.c_custkey == o.o_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


_Q22_T = M.avg_quant(M.sum_units("c_acctbal"), 2)
_Q22_BAL = M.sum_units("c_acctbal")


@register(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH thresh AS (
      SELECT {_Q22_T} AS t
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           count(*) AS n_cust,
           {_Q22_BAL} AS total_bal_cents
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
    "NOT EXISTS is a LEFT ANTI join against date-filtered orders. Money is "
    "aggregated as exact integer cents (round-2 driver red row: the old "
    "floor(sum(double)) flipped a cent on an engine-order ulp difference); "
    "the threshold is a floor-quantized ratio of exact bigints and the "
    "balance total is emitted AS cents (BIGINT) so no float formatting is "
    "involved at all.",
    tags=("join", "anti", "subquery"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thresh = c.where(F.col("c_acctbal") > 0).agg(F.expr(_Q22_T).alias("t"))
    # bounded: thresh is a single-row global aggregate
    rich = c.join(F.broadcast(thresh)).where(F.col("c_acctbal") > F.col("t"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.expr(_Q22_BAL).alias("total_bal_cents"),
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {M.money_sum("volume")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
          OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="Q7 shape: bilateral trade volume between two nations per ship "
    "year. Both nation filters are applied to the DIM sides first "
    "(supplier⋈nation, customer⋈nation shrink to ~1/12 each) and broadcast, "
    "so lineitem is cut by the supplier filter BEFORE its one shuffle onto "
    "orderkey — the disjunctive nation-pair predicate then only runs on "
    "survivors. The reference's only cross-table composition is the "
    "PAT⋈PMT⋈SDT chain (psi_table.c:213-268); a 6-table snowflake with a "
    "disjunctive cross-branch predicate is new surface.",
    tags=("join", "agg", "broadcast"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").where(F.col("n_name").isin("NATION_9", "NATION_6"))
    s = (
        _t(spark, sf_dir, "supplier")
        # bounded: nation filtered to the 2 named rows
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        # bounded: nation filtered to the 2 named rows
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    joined = (
        # supplier/customer slices scale with SF — unhinted
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_6"))
            | ((F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_9"))
        )
    )
    return (
        joined.withColumn(
            "volume", F.col("l_extendedprice") * (1 - F.col("l_discount"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.expr(M.money_sum("volume")).alias("revenue"))
    )


_Q8_NUM = (
    "cast(sum(case when nation = 'NATION_9' then "
    + M.units("volume")
    + " else 0 end) as bigint)"
)
_Q8_SHARE = M.ratio_quant(_Q8_NUM, M.sum_units("volume"), 4)


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {_Q8_SHARE} AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
        AND p_type = 'MEDIUM'
    ) all_nations
    GROUP BY o_year
    """,
    doc="Q8 shape: one supplier nation's share of an entire region's "
    "market for one part type, per order year. The 8-table snowflake "
    "collapses to lineitem + orders with every dim broadcast: the "
    "p_type filter cuts lineitem ~1/6 before its orderkey shuffle, the "
    "region filter cuts customers ~1/5 behind the orders join, and the "
    "share is a conditional-sum ratio (no second pass) over exact-cents "
    "bigints, floor-quantized to 4 places for float parity.",
    tags=("join", "agg", "broadcast"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "MEDIUM")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            # bounded: nation x (1-row region) <= 25 rows
            F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        # bounded: nation is a fixed 25-row dim at any SF
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        # part/supplier/customer slices scale with SF — unhinted
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    return joined.groupBy("o_year").agg(F.expr(_Q8_SHARE).alias("mkt_share"))


@register(
    "q12_late_line_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    """,
    doc="Q12 shape (adapted: the fixture has no l_shipmode/commitdate, so "
    "the grouping is l_returnflag and 'late' = shipped >30 days after "
    "order): per flag, how many late lines came from critical- vs "
    "normal-priority orders — the classic conditional-count pivot pair. "
    "The non-equi ship-lag predicate rides the orderkey equi-join; counts "
    "are integers, exact in any order. One shuffle.",
    tags=("join", "agg", "conditional"),
)
def q12_late_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {M.sum_units("l_extendedprice * (1 - l_discount)")} AS rc
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rc / cast(100 as double) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE rc = (SELECT max(rc) FROM revenue)
    """,
    doc="Q15 shape: the supplier(s) with maximum quarterly revenue — a "
    "scalar MAX subquery over a reused aggregate view. The per-supplier "
    "aggregate materializes ONCE behind a repartition Exchange and is "
    "consumed by both the max() branch (1-row broadcast) and the equality "
    "filter (AQE ReusedExchange; see spark-perf memory). Equality compares "
    "exact BIGINT cents, identical in both engines, so ties surface "
    "identically.",
    tags=("join", "subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.expr(M.sum_units("l_extendedprice * (1 - l_discount)")).alias("rc")
        )
        .repartition(8, "supplier_no")
    )
    mx = revenue.agg(F.max("rc").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        # bounded: mx is a single-row global max
        revenue.join(F.broadcast(mx))
        .where(F.col("rc") == F.col("mx"))
        # supplier scales with SF — unhinted
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.expr("rc / cast(100 as double)").alias("total_revenue"),
        )
    )


@register(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT {_REV} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND ((p_brand = 'Brand#4'  AND l_quantity BETWEEN 1  AND 11)
        OR (p_brand = 'Brand#19' AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#17' AND l_quantity BETWEEN 20 AND 30))
    """,
    doc="Q19 shape (adapted: p_size is constant and there is no "
    "p_container, so the brackets pair brand with quantity bands): revenue "
    "matching a disjunction of conjunctive brackets across BOTH join "
    "sides. The shared l_shipdate range is kept OUT of the OR so it "
    "pushes to the parquet scan (PushedFilters); the cross-side brackets "
    "evaluate after the broadcast hash join of part. Single map-side "
    "pass, no shuffle beyond the final 1-row agg.",
    tags=("join", "broadcast", "predicate"),
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    brackets = (
        ((F.col("p_brand") == "Brand#4") & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#19") & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#17") & qty.between(20, 30))
    )
    return (
        # part scales with SF — unhinted
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .where(brackets)
        .agg(F.expr(_REV).alias("revenue"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_9'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                        ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="Q21 shape (adapted: no receipt/commit dates, so 'kept waiting' = "
    "shipped >60 days after order): suppliers from one nation who were "
    "the SOLE late supplier on a multi-supplier finished order. Instead "
    "of the textbook EXISTS + NOT EXISTS pair (two extra self-joins of "
    "the fact table), the Spark plan derives per-order supplier/late "
    "counts in ONE aggregate over the already-joined rows — "
    "count(distinct suppkey) > 1 encodes the EXISTS, "
    "count(distinct late suppkey) = 1 the NOT EXISTS — so lineitem "
    "shuffles once on orderkey and the aggregate reuses that "
    "partitioning (no second Exchange). Deterministic top-10 by "
    "(numwait desc, s_name).",
    tags=("join", "semi", "anti", "agg", "topk"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    cand = (
        lo.where(F.col("late"))
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    s = _t(spark, sf_dir, "supplier").join(
        # bounded: nation filtered to 1 named row
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        # the nation slice of supplier still scales with SF — unhinted
        cand.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           {M.money_sum(
               "l_extendedprice * (1 - l_discount)"
               " - p_retailprice * l_quantity"
           )} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    doc="Q9 shape (product-type profit by nation and year), adapted to "
    "the fixture schema: no partsupp table exists, so supply cost is "
    "stood in by p_retailprice * quantity (documented adaptation — the "
    "JOIN TOPOLOGY is Q9's: a 5-way star over two fact-side keys, "
    "lineitem joining part AND supplier AND, through supplier, nation, "
    "plus orders for the year). Only the fixed 25-row nation dim is "
    "hint-broadcast; part/supplier scale with SF so AQE decides their "
    "strategy at runtime; the fact-side aggregate "
    "is one map-side-combined groupBy(nation, year); profit rows "
    "quantize to exact cents before the BIGINT sum (functions/money.py "
    "— order-independent, cross-engine bit-identical).",
    tags=("join", "agg", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # part and supplier scale with SF (200k x SF / 10k x SF rows), so no
    # forced broadcast: AQE picks broadcast at small runtime sizes and
    # falls back to shuffle-hash when the dims outgrow the budget.
    pt = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    sup = _t(spark, sf_dir, "supplier")
    # bounded: nation is a fixed 25-row table at every SF
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    orders = _t(spark, sf_dir, "orders")
    profit = (
        "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity"
    )
    return (
        li.join(pt, F.col("p_partkey") == F.col("l_partkey"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(nat, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.expr("cast(year(o_orderdate) as int)").alias("o_year"),
        )
        .agg(F.expr(M.money_sum(profit)).alias("sum_profit"))
    )
