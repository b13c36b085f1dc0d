"""Data-quality profiling + corpus statistics (beyond-reference family).

The reference validates its input inline (compliance checks inside the TS
decoders, `mpeg2ts/src/ts_dec.c:303-367`, `psi_dec.c:165-193`) but has no
standalone profiling surface. A 100 TB training-data pipeline needs one:
column profiles, referential-integrity checks, and corpus-level term
statistics are the first queries run against any new data drop. All are
single-pass or two-shuffle plans with map-side partial aggregation — the
shapes that survive a 1000-executor scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamprocessors_spark.functions import dialect as D
from streamprocessors_spark.functions.dialect import DUCK, SPARK
from streamprocessors_spark.plans.registry import register
from streamprocessors_spark.session import read_table

# Numeric lineitem columns profiled by dq_numeric_profile (fixture schema).
_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

TFIDF_TOPK = 3
BIGRAM_TOPK = 20


@register(
    "dq_numeric_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               count({c})::BIGINT                 AS n_val,
               (count(*) - count({c}))::BIGINT    AS n_null,
               min({c})::DOUBLE                   AS min_v,
               max({c})::DOUBLE                   AS max_v,
               {D.floor_round(DUCK, f"avg({c})", 6)} AS avg_v
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    doc="Column profiling (count / nulls / min / max / mean) for every "
    "numeric lineitem column in ONE scan: a single partial-aggregating "
    "pass computes all 4x5 statistics, then stack() unpivots the 1-row "
    "result to long form. At 100 TB this is the cheapest possible shape — "
    "no shuffle of data rows at all, only the 1-row aggregate.",
    tags=("dq", "profile"),
)
def dq_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}__null"),
            F.min(F.col(c)).cast("double").alias(f"{c}__min"),
            F.max(F.col(c)).cast("double").alias(f"{c}__max"),
            F.expr(D.floor_round(SPARK, f"avg({c})", 6)).alias(f"{c}__avg"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__null, {c}__min, {c}__max, {c}__avg"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "as (col_name, n_val, n_null, min_v, max_v, avg_v)"
    )


@register(
    "dq_referential_orphans",
    oracle="""
    SELECT e.event_type,
           count(*)                 AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           count(*) FILTER (WHERE c.c_custkey IS NULL) AS n_orphans
    FROM events e
    LEFT JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1
    """,
    doc="Referential-integrity audit per event_type: total events, distinct "
    "users, and events whose user_id has no customer row (orphans). Plan: "
    "broadcast LEFT OUTER join against the dim (small build side) + one "
    "partial-agg groupBy — the fact table is scanned once and only the "
    "per-type aggregate is shuffled. On clean fixtures n_orphans is 0 per "
    "row, but the totals keep the gate non-trivial.",
    tags=("dq", "join"),
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.lit(1).alias("_hit")
    )
    # No forced broadcast: customer scales with the SF (not a fixed dim), so
    # the join strategy is left to AQE / autoBroadcastJoinThreshold — at
    # 100 TB a forced-broadcast build side would OOM executors.
    return (
        ev.join(cust, "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.when(F.col("_hit").isNull(), 1)).alias("n_orphans"),
        )
    )


def _tfidf_ctes(d: str, table: str = "documents") -> str:
    """Shared CTE text: tokens -> tf -> df -> N (dialect-parametric)."""
    ws = D.words(d)
    unnest = "explode" if d == SPARK else "unnest"
    return f"""
    tok AS (SELECT doc_id, {unnest}({ws}) AS term FROM {table}),
    tf AS (SELECT doc_id, term, cast(count(*) as BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, cast(count(*) as BIGINT) AS df
           FROM tf GROUP BY term),
    n AS (SELECT cast(count(*) as DOUBLE) AS n_docs FROM {table})
    """


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH {_tfidf_ctes(DUCK)},
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             {D.floor_round(DUCK, "tf.tf * ln(n.n_docs / df.df)", 6)} AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {TFIDF_TOPK}
    """,
    doc=f"TF-IDF keyword extraction: top-{TFIDF_TOPK} terms per document by "
    "tf * ln(N/df). Two partial-aggregating shuffles (tf keyed on doc, df "
    "keyed on term), the doc-count joined in as a broadcast scalar, and a "
    "per-doc row_number window that reuses the tf shuffle's partitioning. "
    "Scores are floor-quantized to 6 decimals so the ordering (and the "
    "oracle hash) is engine-independent; ties break on term ASC.",
    tags=("text", "corpus"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # unique view name: plan functions must not clobber the session-level
    # `documents` view registered by load_tables
    docs.createOrReplaceTempView("sp_tfidf_documents")
    scored = spark.sql(
        f"""
        WITH {_tfidf_ctes(SPARK, table="sp_tfidf_documents")}
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               {D.floor_round(SPARK, "tf.tf * ln(n.n_docs / df.df)", 6)} AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
        """
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


@register(
    "bigram_corpus_topk",
    oracle=f"""
    WITH w AS (SELECT {D.words(DUCK)} AS ws FROM documents),
    b AS (
      SELECT unnest(list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM w WHERE len(ws) >= 2
    )
    SELECT bigram, count(*) AS n
    FROM b GROUP BY 1
    ORDER BY n DESC, bigram ASC
    LIMIT {BIGRAM_TOPK}
    """,
    doc=f"Corpus-wide top-{BIGRAM_TOPK} word bigrams. The explode fans each "
    "document into ~tokens rows, but the following count(*) groupBy does "
    "map-side partial aggregation, so the shuffle carries only distinct "
    "bigrams per task — the vocabulary, not the corpus. The global top-k "
    "is TakeOrdered over the aggregate (no full sort). Deterministic "
    "boundary: ties at rank 20 break on bigram ASC.",
    tags=("text", "corpus", "topk"),
)
def bigram_corpus_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    ws = D.words(SPARK)
    bigrams = (
        docs.selectExpr(f"{ws} as ws")
        .where(F.expr("size(ws) >= 2"))
        # explode_outer + not-null: plain explode would infer a size()>0
        # filter pushed below the ws projection, re-inlining the
        # tokenization per element inside the transform lambda (see
        # llm_ops.decontaminate_ngram_overlap). The null-filter sits ABOVE
        # the Generate (on its output attribute), so nothing is pushed.
        .selectExpr(
            "explode_outer(transform(sequence(1, size(ws) - 1),"
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))) as bigram"
        )
        .where(F.col("bigram").isNotNull())
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(BIGRAM_TOPK)
    )


@register(
    "cume_dist_customer_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           cume_dist()              OVER w AS cd,
           first_value(o_orderkey)  OVER w AS cheapest_ok,
           max(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution-rank analytics per customer: cume_dist (exact "
    "rank/count rational, engine-stable in doubles), first_value over the "
    "price ordering, and a partition-wide max — three window frames, one "
    "shuffle on o_custkey shared by all of them. Completes the ranking-"
    "function family next to percent_rank / ntile / row_number.",
    tags=("window", "rank"),
)
def cume_dist_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_custkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.cume_dist().over(w).alias("cd"),
        F.first("o_orderkey").over(w).alias("cheapest_ok"),
        F.max("o_totalprice").over(wp).alias("max_price"),
    )
