"""Advanced relational operators: as-of join, iterative connected
components.

SURVEY §2 end-note: the reference has no sorts/set-ops/non-equi/as-of
joins — Spark supplies them free, and these queries prove the two that are
genuinely non-trivial at scale:

- **as-of join** without a range-explosion: the naive formulation joins
  every left row to every earlier right row then picks the max — quadratic
  per key. The scale formulation here is a single window pass: union both
  sides, one shuffle on the key, running max over a strictly-preceding
  range frame. DuckDB's native ASOF JOIN is the oracle.
- **connected components** (dedup canonicalization): near-dup *pairs* must
  become *clusters* before you can keep one representative per cluster.
  Iterative min-label propagation over the edge set, converging in
  O(log(diameter)) rounds of joins — the standard large-graph pattern
  (edges stay partitioned by vertex; each round is one shuffle). Oracle:
  transitive closure via WITH RECURSIVE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamprocessors_spark.plans.registry import register
from streamprocessors_spark.session import read_table


@register(
    "asof_join_last_purchase",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts, b.ts AS prev_purchase_ts
    FROM events a
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND a.ts > b.ts
    WHERE a.event_type = 'click'
    """,
    doc="As-of join: every click paired with the user's most recent "
    "strictly-earlier purchase. Spark plan: union both sides, ONE window "
    "pass with a running max over a strictly-preceding range frame — no "
    "per-key range explosion, one shuffle on user_id. Oracle: DuckDB's "
    "native ASOF JOIN.",
    tags=("join", "asof"),
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    # strictly-preceding frame: purchases at the exact same microsecond are
    # excluded, matching ASOF's a.ts > b.ts
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.withColumn("prev_purchase_ts", F.max("p_ts").over(w))
        .where(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "prev_purchase_ts")
    )


# Iteration cap: min-label propagation halves the effective diameter each
# round; 10 rounds covers components with diameter up to 2^10.
_CC_MAX_ITERS = 10


@register(
    "dedup_connected_components",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.sh, b.sh)) AS n_inter,
               len(list_distinct(a.sh || b.sh)) AS n_union
        FROM (
          SELECT doc_id, lang,
                 list_distinct(list_transform(
                   range(1, greatest(len(ws) - 2, 1) + 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
          FROM (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS ws
            FROM documents
          ) WHERE len(ws) >= 3
        ) a JOIN (
          SELECT doc_id, lang,
                 list_distinct(list_transform(
                   range(1, greatest(len(ws) - 2, 1) + 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
          FROM (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS ws
            FROM documents
          ) WHERE len(ws) >= 3
        ) b ON a.lang = b.lang AND a.doc_id < b.doc_id
      ) WHERE 2 * n_inter >= n_union AND n_inter > 0
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, least(u, min(v)) AS canonical
    FROM reach GROUP BY u
    """,
    doc="Iterative connected components over the near-dup pair graph: "
    "cluster canonicalization (keep min doc_id per component) via min-label "
    "propagation — each round one join+groupBy, converging in "
    "O(log diameter) rounds; the DataFrame loop is the driver-side "
    "iteration Spark uses for graph algorithms. Oracle: WITH RECURSIVE "
    "transitive closure. Non-SQL-expressible in one Spark query — this is "
    "the 'iterative algorithm' capability slot.",
    tags=("dedup", "iterative"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessors_spark.plans.llm_ops import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.selectExpr("doc_a as u", "doc_b as v")
        .unionByName(pairs.selectExpr("doc_b as u", "doc_a as v"))
        .distinct()
    )
    # The pair graph is tiny relative to the corpus (only near-dups); pin it
    # on the driver side of the loop via localCheckpoint so each iteration
    # doesn't replay the full shingle pipeline.
    edges = edges.localCheckpoint()
    labels = edges.select(F.col("u").alias("node"), F.col("u").alias("label")).distinct()
    labels = labels.groupBy("node").agg(F.min("label").alias("label"))
    for _ in range(_CC_MAX_ITERS):
        # candidate label for each node: min over neighbors' labels
        prop = (
            edges.join(labels, edges.v == labels.node)
            .select(F.col("u").alias("node"), "label")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        changed = (
            prop.alias("p")
            .join(labels.alias("l"), "node")
            .where(F.col("p.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels = prop.localCheckpoint()
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("canonical"))
