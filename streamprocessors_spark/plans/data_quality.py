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


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 4      # sketch depth (hash rows)
# Sketch width: sized to the FIXTURE vocabulary (~31 words) so counter
# collisions actually occur and the min-over-rows estimate is exercised
# (at 512 the sketch was collision-free and the overcount column never
# left zero — untested behavior). Production sizes W ~ 2^20+ for an
# open vocabulary; width only changes the constants below, not the plan.
CMS_W = 32
CMS_TOPK = 20


def _cms_col(d: str, hx: str, r: str) -> str:
    """Counter column under hash row ``r`` from a PRE-COMPUTED md5 hex
    column ``hx``: the {CMS_D} row hashes are disjoint 2-hex-digit slices
    of ONE digest (the universal-hash-family construction — one hash per
    occurrence, not one per row; measured 2.4 s -> ~1 s at sf0.1).
    Identical arithmetic in both dialects; slices are non-negative."""
    sub = f"substr({hx}, 1 + ({r}) * 2, 2)"
    if d == SPARK:
        return f"(cast(conv({sub}, 16, 10) as bigint) % {CMS_W})"
    return f"((('0x' || {sub})::BIGINT) % {CMS_W})"


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH o AS (SELECT w, md5(w) AS hx
               FROM (SELECT unnest({D.words(DUCK)}) AS w FROM documents)),
    sk AS (
      SELECT r, c, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT t.r, {_cms_col(DUCK, "o.hx", "t.r")} AS c
        FROM o CROSS JOIN unnest(range({CMS_D})) AS t(r)
      ) GROUP BY r, c
    ),
    ex AS (SELECT w, md5(w) AS hx, CAST(count(*) AS BIGINT) AS exact_n
           FROM o GROUP BY w, md5(w)),
    est AS (
      SELECT e.w, CAST(min(sk.cnt) AS BIGINT) AS est_n
      FROM ex e CROSS JOIN unnest(range({CMS_D})) AS t(r)
      JOIN sk ON sk.r = t.r AND sk.c = {_cms_col(DUCK, "e.hx", "t.r")}
      GROUP BY e.w
    )
    SELECT est.w, est.est_n, ex.exact_n,
           CAST(est.est_n - ex.exact_n AS BIGINT) AS overcount
    FROM est JOIN ex USING (w)
    ORDER BY est.est_n DESC, est.w ASC
    LIMIT {CMS_TOPK}
    """,
    doc=f"Count-min sketch (Cormode & Muthukrishnan '05) heavy hitters: "
    f"every word occurrence increments {CMS_D} counters (one per hash "
    f"row) in a {CMS_D}x{CMS_W} integer sketch; a word's estimate is the "
    "min over its counters — always >= the true count, never under. The "
    "sketch is built by ONE groupBy whose key space is the CONSTANT "
    f"{CMS_D * CMS_W} counters: partial aggregation collapses each task "
    "to at most that many rows before the exchange, so at 100 TB the "
    "shuffle carries kilobytes regardless of corpus size (sums commute, "
    "so the sketch is also partition- and merge-order-independent — the "
    "property that makes it streamable). The fixture-scale query also "
    "joins the exact counts so the output exposes the overcount error; "
    f"production keeps only the sketch. Top-{CMS_TOPK} by estimate, "
    "word-ASC tie-break.",
    tags=("text", "corpus", "sketch", "topk"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    occ = (
        docs.selectExpr(f"explode_outer({D.words(SPARK)}) as w")
        .where(F.col("w").isNotNull())
        .selectExpr("w", "md5(w) as hx")
    )
    sk = (
        occ.select("hx", F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("r"))
        .selectExpr("r", f"{_cms_col(SPARK, 'hx', 'r')} as c")
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ex = occ.groupBy("w", "hx").agg(F.count(F.lit(1)).alias("exact_n"))
    probe = ex.select(
        "w", "hx", "exact_n",
        F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("r"),
    ).selectExpr("w", "exact_n", "r", f"{_cms_col(SPARK, 'hx', 'r')} as c")
    # bounded: the sketch is <= CMS_D * CMS_W = constant rows by construction
    return (
        probe.join(F.broadcast(sk), ["r", "c"])
        .groupBy("w")
        .agg(
            F.min("cnt").alias("est_n"),
            F.expr("any_value(exact_n)").alias("exact_n"),
        )
        .selectExpr(
            "w", "est_n", "exact_n",
            "cast(est_n - exact_n as bigint) as overcount",
        )
        .orderBy(F.desc("est_n"), F.asc("w"))
        .limit(CMS_TOPK)
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. '21, arXiv:2112.11446 Table A1)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_WLEN, GOPHER_MAX_WLEN = 3, 10
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
# The paper's rule is ">= 2 distinct words from a fixed stopword lexicon";
# its English list (the, be, to, of, and, that, have, with) intersects the
# 31-word synthetic fixture vocabulary only at 'the', which would pin the
# rule to a constant 0. This lexicon keeps the paper's MECHANISM against
# the fixture's actual function words (same adaptation as
# llm_ops.STOPWORDS for the quality-score family).
GOPHER_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "value"]


def _gopher_exprs(d: str) -> dict[str, str]:
    ws = "ws"
    n = D.size(d, ws)
    wlen_sum = D.agg_sum_bigint(d, ws, "x", "length(x)")
    mean_wlen = D.floor_round(
        d, f"cast({wlen_sum} as double) / cast({n} as double)", 6
    )
    n_symbols = (
        f"({D.regexp_all_count(d, 'text', '#')}"
        f" + {D.regexp_all_count(d, 'text', D.sql_regex_lit(d, chr(92) + '.' + chr(92) + '.' + chr(92) + '.'))})"
    )
    symbol_ratio = D.floor_round(
        d, f"cast({n_symbols} as double) / cast({n} as double)", 6
    )
    if d == SPARK:
        n_alpha = f"size(filter({ws}, x -> x rlike '[a-z]'))"
    else:
        n_alpha = f"len(list_filter({ws}, x -> regexp_matches(x, '[a-z]')))"
    alpha_frac = D.floor_round(
        d, f"cast({n_alpha} as double) / cast({n} as double)", 6
    )
    n_stop = D.intersect_size(
        d, D.distinct(d, ws), D.str_array(d, GOPHER_STOPWORDS)
    )
    return {
        "n": n,
        "mean_wlen": mean_wlen,
        "symbol_ratio": symbol_ratio,
        "alpha_frac": alpha_frac,
        "n_stop": n_stop,
    }


def gopher_keep_expr(d: str) -> str:
    """The Gopher keep conjunction as ONE boolean expression over a frame
    carrying (text, ws) — the scan-local filter form a composed pipeline
    (packed_lineage_bins' cleaned-corpus pack) pushes into its scan. The
    thresholds compare the same quantized metrics as _gopher_select, so a
    doc passes here iff gopher_quality_rules emits passed = 1 for it."""
    e = _gopher_exprs(d)
    return (
        f"({e['n']} >= {GOPHER_MIN_WORDS}"
        f" AND {e['n']} <= {GOPHER_MAX_WORDS}"
        f" AND {e['mean_wlen']} >= {GOPHER_MIN_WLEN}"
        f" AND {e['mean_wlen']} <= {GOPHER_MAX_WLEN}"
        f" AND {e['symbol_ratio']} <= {GOPHER_MAX_SYMBOL_RATIO}"
        f" AND {e['alpha_frac']} >= {GOPHER_MIN_ALPHA_FRAC}"
        f" AND {e['n_stop']} >= {GOPHER_MIN_STOP_HITS})"
    )


def _gopher_select(d: str) -> str:
    e = _gopher_exprs(d)
    r_words = (
        f"CASE WHEN {e['n']} >= {GOPHER_MIN_WORDS}"
        f" AND {e['n']} <= {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END"
    )
    r_wlen = (
        f"CASE WHEN {e['mean_wlen']} >= {GOPHER_MIN_WLEN}"
        f" AND {e['mean_wlen']} <= {GOPHER_MAX_WLEN} THEN 1 ELSE 0 END"
    )
    r_symbol = (
        f"CASE WHEN {e['symbol_ratio']} <= {GOPHER_MAX_SYMBOL_RATIO}"
        " THEN 1 ELSE 0 END"
    )
    r_alpha = (
        f"CASE WHEN {e['alpha_frac']} >= {GOPHER_MIN_ALPHA_FRAC}"
        " THEN 1 ELSE 0 END"
    )
    r_stop = (
        f"CASE WHEN {e['n_stop']} >= {GOPHER_MIN_STOP_HITS}"
        " THEN 1 ELSE 0 END"
    )
    return f"""SELECT doc_id,
      CAST({e['n']} AS BIGINT) AS n_words,
      {e['mean_wlen']} AS mean_wlen,
      {e['symbol_ratio']} AS symbol_ratio,
      {e['alpha_frac']} AS alpha_frac,
      CAST({e['n_stop']} AS BIGINT) AS n_stop,
      CAST({r_words} AS INT) AS r_words,
      CAST({r_wlen} AS INT) AS r_wlen,
      CAST({r_symbol} AS INT) AS r_symbol,
      CAST({r_alpha} AS INT) AS r_alpha,
      CAST({r_stop} AS INT) AS r_stop,
      CAST({r_words} * {r_wlen} * {r_symbol} * {r_alpha} * {r_stop}
           AS INT) AS passed"""


@register(
    "gopher_quality_rules",
    oracle=f"""
    WITH w AS (SELECT doc_id, text, {D.words(DUCK)} AS ws FROM documents
               WHERE {D.size(DUCK, D.words(DUCK))} > 0)
    {_gopher_select(DUCK)} FROM w
    """,
    doc="The Gopher document-quality rule set (Rae et al. '21 Table A1) "
    "as one stateless JVM pass: word-count bounds [50, 100k], mean word "
    "length [3, 10], symbol-to-word ratio (#/ellipsis) <= 0.1, >= 80% "
    "words containing an alphabetic character, and >= 2 distinct "
    "stopwords present. Emits every intermediate metric (floor-quantized "
    "6dp where fractional) plus per-rule verdicts and the conjunction — "
    "the debuggable form a production filter needs. Scale shape: no "
    "exchange at all; every expression is a scalar/HOF pass over the "
    "tokenized text, so it pipelines inside the scan stage at any corpus "
    "size. Both engines evaluate the same expression text; the rule "
    "thresholds compare the QUANTIZED metrics so verdicts are "
    "engine-stable.",
    tags=("text", "quality", "llm"),
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_rules_docs(read_table(spark, sf_dir, "documents"))


def gopher_rules_docs(raw_docs: DataFrame) -> DataFrame:
    """Docs-frame-parameterized core of gopher_quality_rules (shared with
    the hand-labeled per-rule fixture in tests/test_algo_invariants.py)."""
    raw_docs.createOrReplaceTempView("sp_gopher_documents")
    return raw_docs.sparkSession.sql(
        f"""
        WITH w AS (SELECT doc_id, text, {D.words(SPARK)} AS ws
                   FROM sp_gopher_documents
                   WHERE {D.size(SPARK, D.words(SPARK))} > 0)
        {_gopher_select(SPARK)} FROM w
        """
    )


# ---------------------------------------------------------------------------
# Wide per-document quality-signals table (RedPajama-V2 style: Together
# Computer '23 releases the corpus WITH a per-document signal table and
# lets consumers choose thresholds; CCNet/Gopher/FineWeb pipelines all
# materialize this artifact before any filtering decision). Unlike the
# verdict queries above, nothing here decides keep/drop — it is the raw,
# exactly-reproducible measurement layer downstream filters consume.
# ---------------------------------------------------------------------------


def _signals_occ_layers(d: str) -> list[str]:
    """Two chained projection layers that derive the per-distinct-word
    count array `occ` from `ws` via run-lengths over a SORTED copy:
    O(n log n) sort + O(n) boundary scan + O(n_distinct) diffs, replacing
    the old O(n_distinct x n) per-word filter rescan (ADVICE r9 — the
    old shape was quadratic in document length). occ's ORDER differs
    (sorted-word order vs first-appearance order) but both consumers
    (arr_max, an unordered sum) are order-invariant, so every emitted
    signal value is bit-identical to the old definition. Layered as
    separate projections so `starts` is materialized once per row
    (Spark's CollapseProject keeps non-cheap expressions referenced
    more than once in their own projection, SPARK-36718; DuckDB CTE
    layers likewise)."""
    n = D.size(d, "ws")
    wss = D.arr_sort(d, "ws")
    # 1-based positions where a new run (distinct word) begins; the
    # CASE guards element(wss, 0) from ever evaluating at i = 1
    starts = D.filter_(
        d,
        D.seq1(d, n),
        "i -> CASE WHEN i = 1 THEN true ELSE "
        f"{D.element(d, 'wss', 'i')} <> {D.element(d, 'wss', 'i - 1')} END",
    )
    m = D.size(d, "starts")
    occ = D.transform(
        d,
        D.seq1(d, m),
        f"j -> (CASE WHEN j < {m} THEN {D.element(d, 'starts', 'j + 1')}"
        f" ELSE {n} + 1 END) - {D.element(d, 'starts', 'j')}",
    )
    return [f"{starts} AS starts", f"{occ} AS occ"]


def _signals_select(d: str) -> list[str]:
    """The signal battery, dialect-parametric so the Spark plan and the
    DuckDB oracle render from ONE definition (no drift). Every column is
    an exact integer: fractional signals ship as fixed-point numerators
    (consumers divide), entropy as the 1/1024-unit log2q numerator.
    Expects the frame to carry `ws` (words), `wss` (sorted words, unused
    here but feeds the occ layers), and `occ` (per-distinct-word counts,
    _signals_occ_layers)."""
    from streamprocessors_spark.plans.llm_ops import STOPWORDS, _log2q

    n = D.size(d, "ws")
    n_distinct = D.size(d, "occ")
    n_stop = D.size(
        d,
        D.filter_(d, "ws", f"x -> {D.contains(d, D.str_array(d, STOPWORDS), 'x')}"),
    )
    sum_wlen = D.agg_sum_bigint(d, "ws", "x", "length(x)")
    n_alpha = D.size(d, D.filter_(d, "ws", "x -> x ~ '^[a-z]+$'")) if d == DUCK \
        else D.size(d, D.filter_(d, "ws", "x -> x rlike '^[a-z]+$'"))
    idx = D.seq1(d, f"{n} - 1")
    gram = f"{D.element(d, 'ws', 'i')} || ' ' || {D.element(d, 'ws', 'i + 1')}"
    grams = D.transform(d, idx, f"i -> {gram}")
    n_grams = D.size(d, grams)
    n_dist_grams = D.size(d, D.distinct(d, grams))
    occ = "occ"
    sum_clog = D.agg_sum_bigint(d, occ, "c", f"c * {_log2q(d, 'c')}")
    n_digits = D.regexp_all_count(d, "text", "[0-9]")
    n_punct = D.regexp_all_count(d, "lower(text)", "[^a-z0-9 ]")
    return [
        "doc_id",
        "lang",
        "source",
        "CAST(n_chars AS BIGINT) AS n_chars",
        f"CAST({n} AS INT) AS n_words",
        f"CAST({n_distinct} AS INT) AS n_distinct_words",
        f"CAST({n_stop} AS INT) AS n_stopwords",
        f"CAST({n_alpha} AS INT) AS n_alpha_words",
        f"CAST({sum_wlen} AS BIGINT) AS sum_word_len",
        # mean word length in 1/1000 units (floor division of exact ints)
        f"CAST(({sum_wlen} * 1000) {'div' if d == SPARK else '//'} {n}"
        " AS BIGINT) AS mean_wlen_milli",
        f"CAST({n_grams} AS INT) AS n_2grams",
        f"CAST({n_grams} - {n_dist_grams} AS INT) AS n_dup_2grams",
        f"CAST({D.arr_max(d, occ)} AS INT) AS top_word_count",
        f"CAST({n_digits} AS INT) AS n_digit_chars",
        f"CAST({n_punct} AS INT) AS n_punct_chars",
        # Shannon-entropy numerator, 1/1024-bit units: bits/word =
        # ent_num_q / (1024 * n_words); 0 exactly for one-word-repeated
        # docs (the text_entropy_score construction, here join-free)
        f"CAST({n} * {_log2q(d, n)} - {sum_clog} AS BIGINT) AS ent_num_q",
    ]


def signals_docs(raw_docs: DataFrame) -> DataFrame:
    """Docs-frame-parameterized signal pipeline (shared by the batch
    query, the streaming twin, the scale smoke, and the hand-labeled
    fixture test): ws -> length filter -> sorted copy -> run starts ->
    occ -> signal battery, all chained scan-local projections."""
    starts_def, occ_def = _signals_occ_layers(SPARK)
    return (
        raw_docs.selectExpr(
            "doc_id", "lang", "source", "n_chars", "text",
            f"{D.words(SPARK)} as ws",
        )
        .where(F.expr(f"{D.size(SPARK, 'ws')} >= 2"))
        .selectExpr("*", f"{D.arr_sort(SPARK, 'ws')} AS wss")
        .selectExpr("*", starts_def)
        .selectExpr("*", occ_def)
        .selectExpr(
            *[c.replace(" AS ", " as ") for c in _signals_select(SPARK)]
        )
    )


@register(
    "quality_signals_table",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, source, n_chars, text, {D.words(DUCK)} AS ws
      FROM documents
    ),
    w1 AS (SELECT *, {D.arr_sort(DUCK, "ws")} AS wss FROM w
           WHERE {D.size(DUCK, "ws")} >= 2),
    w2 AS (SELECT *, {_signals_occ_layers(DUCK)[0]} FROM w1),
    w3 AS (SELECT *, {_signals_occ_layers(DUCK)[1]} FROM w2)
    SELECT {", ".join(_signals_select(DUCK))}
    FROM w3
    """,
    doc="The wide per-document signal table a curation pipeline "
    "materializes NEXT TO the corpus before any filtering decision "
    "(RedPajama-V2's quality_signals artifact; CCNet's per-shard stats): "
    "word/type/stopword/alpha-word counts, word-length mass, duplicate-"
    "2-gram count, top-word count, digit/punctuation character counts, "
    "and the word-distribution entropy numerator — 13 signals, every one "
    "an exact integer (fractions ship as fixed-point numerators, entropy "
    "in 1/1024-bit log2q units), so the table is bit-identical on any "
    "engine at any parallelism. Scale shape: a pure projection — zero "
    "exchanges, no joins, no windows; at 100 TB it pipelines inside the "
    "parquet scan and writes column-pruned signal files. Spark and the "
    "oracle render from ONE _signals_select definition (no drift).",
    tags=("text", "quality", "llm"),
)
def quality_signals_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return signals_docs(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Cross-source content-overlap matrix: the dataset-level measurement run
# before mixing corpora (Dodge et al. '21 measured exactly this across C4
# and benchmark/crawl slices; any multi-source pretraining mix needs the
# pairwise overlap numbers to set dedup and mixture policy). Documents
# here are grouped by their `source` column; overlap is Jaccard over the
# DISTINCT word-3-gram shingle sets of each source's concatenated corpus.
# ---------------------------------------------------------------------------


def _source_shingle_cte(d: str) -> str:
    from streamprocessors_spark.functions import textprep as TP

    ws = D.words(d)
    if d == DUCK:
        return f"""
    w AS (SELECT source, {ws} AS ws FROM documents),
    g AS (
      SELECT DISTINCT source, {D.md5int(DUCK, "gram")} AS h
      FROM (SELECT source, unnest({TP.shingles(DUCK, "ws")}) AS gram FROM w)
    ),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sh
           FROM g GROUP BY source)
    """
    raise ValueError(d)


@register(
    "source_overlap_matrix",
    oracle=f"""
    WITH {_source_shingle_cte(DUCK)},
    pr AS (SELECT a.source AS sa, b.source AS sb, a.n_sh AS n_a,
                  b.n_sh AS n_b
           FROM sz a JOIN sz b ON a.source < b.source),
    iv AS (
      SELECT a.source AS sa, b.source AS sb,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT pr.sa AS source_a, pr.sb AS source_b, pr.n_a, pr.n_b,
           CAST(coalesce(iv.n_inter, 0) AS BIGINT) AS n_inter,
           CAST(pr.n_a + pr.n_b - coalesce(iv.n_inter, 0) AS BIGINT)
             AS n_union,
           {D.floor_round(DUCK,
             "CAST(coalesce(iv.n_inter, 0) AS DOUBLE) /"
             " CAST(pr.n_a + pr.n_b - coalesce(iv.n_inter, 0) AS DOUBLE)",
             6)} AS jaccard
    FROM pr LEFT JOIN iv ON iv.sa = pr.sa AND iv.sb = pr.sb
    """,
    doc="Pairwise content overlap between corpus sources — the "
    "measurement a multi-source pretraining mix is planned against "
    "(per-pair distinct word-3-gram Jaccard; Dodge et al. '21 ran this "
    "across C4 slices): one row per unordered source pair with exact "
    "shingle-set sizes, intersection, union, and the 6dp-floored "
    "Jaccard; zero-overlap pairs still appear (left join against the "
    "bounded pair spine). Scale shape: shingles hash to 60-bit ints "
    "before the ONE corpus exchange (distinct on (source, h) — "
    "integers, never gram strings); the pair intersection self-joins "
    "that deduped frame on h, so a shingle shared by k sources expands "
    "to at most k(k-1)/2 rows (k = source count, bounded); per-source "
    "sizes and the pair spine are source-count-sized broadcasts.",
    tags=("dq", "dedup", "corpus", "llm"),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamprocessors_spark.functions import textprep as TP

    # deduped (source, h): <= sources x shingle-vocab rows, << the raw
    # incidences; localCheckpoint pins it so the per-source sizes and
    # BOTH legs of the intersection self-join share ONE corpus
    # shingle+distinct pass instead of re-running it three times
    sh = (
        read_table(spark, sf_dir, "documents")
        .selectExpr("source", f"{D.words(SPARK)} as ws")
        .selectExpr("source", f"explode({TP.shingles(SPARK, 'ws')}) as gram")
        .selectExpr("source", f"{D.md5int(SPARK, 'gram')} as h")
        .distinct()
        .localCheckpoint()
    )
    # bounded: sz is one row per source (the fixture has a handful; any
    # real lake has at most thousands of named sources)
    sz = F.broadcast(
        sh.groupBy("source").agg(
            F.expr("cast(count(*) as bigint)").alias("n_sh")
        )
    )
    pr = (
        sz.selectExpr("source as sa", "n_sh as n_a")
        .join(
            sz.selectExpr("source as sb", "n_sh as n_b"),
            F.col("sa") < F.col("sb"),
        )
    )
    iv = (
        sh.selectExpr("source as sa", "h")
        .join(sh.selectExpr("source as sb", "h as hb"),
              F.col("h") == F.col("hb"))
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.expr("cast(count(*) as bigint)").alias("n_inter"))
    )
    return (
        pr.join(iv, ["sa", "sb"], "left")
        .selectExpr(
            "sa as source_a",
            "sb as source_b",
            "n_a",
            "n_b",
            "cast(coalesce(n_inter, 0) as bigint) as n_inter",
            "cast(n_a + n_b - coalesce(n_inter, 0) as bigint) as n_union",
            D.floor_round(
                SPARK,
                "cast(coalesce(n_inter, 0) as double) /"
                " cast(n_a + n_b - coalesce(n_inter, 0) as double)",
                6,
            )
            + " as jaccard",
        )
    )


# ---------------------------------------------------------------------------
# Snapshot delta report: the crawl-refresh diff every periodically-
# re-crawled corpus computes before reprocessing (CommonCrawl dumps,
# lakehouse CDC) — which documents a new snapshot ADDED, REMOVED,
# CHANGED, or left identical, rolled up per source. The fixture is one
# snapshot, so the PREVIOUS snapshot is synthesized deterministically
# (the PII-plant/HTML-synthesis device): v0 = every doc except
# doc_id % 5 = 0 (those are "new in v1"); v1 drops doc_id % 11 = 3
# (those are "removed" -> present only in v0); doc_id % 7 = 0 texts
# carry a v0-only suffix (those diff as "changed"). Both engines
# derive v0 from the same expression text, and the DIFF LOGIC never
# consults the synthesis rules — it is a pure full-outer-join + content
# hash compare that works on any two snapshots.
# ---------------------------------------------------------------------------


def _snapshot_v0_cte(d: str) -> str:
    """The synthesized previous snapshot (doc_id, source, text).

    v0 keeps the doc_id % 11 = 3 docs that v1 EXCLUDES — those are the
    v0-only 'removed' class (ADVICE r9: excluding them from both sides
    made 'removed' unreachable); doc_id % 5 = 0 docs are v1-only
    ('added'); doc_id % 7 = 0 texts carry a v0-only suffix ('changed').
    """
    return (
        "SELECT doc_id, source,"
        " CASE WHEN doc_id % 7 = 0 THEN text || ' [v0-revision]'"
        " ELSE text END AS text"
        " FROM documents"
        " WHERE doc_id % 5 <> 0"
    )


def _drift_cols(d: str) -> list[str]:
    """Per-document signal expressions for the drift rollup, over a frame
    carrying (snapshot, source, text, ws) — dialect-shared."""
    from streamprocessors_spark.plans.llm_ops import STOPWORDS

    n = D.size(d, "ws")
    nd = D.size(d, D.distinct(d, "ws"))
    nstop = D.size(
        d,
        D.filter_(d, "ws", f"x -> {D.contains(d, D.str_array(d, STOPWORDS), 'x')}"),
    )
    ndig = D.regexp_all_count(d, "text", "[0-9]")
    npunct = D.regexp_all_count(d, "lower(text)", "[^a-z0-9 ]")
    return [
        f"CAST({n} AS BIGINT) AS n_words",
        f"CAST({nd} AS BIGINT) AS n_distinct",
        f"CAST({nstop} AS BIGINT) AS n_stop",
        f"CAST({ndig} AS BIGINT) AS n_digit",
        f"CAST({npunct} AS BIGINT) AS n_punct",
    ]


def _drift_rollup(d: str) -> str:
    """The per-(snapshot, source) rollup: doc counts, exact signal sums,
    and exact-integer milli-means (sum*1000 floor-div docs)."""
    div = "div" if d == SPARK else "//"
    cols = []
    for c in ("n_words", "n_distinct", "n_stop", "n_digit", "n_punct"):
        cols.append(f"CAST(sum({c}) AS BIGINT) AS sum_{c[2:]}")
        cols.append(
            f"CAST((sum({c}) * 1000) {div} count(*) AS BIGINT)"
            f" AS mean_{c[2:]}_milli"
        )
    return (
        "SELECT snapshot, source, CAST(count(*) AS BIGINT) AS n_docs, "
        + ", ".join(cols)
    )


@register(
    "snapshot_quality_drift",
    oracle=f"""
    WITH v0 AS ({_snapshot_v0_cte(DUCK)}),
    v1 AS (SELECT doc_id, source, text FROM documents
           WHERE doc_id % 11 <> 3),
    u AS (
      SELECT 'v0' AS snapshot, source, text FROM v0
      UNION ALL
      SELECT 'v1' AS snapshot, source, text FROM v1
    ),
    w AS (SELECT snapshot, source, text, {D.words(DUCK)} AS ws FROM u),
    g AS (
      SELECT snapshot, source, {", ".join(_drift_cols(DUCK))}
      FROM w WHERE {D.size(DUCK, "ws")} > 0
    )
    {_drift_rollup(DUCK)} FROM g GROUP BY snapshot, source
    """,
    doc="Recrawl quality-drift report — the monitor a periodic crawl "
    "refresh is judged by BEFORE reprocessing: per (snapshot, source), "
    "document counts plus exact signal sums and milli-means "
    "(words, distinct words, stopwords, digit chars, punctuation chars "
    "per document) for the previous and the new snapshot side by side; "
    "a source whose new crawl suddenly shortens, de-duplicates, or "
    "fills with digits/punctuation shows here before it poisons a "
    "training mix. Every column is an exact integer (sums, and "
    "floor-divided milli-means), so the table is engine-stable. Scale "
    "shape: ONE unioned scan of the two snapshots (the v0 synthesis is "
    "scan-local expression work), per-document signals pipeline inside "
    "the scan, and a map-side-combined rollup to 2 x sources cells — "
    "zero joins, zero windows.",
    tags=("dq", "quality", "corpus", "pipeline", "llm"),
)
def snapshot_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("sp_snapdrift_documents")
    v0 = spark.sql(
        _snapshot_v0_cte(SPARK).replace("FROM documents",
                                        "FROM sp_snapdrift_documents")
    ).selectExpr("'v0' as snapshot", "source", "text")
    v1 = docs.where("doc_id % 11 != 3").selectExpr(
        "'v1' as snapshot", "source", "text"
    )
    return (
        v0.unionByName(v1)
        .selectExpr("snapshot", "source", "text", f"{D.words(SPARK)} as ws")
        .where(F.expr(f"{D.size(SPARK, 'ws')} > 0"))
        .selectExpr("snapshot", "source", *_drift_cols(SPARK))
        .groupBy("snapshot", "source")
        .agg(*[F.expr(c) for c in _drift_agg_exprs()])
    )


def _drift_agg_exprs() -> list[str]:
    cols = ["cast(count(*) as bigint) as n_docs"]
    for c in ("n_words", "n_distinct", "n_stop", "n_digit", "n_punct"):
        cols.append(f"cast(sum({c}) as bigint) as sum_{c[2:]}")
        cols.append(
            f"cast((sum({c}) * 1000) div count(*) as bigint)"
            f" as mean_{c[2:]}_milli"
        )
    return cols


@register(
    "snapshot_delta_report",
    oracle=f"""
    WITH v0 AS ({_snapshot_v0_cte(DUCK)}),
    v1 AS (SELECT doc_id, source, text FROM documents
           WHERE doc_id % 11 <> 3),
    d AS (
      SELECT coalesce(v1.doc_id, v0.doc_id) AS doc_id,
             coalesce(v1.source, v0.source) AS source,
             CASE
               WHEN v0.doc_id IS NULL THEN 'added'
               WHEN v1.doc_id IS NULL THEN 'removed'
               WHEN md5(v1.text) <> md5(v0.text) THEN 'changed'
               ELSE 'same'
             END AS delta
      FROM v1 FULL OUTER JOIN v0 ON v0.doc_id = v1.doc_id
    )
    SELECT source, delta, CAST(count(*) AS BIGINT) AS n_docs
    FROM d GROUP BY source, delta
    """,
    doc="Snapshot-to-snapshot delta report (the crawl-refresh / CDC "
    "diff run before any incremental reprocessing): per source, how "
    "many documents the new snapshot added, removed, changed, or left "
    "byte-identical — membership by full outer join on doc_id, change "
    "detection by content md5 (never by trusting metadata). The "
    "previous snapshot is synthesized deterministically from the "
    "fixture (v1-only docs, v0-only docs, v0-revised texts — every "
    "delta class planted); the diff logic itself is snapshot-agnostic. "
    "Scale shape: ONE full outer sort-merge join on the id (both "
    "sides shuffle once on doc_id — at 100 TB both snapshots are "
    "id-bucketed so this co-locates scan-side), md5 comparison is "
    "scan-local, and the report is a map-side-combined rollup to "
    "sources x 4 cells.",
    tags=("dq", "corpus", "pipeline", "llm"),
)
def snapshot_delta_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("sp_snapshot_documents")
    v0 = spark.sql(
        _snapshot_v0_cte(SPARK).replace("FROM documents",
                                        "FROM sp_snapshot_documents")
    ).selectExpr("doc_id as id0", "source as src0", "md5(text) as h0")
    v1 = docs.where("doc_id % 11 != 3").selectExpr(
        "doc_id as id1", "source as src1", "md5(text) as h1"
    )
    return (
        v1.join(v0, F.col("id1") == F.col("id0"), "full_outer")
        .selectExpr(
            "coalesce(src1, src0) as source",
            "case when id0 is null then 'added'"
            " when id1 is null then 'removed'"
            " when h1 <> h0 then 'changed'"
            " else 'same' end as delta",
        )
        .groupBy("source", "delta")
        .agg(F.expr("cast(count(*) as bigint)").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Drift-driven remediation (VERDICT r10 #9): the ACTION the recrawl
# monitor exists to trigger — when a source's new snapshot drifts past a
# threshold, its share of the next training mix's token budget is demoted
# before the mix is trained on.
# ---------------------------------------------------------------------------

# A source whose mean words/doc shifts by MORE than this many milli
# (parts per thousand of the v0 mean) between snapshots is treated as
# drifted. 50 splits the fixture's observed per-source drift spectrum
# (~1..91 milli at sf0.001/0.01), so the driver compare exercises both
# the flagged and the clean branch on real data; the planted-drift
# pytest exercises a gross (~190 milli) shift.
DRIFT_THRESH_MILLI = 50
# Drifted sources keep 1/DRIFT_PENALTY_DIV of their temperature-scaled
# allocation weight until a clean re-crawl clears the flag.
DRIFT_PENALTY_DIV = 2


def _remediation_sql(d: str, docs_table: str = "documents") -> str:
    """Dialect-shared remediation plan: snapshot_quality_drift's v0/v1
    mean-words signal -> per-source drift milli + threshold flag ->
    token_budget_plan's temperature-scaled allocation with drifted
    sources' weights divided by the penalty — all exact integers."""
    from streamprocessors_spark.plans.llm_ops import (
        PLAN_TOKEN_BUDGET,
        TEMP_SCALE,
        _BPE_PATTERN,
        _isqrt_sql,
    )

    div = "div" if d == SPARK else "//"
    v0 = _snapshot_v0_cte(d).replace("FROM documents", f"FROM {docs_table}")
    ntok = D.regexp_all_count(d, "lower(text)", _BPE_PATTERN)
    return f"""
    WITH v0 AS ({v0}),
    v1 AS (SELECT doc_id, source, text FROM {docs_table}
           WHERE doc_id % 11 <> 3),
    u AS (
      SELECT 'v0' AS snapshot, source, text FROM v0
      UNION ALL
      SELECT 'v1' AS snapshot, source, text FROM v1
    ),
    w AS (SELECT snapshot, source,
                 {D.size(d, D.words(d))} AS n_words FROM u),
    g AS (SELECT snapshot, source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_words) AS BIGINT) AS sum_words
          FROM w WHERE n_words > 0 GROUP BY snapshot, source),
    m AS (SELECT snapshot, source,
                 CAST((sum_words * 1000) {div} n_docs AS BIGINT)
                   AS mean_milli
          FROM g),
    drift AS (
      SELECT a.source,
             CAST(abs(b.mean_milli - a.mean_milli) * 1000 {div} a.mean_milli
               AS BIGINT) AS drift_milli
      FROM m a JOIN m b ON a.source = b.source
      WHERE a.snapshot = 'v0' AND b.snapshot = 'v1' AND a.mean_milli > 0
    ),
    cnt AS (
      SELECT source, CAST(sum({ntok}) AS BIGINT) AS n_tok
      FROM v1 GROUP BY source
    ),
    c0 AS (
      -- LEFT join: a source present only in the NEW snapshot (or with
      -- no countable v0 words) has no drift baseline — it still gets
      -- its full budget slice, unflagged (drift unknown is not drift
      -- evidence; dropping it would silently redistribute its share)
      SELECT c.source, c.n_tok,
             CAST(COALESCE(dr.drift_milli, 0) AS BIGINT) AS drift_milli,
             CAST(COALESCE(dr.drift_milli, 0) > {DRIFT_THRESH_MILLI}
               AS INT) AS drifted,
             c.n_tok * {TEMP_SCALE} AS x,
             CAST(sqrt(CAST(c.n_tok * {TEMP_SCALE} AS DOUBLE)) AS BIGINT)
               AS c0
      FROM cnt c LEFT JOIN drift dr ON dr.source = c.source
      WHERE c.n_tok > 0
    ),
    sq AS (
      SELECT source, n_tok, drift_milli, drifted,
             {_isqrt_sql(d, "x", "c0")} AS sqrt_q
      FROM c0
    ),
    adj AS (
      SELECT source, n_tok, drift_milli, drifted,
             CAST(sqrt_q AS BIGINT) AS sqrt_q,
             CAST(CASE WHEN drifted = 1
                  THEN sqrt_q {div} {DRIFT_PENALTY_DIV}
                  ELSE sqrt_q END AS BIGINT) AS adj_q
      FROM sq
    ),
    tot AS (SELECT sum(adj_q) AS t FROM adj)
    SELECT a.source, a.n_tok, a.drift_milli, a.drifted, a.sqrt_q, a.adj_q,
           CAST(({PLAN_TOKEN_BUDGET} * a.adj_q) {div} tot.t AS BIGINT)
             AS budget_tok,
           CAST(((({PLAN_TOKEN_BUDGET} * a.adj_q) {div} tot.t) * 1000)
                {div} a.n_tok AS BIGINT) AS epochs_milli
    FROM adj a CROSS JOIN tot
    """


def drift_remediation_frame(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The remediation plan over an arbitrary documents frame (shared
    with the planted-drift pytest)."""
    docs.createOrReplaceTempView("sp_driftrem_documents")
    return spark.sql(_remediation_sql(SPARK, "sp_driftrem_documents"))


@register(
    "drift_remediation_plan",
    oracle=_remediation_sql(DUCK),
    doc="Drift-driven mixture remediation — composes the recrawl "
    "monitor with the budget planner into the ACTION the monitor "
    "exists to trigger (VERDICT r10 #9): per source, the v0-vs-v1 "
    "mean-words drift (exact milli, the snapshot_quality_drift "
    "signal), a threshold flag, and the NEXT training mix's token "
    f"budget where drifted sources keep 1/{DRIFT_PENALTY_DIV} of their "
    "temperature-scaled weight (token_budget_plan's exact-isqrt "
    "device) until a clean re-crawl clears the flag — available "
    "tokens, adjusted weight, budget slice, and implied epochs_milli "
    "per source, all exact integers. Scale shape: one unioned "
    "two-snapshot scan pipelines the word counts (zero joins before "
    "the rollup), everything after the two groupBys is "
    "source-count-sized with a 1-row total cross join — identical to "
    "its two parents. A planted-drift fixture "
    "(tests/test_algo_invariants.py) pins that a shortening source "
    "trips the flag and loses budget share to clean sources.",
    tags=("dq", "quality", "sample", "pipeline", "llm"),
)
def drift_remediation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drift_remediation_frame(spark, read_table(spark, sf_dir, "documents"))
