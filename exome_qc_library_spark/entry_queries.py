"""Oracle-checked operator queries for the driver contract.

Each entry: name → (spark_fn(spark, sf_dir) -> DataFrame, duckdb_sql | None).
The SQL is generated from the SAME Python constants (stopword set,
lexicons, thresholds, scrub rules) the Spark operators use, so both
sides agree by construction. Rows-only entries (sql=None) cover the
hash-sketch operators whose hash primitive (xxhash64) DuckDB lacks.

Operator-inventory coverage tags (SURVEY.md §2) are noted per query.
Float discipline: ratios of integers are bit-identical across engines;
aggregates over doubles go through DECIMAL(38,6) (exact, order-free)
or are rounded to 6 dp before comparison.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .functions.lexicons import LANGS, LEXICONS
from .functions.textmetrics import STOPWORD_SET, text_metrics, words_expr
from .functions.hashing import rolling_fingerprint, word_shingles
from .operators.langid import langid_expr
from .operators.scrub import DEFAULT_RULES, pii_hits_expr, scrub_expr
from .operators.tokenize import BPE_ISH_PATTERN, bpe_ish_token_count, whitespace_token_count

# ---------------------------------------------------------------- helpers


def _t(spark: SparkSession, sf_dir: str, name: str, spread_on: str | None = None) -> DataFrame:
    """Read one testdata table; ``spread_on=<key>`` additionally rounds a
    scan out to the session cores when the parquet layout under-splits it
    (single-row-group files — see :func:`..sources.readers.spread_scan`).
    Opt-in per query: only paths whose heavy per-row work would otherwise
    fuse into a one-task scan stage ask for it; queries that begin with
    their own exchange (window/groupBy-first) gain nothing and skip it."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if spread_on is not None:
        from .sources.readers import spread_scan

        df = spread_scan(df, spread_on)
    return df


def _sql_list(words) -> str:
    inner = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"[{inner}]"


# shared metric CTE for the documents table — mirrors functions/textmetrics.py
def _metrics_cte() -> str:
    stop = _sql_list(STOPWORD_SET)
    return f"""
w AS (
  SELECT doc_id, source, lang, text,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS ws,
         length(text) AS n_chars
  FROM documents
),
m AS (
  SELECT doc_id, source, lang, text, n_chars,
         len(ws) AS word_count,
         CASE WHEN len(ws) > 0
              THEN list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws) END
           AS mean_word_len,
         CASE WHEN n_chars > 0
              THEN length(regexp_replace(text, '[\\p{{L}}\\p{{N}}\\s]', '', 'g'))::DOUBLE / n_chars END
           AS symbol_ratio,
         CASE WHEN len(ws) > 0
              THEN len(list_filter(ws, x -> list_contains({stop}, lower(x))))::DOUBLE / len(ws) END
           AS stopword_density,
         CASE WHEN len(ws) > 0
              THEN len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(ws) END
           AS alpha_word_ratio
  FROM w
)"""


# documents-table thresholds (texts are 15-80 words, single-line)
DOC_MIN_WORDS = 25
DOC_MAX_MEAN_WLEN = 12.0
DOC_MAX_SYMBOL = 0.12
DOC_MIN_STOPDENS = 0.03

# rules as (tag, spark_pred_builder, sql_pred) — both sides generated together
_DOC_RULES_SQL = [
    ("word_count", f"word_count < {DOC_MIN_WORDS}"),
    ("mean_word_len", f"mean_word_len > {DOC_MAX_MEAN_WLEN}"),
    ("symbol_ratio", f"symbol_ratio > {DOC_MAX_SYMBOL}"),
    ("stopword_density", f"stopword_density < {DOC_MIN_STOPDENS}"),
]


def _doc_metrics_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents", spread_on="doc_id")
    m = text_metrics(F.col("text"))
    return docs.withColumns(
        {
            "word_count": m["word_count"],
            "mean_word_len": m["mean_word_len"],
            "symbol_ratio": m["symbol_ratio"],
            "stopword_density": m["stopword_density"],
            "alpha_word_ratio": m["alpha_word_ratio"],
        }
    )


def _doc_rules_spark() -> dict[str, F.Column]:
    return {
        "word_count": F.col("word_count") < DOC_MIN_WORDS,
        "mean_word_len": F.col("mean_word_len") > DOC_MAX_MEAN_WLEN,
        "symbol_ratio": F.col("symbol_ratio") > DOC_MAX_SYMBOL,
        "stopword_density": F.col("stopword_density") < DOC_MIN_STOPDENS,
    }


# --------------------------------------------------------------- flagship


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source flag counts + keep counts (S3+P10+F7+A9 composite).

    The 'one real query' of SURVEY.md §7.2: documents → metric expressions
    → fail-flag array → explode → groupBy(source, flag).
    """
    from .functions.flags import add_flags

    df = _doc_metrics_df(spark, sf_dir)
    df = add_flags(df, "flags", _doc_rules_spark())
    df = df.withColumn("keep", F.size("flags") == 0)
    return (
        df.select("source", "keep", F.explode_outer("flags").alias("flag"))
        .groupBy("source", "flag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        )
    )


def _flagship_sql() -> str:
    per_rule = "\nUNION ALL\n".join(
        f"SELECT source, '{tag}' AS flag, count(*) AS n, 0 AS n_keep FROM mm "
        f"WHERE coalesce({pred}, false) GROUP BY source"
        for tag, pred in _DOC_RULES_SQL
    )
    all_fail = " OR ".join(f"coalesce({p}, false)" for _t2, p in _DOC_RULES_SQL)
    return f"""
WITH {_metrics_cte()},
mm AS (SELECT * FROM m)
SELECT source, flag, n, n_keep FROM (
  {per_rule}
  UNION ALL
  SELECT source, NULL AS flag, count(*) AS n, count(*) AS n_keep
  FROM mm WHERE NOT ({all_fail}) GROUP BY source
) t WHERE n > 0
"""


# ---------------------------------------------------------------- queries


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 composite per-row metrics (variant_qc analog)."""
    df = _doc_metrics_df(spark, sf_dir)
    return df.select(
        "doc_id",
        "word_count",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("symbol_ratio", 6).alias("symbol_ratio"),
        F.round("stopword_density", 6).alias("stopword_density"),
        F.round("alpha_word_ratio", 6).alias("alpha_word_ratio"),
    )


_Q_TEXT_METRICS_SQL = (
    lambda: f"""
WITH {_metrics_cte()}
SELECT doc_id, word_count,
       round(mean_word_len, 6) AS mean_word_len,
       round(symbol_ratio, 6) AS symbol_ratio,
       round(stopword_density, 6) AS stopword_density,
       round(alpha_word_ratio, 6) AS alpha_word_ratio
FROM m
"""
)


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 language-ID (expression scorer) + A4-style agreement columns."""
    docs = _t(spark, sf_dir, "documents")
    s = langid_expr(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        s["lang_id"].alias("lang_id"),
        F.round(s["lang_conf"], 6).alias("lang_conf"),
    )


def _langid_sql() -> str:
    dens = ",\n         ".join(
        f"CASE WHEN len(ws) > 0 THEN len(list_filter(ws, x -> list_contains({_sql_list(LEXICONS[lang])}, lower(x))))::DOUBLE / len(ws) END AS d_{lang}"
        for lang in LANGS
    )
    lang_expr, conf_expr = f"'{LANGS[0]}'", f"d_{LANGS[0]}"
    for lang in LANGS[1:]:
        cond = f"d_{lang} > coalesce({conf_expr}, -1.0)"
        lang_expr = f"CASE WHEN {cond} THEN '{lang}' ELSE {lang_expr} END"
        conf_expr = f"CASE WHEN {cond} THEN d_{lang} ELSE {conf_expr} END"
    return f"""
WITH w AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS ws
  FROM documents
),
d AS (
  SELECT doc_id, lang,
         {dens}
  FROM w
)
SELECT doc_id, lang,
       CASE WHEN {conf_expr} IS NULL THEN NULL ELSE {lang_expr} END AS lang_id,
       round({conf_expr}, 6) AS lang_conf
FROM d
"""


def q_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K11 regex scrub + pii_hits metric (fixed-order chain)."""
    docs = _t(spark, sf_dir, "documents", spread_on="doc_id")
    return docs.select(
        "doc_id",
        scrub_expr(F.col("text")).alias("scrubbed_text"),
        pii_hits_expr(F.col("text")).alias("pii_hits"),
    )


def _scrub_sql() -> str:
    expr = "text"
    for r in DEFAULT_RULES:
        pat = r.regex.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{r.replacement}', 'g')"
    hits = " + ".join(
        f"len(regexp_extract_all(text, '{r.regex}'))" for r in DEFAULT_RULES
    )
    return f"""
SELECT doc_id, {expr} AS scrubbed_text,
       CASE WHEN text IS NOT NULL THEN ({hits})::BIGINT END AS pii_hits
FROM documents
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex pretokens."""
    docs = _t(spark, sf_dir, "documents", spread_on="doc_id")
    return docs.select(
        "doc_id",
        whitespace_token_count(F.col("text")).alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


_Q_TOKEN_SQL = (
    lambda: f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS ws_tokens,
       CASE WHEN text IS NOT NULL
            THEN len(regexp_extract_all(text, '{BPE_ISH_PATTERN.replace("'", "''")}'))::BIGINT END AS bpe_tokens
FROM documents
"""
)


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint (order-sensitive content hash)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_fingerprint(F.col("text")).alias("fingerprint"))


_Q_FINGERPRINT_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS ws
  FROM documents
)
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT, list_transform(ws, wd ->
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(range(1, length(wd) + 1), i -> ascii(substr(wd, i, 1))::BIGINT)),
             (acc, c) -> (acc * 257 + c) % 1000000007))),
         (acc, wp) -> (acc * 257 + wp) % 1000000007
       ) AS fingerprint
FROM w
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 exact dedup: winner (min doc_id) per identical text group."""
    docs = _t(spark, sf_dir, "documents")
    w = W.partitionBy("text").orderBy("doc_id")
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.row_number().over(w).alias("rn"))
        .select("doc_id", (F.col("rn") > 1).alias("is_duplicate"))
    )


_Q_EXACT_DEDUP_SQL = """
SELECT doc_id,
       (row_number() OVER (PARTITION BY text ORDER BY doc_id)) > 1 AS is_duplicate
FROM documents WHERE text IS NOT NULL
"""


def q_histogram_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 histogram: fixed bins over n_chars (manual bucket arithmetic —
    identical in both engines)."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 50), F.lit(10)).cast("long")
    return docs.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


_Q_HIST_SQL = """
SELECT least(floor(n_chars / 50), 10)::BIGINT AS bucket, count(*) AS n
FROM documents GROUP BY 1
"""


def q_collect_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 collect-as-set + A5 collect-to-array (carrier-list analog) in one
    driver row (round-5 VERDICT #1: fit the registry to the driver's
    50-row sweep): per language, the distinct source set AND the full
    sorted doc-id list, both rendered as strings for stable hashing."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias("sources"),
            F.concat_ws(
                ",", F.array_sort(F.collect_list(F.col("doc_id").cast("string")))
            ).alias("doc_ids"),
        )
    )


_Q_COLLECT_SQL = """
SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
       array_to_string(list_sort(list(doc_id::VARCHAR)), ',') AS doc_ids
FROM documents GROUP BY lang
"""


def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 filtered aggregation (cases-vs-controls analog)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.round(F.avg(F.when(F.col("lang") == "en", F.col("n_chars"))), 6).alias("avg_chars_en"),
        F.count_if(F.col("lang") == "zh").alias("n_zh"),
        F.count(F.lit(1)).alias("n"),
    )


_Q_FILTERED_AGG_SQL = """
SELECT source,
       round(avg(CASE WHEN lang = 'en' THEN n_chars END), 6) AS avg_chars_en,
       count(*) FILTER (WHERE lang = 'zh') AS n_zh,
       count(*) AS n
FROM documents GROUP BY source
"""


def q_segment_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13/W1 batch-stratified outlier detection.

    Round-7 plan change (guide §2.4/§2.5/§3.1): the original analytic
    window ``partitionBy(source)`` shuffled and sorted the ENTIRE doc
    table into at most #sources partitions — ``source`` has a handful of
    distinct values, so at any scale the window stage runs on that many
    tasks while the rest of the cluster idles (the low-cardinality-key
    skew the guide warns about; AQE cannot split a single key). The
    per-source μ/σ is a ~#sources-row aggregate, so compute it with a
    partial-agg groupBy (map-side combine, tiny shuffle) and broadcast it
    back: the doc table is never shuffled and never sorted, and the scan
    stays fully parallel. NULL-safe join keeps the NULL-source stratum
    (a plain equi-join would drop it). Same rows, verified against the
    unchanged oracle and bit-compared with the window form."""
    docs = _t(spark, sf_dir, "documents")
    stats = docs.groupBy(F.col("source").alias("__src")).agg(
        F.avg("n_chars").alias("__mu"), F.stddev_samp("n_chars").alias("__sd")
    )
    return (
        docs.join(F.broadcast(stats), F.col("source").eqNullSafe(F.col("__src")), "left")
        .select(
            "doc_id",
            F.coalesce(
                F.abs(F.col("n_chars") - F.col("__mu")) > 2 * F.col("__sd"), F.lit(False)
            ).alias("is_outlier"),
        )
    )


_Q_SEGMENT_Z_SQL = """
SELECT doc_id,
       coalesce(abs(n_chars - avg(n_chars) OVER (PARTITION BY source))
                > 2 * stddev_samp(n_chars) OVER (PARTITION BY source), false) AS is_outlier
FROM documents
"""


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O/W top-k per group: top-3 orders per customer by totalprice.

    ``spread_on="o_custkey"`` (round 7): on an under-split orders layout
    the pre-exchange sort + partial WindowGroupLimit ran on as few tasks
    as there are row groups; hash-repartitioning on the WINDOW key to the
    session partition count satisfies the window's distribution
    requirement outright (guide §2.4 — same key, same partition count →
    the exchange is REUSED, still exactly one in the plan), so the sort +
    top-k run at full width. No-op on any adequately-split input."""
    orders = _t(spark, sf_dir, "orders", spread_on="o_custkey")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


_Q_TOPK_SQL = """
SELECT o_custkey, o_orderkey, rk FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) t WHERE rk <= 3
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 anti-join: customers with no orders (sample-removal analog)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


_Q_ANTI_SQL = """
SELECT c_custkey, c_nationkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
"""


def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 keyed-lookup join + A9 grouped agg: revenue per nation.

    Small dims broadcast (the reference's resource-table joins)."""
    cust = _t(spark, sf_dir, "customer")
    # the broadcast joins + partial agg fuse into the orders scan stage, so
    # an under-split orders layout (2 row groups at sf1.0) serializes the
    # whole probe side — spread it (no-op when the layout is already wide)
    orders = _t(spark, sf_dir, "orders", spread_on="o_orderkey")
    nation = _t(spark, sf_dir, "nation")
    df = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return df


_Q_JOIN_AGG_SQL = """
SELECT n_name,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 semi-structured extraction over events.props."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


_Q_JSON_SQL = """
SELECT event_type,
       CAST(sum(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def q_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 time bucketing: hourly event rollup."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 4).alias("sum_value"),
    )


_Q_TIME_SQL = """
SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY 1
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap sessions per user (lag + cumsum)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ: take epoch seconds via pure wall-clock arithmetic
    # (timestampdiff on NTZ), NOT a cast through the session timezone — a
    # non-UTC driver session would shift gaps across DST transitions
    epoch = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.select("user_id", new_sess.alias("ns"))
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"))
    )


_Q_SESSION_SQL = """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS ns
  FROM events
)
SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions FROM g GROUP BY user_id
"""


def q_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 many-aggregate scan (TPC-H Q1 shape). Double sums go through
    DECIMAL(38,6) so the result is exact and order-independent."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(38,6)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double"), 4).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 4).alias("sum_base_price"),
            F.round(
                F.sum(
                    (dec("l_extendedprice") * (F.lit(1).cast("decimal(38,6)") - dec("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ).cast("double"),
                4,
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q_TPCH_SQL = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_base_price,
       round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * (CAST(1 AS DECIMAL(38,6)) - CAST(l_discount AS DECIMAL(38,6))) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 semi-join: orders whose customer is in nations 0-4 (left_semi)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_Q_SEMI_SQL = """
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_nationkey < 5)
GROUP BY o_orderstatus
"""


def q_union_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 union-cols + J7 union-rows + P12 distinct in one driver row
    (round-5 VERDICT #1): recombine two column-disjoint projections of the
    documents table by row key (Hail ``union_cols`` analog, including the
    ``_r`` suffix rule on the deliberately overlapping ``n_chars``
    column), slice the recombined table by language, stack the slices
    with ``unionByName``, and deduplicate the value combinations."""
    from .operators.enrich import union_cols

    docs = _t(spark, sf_dir, "documents")
    left = docs.select("doc_id", "lang", "n_chars")
    right = docs.select("doc_id", "source", F.col("n_chars"))
    wide = union_cols(left, right, key="doc_id").select(
        "source", "lang", "n_chars", "n_chars_r"
    )
    en = wide.filter(F.col("lang") == "en")
    fr = wide.filter(F.col("lang") == "fr")
    return en.unionByName(fr).distinct()


_Q_UNION_SQL = """
SELECT DISTINCT b.source, a.lang, a.n_chars, b.n_chars AS n_chars_r
FROM documents a JOIN documents b ON a.doc_id = b.doc_id
WHERE a.lang IN ('en', 'fr')
"""


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 moment stats struct per group (hl.agg.stats analog)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.round(F.avg("n_chars"), 4).alias("mean"),
        F.round(F.stddev_samp("n_chars"), 4).alias("stdev"),
        F.min("n_chars").alias("min"),
        F.max("n_chars").alias("max"),
        F.count("n_chars").alias("n"),
        F.sum("n_chars").alias("sum"),
    )


_Q_STATS_SQL = """
SELECT lang, round(avg(n_chars), 4) AS mean, round(stddev_samp(n_chars), 4) AS stdev,
       min(n_chars) AS min, max(n_chars) AS max, count(n_chars) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum
FROM documents GROUP BY lang
"""


def q_explode_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 explode + A9 + O ordered limit: top-20 words in en docs."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        docs.select(F.explode(words_expr(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


_Q_TOP_WORDS_SQL = """
SELECT word, count(*) AS n FROM (
  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')) AS word
  FROM documents WHERE lang = 'en'
) t
GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 point-in-interval annotation via broadcast range join."""
    docs = _t(spark, sf_dir, "documents")
    bands = docs.sparkSession.createDataFrame(
        [("xs", 0, 100), ("s", 100, 250), ("m", 250, 400), ("l", 400, 1_000_000)],
        "band string, lo int, hi int",
    )
    joined = docs.join(
        F.broadcast(bands), (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") < F.col("hi")), "left"
    )
    return joined.groupBy("band").agg(F.count(F.lit(1)).alias("n"))


_Q_INTERVAL_SQL = """
WITH bands(band, lo, hi) AS (VALUES ('xs', 0, 100), ('s', 100, 250), ('m', 250, 400), ('l', 400, 1000000))
SELECT band, count(*) AS n
FROM documents LEFT JOIN bands ON n_chars >= lo AND n_chars < hi
GROUP BY band
"""


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4/K5 exact n-gram Jaccard near-dup pairs, blocked by source."""
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id").alias("k"), F.col("source").alias("blk"),
        word_shingles(F.col("text"), 3).alias("sh"),
    ).filter(F.size("sh") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.k") < F.col("b.k")))
        .select(
            F.col("a.k").alias("a"),
            F.col("b.k").alias("b"),
            F.round(inter / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.05)
    )


_Q_JACCARD_SQL = """
WITH s AS (
  SELECT doc_id AS k, source AS blk,
         list_distinct(
           CASE WHEN len(ws) >= 3
                THEN list_transform(range(1, len(ws) - 1), i -> array_to_string(list_slice(ws, i, i + 2), ' '))
                WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                ELSE [] END) AS sh
  FROM (
    SELECT doc_id, source,
           list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS ws
    FROM documents
  ) w
  WHERE len(sh) > 0
)
SELECT a.k AS a, b.k AS b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM s a JOIN s b ON a.blk = b.blk AND a.k < b.k
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.05
"""


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: brute-force cosine top-3 (the exactness baseline) UNIONed with
    the IVF assign→probe→top-k path under an ``algo`` discriminator — one
    driver row checks both engines against their independent full oracles
    (round-5 VERDICT #1). Brute ties are deterministic by neighbor id; the
    IVF leg uses FIXED literal centroids so the whole plan is
    SQL-mirrorable (k-means-lite training determinism is pinned in
    tests/test_similarity.py)."""
    from .operators.similarity import cosine_topk_brute, cosine_topk_ivf

    emb = _t(spark, sf_dir, "embeddings")
    brute = cosine_topk_brute(emb, emb.filter(F.col("vec_id") < 5), k=3)
    cents = spark.createDataFrame(
        _ivf_centroids(), "centroid_id long, centroid array<double>"
    )
    ivf = cosine_topk_ivf(emb, emb.filter(F.col("vec_id") < 5), cents, k=3, n_probe=2)
    cols = ["query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank"]
    return brute.select(F.lit("brute").alias("algo"), *cols).unionByName(
        ivf.select(F.lit("ivf").alias("algo"), *cols)
    )


def _emb_topk_sql() -> str:
    return f"""
SELECT 'brute' AS algo, * FROM ({_Q_EMB_TOPK_SQL})
UNION ALL
SELECT 'ivf' AS algo, * FROM ({_ivf_topk_sql()})
"""


_Q_EMB_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cosine
  FROM q JOIN c ON neighbor_id <> query_id
),
r AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, rank FROM r WHERE rank <= 3
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label blocks (exact verify path
    of the vector-LSH dedup)."""
    emb = _t(spark, sf_dir, "embeddings")
    from .functions.arrays import cosine_expr

    a = emb.select(F.col("vec_id").alias("a"), F.col("label").alias("la"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("label").alias("lb"), F.col("embedding").alias("vb"))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("a") < F.col("b")))
        .select("a", "b", F.round(cosine_expr(F.col("va"), F.col("vb")), 4).alias("cosine"))
        .filter(F.col("cosine") >= 0.5)
    )


_Q_EMB_NEARDUP_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.5
"""


def q_doc_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc keep/drop verdict from the documents-table rule set (the
    F1-comparable per-record decision column)."""
    from .functions.flags import add_flags

    df = _doc_metrics_df(spark, sf_dir)
    df = add_flags(df, "flags", _doc_rules_spark())
    return df.select(
        "doc_id",
        (F.size("flags") == 0).alias("keep"),
        F.concat_ws(",", F.array_sort("flags")).alias("fail_reasons"),
    )


def _doc_verdicts_sql() -> str:
    tags = ",\n".join(
        f"CASE WHEN coalesce({pred}, false) THEN '{tag}' END" for tag, pred in _DOC_RULES_SQL
    )
    return f"""
WITH {_metrics_cte()},
fl AS (
  SELECT doc_id, list_filter([{tags}], x -> x IS NOT NULL) AS flags FROM m
)
SELECT doc_id, len(flags) = 0 AS keep,
       coalesce(array_to_string(list_sort(flags), ','), '') AS fail_reasons
FROM fl
"""


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4/J6 MinHash-LSH candidate pairs, ORACLE-CHECKED: same banding /
    bucket-cap / pairing code path as production ``flag_near_duplicates``,
    with the SQL-reproducible polynomial base hash (``arithmetic=True``)
    so DuckDB mirrors every signature slot verbatim. The xxhash64+numpy
    production kernel is pinned against exact Jaccard in tests/test_dedup.
    """
    from .operators.dedup import minhash_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_candidate_pairs(
        docs, key_col="doc_id", num_perm=_MH_ORACLE_PERM, bands=_MH_ORACLE_BANDS,
        arithmetic=True,
    ).select("a", "b", F.round("jaccard_est", 6).alias("jaccard_est"))


_MH_ORACLE_PERM, _MH_ORACLE_BANDS = 32, 8


def _minhash_sql(
    num_perm: int = _MH_ORACLE_PERM,
    bands: int = _MH_ORACLE_BANDS,
    shingle_n: int = 3,
    max_bucket: int = 200,
    seed: int = 42,
) -> str:
    """DuckDB mirror of the arithmetic MinHash-LSH pipeline, generated from
    the SAME permutation constants (``_mh_params``) the Spark side uses."""
    from .functions.hashing import _MH_PRIME, _mh_params, POLY_BASE, POLY_MOD

    params = _mh_params(num_perm, seed)
    rpb = num_perm // bands
    mins = ",\n    ".join(
        f"list_min(list_transform(hs, h -> (h*{a} + {b}) % {_MH_PRIME}))" for a, b in params
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT k, {b} AS band, array_to_string(list_slice(sig, {b * rpb + 1}, {b * rpb + rpb}), ',') AS bucket FROM sig_t"
        for b in range(bands)
    )
    return f"""
WITH w AS (
  SELECT doc_id AS k,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS ws
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
sh AS (
  SELECT k,
         list_distinct(CASE WHEN len(ws) >= {shingle_n}
              THEN list_transform(range(1, len(ws) - {shingle_n - 2}), i -> array_to_string(list_slice(ws, i, i + {shingle_n - 1}), ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END) AS sh
  FROM w
),
hs_t AS (
  SELECT k, list_transform(sh, s ->
      list_reduce(list_prepend(0::BIGINT,
          list_transform(range(1, length(s) + 1), i -> ascii(substr(s, i, 1))::BIGINT)),
        (acc, c) -> (acc * {POLY_BASE} + c) % {POLY_MOD})) AS hs
  FROM sh
),
sig_t AS (
  SELECT k, [{mins}] AS sig FROM hs_t WHERE len(hs) > 0
),
banded AS (
  {band_rows}
),
grouped AS (
  SELECT band, bucket, list_slice(list_sort(list(k)), 1, {max_bucket}) AS ks
  FROM banded GROUP BY band, bucket
),
capped AS (SELECT band, bucket, unnest(ks) AS k FROM grouped WHERE len(ks) > 1),
pairs AS (
  SELECT DISTINCT x.k AS a, y.k AS b
  FROM capped x JOIN capped y ON x.band = y.band AND x.bucket = y.bucket AND x.k < y.k
)
SELECT p.a, p.b,
       round(list_sum(list_transform(range(1, {num_perm + 1}),
             i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / {num_perm}.0, 6) AS jaccard_est
FROM pairs p JOIN sig_t sa ON sa.k = p.a JOIN sig_t sb ON sb.k = p.b
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 SimHash sketch column, ORACLE-CHECKED via the 30-bit polynomial
    variant (same shingle/vote/sign algorithm as the production
    ``simhash64``, whose xxhash64 kernel + hamming blocking are pinned in
    tests/test_dedup)."""
    from .functions.hashing import simhash_poly

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash_poly(F.col("text")).alias("simhash"))


def _simhash_sql(bits: int = 30) -> str:
    from .functions.hashing import POLY_BASE, POLY_MOD

    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS ws
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(ws) >= 2
              THEN list_transform(range(1, len(ws)), i -> array_to_string(list_slice(ws, i, i + 1), ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END) AS sh
  FROM w
),
hs_t AS (
  SELECT doc_id, list_transform(sh, s ->
      list_reduce(list_prepend(0::BIGINT,
          list_transform(range(1, length(s) + 1), i -> ascii(substr(s, i, 1))::BIGINT)),
        (acc, c) -> (acc * {POLY_BASE} + c) % {POLY_MOD})) AS hs
  FROM sh
),
v AS (
  SELECT doc_id,
         list_transform(range(0, {bits}), j ->
             list_sum(list_transform(hs, h ->
                 CASE WHEN (h >> j::INTEGER) & 1 = 1 THEN 1::BIGINT ELSE -1::BIGINT END))) AS votes
  FROM hs_t
)
SELECT doc_id,
       CAST(coalesce(list_sum(list_transform(range(0, {bits}), j ->
            CASE WHEN votes[j + 1] > 0 THEN (1::BIGINT << j::INTEGER) ELSE 0::BIGINT END)), 0) AS BIGINT) AS simhash
FROM v
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score over the metric columns."""
    df = _doc_metrics_df(spark, sf_dir)
    df = df.withColumn(
        "dup_line_frac", F.lit(0.0)
    )  # single-line docs: constant, keeps score comparable
    from .operators.tokenize import quality_score_expr

    return df.select("doc_id", F.round(quality_score_expr(), 6).alias("quality_score"))


_Q_QUALITY_SQL = (
    lambda: f"""
WITH {_metrics_cte()}
SELECT doc_id,
  CASE WHEN stopword_density IS NOT NULL AND alpha_word_ratio IS NOT NULL
            AND symbol_ratio IS NOT NULL THEN
  round(greatest(0.0, least(1.0,
      0.25 * greatest(0.0, least(1.0, stopword_density / 0.4))
    + 0.25 * greatest(0.0, least(1.0, alpha_word_ratio))
    + 0.25 * greatest(0.0, least(1.0, 1.0 - symbol_ratio / 0.2))
    + 0.25 * greatest(0.0, least(1.0, 1.0 - 0.0)))), 6) END AS quality_score
FROM m
"""
)


# ------------------------------------------------------------- registry

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "flagship_flag_counts": (flagship, _flagship_sql()),
    "text_metrics": (q_text_metrics, _Q_TEXT_METRICS_SQL()),
    "scrub_pii": (q_scrub, _scrub_sql()),
    "token_counts": (q_token_counts, _Q_TOKEN_SQL()),
    "fingerprint": (q_fingerprint, _Q_FINGERPRINT_SQL),
    "exact_dedup": (q_exact_dedup, _Q_EXACT_DEDUP_SQL),
    "histogram_chars": (q_histogram_chars, _Q_HIST_SQL),
    "collect_sets": (q_collect_sets, _Q_COLLECT_SQL),
    "filtered_agg": (q_filtered_agg, _Q_FILTERED_AGG_SQL),
    "segment_zscore": (q_segment_zscore, _Q_SEGMENT_Z_SQL),
    "window_topk": (q_window_topk, _Q_TOPK_SQL),
    "anti_join": (q_anti_join, _Q_ANTI_SQL),
    "join_agg_revenue": (q_join_agg, _Q_JOIN_AGG_SQL),
    "json_props": (q_json_props, _Q_JSON_SQL),
    "time_window": (q_time_window, _Q_TIME_SQL),
    "sessionize": (q_sessionize, _Q_SESSION_SQL),
    "tpch_pricing": (q_tpch_pricing, _Q_TPCH_SQL),
    "semi_join": (q_semi_join, _Q_SEMI_SQL),
    "union_ops": (q_union_ops, _Q_UNION_SQL),
    "stats_moments": (q_stats_moments, _Q_STATS_SQL),
    "explode_top_words": (q_explode_top_words, _Q_TOP_WORDS_SQL),
    "interval_join": (q_interval_join, _Q_INTERVAL_SQL),
    "jaccard_pairs": (q_jaccard_pairs, _Q_JACCARD_SQL),
    "embedding_neardup": (q_embedding_neardup, _Q_EMB_NEARDUP_SQL),
    "doc_verdicts": (q_doc_verdicts, _doc_verdicts_sql()),
    "quality_score": (q_quality_score, _Q_QUALITY_SQL()),
    "minhash_pairs": (q_minhash_pairs, _minhash_sql()),
    "simhash_sketch": (q_simhash, _simhash_sql()),
}


def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 CUBE grouping-sets rollup over (lang, source); the (lang)
    grouping set IS the A4 counter (group-count-to-dict analog), folded
    in here per round-5 VERDICT #1."""
    docs = _t(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("sum_chars")
    )


_Q_CUBE_SQL = """
SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY CUBE (lang, source)
"""


def q_sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 deterministic ~20% sampling (``mt.sample_rows`` analog,
    variant_qc.py:48) via a Knuth multiplicative-hash gate on the key —
    exactly reproducible in ANSI SQL, unlike engine RNG streams, and
    partition-layout-independent at any scale (``df.sample(seed=...)``
    remains available as the RNG path; its per-seed determinism is pinned
    in tests/test_properties.py).

    Multiplicative hashing mixes only into the HIGH bits, so the gate
    takes ``>> 16`` before the mod (round-2 ADVICE: the bare
    ``(id*K) % 100`` was a bijection on residues — systematic, not
    hashed, sampling); the key is masked to 31 bits first so the int64
    product can never overflow (Spark wraps silently where DuckDB raises,
    so an unguarded multiply diverges between engines at doc_id ≥ ~3.5e9).
    """
    docs = _t(spark, sf_dir, "documents")
    mixed = F.shiftright(F.col("doc_id"), 31).bitwiseXOR(F.col("doc_id"))
    gate = F.pmod(
        F.shiftright(mixed.bitwiseAND(F.lit(2147483647)) * F.lit(2654435761), 16),
        F.lit(100),
    )
    return docs.filter(gate < 20).select("doc_id")


_Q_SAMPLE_SQL = """
SELECT doc_id FROM documents
WHERE (((xor(doc_id >> 31, doc_id) & 2147483647) * 2654435761) >> 16) % 100 < 20
"""


def q_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6/K7 distributed PCA + expression projection, oracle-checked via
    SIGN-INVARIANT facts (round-4 VERDICT #5 — this was the one rows-only
    query): SVD sign/rotation conventions block value equality on the
    scores themselves, but a FULL-RANK fit (k = dim) yields an orthonormal
    basis, so two exact invariants are SQL-checkable per row / globally
    with no SVD in the oracle:

    * ``score_norm`` — ‖P·x‖ = ‖x‖ for every row (orthogonal transforms
      preserve norms; DuckDB recomputes ‖x‖ straight from the parquet);
    * ``total_var`` — Σⱼ var(pcⱼ) = trace of the covariance =
      Σᵢ var(xᵢ) (orthogonal invariance of the trace; DuckDB recomputes
      the right-hand side with ``generate_subscripts`` + ``var_samp``).

    Both run through the REAL fit (``pyspark.ml`` PCA → loadings) and the
    REAL expression projection (``project_pcs``) — a wrong eigenbasis, a
    non-orthonormal loading, or a projection bug breaks the hash.

    Also carries the K7 ``pc_project`` fixed-loading projection
    (``fixed_pc1``/``fixed_pc2`` onto literal axes — a deterministic
    left-fold dot product whose values ARE directly SQL-comparable),
    folded into this driver row per round-5 VERDICT #1."""
    from functools import reduce

    from .operators.pca import fit_pca, project_pcs

    emb = _t(spark, sf_dir, "embeddings")
    dim = 64
    loadings = fit_pca(emb, k=dim)
    scored = project_pcs(emb, loadings)
    pc_cols = [f"pc{j + 1}" for j in range(dim)]
    norm = F.sqrt(reduce(lambda a, c: a + F.col(c) * F.col(c), pc_cols, F.lit(0.0)))
    total = scored.agg(
        F.round(
            reduce(lambda a, c: a + F.var_samp(F.col(c)), pc_cols, F.lit(0.0)), 4
        ).alias("total_var")
    )
    fixed = project_pcs(emb, [_PC_AXIS_1, _PC_AXIS_2]).select(
        "vec_id",
        F.round("pc1", 4).alias("fixed_pc1"),
        F.round("pc2", 4).alias("fixed_pc2"),
    )
    return (
        scored.select("vec_id", F.round(norm, 4).alias("score_norm"))
        .crossJoin(F.broadcast(total))
        .join(fixed, "vec_id")
    )


def _pca_scores_sql() -> str:
    def chain(axis: list[float]) -> str:
        e = "0.0"
        for i, v in enumerate(axis):
            e = f"({e} + embedding[{i + 1}]::DOUBLE * {v!r})"
        return e

    return f"""
WITH sq AS (
  SELECT vec_id, round(sqrt(sum(CAST(v AS DOUBLE) * v)), 4) AS score_norm
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
  GROUP BY vec_id
),
tv AS (
  SELECT round(sum(vv), 4) AS total_var FROM (
    SELECT var_samp(CAST(v AS DOUBLE)) AS vv
    FROM (SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
          FROM embeddings)
    GROUP BY i
  )
),
fx AS (
  SELECT vec_id, round({chain(_PC_AXIS_1)}, 4) AS fixed_pc1,
         round({chain(_PC_AXIS_2)}, 4) AS fixed_pc2
  FROM embeddings
)
SELECT sq.vec_id, score_norm, total_var, fixed_pc1, fixed_pc2
FROM sq CROSS JOIN tv JOIN fx ON sq.vec_id = fx.vec_id
"""


def q_flatten_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 struct flatten: build a nested struct, flatten to columns."""
    from .sources.sinks import flatten_structs

    docs = _t(spark, sf_dir, "documents")
    nested = docs.select(
        "doc_id",
        F.struct(F.col("lang").alias("lang"), F.col("source").alias("source")).alias("meta"),
        F.struct(F.col("n_chars").alias("chars")).alias("size"),
    )
    return flatten_structs(nested)


_Q_FLATTEN_SQL = """
SELECT doc_id, lang AS meta_lang, source AS meta_source, n_chars AS size_chars
FROM documents
"""


def _session_scratch(spark: SparkSession, name: str) -> str:
    """Stable per-session scratch dir under /tmp: overwritten within a
    session (no per-sweep leak), scoped by applicationId so concurrent
    sweeps on one host never clobber each other mid-read (round-5
    ADVICE), and registered for atexit removal so the per-session copy
    does not accumulate across sessions either (round-6 review)."""
    import atexit
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(),
        f"eqls_scratch_{spark.sparkContext.applicationId}",
    )
    if root not in _SCRATCH_ROOTS:
        _SCRATCH_ROOTS.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return os.path.join(root, name)


_SCRATCH_ROOTS: set[str] = set()


def q_jsonl_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 external-interchange export (plink-export analog): round-trip the
    documents table through gzipped JSON-lines shards and return what an
    external consumer would read back. The oracle is the identity SELECT —
    a full value-hash match proves the export preserves every value
    (including multi-line / non-ASCII text) byte-exactly through the
    text-format hand-off. Read-back uses an explicit schema: inference on
    an export is a trap (an all-null column would vanish)."""
    from .sources.sinks import export_jsonl

    docs = _t(spark, sf_dir, "documents")
    # STABLE scratch path, overwritten per invocation — a fresh mkdtemp
    # per oracle sweep would leak a full table copy into /tmp every run;
    # session-scoped + atexit-cleaned via _session_scratch.
    path = _session_scratch(spark, "jsonl_export/docs")
    export_jsonl(
        docs,
        path,
        columns=("doc_id", "text", "lang", "source", "n_chars"),
        keep_col=None,
    )
    return spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(path)


_Q_JSONL_EXPORT_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def q_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 snapshot maintenance: checkpoint the documents table as a
    many-small-files snapshot, run :meth:`CheckpointStore.compact`
    (the Iceberg ``rewrite_data_files`` analog — at 10^12-doc scale
    per-stage snapshots written by thousands of tasks need periodic
    file-count maintenance or scan planning degrades), and return what a
    downstream consumer reads from the compacted snapshot. The identity
    oracle proves the rewrite preserves every value; the companion pytest
    pins the mechanics (file counts, manifest enrichment, partitioned
    layout, crash-window invariant)."""
    from .sources.checkpoint import CheckpointStore

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # stable, overwritten, session-scoped + atexit-cleaned scratch root
    store = CheckpointStore(spark, _session_scratch(spark, "compact_store"))
    store.vacuum()  # clear any crash leftovers from a previous sweep
    store.write(docs.repartition(16), "docs", count_rows=False)
    rec = store.compact("docs", target_file_bytes=1 << 30)
    if not (rec.get("compacted") and rec["files_after"] < rec["files_before"]):
        # explicit raise, not `assert`: the gate must survive python -O
        raise RuntimeError(f"compaction did not reduce the snapshot: {rec}")
    return store.read("docs")


_Q_COMPACT_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""

# ------------------------------------------- round-2 oracle additions
# (VERDICT.md next-steps #3/#4/#8: oracle rows for the operators that had
# only pytest evidence, plus the media-metadata operator)


def q_host_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 composite per-host QC metrics (``hl.sample_qc`` analog) through
    the REAL salted two-level aggregation operator; hosts synthesized
    deterministically from ``source`` so the oracle can re-derive them."""
    from .operators.host_qc import host_metrics

    docs = _doc_metrics_df(spark, sf_dir).withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d"),
            F.col("doc_id").cast("string"),
        ),
    )
    hm = host_metrics(docs, url_col="url", measures=("word_count",))
    return hm.select(
        "host",
        "n_docs",
        F.col("mean_word_count"),
        # round-4 VERDICT #7: dispersion + extreme-value fields (the
        # reference's per-sample struct carries stdev/min/max consumed
        # downstream). The sd recombination is exact integer arithmetic
        # until the final sqrt — bit-identical to the DuckDB mirror.
        F.col("sd_word_count"),
        F.col("min_word_count"),
        F.col("max_word_count"),
    )


def _host_metrics_sql() -> str:
    # sd mirrors host_metrics' sum-of-squares recombination verbatim:
    # products/sums of int word_count are exact in double (< 2^53), so
    # both engines evaluate the identical IEEE expression
    return f"""
WITH {_metrics_cte()},
d AS (SELECT lower(source || '.example.com') AS host, word_count FROM m)
SELECT host, count(*) AS n_docs,
       CAST(sum(word_count) AS DOUBLE) / count(word_count) AS mean_word_count,
       CASE WHEN count(word_count) > 1 THEN
         sqrt(greatest(sum(CAST(word_count AS DOUBLE) * word_count)
                       - CAST(sum(word_count) AS DOUBLE) * CAST(sum(word_count) AS DOUBLE)
                         / count(word_count), 0.0)
              / (count(word_count) - 1))
       END AS sd_word_count,
       min(word_count) AS min_word_count,
       max(word_count) AS max_word_count
FROM d GROUP BY host
"""


def q_host_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 batch-stratified host outlier flags — the full
    ``flag_host_outliers`` path (salted host agg → per-batch μ/σ →
    broadcast join-back), stratified by ``lang`` as the batch key."""
    from .operators.host_qc import flag_host_outliers

    docs = _doc_metrics_df(spark, sf_dir).withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d"),
            F.col("doc_id").cast("string"),
        ),
    )
    out = flag_host_outliers(
        docs, url_col="url", batch_col="lang", measures=("word_count",),
        k_sigma=1.0, flag_col="host_flags",
    )
    return out.select(
        "doc_id", F.array_contains("host_flags", "host_outlier").alias("host_outlier")
    )


def _host_outliers_sql() -> str:
    return f"""
WITH {_metrics_cte()},
d AS (SELECT doc_id, lower(source || '.example.com') AS host, lang, word_count FROM m),
hm AS (
  SELECT host, lang,
         CAST(sum(word_count) AS DOUBLE) / count(word_count) AS mwc
  FROM d GROUP BY host, lang
),
st AS (SELECT lang, avg(mwc) AS mu, stddev_samp(mwc) AS sd FROM hm GROUP BY lang),
bad AS (
  SELECT DISTINCT hm.host, hm.lang FROM hm
  JOIN st ON hm.lang IS NOT DISTINCT FROM st.lang
  WHERE coalesce(sd > 1e-9 * greatest(abs(mu), 1.0)
                 AND abs(mwc - mu) > 1.0 * sd, false)
)
SELECT d.doc_id, (b.host IS NOT NULL) AS host_outlier
FROM d LEFT JOIN bad b
  ON d.host = b.host AND d.lang IS NOT DISTINCT FROM b.lang
"""


def q_iterative_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 iterative global-stat outlier loop (the reference's PCA-outlier
    iteration, samples_qc.py:131-257) with max_iter=2 so the oracle can
    unroll both rounds explicitly."""
    from .operators.outliers import flag_iterative_outliers

    docs = _t(spark, sf_dir, "documents")
    out = flag_iterative_outliers(
        docs, measures=("n_chars",), k_sigma=2.0, max_iter=2,
        flag_col="out_flags", tag="metric_outlier",
    )
    return out.select(
        "doc_id", F.array_contains("out_flags", "metric_outlier").alias("is_outlier")
    )


_Q_ITER_OUTLIERS_SQL = """
WITH s1 AS (SELECT avg(n_chars) AS mu1, stddev_samp(n_chars) AS sd1 FROM documents),
r1 AS (
  SELECT doc_id, n_chars,
         coalesce(sd1 IS NOT NULL AND sd1 > 1e-9 * greatest(abs(mu1), 1.0)
                  AND abs(n_chars - mu1) > 2.0 * sd1, false) AS out1
  FROM documents, s1
),
s2 AS (SELECT avg(n_chars) AS mu2, stddev_samp(n_chars) AS sd2 FROM r1 WHERE NOT out1)
SELECT doc_id,
       (out1 OR coalesce(sd2 IS NOT NULL AND sd2 > 1e-9 * greatest(abs(mu2), 1.0)
                         AND abs(n_chars - mu2) > 2.0 * sd2, false))
         AS is_outlier
FROM r1, s2
"""


def q_perplexity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12/K3 threshold-into-flag semantics of ``flag_high_perplexity``
    (two-threshold sex-imputation analog incl. ``missing_*`` tagging),
    fed an IEEE-exact rational perplexity proxy so both engines compute
    bit-identical inputs (the NB-model perplexity itself is pinned in
    tests/test_perplexity.py)."""
    from .operators.perplexity import flag_high_perplexity

    df = _doc_metrics_df(spark, sf_dir).withColumn(
        "perplexity", F.col("mean_word_len") / (F.col("stopword_density") + F.lit(0.05))
    )
    out = flag_high_perplexity(df, max_perplexity=40.0, flag_col="ppl_flags")
    return out.select(
        "doc_id", F.concat_ws(",", F.array_sort("ppl_flags")).alias("flags")
    )


def _perplexity_flags_sql() -> str:
    return f"""
WITH {_metrics_cte()},
p AS (SELECT doc_id, mean_word_len / (stopword_density + 0.05) AS ppl FROM m)
SELECT doc_id,
       CASE WHEN ppl IS NULL THEN 'missing_perplexity'
            WHEN ppl > 40.0 THEN 'perplexity'
            ELSE '' END AS flags
FROM p
"""


def q_langid_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 language-ID (expression scorer) joined with the A12/K3
    perplexity threshold-into-flag semantics — the two scorers share one
    fused pass in production (``operators/langid.py``), so the registry
    checks them as a single driver row (round-5 VERDICT #1: fit the
    registry to the driver's 50-row sweep). Both component queries keep
    their own oracle SQL generators; this composes them with a key join."""
    return q_langid(spark, sf_dir).join(q_perplexity_flags(spark, sf_dir), "doc_id")


def _langid_perplexity_sql() -> str:
    return f"""
WITH L AS ({_langid_sql()}),
P AS ({_perplexity_flags_sql()})
SELECT L.doc_id, L.lang, L.lang_id, L.lang_conf, P.flags
FROM L JOIN P ON L.doc_id = P.doc_id
"""


def q_ingest_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 ingest extraction (split-multi analog): synthesize page bytes
    from ``text``, run the REAL expression extractor, assert round-trip —
    byte-level NFC/NFD/emoji identity is additionally pinned in
    tests/test_ingest.py."""
    from .operators.ingest import ingest_pages

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.encode(
            F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")),
            "UTF-8",
        ).alias("html"),
    )
    out = ingest_pages(pages)
    return out.select("doc_id", "extracted_text", "was_extracted")


_Q_INGEST_SQL = """
SELECT doc_id,
       CASE WHEN text IS NOT NULL
            THEN regexp_extract('<html><body><p>' || text || '</p></body></html>',
                                '(?s)<p>(.*)</p>', 1) END AS extracted_text,
       (text IS NOT NULL) AS was_extracted
FROM documents
"""


_PC_AXIS_1 = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]
_PC_AXIS_2 = [i / 64.0 for i in range(64)]  # exact binary fractions


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata operator: opaque binary payload → sniffed media
    type (magic numbers), byte length, content sha256 — pure expressions
    (the byte-feature kernel is pinned in tests/test_tokenize_multimodal)."""
    from .operators.multimodal import with_media_metadata

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    out = with_media_metadata(pages, bin_col="payload")
    return out.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.sha256").alias("sha256"),
    )


def _media_meta_sql() -> str:
    from .operators.multimodal import _MAGIC

    whens = "\n       ".join(
        "WHEN "
        + " AND ".join(f"substr(hx, {off}, {len(p)}) = '{p}'" for p, off in conds)
        + f" THEN '{mt}'"
        for conds, mt in _MAGIC
    )
    return f"""
WITH h AS (
  SELECT doc_id, text,
         CASE WHEN text IS NOT NULL THEN substr(hex(encode(text)), 1, 24) END AS hx
  FROM documents
)
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL
       {whens}
       ELSE 'application/octet-stream' END AS media_type,
       CASE WHEN text IS NOT NULL THEN CAST(octet_length(encode(text)) AS BIGINT) END AS n_bytes,
       CASE WHEN text IS NOT NULL THEN sha256(text) END AS sha256
FROM h
"""


# ------------------------------------------- round-3 oracle additions


def _ivf_centroids() -> list[tuple[int, list[float]]]:
    """Four fixed 64-d centroids with exact binary-fraction coordinates
    (float→double conversion exact in both engines)."""
    return [
        (j, [(((i + j) % 5) - 2) / 4.0 for i in range(64)]) for j in range(1, 5)
    ]


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN path (assign → probe → top-k) with FIXED literal centroids so
    the whole plan is deterministic and SQL-mirrorable (round-2 VERDICT #5);
    the k-means-lite *training* determinism is pinned in
    tests/test_similarity.py."""
    from .operators.similarity import cosine_topk_ivf

    emb = _t(spark, sf_dir, "embeddings")
    cents = spark.createDataFrame(
        _ivf_centroids(), "centroid_id long, centroid array<double>"
    )
    out = cosine_topk_ivf(emb, emb.filter(F.col("vec_id") < 5), cents, k=3, n_probe=2)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


def _ivf_topk_sql() -> str:
    vals = ",\n  ".join(
        f"({cid}, {vec!r}::DOUBLE[])" for cid, vec in _ivf_centroids()
    )
    return f"""
WITH cent(cid, cv) AS (VALUES
  {vals}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
asn AS (
  SELECT vec_id, ev, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_cosine_similarity(ev, cv) DESC, cid) AS rn
  FROM c CROSS JOIN cent
),
corp AS (SELECT vec_id, ev, cid FROM asn WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
qp AS (
  SELECT query_id, qv, cid,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, cv) DESC, cid) AS prn
  FROM q CROSS JOIN cent
),
probes AS (SELECT query_id, qv, cid FROM qp WHERE prn <= 2),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, list_cosine_similarity(p.qv, a.ev) AS cosine
  FROM probes p JOIN corp a USING (cid)
  WHERE a.vec_id <> p.query_id
),
r AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, rank FROM r WHERE rank <= 3
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs sharing a word n-gram with the eval
    set (here: every 97th doc) are flagged. Runs the REAL operator in its
    string-join form (``hashed=False``); the xxhash64 production path is
    pinned equal in tests/test_decontaminate_sampling.py."""
    from .operators.decontaminate import flag_contaminated

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = flag_contaminated(
        docs, bench, key_col="doc_id", n=3, hashed=False, flag_col="decon_flags"
    )
    return out.select(
        "doc_id", F.array_contains("decon_flags", "contaminated").alias("contaminated")
    )


_Q_DECON_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS ws
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(ws) >= 3
              THEN list_transform(range(1, len(ws) - 1), i -> array_to_string(list_slice(ws, i, i + 2), ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END) AS sh
  FROM w
),
lens AS (
  SELECT DISTINCT len(ws) AS L FROM w
  WHERE doc_id % 97 = 0 AND len(ws) > 0 AND len(ws) < 3
),
shl AS (
  SELECT w.doc_id,
         list_distinct(CASE WHEN len(ws) >= L
              THEN list_transform(range(1, len(ws) - L + 2), i -> array_to_string(list_slice(ws, i, i + L - 1), ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END) AS sh
  FROM w CROSS JOIN lens
),
bench AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 97 = 0),
dg AS (
  SELECT doc_id, unnest(sh) AS g FROM sh
  UNION
  SELECT doc_id, unnest(sh) AS g FROM shl
),
hits AS (SELECT DISTINCT dg.doc_id FROM dg JOIN bench USING (g))
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def q_cross_doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-line (boilerplate) stats: distinct eligible
    lines per doc and how many appear in ≥2 docs. String-join form
    (``hashed=False``); the xxhash64 production path is pinned equal in
    tests/test_dedup.py."""
    from .operators.dedup import cross_doc_dup_line_stats

    docs = _t(spark, sf_dir, "documents")
    st = cross_doc_dup_line_stats(
        docs, key_col="doc_id", min_line_chars=10, hashed=False
    )
    out = docs.select("doc_id").join(st, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
    )


_Q_CROSS_LINES_SQL = """
WITH l AS (
  SELECT doc_id, trim(lower(unnest(regexp_split_to_array(text, '\\n')))) AS line
  FROM documents WHERE text IS NOT NULL
),
f AS (SELECT DISTINCT doc_id, line FROM l WHERE length(line) >= 10),
fr AS (SELECT line, count(*) AS nd FROM f GROUP BY line),
pd AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_shared
  FROM f JOIN fr USING (line) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(pd.n_lines, 0) AS n_lines,
       coalesce(pd.n_shared, 0) AS n_shared
FROM documents d LEFT JOIN pd USING (doc_id)
"""


def q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate-line REMOVAL (`strip_boilerplate_lines`):
    every doc gets a shared long footer (stripped: ≥3 docs carry it) and
    a shared SHORT line (kept: under the eligibility floor) appended, so
    the oracle exercises strip + keep + byte-exact reassembly in one
    query. String-join form (``hashed=False``); the xxhash64 production
    path is pinned equal in tests/test_dedup.py."""
    from .operators.dedup import strip_boilerplate_lines

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.when(
            F.col("text").isNotNull(),
            F.concat(
                F.col("text"),
                F.lit("\nok\nthis footer is shared boilerplate across documents"),
            ),
        ).alias("text"),
    )
    out = strip_boilerplate_lines(
        base, key_col="doc_id", min_docs=3, min_line_chars=10, hashed=False
    )
    return out.select("doc_id", "text_clean")


_Q_STRIP_SQL = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN NULL
              ELSE text || chr(10) || 'ok' || chr(10) ||
                   'this footer is shared boilerplate across documents' END AS t
  FROM documents
),
l AS (
  SELECT doc_id, trim(lower(unnest(regexp_split_to_array(t, '\\n')))) AS line
  FROM base WHERE t IS NOT NULL
),
f AS (SELECT DISTINCT doc_id, line FROM l WHERE length(line) >= 10),
boiler AS (SELECT line FROM f GROUP BY line HAVING count(*) >= 3),
bl AS (SELECT coalesce(list(line), []) AS bset FROM boiler)
SELECT b.doc_id,
       CASE WHEN b.t IS NULL THEN NULL ELSE
         array_to_string(
           list_filter(regexp_split_to_array(b.t, '\\n'),
             x -> length(trim(lower(x))) < 10
                  OR NOT list_contains(bl.bset, trim(lower(x)))),
           chr(10))
       END AS text_clean
FROM base b, bl
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum quota sampling (domain/language mixing):
    hash-gated like ``sample_rows`` but with a per-stratum threshold."""
    from .operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", {"en": 0.30, "de": 0.10}, key_col="doc_id",
        default_fraction=0.05,
    ).select("doc_id", "lang")


def _stratified_sample_sql() -> str:
    from .operators.sampling import stratified_sample_sql_gate

    return f"""
SELECT doc_id, lang FROM documents
WHERE {stratified_sample_sql_gate("doc_id")} <
      CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 1000 ELSE 500 END
"""


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum token-budget mixing ("keep B weight-units of each
    language in deterministic shuffle order"): the skew-aware two-phase
    cumulative-prefix operator, weights = ``n_chars``. The oracle mirrors
    the exact total order and inclusive running sum in one SQL window;
    the two-phase ≡ naive-window identity is pinned in
    tests/test_decontaminate_sampling.py."""
    from .operators.sampling import sample_to_token_budget

    docs = _t(spark, sf_dir, "documents")
    return sample_to_token_budget(
        docs.select("doc_id", "lang", "n_chars"),
        {"en": 120_000, "de": 40_000},
        strata_col="lang",
        weight_col="n_chars",
        default_budget=15_000,
    ).select("doc_id", "lang", "n_chars")


def _token_budget_sql() -> str:
    from .operators.sampling import token_budget_sql_order

    order = token_budget_sql_order("doc_id")
    return f"""
WITH cum AS (
  SELECT doc_id, lang, n_chars,
         SUM(COALESCE(n_chars, 0)) OVER (
           PARTITION BY lang ORDER BY {order}
         ) AS running
  FROM documents
)
SELECT doc_id, lang, n_chars FROM cum
WHERE lang IS NOT NULL
  AND running <= CASE lang WHEN 'en' THEN 120000 WHEN 'de' THEN 40000
                 ELSE 15000 END
"""


def q_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (`assign_packing_bins`): documents laid end-to-end
    in deterministic hash-shuffle order and assigned to 2048-weight-unit
    training bins, with exact start-offset and boundary-crossing
    bookkeeping. One-window SQL mirror of the same order + inclusive
    running sum; the two-phase ≡ naive identity is pinned in
    tests/test_decontaminate_sampling.py."""
    from .operators.sampling import assign_packing_bins

    docs = _t(spark, sf_dir, "documents")
    return assign_packing_bins(
        docs.select("doc_id", "n_chars"), 2048, weight_col="n_chars"
    ).select("doc_id", "n_chars", "bin_id", "bin_offset", "spans_boundary")


def _packing_bins_sql() -> str:
    from .operators.sampling import token_budget_sql_order

    order = token_budget_sql_order("doc_id")
    return f"""
WITH cum AS (
  SELECT doc_id, n_chars,
         SUM(COALESCE(n_chars, 0)) OVER (ORDER BY {order}) AS c
  FROM documents
)
SELECT doc_id, n_chars,
       CAST((c - COALESCE(n_chars, 0)) // 2048 AS BIGINT) AS bin_id,
       CAST((c - COALESCE(n_chars, 0)) % 2048 AS BIGINT) AS bin_offset,
       ((c - COALESCE(n_chars, 0)) % 2048 + COALESCE(n_chars, 0)) > 2048
         AS spans_boundary
FROM cum
"""


def q_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key quota cap (docs-per-domain limiting): keep the first 30 docs
    per source by doc_id, flag the rest — runs the skew-aware two-phase
    salted top-N (exactness vs the naive window is pinned in
    tests/test_decontaminate_sampling.py)."""
    from .operators.sampling import flag_over_key_cap

    docs = _t(spark, sf_dir, "documents")
    out = flag_over_key_cap(
        docs, key_col="source", max_rows=30, order_cols=(), id_col="doc_id",
        flag_col="cap_flags",
    )
    return out.select(
        "doc_id", F.array_contains("cap_flags", "over_key_cap").alias("over_cap")
    )


_Q_HOST_CAP_SQL = """
WITH r AS (
  SELECT doc_id, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, (rn > 30) AS over_cap FROM r
"""


# ------------------------------------------- round-4 oracle additions


def q_media_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG IHDR / JPEG SOF / GIF LSD / WebP VP8+VP8L image dimensions PLUS
    WAV fmt-chunk audio metadata and MP4 mvhd clip metadata, all as pure
    byte expressions (round-3 VERDICT #5, round-4 VERDICT #3, round-5
    VERDICT #3 — no codec libs): payloads are synthesized
    deterministically FROM doc_id (doc_id%7: 0 → PNG, 1 → JPEG with a
    variable-length COM segment so the SOF marker walk actually hops,
    2 → GIF with little-endian dims, 3 → WebP lossy-simple VP8 keyframe
    with NONZERO rescale bits so the 14-bit mask is exercised, 4 → WebP
    lossless VP8L with the packed 14+14-bit LE dims, 5 → RIFF/WAVE with a
    variable-length JUNK chunk before ``fmt `` so the chunk walk hops,
    6 → ISO-BMFF ftyp + variable-length ``free`` box + moov/mvhd v0),
    then parsed back by the real header parsers in
    ``operators.multimodal`` (``with_media_dims`` + ``with_media_av``).
    The DuckDB oracle constructs the identical hex stream and re-parses
    it with its own fixed-offset / mask-shift arithmetic, a
    recursive-CTE marker walk (JPEG), and size-field-driven hops
    (WAV JUNK, MP4 free) — never by recomputing the planted values from
    doc_id."""
    from .operators.multimodal import with_media_av, with_media_dims

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    w = (F.col("doc_id") % 800 + 16).cast("long")
    h = ((F.col("doc_id") * 3) % 600 + 16).cast("long")
    k = (F.col("doc_id") % 32).cast("int")
    scale_w = (F.col("doc_id") % 4).cast("long")  # VP8 upper-2-bit rescale hints
    scale_h = ((F.col("doc_id") * 7) % 4).cast("long")
    # WAV parameters (kind 5)
    rate = ((F.col("doc_id") % 10) * 4410 + 8000).cast("long")
    ch = (F.col("doc_id") % 3 + 1).cast("long")
    brate = (rate * ch * 2).cast("long")  # 16-bit samples
    block = (ch * 2).cast("long")
    dsize = ((F.col("doc_id") % 100 + 1) * 1000).cast("long")
    # MP4 parameters (kind 6)
    k2 = (F.col("doc_id") % 64).cast("long")  # free-box payload bytes
    mts = ((F.col("doc_id") % 5) * 300 + 600).cast("long")
    mdur = (mts * (F.col("doc_id") % 50 + 1) + F.col("doc_id") % 7).cast("long")

    def hex4(c):  # big-endian uint16 as 4 uppercase hex chars
        return F.lpad(F.hex(c), 4, "0")

    def hex8(c):
        return F.lpad(F.hex(c), 8, "0")

    def le16(c):  # little-endian uint16: low byte then high byte
        return F.concat(
            F.lpad(F.hex(F.pmod(c, F.lit(256))), 2, "0"),
            F.lpad(F.hex(F.shiftright(c, 8)), 2, "0"),
        )

    def le32(c):  # little-endian uint32
        return F.concat(
            *[
                F.lpad(F.hex(F.pmod(F.shiftright(c, 8 * i), F.lit(256))), 2, "0")
                for i in range(4)
            ]
        )

    png = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"),  # sig + len(13) + IHDR
        hex8(w),
        hex8(h),
        F.lit("080600000000000000"),  # bit depth/color/... + dummy CRC
    )
    jpg = F.concat(
        # SOI + APP0/JFIF (len 0x10)
        F.lit("FFD8FFE000104A46494600010100000100010000"),
        F.lit("FFFE"),  # COM marker, variable length → the walk must hop
        hex4(k + F.lit(2)),
        F.repeat(F.lit("41"), k),
        F.lit("FFC0001108"),  # SOF0, len 0x11, precision 8
        hex4(h),
        hex4(w),
        F.lit("03011100021101031101"),  # 3 components
    )
    gif = F.concat(F.lit("474946383961"), le16(w), le16(h), F.lit("F70000"))
    # RIFF WEBP 'VP8 ': frame tag(3) + start code 9D012A + 16-bit LE words
    # whose top 2 bits are rescale hints the parser must mask off
    vp8 = F.concat(
        F.lit("5249464624000000574542505650382012000000000000"),
        F.lit("9D012A"),
        le16(w + scale_w * 16384),
        le16(h + scale_h * 16384),
    )
    # RIFF WEBP 'VP8L': 2F signature + LE uint32 packing (w-1) | (h-1)<<14
    vp8l = F.concat(
        F.lit("5249464624000000574542505650384C0D0000002F"),
        le32((w - 1) + (h - 1) * 16384),
    )
    # RIFF/WAVE: riff-size field (ignored by parsers) + JUNK chunk of k
    # bytes (word-aligned) BEFORE fmt so the chunk walk must hop, then
    # fmt (PCM, 16-bit) and a data chunk header whose SIZE FIELD carries
    # the duration (declared-size contract, see wav_meta_from_hex)
    wav = F.concat(
        F.lit("52494646E803000057415645"),
        F.lit("4A554E4B"),  # 'JUNK'
        le32(k.cast("long")),
        F.repeat(F.lit("00"), (k + F.pmod(k, F.lit(2))).cast("int")),
        F.lit("666D7420"),  # 'fmt '
        F.lit("10000000"),  # chunk size 16, LE
        F.lit("0100"),  # PCM
        le16(ch),
        le32(rate),
        le32(brate),
        le16(block),
        F.lit("1000"),  # bits=16, LE
        F.lit("64617461"),  # 'data'
        le32(dsize),
    )
    # ISO-BMFF: ftyp(16) + 'free' box of k2 payload bytes + moov > mvhd v0
    mp4 = F.concat(
        F.lit("000000106674797069736F6D00000200"),
        hex8(k2 + 8),
        F.lit("66726565"),  # 'free'
        F.repeat(F.lit("00"), k2.cast("int")),
        F.lit("000000746D6F6F76"),  # moov, size 8+108
        F.lit("0000006C6D766864"),  # mvhd, size 108 (declared)
        F.lit("00000000"),  # version 0 + flags
        F.lit("0000000000000000"),  # ctime + mtime
        hex8(mts),
        hex8(mdur),
    )
    m7 = F.col("doc_id") % 7
    payload = F.unhex(
        F.when(m7 == 0, png)
        .when(m7 == 1, jpg)
        .when(m7 == 2, gif)
        .when(m7 == 3, vp8)
        .when(m7 == 4, vp8l)
        .when(m7 == 5, wav)
        .otherwise(mp4)
    )
    pages = docs.withColumn("payload", payload)
    out = with_media_av(with_media_dims(pages, bin_col="payload"), bin_col="payload")
    return out.select(
        "doc_id",
        F.when(m7 == 0, F.lit("png"))
        .when(m7 == 1, F.lit("jpeg"))
        .when(m7 == 2, F.lit("gif"))
        .when(m7 == 3, F.lit("webp_vp8"))
        .when(m7 == 4, F.lit("webp_vp8l"))
        .when(m7 == 5, F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("kind"),
        F.col("media_dims.width").alias("width"),
        F.col("media_dims.height").alias("height"),
        F.col("media_av.sample_rate").alias("sample_rate"),
        F.col("media_av.channels").alias("channels"),
        F.col("media_av.bits_per_sample").alias("bits_per_sample"),
        F.col("media_av.timescale").alias("timescale"),
        F.col("media_av.duration_ms").alias("duration_ms"),
    )


def _media_dims_sql() -> str:
    def hv(expr: str, i: int) -> str:
        return f"(strpos('0123456789ABCDEF', substr({expr}, {i}, 1)) - 1)"

    def hexw(expr: str) -> str:  # 4-hex-char big-endian word -> BIGINT
        return (
            f"(4096*{hv(expr, 1)} + 256*{hv(expr, 2)} + 16*{hv(expr, 3)} + {hv(expr, 4)})"
        )

    def hexb(expr: str) -> str:  # 2-hex-char byte -> BIGINT
        return f"(16*{hv(expr, 1)} + {hv(expr, 2)})"

    # byte p (1-based) of the stream sits at hex chars 2p-1..2p
    sof = "substr(hx, pos*2+1, 2) IN ('C0','C1','C2','C3')"

    def le16sql(v: str) -> str:  # little-endian uint16 hex of a value expr
        return (
            f"lpad(upper(to_hex(({v}) % 256)), 2, '0') "
            f"|| lpad(upper(to_hex(({v}) // 256)), 2, '0')"
        )

    def le32sql(v: str) -> str:
        return " || ".join(
            f"lpad(upper(to_hex((({v}) // {256 ** i}) % 256)), 2, '0')" for i in range(4)
        )

    def be32sql(v: str) -> str:  # big-endian uint32 hex of a value expr
        return f"lpad(upper(to_hex({v})), 8, '0')"

    # position-driven READERS (1-based byte position EXPRESSION) — the
    # mirror re-parses by hopping declared size fields, exactly like the
    # Spark chunk/box walks, never by recomputing planted values
    def hexb_at(pos: str) -> str:
        return hexb(f"substr(hx, ({pos})*2-1, 2)")

    def le16r(pos: str) -> str:
        return f"({hexb_at(pos)} + 256*{hexb_at(f'({pos})+1')})"

    def le32r(pos: str) -> str:
        return f"({le16r(pos)} + 65536*{le16r(f'({pos})+2')})"

    def be32r(pos: str) -> str:
        return (
            f"({hexw(f'substr(hx, ({pos})*2-1, 4)')} * 65536"
            f" + {hexw(f'substr(hx, (({pos})+2)*2-1, 4)')})"
        )

    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, doc_id % 800 + 16 AS w0, (doc_id*3) % 600 + 16 AS h0,
         doc_id % 32 AS k, doc_id % 4 AS sw, (doc_id*7) % 4 AS sh,
         (doc_id % 10) * 4410 + 8000 AS rate, doc_id % 3 + 1 AS ch,
         ((doc_id % 10) * 4410 + 8000) * (doc_id % 3 + 1) * 2 AS brate,
         (doc_id % 100 + 1) * 1000 AS dsz0,
         doc_id % 64 AS k2, (doc_id % 5) * 300 + 600 AS mts,
         ((doc_id % 5) * 300 + 600) * (doc_id % 50 + 1) + doc_id % 7 AS mdur
  FROM documents
),
hxs AS (
  SELECT doc_id, w0, h0,
    CASE WHEN doc_id % 7 = 0 THEN
      '89504E470D0A1A0A0000000D49484452'
        || lpad(upper(to_hex(w0)), 8, '0') || lpad(upper(to_hex(h0)), 8, '0')
        || '080600000000000000'
    WHEN doc_id % 7 = 1 THEN
      'FFD8FFE000104A46494600010100000100010000'
        || 'FFFE' || lpad(upper(to_hex(k + 2)), 4, '0') || repeat('41', k)
        || 'FFC0001108' || lpad(upper(to_hex(h0)), 4, '0')
        || lpad(upper(to_hex(w0)), 4, '0') || '03011100021101031101'
    WHEN doc_id % 7 = 2 THEN
      '474946383961'
        || lpad(upper(to_hex(w0 % 256)), 2, '0') || lpad(upper(to_hex(w0 // 256)), 2, '0')
        || lpad(upper(to_hex(h0 % 256)), 2, '0') || lpad(upper(to_hex(h0 // 256)), 2, '0')
        || 'F70000'
    WHEN doc_id % 7 = 3 THEN
      '5249464624000000574542505650382012000000000000' || '9D012A'
        || {le16sql("w0 + sw*16384")} || {le16sql("h0 + sh*16384")}
    WHEN doc_id % 7 = 4 THEN
      '5249464624000000574542505650384C0D0000002F'
        || {le32sql("(w0 - 1) + (h0 - 1)*16384")}
    WHEN doc_id % 7 = 5 THEN
      '52494646E803000057415645'
        || '4A554E4B' || {le32sql("k")} || repeat('00', k + k % 2)
        || '666D7420' || '10000000' || '0100'
        || {le16sql("ch")} || {le32sql("rate")} || {le32sql("brate")}
        || {le16sql("ch * 2")} || '1000'
        || '64617461' || {le32sql("dsz0")}
    ELSE
      '000000106674797069736F6D00000200'
        || {be32sql("k2 + 8")} || '66726565' || repeat('00', k2)
        || '000000746D6F6F76' || '0000006C6D766864'
        || '00000000' || '0000000000000000'
        || {be32sql("mts")} || {be32sql("mdur")}
    END AS hx
  FROM base
),
png AS (
  SELECT doc_id, 'png' AS kind,
         CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A'
                   AND substr(hx, 25, 8) = '49484452'
              THEN CAST({hexw("substr(hx, 33, 4)")} * 65536
                        + {hexw("substr(hx, 37, 4)")} AS BIGINT) END AS width,
         CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A'
                   AND substr(hx, 25, 8) = '49484452'
              THEN CAST({hexw("substr(hx, 41, 4)")} * 65536
                        + {hexw("substr(hx, 45, 4)")} AS BIGINT) END AS height,
         CAST(NULL AS BIGINT) AS sample_rate, CAST(NULL AS BIGINT) AS channels,
         CAST(NULL AS BIGINT) AS bits_per_sample, CAST(NULL AS BIGINT) AS timescale,
         CAST(NULL AS BIGINT) AS duration_ms
  FROM hxs WHERE doc_id % 7 = 0
),
gif AS (
  SELECT doc_id, 'gif' AS kind,
         CASE WHEN substr(hx, 1, 12) IN ('474946383761', '474946383961')
              THEN CAST({hexb("substr(hx, 13, 2)")}
                        + 256 * {hexb("substr(hx, 15, 2)")} AS BIGINT) END AS width,
         CASE WHEN substr(hx, 1, 12) IN ('474946383761', '474946383961')
              THEN CAST({hexb("substr(hx, 17, 2)")}
                        + 256 * {hexb("substr(hx, 19, 2)")} AS BIGINT) END AS height,
         CAST(NULL AS BIGINT) AS sample_rate, CAST(NULL AS BIGINT) AS channels,
         CAST(NULL AS BIGINT) AS bits_per_sample, CAST(NULL AS BIGINT) AS timescale,
         CAST(NULL AS BIGINT) AS duration_ms
  FROM hxs WHERE doc_id % 7 = 2
),
jwalk AS (
  SELECT doc_id, hx, CAST(3 AS BIGINT) AS pos,
         CAST(NULL AS BIGINT) AS w, CAST(NULL AS BIGINT) AS h, 0 AS it
  FROM hxs WHERE doc_id % 7 = 1 AND substr(hx, 1, 6) = 'FFD8FF'
  UNION ALL
  SELECT doc_id, hx,
         CASE WHEN {sof} THEN pos
              ELSE pos + 2 + {hexw("substr(hx, pos*2+3, 4)")} END,
         CASE WHEN {sof}
              THEN CAST({hexw("substr(hx, pos*2+13, 4)")} AS BIGINT) END,
         CASE WHEN {sof}
              THEN CAST({hexw("substr(hx, pos*2+9, 4)")} AS BIGINT) END,
         it + 1
  FROM jwalk
  WHERE w IS NULL AND it < 32
        AND substr(hx, pos*2-1, 2) = 'FF' AND pos*2 + 16 <= len(hx)
),
jpeg AS (
  SELECT doc_id, 'jpeg' AS kind, max(w) AS width, max(h) AS height,
         CAST(NULL AS BIGINT) AS sample_rate, CAST(NULL AS BIGINT) AS channels,
         CAST(NULL AS BIGINT) AS bits_per_sample, CAST(NULL AS BIGINT) AS timescale,
         CAST(NULL AS BIGINT) AS duration_ms
  FROM jwalk GROUP BY doc_id
),
webp_vp8 AS (
  SELECT doc_id, 'webp_vp8' AS kind,
         CASE WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57454250'
                   AND substr(hx, 25, 8) = '56503820' AND substr(hx, 47, 6) = '9D012A'
                   AND len(hx) >= 60
              THEN CAST(({hexb("substr(hx, 53, 2)")}
                         + 256 * {hexb("substr(hx, 55, 2)")}) % 16384 AS BIGINT) END AS width,
         CASE WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57454250'
                   AND substr(hx, 25, 8) = '56503820' AND substr(hx, 47, 6) = '9D012A'
                   AND len(hx) >= 60
              THEN CAST(({hexb("substr(hx, 57, 2)")}
                         + 256 * {hexb("substr(hx, 59, 2)")}) % 16384 AS BIGINT) END AS height,
         CAST(NULL AS BIGINT) AS sample_rate, CAST(NULL AS BIGINT) AS channels,
         CAST(NULL AS BIGINT) AS bits_per_sample, CAST(NULL AS BIGINT) AS timescale,
         CAST(NULL AS BIGINT) AS duration_ms
  FROM hxs WHERE doc_id % 7 = 3
),
webp_vp8l AS (
  SELECT doc_id, 'webp_vp8l' AS kind,
         CASE WHEN ok THEN CAST(val % 16384 + 1 AS BIGINT) END AS width,
         CASE WHEN ok THEN CAST((val // 16384) % 16384 + 1 AS BIGINT) END AS height,
         CAST(NULL AS BIGINT) AS sample_rate, CAST(NULL AS BIGINT) AS channels,
         CAST(NULL AS BIGINT) AS bits_per_sample, CAST(NULL AS BIGINT) AS timescale,
         CAST(NULL AS BIGINT) AS duration_ms
  FROM (
    SELECT doc_id,
           substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57454250'
             AND substr(hx, 25, 8) = '5650384C' AND substr(hx, 41, 2) = '2F'
             AND len(hx) >= 50 AS ok,
           {hexb("substr(hx, 43, 2)")} + 256 * {hexb("substr(hx, 45, 2)")}
             + 65536 * {hexb("substr(hx, 47, 2)")}
             + 16777216 * {hexb("substr(hx, 49, 2)")} AS val
    FROM hxs WHERE doc_id % 7 = 4
  )
),
wav AS (
  SELECT doc_id, 'wav' AS kind,
         CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
         CASE WHEN ok THEN CAST(rate2 AS BIGINT) END AS sample_rate,
         CASE WHEN ok THEN CAST(ch2 AS BIGINT) END AS channels,
         CASE WHEN ok THEN CAST(bits2 AS BIGINT) END AS bits_per_sample,
         CAST(NULL AS BIGINT) AS timescale,
         CASE WHEN ok AND brate2 > 0
              THEN CAST((dsz2 * 1000) // brate2 AS BIGINT) END AS duration_ms
  FROM (
    SELECT doc_id,
           substr(hx, fpos*2-1, 8) = '666D7420'
             AND substr(hx, (fpos+24)*2-1, 8) = '64617461' AS ok,
           {le16r("fpos+10")} AS ch2, {le32r("fpos+12")} AS rate2,
           {le32r("fpos+16")} AS brate2, {le16r("fpos+22")} AS bits2,
           {le32r("fpos+28")} AS dsz2
    FROM (
      SELECT doc_id, hx, 21 + jsz + jsz % 2 AS fpos
      FROM (SELECT doc_id, hx, {le32r("17")} AS jsz
            FROM hxs WHERE doc_id % 7 = 5)
    )
  )
),
mp4 AS (
  SELECT doc_id, 'mp4' AS kind,
         CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
         CAST(NULL AS BIGINT) AS sample_rate, CAST(NULL AS BIGINT) AS channels,
         CAST(NULL AS BIGINT) AS bits_per_sample,
         CASE WHEN ok AND ts0 > 0 THEN CAST(ts0 AS BIGINT) END AS timescale,
         CASE WHEN ok AND ts0 > 0
              THEN CAST((dur0 * 1000) // ts0 AS BIGINT) END AS duration_ms
  FROM (
    SELECT doc_id,
           substr(hx, (p3+4)*2-1, 8) = '6D6F6F76'
             AND substr(hx, (p3+12)*2-1, 8) = '6D766864'
             AND substr(hx, (p3+16)*2-1, 2) = '00' AS ok,
           {be32r("p3+28")} AS ts0, {be32r("p3+32")} AS dur0
    FROM (
      SELECT doc_id, hx, p2 + {be32r("p2")} AS p3
      FROM (SELECT doc_id, hx, 1 + {be32r("1")} AS p2
            FROM hxs WHERE doc_id % 7 = 6)
    )
  )
)
SELECT * FROM png UNION ALL SELECT * FROM jpeg UNION ALL SELECT * FROM gif
UNION ALL SELECT * FROM webp_vp8 UNION ALL SELECT * FROM webp_vp8l
UNION ALL SELECT * FROM wav UNION ALL SELECT * FROM mp4
"""


QUERIES.update(
    {
        "embedding_topk": (q_embedding_topk, _emb_topk_sql()),
        "media_dims": (q_media_dims, _media_dims_sql()),
        "host_cap": (q_host_cap, _Q_HOST_CAP_SQL),
        "decontaminate": (q_decontaminate, _Q_DECON_SQL),
        "stratified_sample": (q_stratified_sample, _stratified_sample_sql()),
        "token_budget_sample": (q_token_budget_sample, _token_budget_sql()),
        "packing_bins": (q_packing_bins, _packing_bins_sql()),
        "cross_doc_lines": (q_cross_doc_lines, _Q_CROSS_LINES_SQL),
        "strip_boilerplate": (q_strip_boilerplate, _Q_STRIP_SQL),
        "cube_counts": (q_cube_counts, _Q_CUBE_SQL),
        "sample_rows": (q_sample_rows, _Q_SAMPLE_SQL),
        # round-4 VERDICT #5: pca_scores now carries a FULL oracle on
        # sign-invariant facts (norm preservation + trace conservation of
        # the full-rank fit); the raw score values remain convention-
        # dependent and are pinned by the determinism pytest instead.
        "pca_scores": (q_pca_scores, _pca_scores_sql()),
        "flatten_export": (q_flatten_export, _Q_FLATTEN_SQL),
        "jsonl_export": (q_jsonl_export, _Q_JSONL_EXPORT_SQL),
        "compact_roundtrip": (q_compact_roundtrip, _Q_COMPACT_SQL),
        "host_metrics": (q_host_metrics, _host_metrics_sql()),
        "host_outliers": (q_host_outliers, _host_outliers_sql()),
        "iterative_outliers": (q_iterative_outliers, _Q_ITER_OUTLIERS_SQL),
        "langid_perplexity": (q_langid_perplexity, _langid_perplexity_sql()),
        "ingest_extract": (q_ingest_extract, _Q_INGEST_SQL),
        "media_meta": (q_media_meta, _media_meta_sql()),
    }
)


def q_denovo_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 de-novo caller analog: trio-based probabilistic originality flag
    from joined priors (``operators/denovo.py``; reference
    ``find_denovo_variants.py:177-239``). Families = ``source``; snapshot
    windows = ``doc_id % 3`` (0/1 = parents, 2 = child — deterministic
    synthetic snapshot assignment, both engines compute it identically);
    variant = sha256 fingerprint of the text; external panel = the
    fingerprint frequencies of the ``lang='en'`` sub-population (the
    gnomad_fin analog: the reference, too, derives its prior table from a
    filtered view of the corpus and annotates it back,
    ``find_denovo_variants.py:169-199``)."""
    from .operators.denovo import call_denovo_content

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = docs.select(
        "doc_id",
        F.col("source").alias("family"),
        F.pmod(F.col("doc_id"), F.lit(3)).alias("snapshot"),
        F.sha2(F.col("text"), 256).alias("fingerprint"),
    )
    en = docs.filter(F.col("lang") == "en")
    panel = (
        en.groupBy(F.sha2(F.col("text"), 256).alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("k"))
        .crossJoin(F.broadcast(en.agg(F.count(F.lit(1)).alias("n_en"))))
        .select(
            "fingerprint",
            F.round(F.col("k") / F.col("n_en"), 9).alias("panel_af"),
        )
    )
    out = call_denovo_content(base, panel)
    return out.select(
        "doc_id",
        "family",
        F.substring("fingerprint", 1, 12).alias("fp"),
        "n_copies",
        "site_freq_n",
        "prior",
        "p_denovo",
        "confidence",
    )


_Q_DENOVO_SQL = """
WITH base AS (
  SELECT doc_id, source AS family, doc_id % 3 AS snapshot,
         sha256(text) AS fingerprint
  FROM documents WHERE text IS NOT NULL
),
panel AS (
  SELECT sha256(text) AS fingerprint,
         round(count(*)::DOUBLE /
               (SELECT count(*) FROM documents
                WHERE text IS NOT NULL AND lang = 'en'), 9) AS panel_af
  FROM documents WHERE text IS NOT NULL AND lang = 'en' GROUP BY 1
),
fam_fp AS (
  SELECT family, fingerprint,
         sum(CASE WHEN snapshot = 2 THEN 1 ELSE 0 END) AS child_count,
         sum(CASE WHEN snapshot <> 2 THEN 1 ELSE 0 END) AS parent_count
  FROM base GROUP BY 1, 2
),
fp_counts AS (
  SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_copies FROM base GROUP BY 1
),
totals AS (SELECT count(*) AS total_docs FROM base),
fam_stats AS (
  SELECT family,
         sum(CASE WHEN snapshot = 0 THEN 1 ELSE 0 END) AS n_parent_a,
         sum(CASE WHEN snapshot = 1 THEN 1 ELSE 0 END) AS n_parent_b
  FROM base GROUP BY 1
),
scored AS (
  SELECT family, fingerprint, n_copies, n_parent_a, n_parent_b,
         round(greatest(n_copies - 1, 0)::DOUBLE / (total_docs + 10000), 9)
           AS site_freq_n,
         coalesce(p.panel_af, 0.0) AS panel_af
  FROM fam_fp
  JOIN fam_stats USING (family)
  JOIN fp_counts USING (fingerprint)
  CROSS JOIN totals
  LEFT JOIN panel p USING (fingerprint)
  WHERE child_count > 0 AND parent_count = 0
        AND n_parent_a > 0 AND n_parent_b > 0
),
post AS (
  SELECT family, fingerprint, n_copies, site_freq_n,
         round(greatest(panel_af, site_freq_n), 9) AS prior,
         n_parent_a + n_parent_b AS exposure
  FROM scored
),
post2 AS (
  SELECT family, fingerprint, n_copies, site_freq_n, prior,
         round((1.0 - prior) / (1.0 + exposure * prior), 9) AS p_denovo
  FROM post
)
SELECT b.doc_id, b.family, substring(b.fingerprint, 1, 12) AS fp,
       s.n_copies, s.site_freq_n, s.prior, s.p_denovo,
       CASE WHEN s.p_denovo > 0.99 AND s.site_freq_n < 0.001 THEN 'HIGH'
            WHEN s.p_denovo > 0.5 THEN 'MEDIUM'
            ELSE 'LOW' END AS confidence
FROM base b
JOIN post2 s USING (family, fingerprint)
WHERE b.snapshot = 2
"""

QUERIES.update({"denovo_content": (q_denovo_content, _Q_DENOVO_SQL)})
