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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
              THEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / n_chars END
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
    docs = _t(spark, sf_dir, "documents")
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
    from .functions.flags import add_flags, keep_expr

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
    docs = _t(spark, sf_dir, "documents")
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
    docs = _t(spark, sf_dir, "documents")
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


def q_counter_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 counter: group-count to dict analog."""
    return _t(spark, sf_dir, "documents").groupBy("lang").agg(F.count(F.lit(1)).alias("n"))


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


def q_collect_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 collect_as_set (sorted, joined for stable hashing)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias("sources"))
    )


_Q_COLLECT_SQL = """
SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources
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
    """A13/W1 batch-stratified outlier detection via analytic window."""
    docs = _t(spark, sf_dir, "documents")
    w = W.partitionBy("source")
    mu = F.avg("n_chars").over(w)
    sd = F.stddev_samp("n_chars").over(w)
    return docs.select(
        "doc_id",
        F.coalesce(F.abs(F.col("n_chars") - mu) > 2 * sd, F.lit(False)).alias("is_outlier"),
    )


_Q_SEGMENT_Z_SQL = """
SELECT doc_id,
       coalesce(abs(n_chars - avg(n_chars) OVER (PARTITION BY source))
                > 2 * stddev_samp(n_chars) OVER (PARTITION BY source), false) AS is_outlier
FROM documents
"""


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O/W top-k per group: top-3 orders per customer by totalprice."""
    orders = _t(spark, sf_dir, "orders")
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
    orders = _t(spark, sf_dir, "orders")
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
       sum(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS sum_k,
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
    # ts is TIMESTAMP_NTZ in the parquet; route through session-TZ (UTC)
    # timestamp so epoch seconds match DuckDB's epoch(ts) on the naive value
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
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
SELECT user_id, sum(ns) AS n_sessions FROM g GROUP BY user_id
"""


# ------------------------------------------------------------- registry

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "flagship_flag_counts": (flagship, _flagship_sql()),
    "text_metrics": (q_text_metrics, _Q_TEXT_METRICS_SQL()),
    "langid_expr": (q_langid, _langid_sql()),
    "scrub_pii": (q_scrub, _scrub_sql()),
    "token_counts": (q_token_counts, _Q_TOKEN_SQL()),
    "fingerprint": (q_fingerprint, _Q_FINGERPRINT_SQL),
    "exact_dedup": (q_exact_dedup, _Q_EXACT_DEDUP_SQL),
    "counter_lang": (q_counter_lang, "SELECT lang, count(*) AS n FROM documents GROUP BY lang"),
    "histogram_chars": (q_histogram_chars, _Q_HIST_SQL),
    "collect_sources": (q_collect_sources, _Q_COLLECT_SQL),
    "filtered_agg": (q_filtered_agg, _Q_FILTERED_AGG_SQL),
    "segment_zscore": (q_segment_zscore, _Q_SEGMENT_Z_SQL),
    "window_topk": (q_window_topk, _Q_TOPK_SQL),
    "anti_join": (q_anti_join, _Q_ANTI_SQL),
    "join_agg_revenue": (q_join_agg, _Q_JOIN_AGG_SQL),
    "json_props": (q_json_props, _Q_JSON_SQL),
    "time_window": (q_time_window, _Q_TIME_SQL),
    "sessionize": (q_sessionize, _Q_SESSION_SQL),
}
