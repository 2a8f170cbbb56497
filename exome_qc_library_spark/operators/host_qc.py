"""S8 — per-host metrics + batch-stratified outlier flags (single pass).

Analog of the reference's sample QC: per-sample composite metrics
(``hl.sample_qc``, ``/root/reference/shared/samples_qc.py:277``) then
**batch-stratified mean±k·σ outlier flagging** — the reference loops
Python over measures × batches, each iteration a separate filtered
aggregation job (``shared/samples_qc.py:432-486``, A13 in SURVEY.md);
here the same statistics come from analytic windows partitioned by the
batch key, so the whole stage is O(1) Spark jobs regardless of the
number of batches and measures (SURVEY.md §2.4 A13 rewrite).

Skew: per-host aggregation uses a two-level (salted partial → final)
aggregate so one domain-heavy host cannot straggle a reducer
(BASELINE.json; ``functions/urltools.salted_repartition``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.flags import add_flags
from ..functions.urltools import host_expr, salt_expr

HOST_MEASURES: tuple[str, ...] = ("word_count", "symbol_ratio", "stopword_density")


def host_metrics(
    df: DataFrame,
    url_col: str = "url",
    measures: tuple[str, ...] = HOST_MEASURES,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-host metric table via salted two-level aggregation.

    Partial agg on (host, salt) — map-side combine bounds the skewed key —
    then a tiny final agg on host recombines counts/sums exactly.
    """
    base = df.withColumns(
        {"host": host_expr(F.col(url_col)), "__salt": salt_expr(F.col(url_col), salt_buckets)}
    )
    partial = base.groupBy("host", "__salt").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(m).alias(f"sum_{m}") for m in measures],
        *[F.count(m).alias(f"cnt_{m}") for m in measures],
    )
    final = partial.groupBy("host").agg(
        F.sum("n").alias("n_docs"),
        *[
            (F.sum(f"sum_{m}") / F.sum(f"cnt_{m}")).alias(f"mean_{m}")
            for m in measures
        ],
    )
    return final


def flag_host_outliers(
    df: DataFrame,
    url_col: str = "url",
    batch_col: str | None = None,
    measures: tuple[str, ...] = HOST_MEASURES,
    k_sigma: float = 4.0,
    flag_col: str = "final_failing_qc",
) -> DataFrame:
    """Flag docs on hosts whose mean measure is > k·σ from the batch mean.

    One window pass over the (small) host-metrics table, then one
    broadcast join of outlier hosts back onto the docs — never a shuffle
    of the full doc table.
    """
    hm = host_metrics(df, url_col=url_col, measures=measures)
    w = W.partitionBy(F.lit(1) if batch_col is None else F.col(batch_col))
    outlier_cond = None
    for m in measures:
        mu = F.avg(f"mean_{m}").over(w)
        sd = F.stddev_samp(f"mean_{m}").over(w)
        cond = F.coalesce(
            (F.abs(F.col(f"mean_{m}") - mu) > k_sigma * sd), F.lit(False)
        )
        outlier_cond = cond if outlier_cond is None else (outlier_cond | cond)
    bad_hosts = hm.withColumn("__bad", outlier_cond).filter(F.col("__bad")).select("host")
    out = df.withColumn("host", host_expr(F.col(url_col))).join(
        F.broadcast(bad_hosts.withColumn("__host_outlier", F.lit(True))), "host", "left"
    )
    out = add_flags(
        out, flag_col, {"host_outlier": F.coalesce(F.col("__host_outlier"), F.lit(False))}
    )
    return out.drop("__host_outlier")
