"""S1 enrich — host/domain metadata join + metadata-driven flags.

Analog of the reference's sample-annotation stage:
``mt.annotate_cols(**ht[mt.s])`` joining TSV metadata keyed by sample id
(``/root/reference/shared/samples_annotation.py:10-27``, J1), with the
batch label used downstream for stratified QC
(``exome_qc/parse_arguments.py:137-139``).

The metadata table (host, source, spam_score, crawl_batch — FIXTURES.md
§2) is small relative to the corpus → broadcast left join; missing
metadata is tolerated (NULL columns), and a ``spam_score`` threshold
flags whole hosts the way chimeras/contamination % flags samples
(``README.md:190-193``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.flags import add_flags
from ..functions.urltools import host_expr


def enrich_with_host_metadata(
    df: DataFrame,
    host_metadata: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    broadcast_metadata: bool = True,
) -> DataFrame:
    """Left join of per-host metadata onto the pages table.

    Hinted broadcast by default (curated crawl-metadata tables are
    dimension-sized); ``broadcast_metadata=False`` for a full-web host
    table (10⁷–10⁸ rows × several columns — multi-GB, past broadcast
    size), where the uniform host key makes the shuffle join safe and
    AQE still broadcasts if the table actually fits."""
    # fail fast on metadata columns already present in df (round-6 review:
    # a double enrich — stage re-run, resume — would otherwise produce
    # duplicate column names that die later as AMBIGUOUS_REFERENCE or
    # silently resolve to the stale copy); union_cols below enforces the
    # same rule for the generic column-union
    clash = (set(df.columns) & set(host_metadata.columns)) - {host_col}
    if clash:
        raise ValueError(
            f"enrich_with_host_metadata: metadata columns {sorted(clash)} "
            "already exist in the input; drop or rename them first"
        )
    out = df.withColumn(host_col, host_expr(F.col(url_col)))
    meta = F.broadcast(host_metadata) if broadcast_metadata else host_metadata
    return out.join(meta, host_col, "left")


def union_cols(
    a: DataFrame,
    b: DataFrame,
    key: str,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """J8 ``union_cols`` analog: combine two tables' column sets keyed by
    the row key (Hail's column-wise MatrixTable union). Pure equi-join;
    overlapping non-key columns from ``b`` get ``suffix``. Broadcast is
    left to AQE/statistics — either side may be the big one.

    Reference: ``mt.union_cols`` usage in the merged-callset flow
    (SURVEY.md §2.3 J8).
    """
    overlap = (set(a.columns) & set(b.columns)) - {key}
    renamed = b
    for c in overlap:
        target = f"{c}{suffix}"
        # the rename must not silently shadow an existing column — duplicate
        # names make every later by-name select ambiguous at a distance
        if target in a.columns or target in b.columns:
            raise ValueError(
                f"union_cols: renaming overlapping column {c!r} to {target!r} "
                f"collides with an existing column; pass a different suffix"
            )
        renamed = renamed.withColumnRenamed(c, target)
    return a.join(renamed, key, how)


def flag_spam_hosts(
    df: DataFrame,
    max_spam_score: float = 0.8,
    flag_col: str = "low_pass_failing_qc",
) -> DataFrame:
    """Flag docs on hosts whose metadata spam_score exceeds the threshold.
    NULL score (host absent from metadata / 'NA' token) is NOT flagged —
    matching the reference's defined-guard joins, not the missing-metric
    rule (absence of optional metadata is normal)."""
    return add_flags(df, flag_col, {"spam_host": F.col("spam_score") > max_spam_score})
