"""S10 — per-segment (language/source) threshold QC.

Analog of the reference's phenotype-stratified variant QC: thresholds
evaluated inside each subgroup, with per-subgroup aggregates as the
inputs (``/root/reference/shared/variant_qc.py:902-981``; filtered
aggregation A7, ``shared/variant_qc.py:263-307``).

Implementation: one groupBy over the segment key for the segment stats
(map-side partial agg), broadcast back, pure-expression flags — two jobs
total regardless of segment count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.flags import add_flags


def flag_segment_outliers(
    df: DataFrame,
    segment_col: str = "lang_id",
    measure: str = "stopword_density",
    k_sigma: float = 4.0,
    min_segment_n: int = 20,
    flag_col: str = "final_failing_qc",
    tag: str = "segment_outlier",
) -> DataFrame:
    seg = (
        df.groupBy(segment_col)
        .agg(
            F.avg(measure).alias("__seg_mu"),
            F.stddev_samp(measure).alias("__seg_sd"),
            F.count(measure).alias("__seg_n"),
        )
        .filter(F.col(segment_col).isNotNull())
    )
    out = df.join(F.broadcast(seg), segment_col, "left")
    pred = (
        (F.col("__seg_n") >= min_segment_n)
        & (F.col("__seg_sd") > 0)
        & (F.abs(F.col(measure) - F.col("__seg_mu")) > k_sigma * F.col("__seg_sd"))
    )
    # missing_inputs: a NULL measure or NULL segment must yield the
    # missing_<tag> tag, not a silent pass (round-6 review — the same
    # invariant hard_filters honors for this very metric); join-derived
    # NULL stats (segment below min_segment_n) are NOT missing inputs and
    # still pass
    out = add_flags(
        out, flag_col, {tag: pred}, {tag: [F.col(measure), F.col(segment_col)]}
    )
    return out.drop("__seg_mu", "__seg_sd", "__seg_n")
