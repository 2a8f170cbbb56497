"""S6 — iterative global z-score outlier trimming (PCA-outlier analog).

Mirrors the reference's iterative PCA outlier loop: compute stats on the
current survivor set, trim mean±k·σ, repeat until no change or max_iter
(``/root/reference/shared/samples_qc.py:131-257``; max_iter guard
``:176-180``; stats cutoffs ``:218-224``, W3 in SURVEY.md §2.5).

Each round is ONE aggregation job over all measures (the reference runs
one per measure). The loop is driver-side control flow over lazily-built
plans; survivor state is a boolean column, never a shrinking table, so
the final output keeps every row (annotate-don't-drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.flags import add_flags

OUTLIER_MEASURES: tuple[str, ...] = ("word_count", "mean_word_len", "stopword_density")


def flag_iterative_outliers(
    df: DataFrame,
    measures: tuple[str, ...] = OUTLIER_MEASURES,
    k_sigma: float = 4.0,
    max_iter: int = 3,
    flag_col: str = "final_failing_qc",
    tag: str = "metric_outlier",
) -> DataFrame:
    df = df.withColumn("__live", F.lit(True))
    df = df.localCheckpoint(eager=True)  # cut lineage once; loop adds to it
    for i in range(max_iter):
        stats = (
            df.filter(F.col("__live"))
            .agg(
                *[F.avg(m).alias(f"mu_{m}") for m in measures],
                *[F.stddev_samp(m).alias(f"sd_{m}") for m in measures],
            )
            .collect()[0]
        )
        cond = F.lit(False)
        for m in measures:
            mu, sd = stats[f"mu_{m}"], stats[f"sd_{m}"]
            if mu is None or sd is None or sd == 0.0:
                continue
            cond = cond | (F.abs(F.col(m) - F.lit(mu)) > F.lit(k_sigma * sd))
        newly_out = df.filter(F.col("__live") & cond).limit(1).count()
        df = df.withColumn("__live", F.col("__live") & ~F.coalesce(cond, F.lit(False)))
        df = df.localCheckpoint(eager=True)
        if newly_out == 0:
            break
    out = add_flags(df, flag_col, {tag: ~F.col("__live")})
    return out.drop("__live")
