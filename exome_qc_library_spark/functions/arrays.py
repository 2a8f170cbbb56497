"""Array/vector math as higher-order expressions (no UDF, no MLlib dependency).

Analog of the reference's manual PC projection — normalize, elementwise
multiply, ``hl.agg.array_sum`` (``/root/reference/shared/samples_qc.py:565-596``,
K7 in SURVEY.md §2.9) — generalized to the embedding-similarity kernels a
training-data pipeline needs (dot product / cosine over ``array<float>``).

``F.zip_with`` + ``F.aggregate`` fold left-to-right deterministically,
which keeps double-precision results stable across parallelism levels
(the determinism gate, FIXTURES.md §7.5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, deterministic left fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom)


def array_sum_expr(a: Column) -> Column:
    """``hl.sum(arr)`` analog (``shared/variant_qc.py:275``)."""
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double"))


def _elementwise_agg(col: Column, dim: int, agg) -> Column:
    # try_element_at: under Spark 4's default ANSI mode a plain
    # element_at THROWS on any row whose array is shorter than dim,
    # killing the whole aggregation for one ragged vector (round-6
    # review); try_ yields NULL, which sum/avg skip
    return F.array(
        *[agg(F.try_element_at(col, F.lit(i + 1))).alias(f"c{i}") for i in range(dim)]
    )


def elementwise_agg_sum(col: Column, dim: int) -> Column:
    """``hl.agg.array_sum`` analog: elementwise sum of array columns across
    rows — expressed as an array of per-index sums so it stays a single
    grouped aggregation."""
    return _elementwise_agg(col, dim, F.sum)


def elementwise_agg_mean(col: Column, dim: int) -> Column:
    """Elementwise mean of array columns across rows (single grouped
    aggregation) — the centroid-update kernel for IVF-style ANN
    (:func:`~..operators.similarity.train_centroids_lite`)."""
    return _elementwise_agg(col, dim, F.avg)
