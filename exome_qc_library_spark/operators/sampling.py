"""Deterministic stratified sampling — domain/language mixing quotas.

A first-class training-data-pipeline operator (task brief §additions):
down-sample each stratum (language, source domain, quality band) to a
target fraction, deterministically. The gate is the same high-bit
multiplicative hash used by the ``sample_rows`` query (Knuth constant,
``>> 16`` so the mod sees mixed bits, 31-bit mask so the int64 product
can never overflow) — NOT an RNG stream, so the sample is:

* partition-layout-independent (same keys kept at any parallelism /
  any file split — the determinism gate the scaling study requires);
* resumable (re-running after a checkpoint restore picks the same keys);
* exactly reproducible in ANSI SQL (the ``stratified_sample`` oracle).

Reference analog: ``mt.sample_rows`` downsampling before the O(n²)
stages (``/root/reference/shared/variant_qc.py:29-63`` caps via
deterministic subset), generalized to per-stratum quotas like the
reference's per-batch stratification (``shared/samples_qc.py:408-486``).

Scale shape: one pure-expression filter — no shuffle, no RNG state, no
per-stratum jobs; the fraction lookup is a literal CASE chain (strata
counts are small: languages × sources).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761
_MASK31 = 2147483647
_BPS = 10_000  # basis points: fractions quantized to 0.01% so the gate
# compares integers — no float-threshold drift between engines


def hash_gate(key: Column) -> Column:
    """Uniform pseudo-random bucket in [0, 10000) from an integer key."""
    return F.pmod(
        F.shiftright(key.bitwiseAND(F.lit(_MASK31)) * F.lit(_KNUTH), 16), F.lit(_BPS)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep ~``fractions[stratum]`` of each stratum's rows, deterministically.

    A stratum absent from ``fractions`` keeps ``default_fraction``.
    NULL strata use ``default_fraction`` too (no silent keep-all).
    """
    threshold: Column = F.lit(int(round(default_fraction * _BPS)))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(round(frac * _BPS)))
        ).otherwise(threshold)
    return df.filter(hash_gate(F.col(key_col)) < threshold)


def stratified_sample_sql_gate(key_expr: str = "doc_id") -> str:
    """The DuckDB-verbatim mirror of :func:`hash_gate` (oracle helper)."""
    return f"((({key_expr} & {_MASK31}) * {_KNUTH}) >> 16) % {_BPS}"
