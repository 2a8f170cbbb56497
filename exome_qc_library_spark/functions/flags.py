"""Fail-flag accumulator combinators — the engine's signature semantic.

The reference accumulates per-record failure reasons into
``array<string>`` columns instead of dropping rows:

* instantiate with an empty array and conditionally ``.append(tag)``
  (``/root/reference/shared/variant_qc.py:557,568-628``);
* missing inputs get their own ``missing_*`` tag rather than a silent
  pass (``shared/variant_qc.py:573-575``, ``shared/samples_qc.py:374-377``);
* the final keep decision is "flag array is empty"
  (``shared/samples_qc.py:76-77``);
* per-flag accounting is logged after every stage
  (``shared/variant_qc.py:638-723``) — here done in ONE aggregation
  job instead of one full scan per flag.

All combinators are pure Column expressions: no UDFs, no shuffles.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def empty_flags() -> Column:
    """A typed empty ``array<string>`` accumulator (``hl.empty_array(hl.tstr)`` analog)."""
    return F.array().cast(T.ArrayType(T.StringType(), containsNull=False))


def with_flag_column(df: DataFrame, flag_col: str) -> DataFrame:
    """Ensure ``flag_col`` exists as an empty flag accumulator."""
    if flag_col in df.columns:
        return df
    return df.withColumn(flag_col, empty_flags())


def append_flag(flags: Column, tag: str, pred: Column) -> Column:
    """``hl.cond(pred, arr.append(tag), arr)`` analog (variant_qc.py:568-571).

    NULL predicate does NOT append (Hail ``missing_false`` semantics):
    callers that need missing-awareness use :func:`append_flag_with_missing`.
    """
    return F.when(F.coalesce(pred, F.lit(False)), F.array_append(flags, F.lit(tag))).otherwise(
        flags
    )


def append_flag_with_missing(
    flags: Column, tag: str, pred: Column, inputs: Iterable[Column]
) -> Column:
    """Append ``tag`` when pred is true, or ``missing_<tag>`` when any input is NULL.

    Mirrors the reference's explicit missing-measure tagging
    (``shared/variant_qc.py:573-575``): NULL metric ⇒ ``missing_*`` flag,
    never a silent pass.
    """
    inputs = list(inputs)
    any_missing = None
    for c in inputs:
        cond = c.isNull()
        any_missing = cond if any_missing is None else (any_missing | cond)
    if any_missing is None:
        return append_flag(flags, tag, pred)
    return (
        F.when(any_missing, F.array_append(flags, F.lit(f"missing_{tag}")))
        .when(F.coalesce(pred, F.lit(False)), F.array_append(flags, F.lit(tag)))
        .otherwise(flags)
    )


def flag_entry(tag: str, pred: Column, inputs: Iterable[Column] | None = None) -> Column:
    """One rule → a nullable string: ``missing_<tag>`` if any input NULL,
    ``tag`` if pred, else NULL. Linear-size building block for
    :func:`add_flags` (a folded array_append would double the expression
    tree per rule and blow the 64 KB whole-stage-codegen method limit)."""
    expr = F.when(F.coalesce(pred, F.lit(False)), F.lit(tag))
    if inputs:
        any_missing = None
        for c in inputs:
            cond = c.isNull()
            any_missing = cond if any_missing is None else (any_missing | cond)
        expr = F.when(any_missing, F.lit(f"missing_{tag}")).otherwise(expr)
    return expr


VOCAB_KEY = "flag_vocab"


def flag_vocab(df: DataFrame, flag_col: str) -> list[str] | None:
    """The statically-known tag vocabulary of a flag column, or None.

    :func:`add_flags` records every tag it can emit as column metadata
    (parquet round-trips preserve it), so downstream accounting can count
    all flags with fixed aggregate expressions — e.g. inside the
    checkpoint-write job via ``df.observe`` — instead of a second full
    scan (``plans/pipeline.py``)."""
    try:
        md = df.schema[flag_col].metadata
    except KeyError:
        return None
    vocab = md.get(VOCAB_KEY)
    return list(vocab) if vocab is not None else None


def add_flags(
    df: DataFrame,
    flag_col: str,
    rules: dict[str, Column],
    missing_inputs: dict[str, list[Column]] | None = None,
) -> DataFrame:
    """Apply many flag rules in ONE projection (single codegen stage).

    ``rules`` maps tag → boolean predicate. ``missing_inputs`` optionally
    maps tag → the metric columns whose NULL-ness yields ``missing_<tag>``.

    All rules are evaluated as independent nullable entries of a single
    array literal, NULLs filtered out, then concatenated onto the existing
    accumulator — O(rules) expression size, one ``withColumn``.

    Every tag this call can emit (incl. the ``missing_*`` variants) is
    appended to the column's ``flag_vocab`` metadata — the auditable rule
    inventory that lets per-stage accounting run as observed metrics of
    the materialization job itself (see :func:`flag_vocab`).
    """
    df = with_flag_column(df, flag_col)
    missing_inputs = missing_inputs or {}
    entries = [flag_entry(t, p, missing_inputs.get(t)) for t, p in rules.items()]
    new_flags = F.filter(F.array(*entries), lambda x: x.isNotNull())
    # coalesce the accumulator: a NULL flag array (e.g. rows introduced by
    # an outer join after the column existed) would NULL-propagate through
    # concat, silently swallowing every flag appended from then on AND
    # making size(flags)==0 keep-checks evaluate NULL (round-6 review)
    acc = F.coalesce(F.col(flag_col), F.array().cast("array<string>"))
    out = df.withColumn(flag_col, F.concat(acc, new_flags))
    md = dict(df.schema[flag_col].metadata)
    vocab = list(md.get(VOCAB_KEY, []))
    for t in rules:
        if t not in vocab:
            vocab.append(t)
        if missing_inputs.get(t) and f"missing_{t}" not in vocab:
            vocab.append(f"missing_{t}")
    md[VOCAB_KEY] = vocab
    return out.withMetadata(flag_col, md)


def passes(flag_col: str) -> Column:
    """``hl.len(failing)==0`` analog (samples_qc.py:76-77)."""
    return F.size(F.col(flag_col)) == 0


def keep_expr(*flag_cols: str) -> Column:
    """Final verdict: conjunction of empty flag arrays (README.md:51-53 invariant)."""
    out = F.lit(True)
    for c in flag_cols:
        out = out & (F.size(F.col(c)) == 0)
    return out


def count_flags(df: DataFrame, flag_col: str, tags: Iterable[str] | None = None) -> dict[str, int]:
    """Per-flag counts in a SINGLE job.

    The reference's ``count_failing`` issues one full-scan aggregation per
    flag ("Slow but useful", ``shared/variant_qc.py:119,129-160``); here all
    tags are counted in one ``agg`` of many ``count_if`` expressions when the
    tag set is known, else one explode+groupBy pass.
    """
    if tags is not None:
        tags = list(tags)
        aggs = [
            F.count_if(F.array_contains(F.col(flag_col), t)).alias(t) for t in tags
        ] + [F.count_if(F.size(F.col(flag_col)) == 0).alias("__passing__")]
        row = df.agg(*aggs).collect()[0]
        return {t: row[t] for t in tags} | {"__passing__": row["__passing__"]}
    rows = (
        df.select(F.explode(flag_col).alias("flag")).groupBy("flag").count().collect()
    )
    return {r["flag"]: r["count"] for r in rows}


def flag_count_df(df: DataFrame, flag_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """Distributed per-flag (optionally per-group) accounting table.

    Analog of the per-stage ``count_failing`` reports
    (``shared/variant_qc.py:638-723``), returned as a DataFrame so it can
    be snapshotted next to the stage checkpoint.
    """
    group_cols = group_cols or []
    return (
        df.select(*group_cols, F.explode_outer(flag_col).alias("flag"))
        .groupBy(*group_cols, "flag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
