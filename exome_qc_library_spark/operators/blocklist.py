"""S2 — blocklist removal: anti-join + substring rules.

Mirrors the reference's sample-removal stage exactly:
* anti-join against a removal list (``mt.anti_join_cols(rm_list)``,
  ``/root/reference/exome_qc/exome_qc.py:134-138``, J2) — here as a FLAG,
  not a drop, to preserve the annotate-don't-drop invariant; an eager
  ``remove_blocklisted`` variant gives the reference's dropping behavior;
* substring removal (``--sample_removal_strings``,
  ``exome_qc/exome_qc.py:143-148``, P2) via a broadcast literal list,
  like ``hl.literal(list).contains(mt.s)`` (J3, ``:271,323``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.flags import add_flags
from ..functions.urltools import host_expr


def flag_blocklisted(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    list_col: str = "url_or_host",
    flag_col: str = "low_pass_failing_qc",
) -> DataFrame:
    """Flag rows whose url OR host appears in the (broadcast) blocklist."""
    bl = F.broadcast(blocklist.select(F.col(list_col).alias("__blocked")).distinct())
    host = host_expr(F.col(url_col))
    hit = (
        df.withColumn("__host", host)
        .join(bl, (F.col(url_col) == F.col("__blocked")) | (F.col("__host") == F.col("__blocked")), "left")
        .withColumn("__is_blocked", F.col("__blocked").isNotNull())
        .drop("__blocked", "__host")
        # the OR-join can duplicate a row matched by both url and host
        .dropDuplicates([url_col])
    )
    return add_flags(hit, flag_col, {"blocklisted": F.col("__is_blocked")}).drop("__is_blocked")


def flag_substring_matches(
    df: DataFrame,
    substrings: Sequence[str],
    url_col: str = "url",
    flag_col: str = "low_pass_failing_qc",
) -> DataFrame:
    """``--sample_removal_strings`` analog: flag urls containing any of the
    given substrings (driver-literal broadcast, pure expressions)."""
    cond = F.lit(False)
    for s in substrings:
        cond = cond | F.col(url_col).contains(s)
    return add_flags(df, flag_col, {"url_substring": cond})


def remove_blocklisted(df: DataFrame, blocklist: DataFrame, url_col: str = "url") -> DataFrame:
    """Eager anti-join variant (the reference's literal semantics, J2)."""
    bl = blocklist.select(F.col(blocklist.columns[0]).alias(url_col)).distinct()
    return df.join(F.broadcast(bl), url_col, "left_anti")
