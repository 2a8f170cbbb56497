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
    """Flag rows whose url OR host appears in the (broadcast) blocklist.

    Two broadcast EQUI left joins against the DISTINCT list (≤1 match per
    row per join, so no row multiplication) instead of an OR-condition
    join + dropDuplicates — the old shape silently collapsed legitimate
    duplicate url keys (crawl re-fetches), breaking the rows-preserved
    invariant (round-1 ADVICE); an OR predicate also forces a nested-loop
    join, while equi-joins stay hash joins.
    """
    keys = blocklist.select(F.col(list_col).alias("__blocked")).distinct()
    # the second broadcast reuses the first's exchange (canonicalized
    # plans match despite the aliases; ReusedExchange verified in tests)
    by_url = F.broadcast(keys.withColumnRenamed("__blocked", "__bu"))
    by_host = F.broadcast(keys.withColumnRenamed("__blocked", "__bh"))
    hit = (
        df.withColumn("__host", host_expr(F.col(url_col)))
        .join(by_url, F.col(url_col) == F.col("__bu"), "left")
        .join(by_host, F.col("__host") == F.col("__bh"), "left")
        .withColumn("__is_blocked", F.col("__bu").isNotNull() | F.col("__bh").isNotNull())
        .drop("__bu", "__bh", "__host")
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
    """Eager anti-join variant (the reference's literal semantics, J2).

    Matches url OR host, the same semantics as :func:`flag_blocklisted`
    (round-6 review: the url-only anti-join let blocked-HOST docs survive
    the eager removal path while the flag path caught them). Two chained
    equi anti-joins — an OR-condition join would force a nested loop."""
    bl = blocklist.select(F.col(blocklist.columns[0]).alias("__blocked")).distinct()
    out = df.join(
        F.broadcast(bl), df[url_col] == bl["__blocked"], "left_anti"
    )
    return out.withColumn("__host", host_expr(F.col(url_col))).join(
        F.broadcast(bl), F.col("__host") == bl["__blocked"], "left_anti"
    ).drop("__host")
