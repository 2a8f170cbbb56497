"""External-resource readers: delimited files, removal lists, interval tables.

Parity targets (SURVEY.md §2.1):

* S4 — ``hl.import_table(file, delimiter=..., impute=True, key=...,
  missing=...)`` (``/root/reference/shared/samples_annotation.py:21``;
  no-header variant ``exome_qc/exome_qc.py:135``) →
  :func:`import_delimited`.
* S1/S12 — pages-table scans with projection/filter pushdown →
  :func:`read_pages` / :func:`read_testdata_table`.
* S5 — locus-interval import + point-in-interval annotation
  (``find_denovo_variants.py:280-283``) → :func:`read_intervals` +
  :func:`interval_join` (broadcast range join — interval sets are small,
  so Spark executes a broadcast-nested-loop, which is the right plan).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def import_delimited(
    spark: SparkSession,
    path: str,
    delimiter: str = "\t",
    header: bool = True,
    impute: bool = True,
    missing: str = "NA",
    key: str | None = None,
    schema: str | None = None,
) -> DataFrame:
    """``hl.import_table`` analog: delimiter/missing-token/impute options.

    ``impute=True`` maps to ``inferSchema`` (acceptable for small resource
    tables only; big tables should pass ``schema``). ``key`` is advisory —
    Spark has no keyed tables; joins choose the key (SURVEY.md §1.1).
    """
    reader = (
        spark.read.option("sep", delimiter)
        .option("header", header)
        .option("nullValue", missing)
    )
    if schema:
        reader = reader.schema(schema)
    elif impute:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if not header and not schema:
        # headerless + no explicit schema → Spark's _c0.._cN; rename to the
        # reference's f0..fN convention. An explicit schema already names
        # the columns — renaming would clobber it (round-6 review)
        df = df.toDF(*[f"f{i}" for i in range(len(df.columns))])
    return df


def read_removal_list(spark: SparkSession, path: str) -> DataFrame:
    """One url-or-host per line, no header — ``--sample_removal_list`` analog
    (``exome_qc/exome_qc.py:134-138``)."""
    return import_delimited(spark, path, header=False, impute=False).toDF("url_or_host")


def read_testdata_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan of the pages table (url, warc_ts, html, text, lang) — parquet
    path or catalog table name.

    Anything path-shaped (contains a separator or a URI scheme, or exists
    locally) is read as parquet; only bare identifiers go to the catalog.
    ``os.path.isdir`` alone would misroute every REMOTE dataset URI
    (``s3a://…/pages``) into ``spark.read.table`` (round-6 review)."""
    looks_like_path = (
        "/" in path or "\\" in path or "://" in path
        or path.endswith(".parquet") or os.path.isdir(path)
    )
    if looks_like_path:
        return spark.read.parquet(path)
    return spark.read.table(path)


def read_intervals(spark: SparkSession, path: str, delimiter: str = "\t") -> DataFrame:
    """Interval file ``key, lo, hi`` (e.g. host, size band) → typed table."""
    return import_delimited(spark, path, delimiter=delimiter, header=True)


def interval_join(
    df: DataFrame,
    intervals: DataFrame,
    point: Column,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "left",
) -> DataFrame:
    """Point-in-interval annotation: broadcast non-equi join — small interval
    sets make broadcast-nested-loop the correct physical plan (J5)."""
    cond = (point >= intervals[lo]) & (point < intervals[hi])
    return df.join(F.broadcast(intervals), cond, how)
