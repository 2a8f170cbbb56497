"""Structured Streaming ingestion of the pages table.

The reference is a pure batch pipeline whose closest streaming analog is
its resumable checkpointing (``/root/reference/README.md:54-55``;
SURVEY.md §2.10). The target layout is append-only snapshots keyed by
``warc_ts`` — which makes the *same stage functions* runnable under
``readStream``: every per-row stage (ingest, hard filters, langid UDF,
scrub, verdict) is stateless, so it composes unchanged; only the
cross-record stages (dedup, host QC) need batch barriers and run in
``foreachBatch`` or stay in the batch plane.

Provided here:
* :func:`stream_pages` — file-source stream over a pages directory;
* :func:`streaming_quality_flags` — the stateless stage chain as a
  streaming transformation;
* :func:`windowed_flag_counts` — watermarked per-crawl-window flag
  accounting (late pages up to the watermark are folded in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.hard_filters import LOW_PASS, apply_hard_filters
from ..operators.ingest import ingest_pages
from ..operators.langid import with_langid_expr, flag_lang_mismatch
from ..operators.scrub import apply_scrub
from ..operators.verdict import with_verdict
from ..synth import PAGES_SCHEMA


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_quality_flags(pages: DataFrame) -> DataFrame:
    """Stateless stage chain — identical code path as batch (the whole
    point of keeping stages pure DataFrame → DataFrame)."""
    df = ingest_pages(pages)
    df = apply_hard_filters(df, "low_pass_failing_qc", LOW_PASS)
    df = with_langid_expr(df)
    df = flag_lang_mismatch(df)
    df = with_verdict(df, flag_cols=("low_pass_failing_qc", "final_failing_qc"))
    return apply_scrub(df)


def windowed_flag_counts(
    flagged: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-crawl-window fail-reason accounting with late-data handling."""
    return (
        flagged.withWatermark("warc_ts", watermark)
        .select(F.col("warc_ts"), F.explode_outer("low_pass_failing_qc").alias("flag"))
        .groupBy(F.window("warc_ts", window), "flag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def run_stream_to_memory(spark: SparkSession, src_path: str, name: str = "stream_out") -> DataFrame:
    """Drive a bounded file stream to completion synchronously (test/demo)."""
    q = (
        windowed_flag_counts(streaming_quality_flags(stream_pages(spark, src_path)))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")
