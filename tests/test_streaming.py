"""Structured-Streaming path: the stateless stage chain over a file stream
with watermarked windowed flag accounting (SURVEY.md §2.10)."""

import os
import shutil
import tempfile


def test_stream_pipeline_counts(spark, pages):
    from exome_qc_library_spark.streaming.stream import run_stream_to_memory

    src = tempfile.mkdtemp(prefix="stream_src_")
    try:
        pages.limit(100).repartition(4).write.mode("overwrite").parquet(src)
        out = run_stream_to_memory(spark, src, name="t_stream")
        rows = out.collect()
        assert len(rows) > 0
        flags = {r["flag"] for r in rows}
        assert None in flags or len(flags) > 1  # pass rows and/or fail reasons
        assert all(r["n"] > 0 for r in rows)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_matches_batch_flags(spark, pages):
    """The same stage functions run in batch — flag totals must agree."""
    import pyspark.sql.functions as F

    from exome_qc_library_spark.streaming.stream import streaming_quality_flags

    batch = streaming_quality_flags(pages.limit(100))
    n_fail_batch = batch.filter(F.size("low_pass_failing_qc") > 0).count()
    assert batch.count() == 100
    assert 0 < n_fail_batch < 100
