"""Structured-Streaming path: the stateless stage chain over a file stream
with watermarked windowed flag accounting (SURVEY.md §2.10)."""

import os
import shutil
import tempfile


def test_stream_pipeline_counts(spark, pages):
    import pyspark.sql.functions as F

    from exome_qc_library_spark.streaming.stream import (
        run_stream_to_memory,
        streaming_quality_flags,
    )

    src = tempfile.mkdtemp(prefix="stream_src_")
    try:
        fixture = pages.limit(100)
        fixture.repartition(4).write.mode("overwrite").parquet(src)
        out = run_stream_to_memory(spark, src, name="t_stream")
        rows = out.collect()
        assert len(rows) > 0
        flags = {r["flag"] for r in rows}
        assert None in flags or len(flags) > 1  # pass rows and/or fail reasons
        assert all(r["n"] > 0 for r in rows)
        # round-6 review: complete-mode totals cover EVERY window — append
        # mode on a bounded run withheld all windows within the watermark
        # horizon of the max event time, silently under-counting the
        # newest hours. Pin stream total ≡ batch total.
        batch_total = (
            streaming_quality_flags(fixture)
            .filter(F.col("warc_ts").isNotNull())
            .select(F.explode_outer("low_pass_failing_qc"))
            .count()
        )
        assert sum(r["n"] for r in rows) == batch_total
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stateful_host_counters_accumulate_across_batches(spark, pages):
    """applyInPandasWithState: per-host counters must fold state across
    micro-batches (maxFilesPerTrigger=1 over a multi-file source) and the
    final counter per host must equal the batch aggregation."""
    import pyspark.sql.functions as F

    from exome_qc_library_spark.functions.urltools import with_host
    from exome_qc_library_spark.operators.hard_filters import LOW_PASS, apply_hard_filters
    from exome_qc_library_spark.operators.ingest import ingest_pages
    from exome_qc_library_spark.streaming.stream import (
        stream_pages,
        streaming_host_counters,
    )
    from exome_qc_library_spark.synth import PAGES_SCHEMA

    src = tempfile.mkdtemp(prefix="stream_state_")
    try:
        pages.limit(120).repartition(4).write.mode("overwrite").parquet(src)

        def flagged(df):
            return with_host(apply_hard_filters(ingest_pages(df), "low_pass_failing_qc", LOW_PASS))

        q = (
            streaming_host_counters(flagged(stream_pages(spark, src, max_files_per_trigger=1)))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("t_state")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # update-mode memory sink appends each trigger's emissions: the MAX
        # per host is the final accumulated state
        got = {
            r["host"]: (r["n_docs"], r["n_flagged"])
            for r in spark.sql(
                "SELECT host, max(n_docs) AS n_docs, max(n_flagged) AS n_flagged "
                "FROM t_state GROUP BY host"
            ).collect()
        }
        want = {
            r["host"]: (r["n"], r["f"])
            for r in flagged(spark.read.schema(PAGES_SCHEMA).parquet(src))
            .groupBy("host")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count_if(F.size("low_pass_failing_qc") > 0).alias("f"),
            )
            .collect()
        }
        assert got == want
        assert len(want) > 1
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stateful_counters_survive_query_restart(spark, pages):
    """Stop/restart with the same checkpointLocation: per-host state must be
    recovered from the state store, not rebuilt from zero — the property a
    100 TB resumable ingest relies on (round-2 VERDICT #8)."""
    import pyspark.sql.functions as F

    from exome_qc_library_spark.functions.urltools import with_host
    from exome_qc_library_spark.operators.hard_filters import LOW_PASS, apply_hard_filters
    from exome_qc_library_spark.operators.ingest import ingest_pages
    from exome_qc_library_spark.streaming.stream import (
        stream_pages,
        streaming_host_counters,
    )
    from exome_qc_library_spark.synth import PAGES_SCHEMA

    src = tempfile.mkdtemp(prefix="stream_restart_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_restart_ckpt_")
    try:
        all_pages = pages.limit(120).cache()
        t1 = all_pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
        t2 = all_pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)

        def flagged(df):
            return with_host(
                apply_hard_filters(ingest_pages(df), "low_pass_failing_qc", LOW_PASS)
            )

        def run_once():
            # memory sink cannot recover from a checkpoint — foreachBatch is
            # the restartable sink shape a real deployment uses
            emitted = []

            def sink(batch_df, _bid):
                emitted.extend(batch_df.collect())

            q = (
                streaming_host_counters(
                    flagged(stream_pages(spark, src, max_files_per_trigger=1))
                )
                .writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            return emitted

        t1.repartition(2).write.mode("overwrite").parquet(src)
        run_once()
        # second tranche lands AFTER the first query stopped
        t2.repartition(2).write.mode("append").parquet(src)
        run2 = run_once()

        got: dict = {}
        for r in run2:  # keep the LAST emission per host (max counters)
            cur = got.get(r["host"], (0, 0))
            got[r["host"]] = (max(cur[0], r["n_docs"]), max(cur[1], r["n_flagged"]))
        want_all = {
            r["host"]: (r["n"], r["f"])
            for r in flagged(spark.read.schema(PAGES_SCHEMA).parquet(src))
            .groupBy("host")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count_if(F.size("low_pass_failing_qc") > 0).alias("f"),
            )
            .collect()
        }
        want_t2_only = {
            r["host"]: r["n"]
            for r in flagged(t2).groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # run 2 emits only tranche-2 hosts, but each with counters folded
        # over BOTH tranches — equal to the full batch aggregation
        assert got, "second run emitted nothing"
        for host, (n_docs, n_flagged) in got.items():
            assert (n_docs, n_flagged) == want_all[host]
        # at least one host spans both tranches, proving state was recovered
        # (n_docs strictly exceeds its tranche-2-only count)
        assert any(got[h][0] > want_t2_only.get(h, 0) for h in got)
        all_pages.unpersist()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _dedup_tranches():
    import datetime

    def ts(i):
        return datetime.datetime(2024, 1, 1, i)

    # arrival (tranche) order == warc_ts order, so stream first-arrived ≡
    # batch earliest-warc_ts
    return [
        [("a1", ts(1), "content X"), ("a2", ts(2), "content Y"), ("n1", ts(2), None)],
        [("b1", ts(3), "content X"), ("b2", ts(4), "content Z"), ("n2", ts(4), None)],
        [("c1", ts(5), "content X"), ("c2", ts(6), "content W"), ("c3", ts(7), "content Y")],
    ]


def _run_dedup_stream(spark, src, ckpt):
    from exome_qc_library_spark.streaming.stream import streaming_exact_dedup

    emitted = []

    def sink(batch_df, _bid):
        emitted.extend(r["url"] for r in batch_df.select("url").collect())

    q = (
        streaming_exact_dedup(
            spark.readStream.schema("url string, warc_ts timestamp, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return emitted


def test_streaming_exact_dedup_matches_batch(spark):
    """round-4 VERDICT #6: cross-batch exact dedup via
    dropDuplicatesWithinWatermark on the content hash must keep exactly
    the batch operator's keep-set over a multi-file time-ordered stream;
    NULL-text rows are never deduplicated."""
    import pyspark.sql.functions as F

    from exome_qc_library_spark.operators.dedup import flag_exact_duplicates

    src = tempfile.mkdtemp(prefix="stream_dedup_")
    ckpt = tempfile.mkdtemp(prefix="stream_dedup_ck_")
    schema = "url string, warc_ts timestamp, text string"
    try:
        for tranche in _dedup_tranches():
            spark.createDataFrame(tranche, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        kept_stream = set(_run_dedup_stream(spark, src, ckpt))
        batch = flag_exact_duplicates(spark.read.schema(schema).parquet(src))
        kept_batch = {
            r["url"]
            for r in batch.filter(
                ~F.array_contains("low_pass_failing_qc", "exact_duplicate")
            ).collect()
        }
        assert kept_stream == kept_batch == {"a1", "a2", "b2", "c2", "n1", "n2"}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_exact_dedup_survives_restart(spark):
    """Dedup state must be recovered from the checkpoint: a duplicate whose
    original arrived BEFORE the restart is still dropped after it."""
    src = tempfile.mkdtemp(prefix="stream_dedup_rs_")
    ckpt = tempfile.mkdtemp(prefix="stream_dedup_rs_ck_")
    schema = "url string, warc_ts timestamp, text string"
    t1, t2, t3 = _dedup_tranches()
    try:
        for tranche in (t1, t2):
            spark.createDataFrame(tranche, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        first = _run_dedup_stream(spark, src, ckpt)
        assert set(first) == {"a1", "a2", "b2", "n1", "n2"}
        # tranche 3 lands after the first query stopped; c1 duplicates
        # pre-restart content X and must STILL be dropped
        spark.createDataFrame(t3, schema).coalesce(1).write.mode("append").parquet(src)
        second = _run_dedup_stream(spark, src, ckpt)
        assert set(second) == {"c2"}  # c1 (dup of a1) and c3 (dup of a2) dropped
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_matches_batch_flags(spark, pages):
    """The same stage functions run in batch — flag totals must agree."""
    import pyspark.sql.functions as F

    from exome_qc_library_spark.streaming.stream import streaming_quality_flags

    batch = streaming_quality_flags(pages.limit(100))
    n_fail_batch = batch.filter(F.size("low_pass_failing_qc") > 0).count()
    assert batch.count() == 100
    assert 0 < n_fail_batch < 100


def test_streaming_decontamination_matches_batch(spark, pages):
    """Decontamination is per-doc vs a STATIC benchmark — it needs no
    cross-batch state, so it composes into streaming via foreachBatch
    (the repo's documented pattern for cross-record stages) and must
    produce exactly the batch operator's flags."""
    import pyspark.sql.functions as F

    from exome_qc_library_spark.operators.decontaminate import flag_contaminated
    from exome_qc_library_spark.operators.ingest import ingest_pages
    from exome_qc_library_spark.streaming.stream import stream_pages

    src = tempfile.mkdtemp(prefix="stream_decon_")
    try:
        sample = pages.limit(80).cache()
        sample.repartition(4).write.mode("overwrite").parquet(src)
        # benchmark = one real doc's text → at least one stream doc flags
        bench_text = sample.filter(F.col("text").isNotNull()).first()["text"]
        bench = spark.createDataFrame([("b1", bench_text)], "bid string, text string")

        collected: dict[str, bool] = {}

        def sink(df, _epoch):
            out = flag_contaminated(ingest_pages(df), bench, n=5, flag_col="ff")
            for r in out.select("url", "ff").collect():
                collected[r["url"]] = "contaminated" in r["ff"]

        q = (
            stream_pages(spark, src, max_files_per_trigger=1)
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

        batch = flag_contaminated(ingest_pages(sample), bench, n=5, flag_col="ff")
        want = {
            r["url"]: "contaminated" in r["ff"]
            for r in batch.select("url", "ff").collect()
        }
        assert collected == want
        assert any(want.values()) and not all(want.values())
        sample.unpersist()
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _near_dup_tranches():
    import datetime

    def ts(i):
        return datetime.datetime(2024, 1, 1, i)

    words = [f"w{i}" for i in range(80)]
    ta = " ".join(words)
    ta2 = " ".join(words[:-1] + ["changed"])          # one-word near-dup of ta
    ta3 = " ".join(["altered"] + words[1:])           # another, star-shaped
    tb = " ".join(f"z{i}" for i in range(80))         # unrelated
    tn = " ".join(f"q{i}" for i in range(80))         # unrelated
    return [
        [("a1", ts(1), ta), ("b1", ts(2), tb), ("n1", ts(3), tn)],
        [("a2", ts(4), ta2), ("a3", ts(5), ta3)],
    ]


def _run_near_dup_stream(spark, src, ckpt, **kwargs):
    from exome_qc_library_spark.streaming.stream import streaming_near_dup_matches

    matches = []

    def sink(batch_df, _bid):
        matches.extend(
            (r["k"], r["rep"]) for r in batch_df.select("k", "rep").collect()
        )

    q = (
        streaming_near_dup_matches(
            spark.readStream.schema("url string, warc_ts timestamp, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            **kwargs,
        )
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return matches


def test_streaming_near_dup_matches_batch(spark):
    """Cross-batch NEAR-dup via band-bucket state must flag exactly the
    batch flag_near_duplicates non-keep set on star-shaped clusters
    arriving in time order."""
    import pyspark.sql.functions as F

    from exome_qc_library_spark.operators.dedup import flag_near_duplicates

    src = tempfile.mkdtemp(prefix="stream_neardup_")
    ckpt = tempfile.mkdtemp(prefix="stream_neardup_ck_")
    schema = "url string, warc_ts timestamp, text string"
    try:
        for tranche in _near_dup_tranches():
            spark.createDataFrame(tranche, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        matches = _run_near_dup_stream(spark, src, ckpt)
        flagged_stream = {k for k, _rep in matches}
        reps = {rep for _k, rep in matches}
        batch = flag_near_duplicates(spark.read.schema(schema).parquet(src))
        flagged_batch = {
            r["url"]
            for r in batch.filter(
                F.array_contains("final_failing_qc", "near_duplicate")
            ).collect()
        }
        assert flagged_stream == flagged_batch == {"a2", "a3"}
        assert reps == {"a1"}  # first-arrived ≡ earliest-warc_ts representative
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_near_dup_survives_restart(spark):
    """Bucket representatives live in the state store: a near-dup whose
    original arrived BEFORE the restart is still matched after it."""
    src = tempfile.mkdtemp(prefix="stream_neardup_rs_")
    ckpt = tempfile.mkdtemp(prefix="stream_neardup_rs_ck_")
    schema = "url string, warc_ts timestamp, text string"
    t1, t2 = _near_dup_tranches()
    try:
        spark.createDataFrame(t1, schema).coalesce(1).write.mode("append").parquet(src)
        first = _run_near_dup_stream(spark, src, ckpt)
        assert first == []  # originals only, nothing to match yet
        spark.createDataFrame(t2, schema).coalesce(1).write.mode("append").parquet(src)
        second = _run_near_dup_stream(spark, src, ckpt)
        assert {k for k, _ in second} == {"a2", "a3"}
        assert {rep for _, rep in second} == {"a1"}  # recovered from state
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_near_dup_state_ttl_evicts_and_reseeds(spark):
    """Event-time TTL bounds the band-bucket state store: once the
    watermark passes a bucket's last-activity + TTL in a batch that
    brings it no data, its representative is evicted; a later duplicate
    re-seeds the bucket instead of matching the expired original
    (bounded recall loss at the TTL horizon), while duplicates within
    the horizon still match normally."""
    import datetime

    def ts(i, m=0):
        return datetime.datetime(2024, 1, 1, i, m)

    words = [f"w{i}" for i in range(80)]
    ta = " ".join(words)
    ta2 = " ".join(words[:-1] + ["changed"])
    ta3 = " ".join(["altered"] + words[1:])
    tz = " ".join(f"z{i}" for i in range(80))   # unrelated watermark-drivers
    tz2 = " ".join(f"y{i}" for i in range(80))
    tranches = [
        [("a1", ts(1), ta)],
        # batch 2 raises the post-batch watermark to hour 10 (during the
        # batch it is still hour 1, so a1's 1:30 timer cannot fire yet)
        [("z1", ts(10), tz)],
        # batch 3: watermark now 10:00 > a1's timer AND the a-bucket gets
        # no data — Spark's timeout contract evicts it exactly here
        [("z2", ts(10, 30), tz2)],
        [("a2", ts(11), ta2), ("a3", ts(12), ta3)],
    ]
    schema = "url string, warc_ts timestamp, text string"

    def run(ttl):
        src = tempfile.mkdtemp(prefix="stream_ttl_")
        ckpt = tempfile.mkdtemp(prefix="stream_ttl_ck_")
        try:
            for tranche in tranches:
                spark.createDataFrame(tranche, schema).coalesce(1).write.mode(
                    "append"
                ).parquet(src)
            return _run_near_dup_stream(
                spark, src, ckpt, state_ttl_minutes=ttl
            )
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

    # TTL shorter than the gap: a1 evicted in batch 2, a2 re-seeds,
    # a3 matches the NEW representative
    short = run(30.0)
    assert {(k, rep) for k, rep in short} == {("a3", "a2")}
    # TTL longer than the whole span: identical to the NoTimeout result
    long = run(24 * 60.0)
    assert {(k, rep) for k, rep in long} == {("a2", "a1"), ("a3", "a1")}


def test_streaming_exact_dedup_null_text_null_key_rows_all_survive(spark):
    """round-5 ADVICE: with text AND key both NULL the state key must not
    collapse to a single NULL-concat group — every such row survives."""
    import datetime

    src = tempfile.mkdtemp(prefix="stream_nullkey_")
    ckpt = tempfile.mkdtemp(prefix="stream_nullkey_ck_")
    schema = "url string, warc_ts timestamp, text string"
    rows = [
        (None, datetime.datetime(2024, 1, 1, h), None) for h in range(1, 4)
    ]
    try:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        emitted = _run_dedup_stream(spark, src, ckpt)
        assert emitted == [None, None, None]  # all three, none deduplicated
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_near_dup_ttl_ignores_null_event_time_rows(spark):
    """round-5 ADVICE: with a TTL configured, a NULL event time would reach
    the state fn as NaT and compute a far-past timeout that kills the
    query — such rows are filtered in TTL mode and the query completes."""
    import datetime

    words = [f"w{i}" for i in range(80)]
    ta = " ".join(words)
    ta2 = " ".join(words[:-1] + ["changed"])
    src = tempfile.mkdtemp(prefix="stream_nat_")
    ckpt = tempfile.mkdtemp(prefix="stream_nat_ck_")
    schema = "url string, warc_ts timestamp, text string"
    rows = [
        ("a1", datetime.datetime(2024, 1, 1, 1), ta),
        ("nat", None, ta2),  # would NaT-poison the timeout computation
        ("a2", datetime.datetime(2024, 1, 1, 1, 10), ta2),
    ]
    try:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        matches = _run_near_dup_stream(
            spark, src, ckpt, state_ttl_minutes=60.0
        )
        assert ("a2", "a1") in {(k, rep) for k, rep in matches}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
