"""Physical-plan audits: the scale properties the engine claims must be
visible in the executed plan, not just asserted in prose (SURVEY.md §4).

Each test pins one property: predicate pushdown reaching the parquet
scan, column pruning (ReadSchema), broadcast joins for small dims,
window-free host QC, shuffle-free IVF assignment (in test_similarity),
and absence of cartesian products in the LSH pair generation.
"""

import pyspark.sql.functions as F

from exome_qc_library_spark.entry_queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


SF = "/root/testdata/sf0.001"


def q(name, spark):
    fn, _sql = QUERIES[name]
    return fn(spark, SF)


def test_filter_pushdown_reaches_scan(spark):
    # tpch_pricing filters l_shipdate <= date: must appear as PushedFilters
    plan = _plan(q("tpch_pricing", spark))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_column_pruning_token_counts(spark):
    # token_counts reads only doc_id + text: the scan schema must not
    # include lang/source/n_chars
    plan = _plan(q("token_counts", spark))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_join_agg_uses_broadcast_joins(spark):
    # small dims (customer, nation) broadcast — no sort-merge shuffle join
    plan = _plan(q("join_agg_revenue", spark))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_host_outliers_plan_is_window_free(spark):
    # A13 via grouped agg + broadcast, never a WindowExec (VERDICT r1 #3)
    plan = _plan(q("host_outliers", spark))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_lsh_pairs_no_cartesian(spark):
    # candidate generation must never be a cartesian/nested-loop product
    plan = _optimized(q("minhash_pairs", spark))
    assert "Join Cross" not in plan and "CartesianProduct" not in plan


def test_simhash_pairs_no_cartesian_and_aggregate_shaped(spark):
    # round-2 VERDICT #2: simhash candidate generation is a capped
    # groupBy-explode like minhash — never a blockwise self-join that can
    # go O(m²) on a hot quarter value
    from exome_qc_library_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame(
        [(f"u{i}", 0x1111_2222_3333_4444 ^ i) for i in range(8)],
        "url string, simhash long",
    )
    pairs = simhash_pairs(df)
    opt = _optimized(pairs)
    assert "Join Cross" not in opt and "CartesianProduct" not in opt
    plan = _plan(pairs)
    assert "HashAggregate" in plan or "SortAggregate" in plan  # block cap agg


def test_exact_dedup_pipeline_form_is_aggregate_not_window(spark):
    # the PIPELINE exact-dedup (sha2 groupBy min-struct) — scale shape
    from exome_qc_library_spark.operators.dedup import flag_exact_duplicates

    df = spark.createDataFrame(
        [("u1", 1, "x"), ("u2", 2, "x")], "url string, warc_ts long, text string"
    )
    plan = _plan(flag_exact_duplicates(df))
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_whole_stage_codegen_on_scan_agg(spark):
    # simple-expression scan+agg queries must sit inside WholeStageCodegen
    # (HOF-lambda projections like text_metrics are interpreted by design —
    # Spark excludes higher-order functions from codegen — so the codegen
    # check pins the arithmetic/aggregate shapes instead)
    import re

    for name in ("histogram_chars", "tpch_pricing"):
        df = q(name, spark)
        df.collect()  # finalize the AQE plan — codegen markers appear only then
        plan = _plan(df)
        # AQE's final-plan rendering marks codegen stages as `*(n) Operator`
        assert re.search(r"\*\(\d+\) (Hash|Sort)Aggregate", plan), (name, plan[:400])


def test_segment_zscore_plan_is_window_free(spark):
    """Round 7: the per-source z-score must never shuffle the doc table
    into #sources window partitions (low-cardinality key skew) — the
    stats side is a partial-agg groupBy broadcast back; only the tiny
    per-source aggregate crosses an exchange."""
    plan = _plan(q("segment_zscore", spark))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    # the doc (probe) side reaches the join straight from the scan — the
    # only Sort in an agg+broadcast plan would be a stray window artifact
    assert "Sort" not in plan


def test_window_topk_single_exchange_with_group_limit(spark):
    """Round 7: the spread repartition keys on the WINDOW key, so the
    window reuses it (guide §2.4) — exactly one data exchange besides the
    broadcast-free plan, and Spark 4's WindowGroupLimit top-k pruning
    must survive the rewrite."""
    plan = _plan(q("window_topk", spark))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") <= 2  # AQE may or may not fold the spread
