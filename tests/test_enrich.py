"""S1 enrich: host-metadata broadcast join + spam flags (J1 analog)."""

import pyspark.sql.functions as F

from exome_qc_library_spark.operators.enrich import enrich_with_host_metadata, flag_spam_hosts


def test_enrich_and_spam_flags(spark):
    docs = spark.createDataFrame(
        [("https://a.com/1",), ("https://b.com/1",), ("https://c.com/1",)], "url string"
    )
    meta = spark.createDataFrame(
        [("a.com", "src1", 0.95, "b1"), ("b.com", "src2", 0.1, "b1")],
        "host string, source string, spam_score double, crawl_batch string",
    )
    out = flag_spam_hosts(enrich_with_host_metadata(docs, meta))
    rows = {r["url"]: r for r in out.collect()}
    assert rows["https://a.com/1"]["low_pass_failing_qc"] == ["spam_host"]
    assert rows["https://b.com/1"]["low_pass_failing_qc"] == []
    # host absent from metadata: NULL columns, no flag
    assert rows["https://c.com/1"]["spam_score"] is None
    assert rows["https://c.com/1"]["low_pass_failing_qc"] == []
    assert out.count() == 3


def test_join_is_broadcast(spark):
    docs = spark.createDataFrame([("https://a.com/1",)], "url string")
    meta = spark.createDataFrame([("a.com", 0.5)], "host string, spam_score double")
    plan = enrich_with_host_metadata(docs, meta)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_enrich_broadcast_gate(spark):
    # broadcast_metadata=False (full-web host tables past broadcast size)
    # must produce identical rows via the shuffle-join path
    docs = spark.createDataFrame(
        [("https://a.com/1",), ("https://c.com/1",)], "url string"
    )
    meta = spark.createDataFrame(
        [("a.com", "src1", 0.95, "b1")],
        "host string, source string, spam_score double, crawl_batch string",
    )
    a = sorted(
        map(tuple, enrich_with_host_metadata(docs, meta).collect())
    )
    b = sorted(
        map(
            tuple,
            enrich_with_host_metadata(docs, meta, broadcast_metadata=False).collect(),
        )
    )
    assert a == b
