"""PII scrub correctness + byte stability (north rule: byte-identical
scrubbed text per url)."""

import pyspark.sql.functions as F

from exome_qc_library_spark.operators.scrub import apply_scrub, scrub_expr, with_pii_hits


def scrub_one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(scrub_expr(F.col("text")).alias("s")).collect()[0]["s"]


def test_email_phone_ssn_card_ip(spark):
    t = "mail a.b-c@x.co.uk call 555-123-4567 ssn 123-45-6789 card 4111 1111 1111 1111 ip 10.0.0.1 done"
    s = scrub_one(spark, t)
    assert "<EMAIL>" in s and "<PHONE>" in s and "<SSN>" in s and "<CARD>" in s and "<IP>" in s
    assert "a.b-c@x" not in s and "4111" not in s and "123-45-6789" not in s
    assert s.endswith("done")


def test_clean_text_unchanged(spark):
    t = "the quick brown fox version 2 of 10 things"
    assert scrub_one(spark, t) == t


def test_pii_hits_metric(spark):
    df = spark.createDataFrame(
        [("a", "x@y.com and 1.2.3.4"), ("b", "clean"), ("c", None)], "id string, text string"
    )
    got = {r["id"]: r["pii_hits"] for r in with_pii_hits(df).collect()}
    assert got["a"] == 2 and got["b"] == 0 and got["c"] is None


def test_scrub_gated_on_keep(spark):
    df = spark.createDataFrame(
        [("a", "x@y.com", True), ("b", "x@y.com", False)], "id string, text string, keep boolean"
    )
    got = {r["id"]: r["scrubbed_text"] for r in apply_scrub(df).collect()}
    assert got["a"] == "<EMAIL>"
    assert got["b"] is None  # dropped docs never export scrubbed text


def test_byte_stability_across_runs(spark, pages):
    a = apply_scrub(pages.withColumn("keep", F.lit(True)))
    b = apply_scrub(pages.withColumn("keep", F.lit(True)))
    diff = (
        a.select("url", "scrubbed_text")
        .exceptAll(b.select("url", "scrubbed_text"))
        .count()
    )
    assert diff == 0
