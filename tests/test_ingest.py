"""Byte-identity contract of the extraction stage (BASELINE.json input_hint)."""

import pyspark.sql.functions as F

from exome_qc_library_spark.operators.ingest import extract_text_bytes, ingest_pages


def test_extract_pure_function():
    assert extract_text_bytes(b"<html><body><p>hi there</p></body></html>") == "hi there"
    assert extract_text_bytes(None) is None
    assert extract_text_bytes(b"<html>no body</html>") is None
    # embedded newlines survive byte-for-byte (DOTALL)
    assert extract_text_bytes(b"<p>a\nb</p>") == "a\nb"


def test_unicode_byte_identity():
    import unicodedata

    nfc = unicodedata.normalize("NFC", "café résumé")
    nfd = unicodedata.normalize("NFD", nfc)
    for s in (nfc, nfd, "emoji 😀🚀 text"):
        html = f"<p>{s}</p>".encode("utf-8")
        out = extract_text_bytes(html)
        assert out == s
        assert out.encode("utf-8") == s.encode("utf-8")


def test_ingest_matches_source_text(spark, pages):
    out = ingest_pages(pages)
    mism = out.filter(
        F.col("text").isNotNull() & (F.col("extracted_text") != F.col("text"))
    ).count()
    assert mism == 0
    assert out.count() == pages.count()
    assert "source_file" in out.columns and "stage_id" in out.columns


def test_ingest_null_html(spark):
    df = spark.createDataFrame(
        [("u1", None, None, None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    row = ingest_pages(df).collect()[0]
    assert row["extracted_text"] is None and row["was_extracted"] is False
