"""Token counting, fingerprints, quality score; multimodal binary plumbing."""

import pyspark.sql.functions as F

from exome_qc_library_spark.operators.multimodal import (
    decode_media_features,
    with_media_metadata,
)
from exome_qc_library_spark.operators.tokenize import with_fingerprint, with_token_counts


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("a", "hello world it's 2024!"), ("b", ""), ("c", None)], "id string, text string"
    )
    got = {r["id"]: (r["ws_tokens"], r["bpe_tokens"]) for r in with_token_counts(df).collect()}
    assert got["a"][0] == 4
    # hello|world|it|'s|2024|! → 6 BPE-ish pretokens
    assert got["a"][1] == 6
    assert got["b"] == (0, 0)
    assert got["c"] == (None, None)


def test_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [("a", "the cat"), ("b", "the cat"), ("c", "cat the"), ("d", "THE   CAT")],
        "id string, text string",
    )
    got = {r["id"]: r["fingerprint"] for r in with_fingerprint(df).collect()}
    assert got["a"] == got["b"]          # identical text
    assert got["a"] != got["c"]          # order-sensitive
    assert got["a"] == got["d"]          # case/whitespace-insensitive


def test_media_metadata_and_stub_decode(spark):
    df = spark.createDataFrame([("u1", b"\x89PNGfake"), ("u2", None)], "url string, html binary")
    meta = {r["url"]: r["media_meta"] for r in with_media_metadata(df).collect()}
    assert meta["u1"]["n_bytes"] == 8 and len(meta["u1"]["sha256"]) == 64
    assert meta["u2"] is None

    out = {r["url"]: r["media_features"] for r in decode_media_features(df, dim=8).collect()}
    assert len(out["u1"]) == 8 and all(0 <= x < 1 for x in out["u1"])
    assert out["u2"] is None
    # deterministic across invocations
    out2 = {r["url"]: r["media_features"] for r in decode_media_features(df, dim=8).collect()}
    assert out == out2


def test_stub_gate_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_media_features(None, allow_stub=False)
