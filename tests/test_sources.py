"""Sources: delimited import (S4), removal list, interval join (J5),
checkpoint store manifest/resume semantics (S6/S11)."""

import os
import tempfile

import pyspark.sql.functions as F

from exome_qc_library_spark.sources.checkpoint import CheckpointStore
from exome_qc_library_spark.sources.readers import (
    import_delimited,
    interval_join,
    read_removal_list,
)


def test_import_delimited_missing_token_and_impute(spark, tmp_path):
    p = tmp_path / "ann.tsv"
    p.write_text("host\tspam_score\tbatch\na.com\t0.5\tb1\nb.com\tNA\tb2\n")
    df = import_delimited(spark, str(p), delimiter="\t", missing="NA")
    rows = {r["host"]: r for r in df.collect()}
    assert rows["b.com"]["spam_score"] is None  # NA → NULL
    assert isinstance(rows["a.com"]["spam_score"], float)  # impute=True typed it


def test_read_removal_list(spark, tmp_path):
    p = tmp_path / "rm.txt"
    p.write_text("https://bad.com/x\nspam.example.com\n")
    df = read_removal_list(spark, str(p))
    assert df.columns == ["url_or_host"] and df.count() == 2


def test_interval_join(spark):
    docs = spark.createDataFrame([(1, 50), (2, 150), (3, 999)], "id long, v long")
    iv = spark.createDataFrame(
        [("low", 0, 100), ("mid", 100, 200)], "band string, lo long, hi long"
    )
    out = {r["id"]: r["band"] for r in interval_join(docs, iv, F.col("v")).collect()}
    assert out == {1: "low", 2: "mid", 3: None}


def test_checkpoint_store_roundtrip(spark):
    root = tempfile.mkdtemp()
    store = CheckpointStore(spark, root)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert not store.exists("st1")
    out = store.write(df, "st1", params={"k": 1}, parent=None)
    assert store.exists("st1")
    man = store.manifest("st1")
    assert man["rows"] == 2 and man["params"] == {"k": 1} and man["stage"] == "st1"
    assert {r["id"] for r in store.read("st1").collect()} == {1, 2}

    # stage() resumes instead of recomputing
    calls = []

    def fn(d):
        calls.append(1)
        return d

    store.stage("st1", fn, df)
    assert calls == []  # skipped — existence-gated


def test_torn_write_counts_as_absent(spark):
    root = tempfile.mkdtemp()
    store = CheckpointStore(spark, root)
    df = spark.createDataFrame([(1,)], "id long")
    store.write(df, "st2")
    os.remove(os.path.join(root, "st2", "_manifest.json"))  # simulate torn write
    assert not store.exists("st2")
