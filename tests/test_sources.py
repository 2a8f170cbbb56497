"""Sources: delimited import (S4), removal list, interval join (J5),
checkpoint store manifest/resume semantics (S6/S11)."""

import os
import shutil
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


def test_compact_rewrites_small_files_and_preserves_content(spark):
    root = tempfile.mkdtemp()
    store = CheckpointStore(spark, root)
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("v")
    )
    before = store.write(df.repartition(16), "stc", params={"k": 1})
    # collect BEFORE compacting: the rewrite invalidates live handles on
    # the old files (documented caller contract — re-read after compact)
    before_rows = sorted(map(tuple, before.collect()))
    assert len(store.fmt.data_files(store.path("stc"))) == 16
    rec = store.compact("stc", target_file_bytes=1 << 30)  # everything fits in 1 file
    assert rec["compacted"] and rec["files_before"] == 16 and rec["files_after"] == 1
    after_rows = sorted(map(tuple, store.read("stc").collect()))
    assert after_rows == before_rows  # content identical
    # manifest survived the swap: stage fields intact, record appended,
    # store invariant holds (exists == valid committed data)
    man = store.manifest("stc")
    assert man["stage"] == "stc" and man["params"] == {"k": 1} and man["rows"] == 2000
    assert man["compactions"][0]["files_after"] == 1
    assert store.exists("stc")
    # resume path still short-circuits over the compacted snapshot
    calls = []
    store.stage("stc", lambda d: calls.append(1) or d, df)
    assert calls == []
    # second compaction is a no-op
    rec2 = store.compact("stc", target_file_bytes=1 << 30)
    assert rec2["compacted"] is False and rec2["files"] == 1


def test_compact_partitioned_stage_preserves_layout(spark):
    root = tempfile.mkdtemp()
    store = CheckpointStore(spark, root)
    df = spark.range(600).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    before = store.write(df.repartition(8), "stp", partition_by=["grp"])
    before_rows = sorted(map(tuple, before.select("id", "grp").collect()))
    assert len(store.fmt.data_files(store.path("stp"))) > 3
    rec = store.compact("stp", target_file_bytes=1 << 30)
    assert rec["compacted"] and rec["files_after"] <= 3  # ≤ one file per live key
    # Hive layout preserved: partition dirs still present, content identical
    dirs = {
        d for d in os.listdir(store.path("stp")) if d.startswith("grp=")
    }
    assert dirs == {"grp=0", "grp=1", "grp=2"}
    after_rows = sorted(map(tuple, store.read("stp").select("id", "grp").collect()))
    assert after_rows == before_rows


def test_compact_absent_stage_raises(spark):
    store = CheckpointStore(spark, tempfile.mkdtemp())
    try:
        store.compact("nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_vacuum_reclaims_torn_and_scratch_only(spark):
    root = tempfile.mkdtemp()
    store = CheckpointStore(spark, root)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    store.write(df, "good")
    store.write(df, "torn")
    os.remove(os.path.join(root, "torn", "_manifest.json"))
    os.makedirs(os.path.join(root, "stage.compact_tmp"))
    os.makedirs(os.path.join(root, "stage.pre_compact"))
    removed = store.vacuum()
    assert removed == {
        "torn": ["torn"],
        "scratch": ["stage.compact_tmp", "stage.pre_compact"],
        "restored": [],
    }
    # the committed stage survives, fully readable
    assert store.exists("good") and store.read("good").count() == 1
    assert sorted(os.listdir(root)) == ["good"]


def test_vacuum_restores_pre_compact_backup_after_mid_swap_crash(spark):
    # crash between compact()'s two os.rename calls: the .pre_compact
    # backup holds the only committed copy of the stage — vacuum must
    # restore it, never delete it (round-5 ADVICE)
    root = tempfile.mkdtemp()
    store = CheckpointStore(spark, root)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    store.write(df, "st")
    # simulate the first rename having happened (stage dir gone)
    os.rename(os.path.join(root, "st"), os.path.join(root, "st.pre_compact"))
    assert not store.exists("st")
    removed = store.vacuum()
    assert removed["restored"] == ["st.pre_compact"] and removed["torn"] == []
    assert store.exists("st") and store.read("st").count() == 2

    # crash between the SECOND rename and the manifest update: stage dir
    # holds manifest-less compacted data, backup holds the manifest —
    # vacuum replaces the torn data with the committed backup
    os.rename(os.path.join(root, "st"), os.path.join(root, "st.pre_compact"))
    os.makedirs(os.path.join(root, "st"))
    with open(os.path.join(root, "st", "part-junk.parquet"), "w") as fh:
        fh.write("torn")
    removed = store.vacuum()
    assert removed["restored"] == ["st.pre_compact"] and removed["torn"] == []
    assert store.exists("st") and store.read("st").count() == 2

    # committed stage + leftover backup: backup is redundant → scratch
    os.makedirs(os.path.join(root, "st.pre_compact"))
    removed = store.vacuum()
    assert removed["scratch"] == ["st.pre_compact"] and removed["restored"] == []
    assert store.exists("st") and store.read("st").count() == 2


def test_compact_on_iceberg_backend_raises_clearly(spark):
    from exome_qc_library_spark.sources.table_format import IcebergFormat

    store = CheckpointStore(spark, tempfile.mkdtemp(), fmt=IcebergFormat())
    try:
        store.compact("any")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_iceberg_backend_contract(spark):
    """round-5 VERDICT #8: the Iceberg backend is dead code in this
    sandbox (no iceberg-spark-runtime jar) — this contract test runs
    whenever the jar IS present and pytest.skips otherwise, so the
    backend cannot rot silently.

    Activation (real deployment):
      spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-<sparkver>:<ver> \
        --conf spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.<name>.type=hadoop \
        --conf spark.sql.catalog.<name>.warehouse=<path>
    then CheckpointStore(spark, "", fmt=IcebergFormat("<name>")).

    Pinned semantics: write→exists→read round-trip, createOrReplace
    overwrite, manifest round-trip through engine.* table properties
    (incl. the post-write rows enrichment Pipeline.run relies on), and
    compact() delegating to the catalog procedure via
    NotImplementedError."""
    import pytest

    from exome_qc_library_spark.sources.table_format import IcebergFormat

    wh = tempfile.mkdtemp(prefix="ice_wh_")
    spark.conf.set("spark.sql.catalog.ice_contract", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice_contract.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice_contract.warehouse", wh)
    try:
        spark.catalog.tableExists("ice_contract.default.__probe__")
    except Exception as e:  # noqa: BLE001 — any failure to LOAD the catalog = no jar
        shutil.rmtree(wh, ignore_errors=True)
        pytest.skip(f"Iceberg runtime not on classpath: {type(e).__name__}")
    try:
        fmt = IcebergFormat("ice_contract")
        store = CheckpointStore(spark, "", fmt=fmt)
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        out = store.write(df, "st_contract", params={"p": 1})
        assert store.exists("st_contract")
        assert sorted(map(tuple, out.collect())) == [(1, "a"), (2, "b")]
        man = store.manifest("st_contract")
        assert man is not None and man["params"] == {"p": 1} and man["rows"] == 2
        # createOrReplace overwrite semantics
        store.write(spark.createDataFrame([(9, "z")], "id long, v string"), "st_contract")
        assert store.read("st_contract").count() == 1
        # plain-parquet maintenance must refuse and point at the catalog procedure
        try:
            store.compact("st_contract")
            raise AssertionError("expected NotImplementedError")
        except NotImplementedError:
            pass
        assert not store.exists("st_never_written")
    finally:
        spark.sql("DROP TABLE IF EXISTS ice_contract.default.st_contract")
        shutil.rmtree(wh, ignore_errors=True)


def test_import_delimited_explicit_schema_keeps_names(spark, tmp_path):
    """Round-6 review: the f0..fN rename applies only to headerless files
    WITHOUT a schema — an explicit schema already names the columns."""
    p = str(tmp_path / "t.csv")
    with open(p, "w") as fh:
        fh.write("https://a.com\t123\n")
    df = import_delimited(
        spark, p, header=False, schema="url STRING, ts LONG"
    )
    assert df.columns == ["url", "ts"]
    assert df.collect()[0]["ts"] == 123
    df2 = import_delimited(spark, p, header=False, impute=False)
    assert df2.columns == ["f0", "f1"]  # headerless+schemaless keeps f-names


def test_read_pages_routes_remote_uri_to_parquet(spark):
    """Round-6 review: os.path.isdir is always False for remote URIs, so
    s3a://… dataset dirs were misrouted to spark.read.table. Anything
    path-shaped must take the parquet branch (the error then mentions the
    path/scheme, not TABLE_OR_VIEW_NOT_FOUND)."""
    import pytest

    from exome_qc_library_spark.sources.readers import read_pages

    with pytest.raises(Exception) as e:
        read_pages(spark, "s3a://no-such-bucket/crawl/pages").collect()
    assert "TABLE_OR_VIEW_NOT_FOUND" not in str(e.value)
