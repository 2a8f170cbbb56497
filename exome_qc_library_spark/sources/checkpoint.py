"""CheckpointStore — existence-gated, resumable stage materialization.

The core engine feature (SURVEY.md §4 item 1). Mirrors the reference's
pattern of (a) ``mt.checkpoint(path, overwrite=True)`` after every
expensive step to cut lineage (``/root/reference/shared/variant_qc.py:
218,386,517,633``), and (b) skipping a stage entirely when its output
already exists (``exome_qc/exome_qc.py:73,116-117,124,169`` +
``shared/utils.py:227-247``), so a killed run resumes from the last
completed stage.

Each checkpoint carries a manifest with stage id, parameters, parent
stage (lineage), row count and optional per-flag metrics — the Spark
replacement for Hail globals (``shared/variant_qc.py:775-781``).
"""

from __future__ import annotations

import math
import os
import shutil
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .table_format import ParquetManifestFormat, default_format


class CheckpointStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fmt: ParquetManifestFormat | None = None,
    ) -> None:
        self.spark = spark
        self.root = root
        self.fmt = fmt or default_format()
        # directory creation is a local-FS (parquet+manifest) concern; a
        # catalog-backed format addresses tables, not paths — its "root"
        # may be empty (stage name = table name under the catalog)
        if hasattr(self.fmt, "data_files"):
            os.makedirs(root, exist_ok=True)

    def path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def exists(self, stage: str) -> bool:
        return self.fmt.exists(self.spark, self.path(stage))

    def read(self, stage: str) -> DataFrame:
        return self.fmt.read(self.spark, self.path(stage))

    def manifest(self, stage: str) -> dict[str, Any] | None:
        return self.fmt.read_manifest(self.path(stage))

    def write(
        self,
        df: DataFrame,
        stage: str,
        params: dict[str, Any] | None = None,
        parent: str | None = None,
        metrics: dict[str, Any] | None = None,
        partition_by: list[str] | None = None,
        count_rows: bool = True,
    ) -> DataFrame:
        """Materialize + manifest, then return the re-read DataFrame
        (write-read barrier = lineage cut, exactly ``mt.checkpoint``)."""
        path = self.path(stage)
        meta: dict[str, Any] = {
            "stage": stage,
            "params": params or {},
            "parent": parent,
            "schema": df.schema.jsonValue(),
        }
        if metrics:
            meta["metrics"] = metrics
        # keep the dict write() returned: it carries the format-owned fields
        # (format/path/partition_by) that must survive the row-count rewrite
        # (round-1 ADVICE: rewriting from the pre-write meta dropped them)
        manifest = self.fmt.write(df, path, metadata=meta, partition_by=partition_by)
        out = self.fmt.read(self.spark, path)
        if count_rows:
            # cheap on parquet (footer statistics); recorded for accounting
            manifest["rows"] = out.count()
            self.fmt.update_manifest(path, manifest)
        return out

    def stage(
        self,
        name: str,
        fn: Callable[[DataFrame], DataFrame],
        upstream: DataFrame,
        params: dict[str, Any] | None = None,
        parent: str | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run-or-resume: if the checkpoint exists, read it and skip the
        computation (the reference's per-stage gating loop,
        ``exome_qc/exome_qc.py:116-117``)."""
        if self.exists(name):
            return self.read(name)
        return self.write(
            fn(upstream), name, params=params, parent=parent, partition_by=partition_by
        )

    def compact(
        self, stage: str, target_file_bytes: int = 128 * 1024 * 1024
    ) -> dict[str, Any]:
        """Small-files maintenance: rewrite a stage's snapshot into
        ``ceil(total_bytes / target_file_bytes)`` evenly-sized files.

        At 10^12-doc scale every per-stage snapshot is written by
        thousands of tasks; without periodic compaction the file count
        (and with it scan-planning time and NameNode/manifest pressure)
        grows unboundedly across pipeline runs — the same maintenance an
        Iceberg deployment runs as ``rewrite_data_files``. Content is
        untouched: one balanced round-robin ``repartition`` (even output
        sizes — ``coalesce`` would both skew file sizes and throttle the
        scan's parallelism to the target count), partition columns from
        the original write preserved.

        Commit protocol: the rewrite lands in a sibling temp dir WITHOUT
        a manifest, the directories swap, and the manifest (enriched with
        a ``compactions`` record, row count carried over) is written
        LAST — so the store-wide invariant "manifest present ⇔ data
        complete" holds in every crash window, and a compaction killed
        mid-swap degrades to the ordinary torn-write recompute path, never
        to a manifest pointing at partial data.

        No-op (``{"compacted": False}``) when the snapshot already meets
        the target. Returns the compaction record either way.

        Caller contract: unlike Iceberg (where an open scan pins its
        snapshot), a plain-parquet rewrite invalidates any LIVE DataFrame
        handle previously read from this stage — re-``read`` after
        compacting. Run it between pipeline runs, not mid-plan.
        """
        if not hasattr(self.fmt, "data_files"):
            raise NotImplementedError(
                "compact() is the parquet+manifest maintenance path; on an "
                "Iceberg-backed store run the catalog's rewrite_data_files "
                "procedure instead"
            )
        path = self.path(stage)
        manifest = self.fmt.read_manifest(path)
        if manifest is None:
            raise ValueError(f"stage {stage!r} absent or torn — nothing to compact")
        files = self.fmt.data_files(path)
        total = sum(os.path.getsize(f) for f in files)
        target_n = max(1, math.ceil(total / target_file_bytes))
        if len(files) <= target_n:
            return {
                "compacted": False,
                "files": len(files),
                "bytes": total,
                "target_files": target_n,
            }
        df = self.fmt.read(self.spark, path)
        part_cols = manifest.get("partition_by") or []
        tmp = path + ".compact_tmp"
        writer = (
            # hash-cluster on the partition columns so each Hive directory
            # is written by one task (one file per live key); plain
            # round-robin otherwise
            df.repartition(target_n, *part_cols)
            if part_cols
            else df.repartition(target_n)
        ).write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(tmp)
        bak = path + ".pre_compact"
        shutil.rmtree(bak, ignore_errors=True)  # crashed-prior-compact leftover
        os.rename(path, bak)
        os.rename(tmp, path)
        record = {
            "compacted": True,
            "files_before": len(files),
            "files_after": len(self.fmt.data_files(path)),
            "bytes": total,
            "target_file_bytes": target_file_bytes,
        }
        manifest.setdefault("compactions", []).append(record)
        self.fmt.update_manifest(path, manifest)
        shutil.rmtree(bak)
        return record

    def vacuum(self) -> dict[str, list[str]]:
        """Garbage-collect the crash windows: stage dirs with data but no
        manifest (torn writes — the resume gate already treats them as
        absent, this reclaims the bytes) and compaction scratch dirs
        (``*.compact_tmp`` never swapped in, ``*.pre_compact`` whose
        stage committed). A ``*.pre_compact`` backup is deleted ONLY when
        its stage dir holds a valid manifest; if a compaction crashed
        mid-swap the backup is the last committed copy of the stage, so
        vacuum RESTORES it (rename back over the torn/absent stage dir)
        instead of deleting it — preserving the invariant that a dir is
        only removed when the manifest says so (round-5 ADVICE).
        Committed stages are untouched. Safe to run any time no writer is
        active on the store root; the reference's operators likewise
        assume single-writer stage dirs (``overwrite=True``
        checkpoints)."""
        removed: dict[str, list[str]] = {"torn": [], "scratch": [], "restored": []}
        # catalog-backed formats address tables, not dirs — there is nothing
        # on the local FS to reclaim (and self.root may not exist at all)
        if not hasattr(self.fmt, "data_files") or not os.path.isdir(self.root):
            return removed
        names = sorted(os.listdir(self.root))
        for name in names:
            p = os.path.join(self.root, name)
            if not os.path.isdir(p):
                continue
            if name.endswith(".compact_tmp"):
                # never swapped in — no manifest by construction, pure scratch
                shutil.rmtree(p)
                removed["scratch"].append(name)
            elif name.endswith(".pre_compact"):
                stage_path = p[: -len(".pre_compact")]
                if self.fmt.read_manifest(stage_path) is not None:
                    # compaction committed — backup is redundant
                    shutil.rmtree(p)
                    removed["scratch"].append(name)
                elif self.fmt.read_manifest(p) is not None:
                    # crashed between compact()'s two renames: the backup
                    # is the only committed copy — restore, don't delete
                    if os.path.isdir(stage_path):
                        shutil.rmtree(stage_path)  # torn swapped-in data
                    os.rename(p, stage_path)
                    removed["restored"].append(name)
                else:
                    shutil.rmtree(p)  # backup itself torn — unrecoverable
                    removed["scratch"].append(name)
            elif self.fmt.read_manifest(p) is None:
                # a torn stage whose .pre_compact backup holds a valid
                # manifest is handled by the restore branch above — don't
                # delete it here (the restore reuses the dir name)
                bak = p + ".pre_compact"
                if not (os.path.isdir(bak) and self.fmt.read_manifest(bak) is not None):
                    shutil.rmtree(p)
                    removed["torn"].append(name)
        return removed
