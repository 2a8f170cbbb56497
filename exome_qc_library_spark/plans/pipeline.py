"""Generic staged pipeline runner with existence-gated checkpoint resume.

The Spark re-expression of the reference's driver loop
(``/root/reference/exome_qc/exome_qc.py:68-588``): stepcount 1..N, each
stage gated on ``check_exists(stage_output)`` (``shared/utils.py:227-247``)
— skip if present, else compute from the previous checkpoint and
materialize. Stages are pure ``DataFrame → DataFrame`` functions;
the runner owns materialization, manifests (params/lineage/metrics)
and accounting, so stage code stays declarative for Catalyst.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from ..functions.flags import flag_count_df
from ..sources.checkpoint import CheckpointStore


@dataclass
class Stage:
    name: str
    fn: Callable[[DataFrame], DataFrame]
    params: dict[str, Any] = field(default_factory=dict)
    # flag column to snapshot accounting for (the reference's per-stage
    # count_failing reports, shared/variant_qc.py:638-723); only written
    # when the stage materializes
    account_flags: str | None = None
    # materialize=False chains this stage lazily into the next checkpoint —
    # the reference checkpoints after EVERY step and flags the cost
    # ("constant checkpointing is expensive", variant_qc.py:783-784); here
    # cheap expression stages fuse into one codegen'd write
    materialize: bool = True


@dataclass
class StageResult:
    name: str
    resumed: bool
    seconds: float
    rows: int | None


class Pipeline:
    def __init__(self, stages: list[Stage], store: CheckpointStore) -> None:
        self.stages = stages
        self.store = store
        self.results: list[StageResult] = []

    def run(self, df: DataFrame, from_stage: str | None = None) -> DataFrame:
        """Run all stages; any stage whose checkpoint exists is read back
        instead of recomputed (cold run ≡ resumed run, FIXTURES.md §7.4).

        ``from_stage`` forces recomputation from that stage on: checkpoints
        of stages at/after it are treated as STALE and rebuilt (the
        reference's "rerun from step N" knob), while stages before it still
        resume from their checkpoints as usual.
        """
        if from_stage is not None and from_stage not in {s.name for s in self.stages}:
            raise ValueError(f"unknown stage {from_stage!r}")
        prev_name = None
        force = False
        pending_params: dict[str, Any] = {}
        for st in self.stages:
            if from_stage is not None and st.name == from_stage:
                force = True
            t0 = time.monotonic()
            if st.materialize and not force and self.store.exists(st.name):
                df = self.store.read(st.name)
                pending_params = {}
                self.results.append(
                    StageResult(st.name, True, time.monotonic() - t0, None)
                )
            else:
                out = st.fn(df)
                if st.materialize:
                    # row counting is one extra job per checkpoint; only the
                    # terminal stage needs it for the manifest (intermediate
                    # row counts are recoverable from parquet footers)
                    is_last = st.name == self.stages[-1].name
                    df = self.store.write(
                        out,
                        st.name,
                        params={**pending_params, st.name: st.params},
                        parent=prev_name,
                        count_rows=is_last,
                    )
                    pending_params = {}
                    if st.account_flags and st.account_flags in df.columns:
                        acct = flag_count_df(df, st.account_flags)
                        self.store.write(
                            acct,
                            f"{st.name}__flag_counts",
                            params={"of": st.name},
                            parent=st.name,
                            count_rows=False,
                        )
                    man = self.store.manifest(st.name) or {}
                    rows = man.get("rows")
                else:
                    # lazy stage: params fold into the next checkpoint's manifest
                    df = out
                    pending_params[st.name] = st.params
                    rows = None
                self.results.append(
                    StageResult(st.name, False, time.monotonic() - t0, rows)
                )
            if st.materialize:
                prev_name = st.name
        return df
