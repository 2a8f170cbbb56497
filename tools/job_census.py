"""Job-level census of the staged pipeline — serial-fraction instrument.

Round-5 follow-up to the BENCH.md Amdahl finding (~22 s size-insensitive
serial component at 500k docs): runs the full quality pipeline once and
then reads the Spark UI REST jobs timeline to report, per job,

  * wall duration (completion - submission),
  * the inter-job GAP to the previous job's completion — time when NO
    Spark job is running, i.e. pure driver work: stage-function build
    time, checkpoint manifest/commit IO, union-find, py4j round-trips.

The sum of positive gaps + the pre-first-job lead-in is the measured
driver-serial fraction; the job count itself bounds per-job scheduling
overhead. This is the number the "fewer jobs per run" optimization is
graded against.

Usage: PYTHONPATH=/root/repo python tools/job_census.py [n_docs] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from exome_qc_library_spark.plans.quality_pipeline import build_quality_pipeline
    from exome_qc_library_spark.session import build_session
    from exome_qc_library_spark.sources.checkpoint import CheckpointStore
    from exome_qc_library_spark.synth import synthesize_pages

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    spark = build_session(
        app_name="job_census",
        parallelism=cpus,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    base = spark.sparkContext.uiWebUrl
    app_id = _rest(base, "applications")[0]["id"]

    # warmup exactly like bench.py so codegen/worker startup is excluded
    wck = tempfile.mkdtemp(prefix="census_warm_")
    try:
        build_quality_pipeline(CheckpointStore(spark, wck)).run(
            synthesize_pages(spark, n_docs=500, seed=7, with_edge_cases=False)
        ).count()
    finally:
        shutil.rmtree(wck, ignore_errors=True)

    pages_dir = os.environ.get("SPARK_GRAFT_PAGES_DIR")
    if pages_dir:
        pages = spark.read.parquet(pages_dir)
    else:
        pages = synthesize_pages(spark, n_docs=n_docs, seed=42, with_edge_cases=False)

    jobs_before = {j["jobId"] for j in _rest(base, f"applications/{app_id}/jobs")}

    ck = tempfile.mkdtemp(prefix="census_ck_")
    t0 = time.monotonic()
    pipe = build_quality_pipeline(CheckpointStore(spark, ck))
    pipe.run(pages).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0

    jobs = [
        j
        for j in _rest(base, f"applications/{app_id}/jobs")
        if j["jobId"] not in jobs_before and "completionTime" in j
    ]
    shutil.rmtree(ck, ignore_errors=True)

    def _ts(s: str) -> float:
        # Spark REST times look like 2026-08-17T12:00:00.123GMT
        from datetime import datetime

        return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    jobs.sort(key=lambda j: _ts(j["submissionTime"]))
    spans = [(_ts(j["submissionTime"]), _ts(j["completionTime"]), j) for j in jobs]
    job_wall = sum(b - a for a, b, _ in spans)
    gaps = []
    for i in range(1, len(spans)):
        g = spans[i][0] - spans[i - 1][1]
        if g > 0:
            gaps.append(round(g, 3))
    gap_total = sum(gaps)
    per_job = [
        {
            "job": j["jobId"],
            "sec": round(b - a, 3),
            "gap_before": round(spans[i][0] - spans[i - 1][1], 3) if i else None,
            "desc": (j.get("name") or "")[:100],
        }
        for i, (a, b, j) in enumerate(spans)
    ]
    stage_secs = {r.name: round(r.seconds, 2) for r in pipe.results}
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "cpus": cpus,
                "pipeline_wall_sec": round(wall, 2),
                "n_jobs": len(jobs),
                "job_wall_sec": round(job_wall, 2),
                "driver_gap_sec": round(gap_total, 2),
                "gap_frac_of_wall": round(gap_total / wall, 3) if wall else None,
                "top_gaps": sorted(gaps, reverse=True)[:10],
                "stage_secs": stage_secs,
                "jobs": per_job,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
