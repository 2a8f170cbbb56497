"""Round-7 measurement harness (guide §1.4): per-query noop-sink timings
with repeats, WITHOUT touching the frozen bench.py. Prints one JSON line.

Usage:
  SPARK_GRAFT_SF_DIR=... python bench_extra.py [name ...]
Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPS (default 3),
     SPARK_GRAFT_SKIP_WARM (default 0 — one untimed warm pass per query).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def main() -> None:
    from bench import BENCH_QUERIES, EXTRA_WORKLOADS
    from exome_qc_library_spark.entry_queries import QUERIES
    from exome_qc_library_spark.session import build_session

    names = sys.argv[1:] or BENCH_QUERIES
    spark = build_session(app_name="bench_extra", parallelism=CPUS)
    out: dict[str, dict] = {}
    warm = os.environ.get("SPARK_GRAFT_SKIP_WARM", "0") != "1"
    for name in names:
        fn = EXTRA_WORKLOADS.get(name) or QUERIES[name][0]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        reps = REPS + (1 if warm else 0)
        for i in range(reps):
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 3)
            samples.append(dt)
        timed = samples[1:] if warm else samples
        out[name] = {"min": min(timed), "samples": samples}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
