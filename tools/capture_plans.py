"""Capture .explain("formatted") for bench/declared queries into plans/<tag>/.

Usage: PYTHONPATH=/root/repo python tools/capture_plans.py <tag> [sf_dir] [name ...]

Writes plans/<tag>/<name>_<suffix>.txt where suffix is the last path
component of <tag> when it contains '/', else 'plan'. Convention for the
optimization rounds: tag "r07/before" -> plans/r07/<name>_before.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    names = sys.argv[3:]

    from bench import BENCH_QUERIES, EXTRA_WORKLOADS
    from exome_qc_library_spark.entry_queries import QUERIES
    from exome_qc_library_spark.session import build_session

    if "/" in tag:
        d, suffix = tag.rsplit("/", 1)
        out_dir = os.path.join(REPO, "plans", d)
    else:
        out_dir, suffix = os.path.join(REPO, "plans", tag), "plan"
    os.makedirs(out_dir, exist_ok=True)

    spark = build_session(app_name="capture_plans")
    targets = names or BENCH_QUERIES
    for name in targets:
        fn = EXTRA_WORKLOADS.get(name) or QUERIES[name][0]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir}\n{plan}")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
