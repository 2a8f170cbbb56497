"""N-vs-4N scaling study (BASELINE.md protocol, north-rule evidence).

Runs bench.py as a subprocess at two parallelism levels (default 8 and
32) on identical input + seeds, reports throughput at both and the
scaling efficiency  eff = (T_N / T_4N) / (4N / N), and verifies the
determinism gate (pipeline output identical at both levels) separately
in tests/test_pipeline.py.

Usage: PYTHONPATH=/root/repo python tools/bench_scaling.py [out.md]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (8, 32)


def run_level(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    results = {n: run_level(n) for n in LEVELS}
    n, m = LEVELS
    t_n = results[n]["queries"]["pipeline_e2e"]
    t_m = results[m]["queries"]["pipeline_e2e"]
    eff = (t_n / t_m) / (m / n)
    report = {
        "levels": LEVELS,
        f"pipeline_sec_local{n}": t_n,
        f"pipeline_sec_local{m}": t_m,
        f"docs_per_sec_local{n}": results[n]["pipeline_docs_per_sec"],
        f"docs_per_sec_local{m}": results[m]["pipeline_docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "full": results,
    }
    print(json.dumps(report, indent=2))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            lines = [
                "# BENCH — scaling study (N vs 4N parallelism)\n",
                f"| level | pipeline sec | docs/sec |",
                "|---|---|---|",
            ]
            for lv in LEVELS:
                lines.append(
                    f"| local[{lv}] | {results[lv]['queries']['pipeline_e2e']} | "
                    f"{results[lv]['pipeline_docs_per_sec']} |"
                )
            lines.append(f"\nScaling efficiency (N={n} → 4N={m}): **{eff:.3f}**\n")
            lines.append("Per-query seconds at each level:\n")
            lines.append("```json")
            lines.append(json.dumps({str(k): v["queries"] for k, v in results.items()}, indent=2))
            lines.append("```")
            f.write("\n".join(lines))


if __name__ == "__main__":
    main()
