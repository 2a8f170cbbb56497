"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at a given sf dir, compare
row count, column names, and order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Dtype-STRICT canonicalization mirroring the driver's hash discipline:
    ints stay ints, floats stay floats (rounded to 6 dp) — a DuckDB HUGEINT
    sum landing as float64 (`99111.0`) must NOT compare equal to Spark's
    int64 `99111` (that masking was round-1 finding #2 in VERDICT.md)."""

    def elem(e) -> str:
        """Element-wise canon for list cells: floats rounded like scalar
        floats, elements SORTED so collect_list order (nondeterministic in
        Spark) can never flip a comparison (round-2 ADVICE)."""
        if e is None or (not isinstance(e, (list, set, tuple)) and pd.isna(e)):
            return "__NULL__"
        if isinstance(e, bool):
            return str(e)
        if isinstance(e, float):
            return repr(round(e, 6))
        if isinstance(e, (list, set, tuple)) or type(e).__name__ == "ndarray":
            return str(sorted(elem(x) for x in e))
        return str(e)

    def cell(v, kind: str) -> str:
        if v is None or (not isinstance(v, (list, set, tuple)) and pd.isna(v)):
            return "__NULL__"
        if kind == "i":
            return str(int(v))
        if kind == "f":
            return repr(round(float(v), 6))
        if kind == "b":
            return str(bool(v))
        if isinstance(v, (list, set, tuple)) or type(v).__name__ == "ndarray":
            return str(sorted(elem(e) for e in v))
        return str(v)

    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if "datetime" in dt:
            df[c] = df[c].astype(str).where(df[c].notna(), "__NULL__")
            continue
        kind = (
            "i"
            if df[c].dtype.kind in "iu" or dt.startswith(("Int", "UInt"))
            else "f"
            if df[c].dtype.kind == "f" or dt.startswith("Float")
            else "b"
            if df[c].dtype.kind == "b" or dt == "boolean"
            else "o"
        )
        df[c] = df[c].map(lambda v, k=kind: cell(v, k))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from exome_qc_library_spark.entry_queries import QUERIES
    from exome_qc_library_spark.session import build_session

    spark = build_session(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if sql is None:
            print(f"ok*   {name}: rows-only, {len(sdf)} rows ({t_spark:.1f}s)")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures.append(name)
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            failures.append(name)
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} rows differ; first diffs:")
            merged = pd.concat(
                [a[neq].head(3).add_suffix("_spark"), b[neq].head(3).add_suffix("_duck")], axis=1
            )
            print(merged.to_string())
            failures.append(name)
            continue
        print(f"OK    {name}: {len(a)} rows match ({t_spark:.1f}s)")
    spark.stop()
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} queries OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
