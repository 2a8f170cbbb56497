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

# Columns whose LIST cells compare order-INSENSITIVELY, per query — opt-in
# (round-3 ADVICE: sorting every list cell would silently mask an ordering
# bug in a query whose array order is contractual, e.g. a sort_array or
# ranked-list column). Only aggregation-order-nondeterministic collectors
# belong here. Currently EMPTY: every shipped array-producing query
# normalizes to a sorted concat_ws string precisely so its oracle row is
# order-exact. Value True = all list columns of that query.
UNORDERED_LIST_COLS: dict[str, set | bool] = {}


def canon(df: pd.DataFrame, unordered_cols: set | bool = False) -> pd.DataFrame:
    """Dtype-STRICT canonicalization mirroring the driver's hash discipline:
    ints stay ints, floats stay floats (rounded to 6 dp) — a DuckDB HUGEINT
    sum landing as float64 (`99111.0`) must NOT compare equal to Spark's
    int64 `99111` (that masking was round-1 finding #2 in VERDICT.md).

    List cells keep their element ORDER unless their column is named in
    ``unordered_cols`` (or it is True): order-insensitive comparison is
    opt-in per column, so a contractual array ordering can never be
    silently masked by the harness (round-3 ADVICE)."""

    def _is_seq(v) -> bool:
        return isinstance(v, (list, set, tuple)) or type(v).__name__ == "ndarray"

    def elem(e, unordered: bool) -> str:
        """Element-wise canon for list cells: floats rounded like scalar
        floats; elements sorted only when the column opted in.

        Sequence check FIRST (round-6 review): pd.isna(ndarray) returns
        an array, so an isna-first guard raised 'truth value is
        ambiguous' on every multi-element array cell — both Spark
        toPandas (Arrow) and DuckDB .df() hand list columns back as
        ndarrays. Signed zero is normalized (+0.0) so -1e-9 vs +1e-9
        both canonicalize to '0.0' within the 6-dp tolerance."""
        if _is_seq(e):
            inner = [elem(x, unordered) for x in e]
            return str(sorted(inner) if unordered else inner)
        if e is None or pd.isna(e):
            return "__NULL__"
        if isinstance(e, bool):
            return str(e)
        if isinstance(e, float):
            return repr(round(e, 6) + 0.0)
        return str(e)

    def cell(v, kind: str, unordered: bool) -> str:
        if _is_seq(v):
            return elem(v, unordered)
        if v is None or pd.isna(v):
            return "__NULL__"
        if kind == "i":
            return str(int(v))
        if kind == "f":
            return repr(round(float(v), 6) + 0.0)
        if kind == "b":
            return str(bool(v))
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
        uno = unordered_cols is True or (
            not isinstance(unordered_cols, bool) and c in unordered_cols
        )
        df[c] = df[c].map(lambda v, k=kind, u=uno: cell(v, k, u))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from exome_qc_library_spark.entry_queries import QUERIES
    from exome_qc_library_spark.session import build_session

    # a typo'd name would otherwise run ZERO queries and exit 0 with an
    # all-OK summary — the gate passing vacuously (round-6 review)
    unknown = only - set(QUERIES)
    if unknown:
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2

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
        uno = UNORDERED_LIST_COLS.get(name, False)
        a, b = canon(sdf, uno), canon(odf, uno)
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
    n_run = len(only) if only else len(QUERIES)
    print(f"\n{n_run - len(failures)}/{n_run} queries OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
