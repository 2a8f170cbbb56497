"""Build a x10 perf-replica of a testdata sf dir (measurement aid ONLY).

The driver generates its large-scale dir (e.g. sf1.0) at measurement time
and removes it afterwards, so optimization sessions cannot re-measure at
that scale. This tool replicates each sf0.1 table 10x with remapped keys
into a sibling dir, writing ONE parquet file per table with pyarrow
defaults — the same single-file layout the real generator produces (at
1.5M orders rows that yields 2 row groups, matching the observed sf1.0
layout). Correctness is NEVER checked against this dir (text contents of
replicas are perturbed, keys are offset); it exists purely so before/after
wall-clock comparisons run at the scale the driver times.

Usage: python tools/make_sfrep.py [src_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table key columns offset by i * stride per replica (stride >> max key)
KEYS = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "embeddings": ["vec_id"],
}
SMALL = {"nation", "region"}  # broadcast dims: keep as-is
STRIDE = 100_000_000


def replicate(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        t = pq.read_table(os.path.join(src, fn))
        if name in SMALL:
            pq.write_table(t, os.path.join(dst, fn))
            print(f"{name}: copied {t.num_rows}")
            continue
        reps = []
        for i in range(factor):
            r = t
            for k in KEYS.get(name, []):
                r = r.set_column(
                    r.schema.get_field_index(k),
                    k,
                    pc.add(r.column(k), i * STRIDE),
                )
            if name == "documents" and i > 0:
                # perturb replica text so the corpus keeps (approximately)
                # the original duplicate-group structure instead of every
                # text becoming a factor-way exact duplicate
                idx = r.schema.get_field_index("text")
                r = r.set_column(
                    idx,
                    "text",
                    pc.binary_join_element_wise(
                        r.column("text").cast(pa.string()), f" r{i}", ""
                    ),
                )
            reps.append(r)
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(dst, fn))
        print(f"{name}: {t.num_rows} -> {out.num_rows}")
    open(os.path.join(dst, "_DONE"), "w").close()


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/sfrep1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    replicate(src, dst, factor)
