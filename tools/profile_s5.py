"""Sub-step profile of the s5 near-dedup stage (the fattest pipeline stage).

The pipeline's per-stage timings treat s5 as one materialization barrier;
this tool re-runs its internals with explicit forcing between sub-steps so
optimization effort lands on the real hot spot instead of a guess:

  sketch     — shingle + xxhash64 + vectorized signature UDF (row-local)
  candidates — band explode → (band,bucket) shuffle → capped pair gen
  pairs      — signature join-backs + jaccard_est + threshold + count gate
  cluster    — driver union-find + Arrow mapping shipment (serial by design)
  mapback    — broadcast join + winner selection + flag append (no sink)
  write      — checkpoint parquet write of the flagged table

Each number is a DELTA: earlier sub-steps are localCheckpoint'd exactly the
way the production operator barriers them, so a later step reuses — not
recomputes — its upstream. Run in a QUIET window (BENCH.md protocol):

  PYTHONPATH=/root/repo python tools/profile_s5.py [n_docs=200000] [cpus=32]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from exome_qc_library_spark.functions.hashing import (
        lsh_band_keys,
        shingle_hashes,
        word_shingles,
    )
    from exome_qc_library_spark.operators.dedup import (
        _minhash_sig_udf,
        connected_components_driver,
    )
    from exome_qc_library_spark.session import build_session
    from exome_qc_library_spark.synth import synthesize_pages

    spark = build_session(app_name="profile_s5", parallelism=cpus)
    num_perm, bands, threshold, max_bucket = 64, 16, 0.8, 200
    rows_per_band = num_perm // bands

    pages_dir = os.environ.get("SPARK_GRAFT_PAGES_DIR")
    if pages_dir:
        df = spark.read.parquet(pages_dir)
    else:
        p = tempfile.mkdtemp(prefix="profile_s5_pages_")
        synthesize_pages(spark, n_docs=n_docs, seed=42, with_edge_cases=False).write.mode(
            "overwrite"
        ).parquet(p)
        df = spark.read.parquet(p)

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    t: dict[str, float] = {}
    load0 = open("/proc/loadavg").read().split()[0]

    # -- sketch (mirrors minhash_candidate_pairs' UDF path + its barrier)
    t0 = time.monotonic()
    base = df.filter(F.col("text").isNotNull() & (F.length("text") > 0))
    sk = (
        base.select(
            F.col("url").alias("k"),
            _minhash_sig_udf(num_perm)(shingle_hashes(word_shingles(F.col("text"), 3))).alias(
                "sig"
            ),
        )
        .filter(F.col("sig")[0].isNotNull())
        .localCheckpoint()  # eager: forces the sketch NOW so the delta is clean
    )
    t["sketch"] = time.monotonic() - t0

    # -- candidates (band explode → bucket shuffle → capped pair explode)
    t0 = time.monotonic()
    banded = sk.select(
        "k", F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band)).alias("bk")
    ).select("k", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    grouped = banded.groupBy("band", "bucket").agg(
        F.slice(F.array_sort(F.collect_list("k")), 1, max_bucket).alias("ks")
    )
    cand = (
        grouped.filter(F.size("ks") > 1)
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("ks"),
                            lambda a: F.transform(
                                F.col("ks"), lambda b: F.struct(a.alias("x"), b.alias("y"))
                            ),
                        )
                    ),
                    lambda pr: pr["x"] < pr["y"],
                )
            ).alias("p")
        )
        .select(F.col("p.x").alias("a"), F.col("p.y").alias("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    n_cand = cand.count()
    t["candidates"] = time.monotonic() - t0

    # -- pairs: signature join-backs + similarity estimate + threshold
    t0 = time.monotonic()
    siga = sk.select(F.col("k").alias("a"), F.col("sig").alias("siga"))
    sigb = sk.select(F.col("k").alias("b"), F.col("sig").alias("sigb"))
    pairs = (
        cand.join(siga, "a")
        .join(sigb, "b")
        .withColumn(
            "jaccard_est",
            F.size(
                F.filter(
                    F.zip_with(F.col("siga"), F.col("sigb"), lambda x, y: x == y), lambda e: e
                )
            )
            / F.size("siga").cast("double"),
        )
        .drop("siga", "sigb")
        .filter(F.col("jaccard_est") >= threshold)
        .localCheckpoint()
    )
    n_pairs = pairs.count()
    t["pairs"] = time.monotonic() - t0

    # -- cluster (driver union-find, the by-design serial boundary)
    t0 = time.monotonic()
    mapping = connected_components_driver(pairs)
    import pandas as pd

    cdf = spark.createDataFrame(
        pd.DataFrame({"url": list(mapping.keys()), "dup_cluster_id": list(mapping.values())}),
        schema="url string, dup_cluster_id string",
    )
    t["cluster"] = time.monotonic() - t0

    # -- mapback: broadcast join + winner-per-cluster + flag append
    t0 = time.monotonic()
    joined = df.join(F.broadcast(cdf), "url", "left")
    clustered = joined.filter(F.col("dup_cluster_id").isNotNull()).select(
        "url", "dup_cluster_id", "warc_ts"
    )
    winners = (
        clustered.groupBy("dup_cluster_id")
        .agg(F.min(F.struct(F.col("warc_ts"), F.col("url"))).alias("w"))
        .select("dup_cluster_id", F.col("w.url").alias("__winner"))
    )
    flagged = joined.join(F.broadcast(winners), "dup_cluster_id", "left").withColumn(
        "near_duplicate",
        F.col("dup_cluster_id").isNotNull() & (F.col("url") != F.col("__winner")),
    )
    noop(flagged)
    t["mapback"] = time.monotonic() - t0

    # -- write: checkpoint-shaped parquet of the flagged table
    t0 = time.monotonic()
    out_dir = tempfile.mkdtemp(prefix="profile_s5_out_")
    flagged.drop("__winner").write.mode("overwrite").parquet(os.path.join(out_dir, "s5"))
    t["write"] = time.monotonic() - t0

    load1 = open("/proc/loadavg").read().split()[0]
    print(
        json.dumps(
            {
                "docs": df.count(),
                "cpus": cpus,
                "candidates": n_cand,
                "pairs_over_threshold": n_pairs,
                "clusters": len(set(mapping.values())),
                "steps_sec": {k: round(v, 2) for k, v in t.items()},
                "total_sec": round(sum(t.values()), 2),
                "load_start": load0,
                "load_end": load1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
