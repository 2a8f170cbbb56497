"""S4/S5 — deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Web-text analog of the reference's relatedness stage
(``/root/reference/shared/samples_qc.py:737-872``): an all-pairs
similarity kernel (``hl.king``, K4) reduced to above-threshold pairs,
clustered, and resolved to one representative per cluster via a
driver-side graph algorithm (``nx_algorithm``,
``shared/samples_qc.py:672-734``, K10) — then verdicts joined back to
the unfiltered table (annotate-don't-drop).

Scale design (10^12 docs):
* sketches (minhash signature / simhash / content hash) are **row-local
  expressions** — zero shuffle, one codegen projection;
* candidate generation shuffles on the **(band, bucket) key only** —
  never the O(n²) pair space; bucket size is capped (``max_bucket``) the
  same way the reference caps its kinship working set at 80k rows
  (``shared/variant_qc.py:29-63``) so a degenerate bucket (e.g. empty
  docs) cannot quadratically explode;
* verified pairs are rare → collected to the driver for union-find,
  exactly the reference's to_pandas→networkx boundary
  (``shared/samples_qc.py:805-808``), bounded by #pairs not #docs; an
  iterative DataFrame connected-components is provided for the case
  where pairs do not fit on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.flags import add_flags
from ..functions.hashing import (
    exact_content_hash,
    hamming64,
    lsh_band_keys,
    minhash_signature,
    shingle_hashes,
    simhash64,
    word_shingles,
)

# ------------------------------------------------------------- exact dedup


def flag_exact_duplicates(
    df: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    order_col: str = "warc_ts",
    flag_col: str = "low_pass_failing_qc",
) -> DataFrame:
    """Exact dedup: hash-groupBy on sha2(text); keep the earliest
    ``order_col`` (tie-break on key) per content group, flag the rest.

    One shuffle on the 256-bit content hash (uniform — no skew), map-side
    partial aggregation via min(struct). The winner choice mirrors the
    reference's independent-set preference rules (case-preferring,
    ``shared/samples_qc.py:691-713``) — here earliest-crawl-wins. A NULL
    ``order_col`` sorts LAST (the is-null flag leads the struct): struct
    ordering would otherwise put NULL first and a timestamp-less copy
    would beat every genuinely-dated crawl (round-6 review).
    """
    h = exact_content_hash(F.col(text_col))
    with_h = df.withColumn("__chash", h)
    winners = (
        with_h.filter(F.col(text_col).isNotNull())
        .groupBy("__chash")
        .agg(
            F.min(
                F.struct(
                    F.col(order_col).isNull().alias("o_missing"),
                    F.col(order_col),
                    F.col(key_col),
                )
            ).alias("w"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "__chash", F.col("w")[key_col].alias("__winner"), F.col("n").alias("__nsame")
        )
    )
    out = with_h.join(winners, "__chash", "left")
    is_dup = (
        F.col(text_col).isNotNull()
        & (F.col("__nsame") > 1)
        & (F.col(key_col) != F.col("__winner"))
    )
    out = add_flags(out, flag_col, {"exact_duplicate": is_dup})
    return out.drop("__chash", "__winner", "__nsame")


# ----------------------------------------------------------- MinHash LSH


def _minhash_sig_udf(num_perm: int, seed: int = 42):
    """Vectorized signature kernel: per Arrow batch, ALL rows' base hashes
    are flattened into one array, the affine permutation family
    ((h·a + b) mod P) is applied to cache-sized chunks, and per-row minima
    come from one ``np.minimum.reduceat`` over the row offsets — no Python
    loop in the hot path. Round-5 profile: the per-row-loop predecessor was
    ~2/3 of the whole sketch step (the fattest sub-step of the fattest
    pipeline stage); batch-flattening removes the per-row interpreter and
    temporary-allocation overhead while producing IDENTICAL signatures.
    Base hashes stay JVM-side (xxhash64)."""
    from ..functions.hashing import _MH_PRIME, _mh_params

    params = _mh_params(num_perm, seed)
    a = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    b = np.array([p[1] for p in params], dtype=np.int64)[:, None]
    # rows are processed in chunks of <= CHUNK_HASHES flattened hashes so the
    # (num_perm × chunk) intermediate stays ~tens of MB (cache/alloc friendly)
    chunk_hashes = max(1, 2_097_152 // num_perm)

    @F.pandas_udf("array<long>")
    def _sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for hs_col in it:
            yield pd.Series(
                _minhash_sig_batch(hs_col.values, a, b, chunk_hashes), dtype=object
            )

    return _sig


def _minhash_sig_flat(flat, starts, a, b, chunk_hashes: int):
    """Core signature kernel over FLAT storage: rows are the slices of
    ``flat`` delimited by ``starts`` (len n+1, strictly increasing — no
    empty rows here; callers route those to NULL). Returns an (n, num_perm)
    int64 matrix.

    One reused buffer + out= ops: the kernel is bound by the (num_perm × T)
    intermediate's memory traffic and the remainder op (measured ~90% of
    kernel time; numpy's scalar-divisor remainder already uses a
    multiply-shift fast path, so there is no cheaper exact formulation —
    Mersenne folding and unique-hash dedup+gather both measured slower).
    In-place halves the temporary traffic: ~13% on realistic batches."""
    from ..functions.hashing import _MH_PRIME

    n = len(starts) - 1
    num_perm = a.shape[0]
    out = np.empty((n, num_perm), dtype=np.int64)
    buf = np.empty((num_perm, min(chunk_hashes, max(flat.size, 1))), dtype=np.int64)
    row = 0
    while row < n:
        end = row
        while end < n and starts[end + 1] - starts[row] <= chunk_hashes:
            end += 1
        end = max(end, row + 1)  # a single over-sized row still goes through
        seg = flat[starts[row] : starts[end]]
        m = (
            buf[:, : seg.size]
            if seg.size <= buf.shape[1]
            else np.empty((num_perm, seg.size), dtype=np.int64)
        )
        np.multiply(seg[None, :], a, out=m)
        np.add(m, b, out=m)
        np.remainder(m, _MH_PRIME, out=m)
        offs = (starts[row:end] - starts[row]).astype(np.int64, copy=False)
        out[row:end] = np.minimum.reduceat(m, offs, axis=1).T
        row = end
    return out


def _minhash_sig_batch(vals, a, b, chunk_hashes: int) -> list:
    """One batch of base-hash arrays (object rows) → list of signature lists
    (None preserved for None/empty rows). Object-row wrapper around
    :func:`_minhash_sig_flat`; the chunk-boundary logic is unit-testable
    with a tiny ``chunk_hashes``."""
    out: list = [None] * len(vals)
    idx = [i for i, v in enumerate(vals) if v is not None and len(v) > 0]
    if not idx:
        return out
    arrs = [np.asarray(vals[i], dtype=np.int64) for i in idx]
    lens = np.fromiter((x.size for x in arrs), dtype=np.int64, count=len(arrs))
    starts = np.concatenate(([0], np.cumsum(lens)))
    sigs = _minhash_sig_flat(np.concatenate(arrs), starts, a, b, chunk_hashes)
    for j, i in enumerate(idx):
        out[i] = sigs[j].tolist()
    return out


def _minhash_sig_arrow_fn(num_perm: int, seed: int = 42):
    """``mapInArrow`` signature stage: ``(k, hs: array<int|bigint>)``
    batches → ``(k, sig: array<bigint>)`` batches with ZERO per-row Python
    objects in either direction: the Arrow list buffers are consumed flat
    (``flatten()``/``value_lengths()``, zero-copy) and the output list
    array is assembled from one flat int64 values buffer + an arithmetic
    offsets vector. Bit-identical to the pandas path (pinned in tests).

    NOT the production default: measured equal-to-slightly-slower than the
    column-form pandas UDF at 500k docs / 8 cores (BENCH.md round 5) —
    the per-row boxing it eliminates (~7× cheaper output conversion in
    isolation) is offset by shipping the key column through Python in both
    directions, which the column UDF avoids. Retained, tested, because on
    a real multi-executor cluster with wide keys the trade-off is
    measurable again and the flat-buffer shape is the one to reach for."""
    from ..functions.hashing import _mh_params

    params = _mh_params(num_perm, seed)
    a = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    b = np.array([p[1] for p in params], dtype=np.int64)[:, None]
    chunk_hashes = max(1, 2_097_152 // num_perm)

    def fn(batches):
        import pyarrow as pa

        for batch in batches:
            key = batch.column(0)
            la = batch.column(1)
            n = len(la)
            # value_lengths: null rows → null → 0; flatten(): skips null
            # rows, includes empty extents — both orderings are row order,
            # so the alignment guard below is exact
            lens = la.value_lengths().to_numpy(zero_copy_only=False)
            lens = np.nan_to_num(lens, nan=0).astype(np.int64)
            flat = la.flatten().to_numpy(zero_copy_only=False)
            if flat.size != int(lens.sum()):  # pragma: no cover — spec guard
                raise AssertionError("list flatten misaligned with value_lengths")
            nonempty = lens > 0
            ne = np.nonzero(nonempty)[0]
            if ne.size:
                starts = np.zeros(ne.size + 1, dtype=np.int64)
                np.cumsum(lens[ne], out=starts[1:])
                sig_values = _minhash_sig_flat(
                    flat.astype(np.int64, copy=False), starts, a, b, chunk_hashes
                ).ravel()
            else:
                sig_values = np.empty(0, dtype=np.int64)
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(np.where(nonempty, num_perm, 0), out=offs[1:])
            sig_arr = pa.ListArray.from_arrays(
                pa.array(offs.astype(np.int32), type=pa.int32()),
                pa.array(sig_values, type=pa.int64()),
                mask=pa.array(~nonempty),
            )
            yield pa.RecordBatch.from_arrays(
                [key, sig_arr], [batch.schema.names[0], "sig"]
            )

    return fn


def capped_bucket_pairs(
    grouped: DataFrame, ks_col: str = "ks", dedup: bool = True
) -> DataFrame:
    """Expand each capped bucket's sorted member array into ordered pairs
    ``(a, b)`` with ``a < b`` — the shared self-pair kernel behind every
    bucketed pair generator here (MinHash bands, SimHash quarters,
    hyperplane sign buckets). Previously copy-pasted at each site, so the
    round-2 sort-before-slice determinism fix had to be applied three
    times by hand (round-6 review). The caller owns the cap contract
    (``slice(array_sort(collect_list(k)), 1, max_bucket)``); this helper
    only expands. ``dedup=False`` skips the cross-bucket dropDuplicates
    for generators whose rows live in exactly one bucket."""
    cand = (
        grouped.filter(F.size(ks_col) > 1)
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col(ks_col),
                            lambda x: F.transform(
                                F.col(ks_col),
                                lambda y: F.struct(x.alias("x"), y.alias("y")),
                            ),
                        )
                    ),
                    lambda p: p["x"] < p["y"],
                )
            ).alias("p")
        )
        .select(F.col("p.x").alias("a"), F.col("p.y").alias("b"))
    )
    return cand.dropDuplicates(["a", "b"]) if dedup else cand


def minhash_candidate_pairs(
    df: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 200,
    arithmetic: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash.

    Returns (a, b, jaccard_est) with a < b, deduplicated across bands.
    ``jaccard_est`` = fraction of matching signature slots.

    ``arithmetic=True`` switches the base hash from xxhash64 (+ vectorized
    numpy signature UDF) to the SQL-reproducible polynomial primitive with
    an expression-only signature and raw-csv band keys — same banding,
    capping and pairing code path, but every number is mirrorable verbatim
    in the DuckDB oracle (VERDICT.md round-1 next-step #3). Production
    keeps the default: xxhash64 mixes better and the numpy kernel is ~100×
    the interpreted HOF path on long docs.
    """
    if num_perm % bands != 0:
        # banding covers bands·rows_per_band slots; a remainder would mean
        # computed-but-never-banded permutations silently degrading recall
        # while jaccard_est still divides by num_perm (round-6 review)
        raise ValueError(f"num_perm ({num_perm}) must be divisible by bands ({bands})")
    rows_per_band = num_perm // bands
    # ONE materialization barrier: the sketch table is reused three times
    # (banding + the two signature join-backs); WITHOUT the barrier
    # Catalyst's CollapseProject would inline the signature into every
    # consumer — multiplicative recompute on long docs. The shingle-hash
    # array needs no barrier of its own: the signature UDF consumes it
    # exactly once. localCheckpoint == the reference's checkpoint-after-
    # expensive-step (a parquet snapshot of the sketch table at cluster
    # scale).
    base = df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
    if arithmetic:
        from ..functions.hashing import poly_shingle_hashes

        # materialize the base-hash array BEFORE the num_perm-way signature
        # fan-out: each of the num_perm array_min branches references the
        # same subtree, and interpreted HOFs get no common-subexpression
        # elimination — without the barrier the shingle fold re-runs
        # num_perm times per row (measured 62s → ~3s at 500 docs)
        hs = base.select(
            F.col(key_col).alias("k"),
            poly_shingle_hashes(word_shingles(F.col(text_col), shingle_n)).alias("hs"),
        ).localCheckpoint(eager=False)
        sk = hs.select("k", minhash_signature(F.col("hs"), num_perm, seed).alias("sig"))
    else:
        # column-form pandas UDF, deliberately: the key column stays
        # JVM-side (only the hash arrays cross the Arrow boundary). The
        # boxing-free mapInArrow variant (_minhash_sig_arrow_fn) measured
        # equal-to-slightly-slower at 500k docs because it ships the key
        # through Python both ways; an array<int> downcast of the hashes
        # also LOST (the element-wise cast pass costs more than the bytes
        # it saves). Three-way A/B in BENCH.md round 5.
        sk = base.select(
            F.col(key_col).alias("k"),
            _minhash_sig_udf(num_perm, seed)(
                shingle_hashes(word_shingles(F.col(text_col), shingle_n))
            ).alias("sig"),
        )
    sk = (
        # drop shingle-less docs: UDF path yields sig NULL, expression path
        # yields an array of NULL slots — sig[0] IS NULL catches both
        sk.filter(F.col("sig")[0].isNotNull())
        .localCheckpoint(eager=False)
    )
    # Band on the KEY only — the 8·num_perm-byte signature must not ride
    # through the bands-way exploded shuffle (at 50k docs that is ~450 MB of
    # shuffle for 26 MB of signatures; at 10^12 docs it is the bottleneck).
    # Signatures are joined back for the (rare) candidate pairs instead.
    banded = sk.select(
        "k",
        F.explode(
            lsh_band_keys(F.col("sig"), bands, rows_per_band, as_csv=arithmetic)
        ).alias("bk"),
    ).select("k", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    # cap degenerate buckets (80k-style guard): keep first max_bucket members
    grouped = banded.groupBy("band", "bucket").agg(
        F.slice(F.array_sort(F.collect_list("k")), 1, max_bucket).alias("ks")
    )
    cand = capped_bucket_pairs(grouped)
    siga = sk.select(F.col("k").alias("a"), F.col("sig").alias("siga"))
    sigb = sk.select(F.col("k").alias("b"), F.col("sig").alias("sigb"))
    pairs = (
        cand.join(siga, "a")
        .join(sigb, "b")
        .withColumn(
            "jaccard_est",
            F.size(
                F.filter(F.zip_with(F.col("siga"), F.col("sigb"), lambda x, y: x == y), lambda e: e)
            )
            / F.size("siga").cast("double"),
        )
        .drop("siga", "sigb")
    )
    return pairs


def connected_components_driver(pairs: DataFrame, a: str = "a", b: str = "b") -> dict[str, str]:
    """Union-find over collected edges → {key: cluster_rep(min key)}.

    Driver boundary deliberately bounded by the number of *pairs*, like
    the reference's to_pandas→networkx step (``shared/samples_qc.py:805``).
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # ONE Arrow-batched toPandas job, not collect() (row-pickled) and not
    # toLocalIterator() (one sequential job per partition): the edge set
    # is small by design but at web scale it is still 10⁵-10⁶ rows, and
    # this driver boundary is serial — Amdahl's s in the scaling study
    pdf = pairs.select(a, b).toPandas()
    for x, y in zip(pdf[a].tolist(), pdf[b].tolist()):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            # min key becomes the root → deterministic cluster ids
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    return {k: find(k) for k in parent}


def connected_components_df(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Scale path: iterative min-label propagation entirely in DataFrames
    (for when the edge set itself is too big for the driver).

    Convergence is O(component diameter) rounds (plain label propagation,
    not the O(log n) of star-contraction) — fine for web-dup clusters,
    whose diameters are small. If a pathological chain is still changing
    after ``max_iter`` rounds the function RAISES instead of silently
    returning a split cluster (round-1 ADVICE #4): a wrong cluster id
    would silently under-deduplicate.
    """
    edges = pairs.select(F.col("a"), F.col("b")).unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labels = edges.select(F.col("a").alias("k")).distinct().withColumn("c", F.col("k"))
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["b"] == labels["k"])
            .groupBy("a")
            .agg(F.min("c").alias("nc"))
        )
        new_labels = (
            labels.join(nbr_min, labels["k"] == nbr_min["a"], "left")
            .select(F.col("k"), F.least(F.col("c"), F.col("nc")).alias("c"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "k")
            .filter(F.col("n.c") != F.col("o.c"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint() if changed else new_labels
        if not changed:
            break
    if changed:
        raise RuntimeError(
            f"connected_components_df did not converge in {max_iter} iterations "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels.select(F.col("k"), F.col("c").alias("dup_cluster_id"))


def flag_near_duplicates(
    df: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    order_col: str = "warc_ts",
    flag_col: str = "final_failing_qc",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    use_driver_cc: bool | None = None,
    max_driver_pairs: int = 5_000_000,
    prefer: list | None = None,
    algo: str = "minhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Full near-dup stage: sketch pairs → threshold → components →
    representative per cluster → ``near_duplicate`` flags,
    ``dup_cluster_id`` annotation. Row count preserved.

    ``algo`` selects the pair generator (round-5 VERDICT #2 — the sketch
    is the fattest pipeline cost, and the cheaper engine should be a
    pipeline-reachable knob, not just a standalone operator):

    * ``"minhash"`` (default) — banded MinHash-LSH over word shingles;
      ``threshold``/``num_perm``/``bands`` apply. Highest recall on
      reordered/partially-overlapping text.
    * ``"simhash"`` — 64-bit SimHash with 16-bit quarter blocking and
      exact Hamming verification ≤ ``max_hamming``; one 8-byte sketch per
      doc instead of ``num_perm`` minima, so the sketch pass is several
      times cheaper. Catches char-level near-identity; text with many
      scattered word edits that MinHash still flags can fall outside the
      Hamming ball (documented recall trade — see
      tests/test_dedup.py::test_near_dup_algo_knob_agreement).

    Everything downstream of pair generation (size-gated clustering,
    representative election, flag semantics) is shared verbatim.

    ``use_driver_cc=None`` (default) SIZE-GATES the clustering path
    (round-4 VERDICT #1 — the last place where 100-TB safety depended on
    a caller flag): the thresholded pair set is localCheckpoint'd (tiny
    by LSH construction) and counted — one cheap job over pairs, never
    docs — and the driver union-find is chosen only when the edge count
    fits ``max_driver_pairs``; above it the distributed min-label
    propagation (:func:`connected_components_df`) runs instead. Explicit
    ``True``/``False`` still overrides. The bound mirrors the
    reference's own driver-boundary cap on its to_pandas→networkx step
    (``shared/samples_qc.py:805-808``).

    ``prefer`` is the pluggable representative-preference rule (the
    reference's case-preferring independent set,
    ``shared/samples_qc.py:691-713``): a list of Columns the winner
    minimizes lexicographically before the key tiebreak. Default
    ``[F.col(order_col)]`` = earliest-crawl-wins; e.g.
    ``prefer=[-F.col("quality_score")]`` keeps the highest-quality copy.
    Keeping exactly one representative per connected component guarantees
    the kept set induces an edgeless subgraph (every above-threshold pair
    lies within one component — the reference's nx-independent-set sanity
    assertion, ``shared/samples_qc.py:656-664``; pinned in tests).
    """
    for reserved in ("dup_cluster_id", "__rep"):
        if reserved in df.columns:
            # e.g. re-running on an already-annotated table: the cluster
            # join would produce an AMBIGUOUS_REFERENCE failure deep in
            # the plan — fail fast with the actual cause instead
            raise ValueError(
                f"input already carries reserved column {reserved!r}; "
                "drop or rename it before re-running near-dup flagging"
            )
    if algo == "minhash":
        pairs = minhash_candidate_pairs(
            df, key_col=key_col, text_col=text_col, num_perm=num_perm, bands=bands
        ).filter(F.col("jaccard_est") >= threshold)
    elif algo == "simhash":
        tmp = "__sh"
        while tmp in df.columns:
            tmp += "_"
        pairs = simhash_pairs(
            with_simhash(df, text_col=text_col, out_col=tmp),
            key_col=key_col,
            sim_col=tmp,
            max_hamming=max_hamming,
        ).select("a", "b")
    else:
        raise ValueError(f"unknown near-dup algo {algo!r}: minhash|simhash")
    if use_driver_cc is None:
        # materialize once so the gate count and the chosen CC path share
        # the LSH work instead of recomputing the sketch pipeline twice
        pairs = pairs.localCheckpoint()
        use_driver_cc = pairs.count() <= max_driver_pairs
    if use_driver_cc:
        mapping = connected_components_driver(pairs)
        if not mapping:
            return add_flags(
                df.withColumn("dup_cluster_id", F.lit(None).cast("string")),
                flag_col,
                {"near_duplicate": F.lit(False)},
            )
        spark = df.sparkSession
        # pandas + Arrow ship the mapping in columnar batches — the
        # list-of-tuples path pickles row-by-row and is a measurable
        # DRIVER-SERIAL cost at web-scale pair counts (Amdahl: serial
        # driver work is what caps the N→4N scaling efficiency)
        cdf = spark.createDataFrame(
            pd.DataFrame(
                {key_col: list(mapping.keys()), "dup_cluster_id": list(mapping.values())}
            ),
            schema=f"{key_col} string, dup_cluster_id string",
        )
    else:
        cdf = connected_components_df(pairs).withColumnsRenamed(
            {"k": key_col, "dup_cluster_id": "dup_cluster_id"}
        )
    # broadcast ONLY on the driver path (the mapping already fit in driver
    # memory, so it broadcasts by construction); the distributed-CC path
    # exists precisely because the cluster mapping may NOT fit — there the
    # join is left to AQE, which shuffles or broadcasts on actual size
    maybe_bcast = F.broadcast if use_driver_cc else (lambda d: d)
    out = df.join(maybe_bcast(cdf), key_col, "left")
    # representative = preferred (pref..., key) min per cluster, computed on
    # the TINY clustered subset and joined back — NOT a window over the full
    # table (a window with NULL cluster for 99% of rows funnels the whole
    # table into one straggler partition)
    pref = prefer if prefer is not None else [F.col(order_col)]
    # NULL preference values sort LAST (is-null flag precedes each pref
    # column in the struct): bare struct ordering would put NULL first,
    # letting e.g. a timestamp-less copy beat every dated crawl
    pref_fields = [
        c
        for i, p in enumerate(pref)
        for c in (p.isNull().alias(f"pn{i}"), p.alias(f"p{i}"))
    ]
    reps = (
        out.filter(F.col("dup_cluster_id").isNotNull())
        .groupBy("dup_cluster_id")
        .agg(F.min(F.struct(*pref_fields, F.col(key_col))).alias("w"))
        .select("dup_cluster_id", F.col("w")[key_col].alias("__rep"))
    )
    out = out.join(maybe_bcast(reps), "dup_cluster_id", "left")
    is_dup = F.col("dup_cluster_id").isNotNull() & (F.col(key_col) != F.col("__rep"))
    return add_flags(out, flag_col, {"near_duplicate": is_dup}).drop("__rep")


# --------------------------------------------------------------- SimHash


def _simhash_votes_batch(col: pd.Series) -> pd.Series:
    """Numpy SimHash bit-vote kernel over per-row shingle-hash arrays:
    bit j of the sketch is set iff more than half the row's (distinct)
    shingle hashes have bit j set — EXACTLY :func:`~..functions.hashing.
    simhash64`'s vote>0 rule, so the two kernels are bit-identical
    (pinned in tests). One flattened pass: 64 ``np.add.reduceat`` sweeps
    over the batch's concatenated hashes, no per-row Python."""
    n = len(col)
    out = np.zeros(n, dtype=np.uint64)
    valid = np.fromiter((v is not None for v in col), dtype=bool, count=n)
    rows = [np.asarray(col.iloc[i], dtype=np.int64) for i in range(n) if valid[i]]
    if rows:
        lens = np.fromiter((len(r) for r in rows), dtype=np.int64, count=len(rows))
        sk = np.zeros(len(rows), dtype=np.uint64)
        # empty hash arrays stay sketch 0 (the no-shingle vote outcome, same
        # as simhash64 on array()); reduceat with their start indices would
        # crash on a trailing empty row and silently borrow the next row's
        # first element otherwise (equal-indices rule)
        ne = lens > 0
        if ne.any():
            starts = np.zeros(len(rows), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            flat = np.concatenate(rows).view(np.uint64)
            starts_ne = starts[ne]
            lens_u = lens[ne].astype(np.uint64)
            sk_ne = np.zeros(int(ne.sum()), dtype=np.uint64)
            for j in range(64):
                bitsum = np.add.reduceat(
                    (flat >> np.uint64(j)) & np.uint64(1), starts_ne
                )
                sk_ne |= (2 * bitsum > lens_u).astype(np.uint64) << np.uint64(j)
            sk[ne] = sk_ne
        out[valid] = sk
    res = pd.Series(out.view(np.int64), index=col.index, dtype="Int64")
    res[~valid] = pd.NA
    return res


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
    kernel: str = "np",
) -> DataFrame:
    """NULL/blank text → NULL sketch (not the all-zero-vote 0 sketch, which
    would co-block every empty doc into one degenerate quarter block);
    ``simhash_pairs`` drops NULL sketches before blocking.

    ``kernel="np"`` (default, round-6): shingle hashes stay JVM-side
    (``xxhash64`` over the distinct word shingles), then ONE Arrow
    shipment of the int64 arrays feeds the flattened numpy bit-vote
    kernel — the same treatment the MinHash signature kernel got in r5.
    ``kernel="expr"`` is the pure-expression twin (interpreted HOF:
    O(shingles·64) per row — measured 8× slower at 500k docs, kept for
    plan-portability and as the equality pin)."""
    has_text = F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    if kernel == "expr":
        return df.withColumn(out_col, F.when(has_text, simhash64(F.col(text_col))))
    if kernel != "np":
        raise ValueError(f"unknown simhash kernel {kernel!r}: np|expr")

    @F.pandas_udf("long")
    def _votes(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for col in it:
            yield _simhash_votes_batch(col)

    hs = F.when(
        has_text,
        F.transform(word_shingles(F.col(text_col), 2), lambda s: F.xxhash64(s)),
    )
    return df.withColumn(out_col, _votes(hs))


def simhash_pairs(
    df: DataFrame,
    key_col: str = "url",
    sim_col: str = "simhash",
    max_hamming: int = 3,
    max_block: int = 200,
) -> DataFrame:
    """Near-dup candidates by SimHash: block on 16-bit quarters (a pair
    within hamming ≤ 3 of a 64-bit hash shares at least one exact quarter
    — pigeonhole), then verify the full distance. Shuffle key = quarter
    value, never the pair space.

    Degenerate blocks are capped at ``max_block`` members (round-2 VERDICT
    #2): a hot quarter value shared by m docs — near-empty pages, a popular
    template — would otherwise emit O(m²) join rows and OOM one reducer at
    web scale. Same ``collect_list → slice`` guard as
    :func:`minhash_candidate_pairs` (the reference caps every O(n²)-shaped
    working set, ``shared/variant_qc.py:29-63``); keys are sorted first so
    the kept subset is deterministic. Hashes are joined back onto the
    (rare) candidate pairs for full-distance verification — the 8-byte
    simhash never rides the exploded quarter shuffle.
    """
    if not 0 <= max_hamming <= 3:
        # the recall guarantee is the pigeonhole over four 16-bit quarters:
        # ≤3 differing bits cannot touch all 4 quarters. At max_hamming=4
        # a pair with one flipped bit per quarter would silently never be
        # generated as a candidate — fail loudly instead (round-6 review)
        raise ValueError(
            f"max_hamming must be in [0, 3] for 16-bit quarter blocking, "
            f"got {max_hamming}"
        )
    sk = df.filter(F.col(sim_col).isNotNull()).select(
        F.col(key_col).alias("k"), F.col(sim_col).alias("s")
    )
    quarters = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.shiftright(F.col("s"), q * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"),
            )
            for q in range(4)
        ]
    )
    blocked = sk.select("k", F.explode(quarters).alias("blk")).select(
        "k", F.col("blk.q").alias("q"), F.col("blk.v").alias("v")
    )
    grouped = blocked.groupBy("q", "v").agg(
        F.slice(F.array_sort(F.collect_list("k")), 1, max_block).alias("ks")
    )
    cand = capped_bucket_pairs(grouped)
    siga = sk.select(F.col("k").alias("a"), F.col("s").alias("sa"))
    sigb = sk.select(F.col("k").alias("b"), F.col("s").alias("sb"))
    return (
        cand.join(siga, "a")
        .join(sigb, "b")
        .select("a", "b", hamming64(F.col("sa"), F.col("sb")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------- cross-document duplicate lines


def cross_doc_dup_line_stats(
    docs: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    min_line_chars: int = 10,
    hashed: bool = True,
) -> DataFrame:
    """Per-doc (n_lines, n_shared): how many of the doc's distinct eligible
    lines also appear in at least one OTHER document — the cross-corpus
    boilerplate signal (nav bars, cookie banners, footers) that the
    within-doc ``dup_line_frac`` metric cannot see.

    Scale shape (the whole point — no all-pairs anything):
    * explode → normalize → length-filter is row-local;
    * ``dropDuplicates(key, line)`` shuffles on the uniform (key, line)
      pair — a hot boilerplate line is spread across its docs' keys, so
      no reducer sees the full hot line;
    * line frequency is a ``groupBy(line).count()`` with map-side partial
      aggregation — the hot line arrives at its reducer as a handful of
      partial counts, not 10⁹ rows;
    * the shared-line set joins back 1-row-per-(doc,line) — no fan-out;
      AQE handles residual partition skew.

    ``hashed=True`` (production) carries ``xxhash64(line)`` (8 bytes)
    through the shuffles instead of the line text; ``hashed=False`` is
    the DuckDB-mirrorable form (oracle query ``cross_doc_lines``), pinned
    equal in tests.
    """
    lines = (
        docs.select(
            F.col(key_col).alias("__k"),
            F.explode(F.split(F.col(text_col), "\n")).alias("__raw"),
        )
        .select("__k", F.trim(F.lower(F.col("__raw"))).alias("__line"))
        .filter(F.length("__line") >= min_line_chars)
    )
    if hashed:
        lines = lines.select("__k", F.xxhash64("__line").alias("__line"))
    pairs = lines.dropDuplicates(["__k", "__line"])
    shared = (
        pairs.groupBy("__line")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") > 1)
        .select("__line", F.lit(True).alias("__shared"))
    )
    return (
        pairs.join(shared, "__line", "left")
        .groupBy("__k")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count_if(F.coalesce(F.col("__shared"), F.lit(False))).alias("n_shared"),
        )
        .withColumnRenamed("__k", key_col)
    )


def flag_cross_doc_dup_lines(
    docs: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    max_shared_frac: float = 0.6,
    min_line_chars: int = 10,
    hashed: bool = True,
    flag_col: str = "low_pass_failing_qc",
    tag: str = "cross_doc_dup_lines",
) -> DataFrame:
    """Flag docs whose shared-line fraction exceeds ``max_shared_frac``.
    Row count and key set preserved (annotate-don't-drop); the comparison
    is ``n_shared > frac · n_lines`` (no division — exact in both
    engines)."""
    st = cross_doc_dup_line_stats(docs, key_col, text_col, min_line_chars, hashed)
    out = docs.join(st, key_col, "left")
    pred = F.coalesce(
        F.col("n_shared") > F.lit(max_shared_frac) * F.col("n_lines"), F.lit(False)
    )
    return add_flags(out, flag_col, {tag: pred}).drop("n_lines", "n_shared")


def strip_boilerplate_lines(
    docs: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    min_docs: int = 3,
    min_line_chars: int = 10,
    hashed: bool = True,
    out_col: str = "text_clean",
) -> DataFrame:
    """C4-style boilerplate REMOVAL: rewrite each doc's text with every
    line that occurs (normalized: trim+lower) in ≥ ``min_docs`` distinct
    documents stripped out, preserving the order and original bytes of
    the surviving lines. The surgical complement of
    :func:`flag_cross_doc_dup_lines`, which only flags whole documents —
    nav bars / cookie banners / footers pollute GOOD documents, and a
    quality pipeline wants the page minus the chrome, not a dropped page.

    Lines shorter than ``min_line_chars`` after normalization are never
    stripped (too little evidence to be chrome, and C4 likewise bounds
    eligibility). NULL text stays NULL; a doc whose every line is
    boilerplate becomes the empty string. A doc with nothing to strip
    round-trips byte-identically (split + rejoin on ``\\n`` is the
    identity).

    Scale shape: ``posexplode`` is row-local; the boilerplate set is the
    same uniform two-aggregate chain as
    :func:`cross_doc_dup_line_stats` (distinct (doc, line) → per-line
    doc counts with map-side combine); the hit set joins back onto the
    1-row-per-(doc,pos,line) table on a uniform 16-byte dual-hash key
    (two independently-seeded ``xxhash64`` values — a single 64-bit hash
    would silently strip legitimate lines on birthday collisions at the
    10^13-distinct-line design scale; AQE-decided join — the chrome
    vocabulary of a 10^12-doc corpus is NOT assumed broadcastable);
    reassembly is one ``collect_list`` window bounded by a single
    document's line count. ``hashed=False`` carries the normalized line
    text instead of the hashes through the shuffles — the
    DuckDB-mirrorable twin (oracle query ``strip_boilerplate``), pinned
    equal in tests.
    """
    for c in ("__k", "__pos", "__raw", "__norm", "__elig", "__nk", "__hit"):
        if c in docs.columns:
            raise ValueError(f"input already carries reserved column {c!r}")
    lines = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__raw"),
    )
    norm = F.trim(F.lower(F.col("__raw")))
    lines = lines.select(
        "__k",
        "__pos",
        "__raw",
        (F.length(norm) >= min_line_chars).alias("__elig"),
        # hashed path carries TWO independently-seeded 64-bit hashes
        # (~128-bit effective key): this operator REWRITES text, so a
        # single-64-bit birthday collision at the 10^13-distinct-line
        # design scale would silently strip a legitimate line with no
        # trace (round-5 ADVICE). Struct equality rides the same
        # groupBy/join shape at +8 bytes per shuffled row.
        (
            F.struct(
                F.xxhash64(norm).alias("h1"),
                F.xxhash64(norm, F.lit(0x9E3779B9)).alias("h2"),
            )
            if hashed
            else norm
        ).alias("__nk"),
    )
    boiler = (
        lines.filter(F.col("__elig"))
        .select("__k", "__nk")
        .dropDuplicates()
        .groupBy("__nk")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__nk", F.lit(True).alias("__hit"))
    )
    kept = lines.join(boiler, "__nk", "left").filter(
        ~F.col("__elig") | F.col("__hit").isNull()
    )
    rebuilt = kept.groupBy("__k").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__raw"))),
                lambda s: s["__raw"],
            ),
        ).alias(out_col)
    )
    out = docs.join(rebuilt.withColumnRenamed("__k", key_col), key_col, "left")
    # all-lines-stripped docs vanish from `kept` — they are "", not NULL;
    # a NULL key can never rejoin its rebuilt lines (NULL ≠ NULL in the
    # join), so such rows pass through UNSTRIPPED rather than silently
    # losing their text to the coalesce. `key_col` must be unique, as in
    # every per-key operator here — duplicate keys would merge texts.
    return out.withColumn(
        out_col,
        F.when(F.col(key_col).isNull(), F.col(text_col)).when(
            F.col(text_col).isNotNull(), F.coalesce(F.col(out_col), F.lit(""))
        ),
    )


# ------------------------------------------------------- n-gram Jaccard


def jaccard_pairs_exact(
    df: DataFrame,
    key_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    allow_unblocked: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join (baseline / verifier for LSH).

    O(n²) within a block — use ``block_col`` (e.g. host or LSH bucket) to
    bound n. The unblocked form is the small-data oracle baseline ONLY and
    must be requested explicitly with ``allow_unblocked=True`` so pipeline
    code can never reach the full cross product by accident (the reference
    caps every O(n²)-shaped working set, ``shared/variant_qc.py:29-63``).
    """
    if block_col is None and not allow_unblocked:
        raise ValueError(
            "jaccard_pairs_exact without block_col is O(n²) over the whole "
            "table; pass block_col (host / LSH bucket) or allow_unblocked=True "
            "for a small-data baseline"
        )
    sh = df.select(
        F.col(key_col).alias("k"),
        (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    ).filter(F.size("sh") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.k") < F.col("b.k")))
        .select(
            F.col("a.k").alias("a"),
            F.col("b.k").alias("b"),
            (inter / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
