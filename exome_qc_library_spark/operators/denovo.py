"""De-novo content caller — trio-based probabilistic flag from joined priors.

Closes SURVEY §2 K8. The reference calls ``hl.de_novo`` over trios with
``pop_frequency_prior = max(gnomad_af, site_freq_gnomad_n)``
(``/root/reference/find_denovo_variants.py:213-239``): a variant seen in
the child but in neither parent is a de-novo candidate, scored by a
posterior that shrinks as the population prior (how common the allele is
anyway) grows, and bucketed into HIGH/MEDIUM/LOW confidence tiers. The
prior itself is assembled upstream (``find_denovo_variants.py:177-215``)
from (a) in-sample site frequency with the external panel's allele count
folded into the denominator, ``(n_alt-1)/(total+gnomad_AN)``, and (b) a
left-joined external panel frequency with missing→0
(``hl.or_else(mt.gnomad_af, 0)``, line 208).

Web-text analog — "original content" calling:

* variant            → content fingerprint (hash of the text)
* trio               → per-family (host/source) snapshot windows: two
                       parent windows + one child window; a family with
                       an EMPTY parent window is an incomplete trio and
                       produces no calls (hl.de_novo requires both
                       parental genotypes defined)
* de-novo candidate  → fingerprint carried by a child-window doc and by
                       NO doc in either parent window of the same family
* prior              → greatest(panel_af, site_freq_n) where
                       site_freq_n = max(n_copies-1, 0)/(total+ext_n)
                       and panel_af is left-joined, missing→0
* posterior          → p = (1-prior)/(1 + parent_exposure·prior): a
                       common fingerprint (high prior) or a family with
                       many parent docs that still never carried it is
                       more likely an ingest artifact than original
                       content — mirrors the caller's prior-weighted
                       shrinkage
* confidence         → HIGH if p>0.99 and site_freq_n<1e-3, MEDIUM if
                       p>0.5, else LOW (hl.de_novo's posterior cutoffs)

Scale shape (100 TB): one shuffle keyed by the uniform composite
(family, fingerprint) computes child/parent presence with map-side
combine; global fingerprint counts are a second uniform-key aggregate;
per-family parent exposure is a #families-row table whose join is
AQE-decided (families = hosts = 10^8+ at web scale — the broadcast hint
is opt-in via ``broadcast_families``, same gate pattern as the
decontamination hit set); the single-row corpus total rides a broadcast
cross-join (same pattern as ``host_qc.py``); the panel join is likewise
AQE-decided. Candidates are rare, so the final join back onto child
docs moves only hits — no payload (text) ever rides a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: gnomad-AN analog: external panel allele count folded into the
#: site-frequency denominator (find_denovo_variants.py:184).
DEFAULT_EXT_N = 10_000

#: hl.de_novo posterior/frequency cutoffs, reused as-is.
_P_HIGH, _FREQ_HIGH, _P_MED = 0.99, 1e-3, 0.5


def call_denovo_content(
    docs: DataFrame,
    panel_af: DataFrame,
    *,
    family_col: str = "family",
    snapshot_col: str = "snapshot",
    fingerprint_col: str = "fingerprint",
    id_col: str = "doc_id",
    child_snapshot: int = 2,
    ext_n: int = DEFAULT_EXT_N,
    broadcast_families: bool = False,
) -> DataFrame:
    """Call de-novo (original) content per child doc.

    ``docs`` needs (id, family, snapshot∈{0,1,child}, fingerprint) —
    fingerprint rows with NULLs are ignored. ``panel_af`` is the
    external reference-population table ``(fingerprint_col, panel_af)``;
    fingerprints absent from it get panel_af = 0 (the reference's
    ``or_else(gnomad_af, 0)``). Returns one row per child-window doc
    whose fingerprint is a de-novo candidate, with
    (id, family, fingerprint, n_copies, site_freq_n, prior, p_denovo,
    confidence).

    ``broadcast_families`` hints the per-family exposure table into a
    broadcast join. OFF by default: families map to hosts, and a
    web-scale corpus has 10^8+ of them — the same unbounded-broadcast
    trap as the decontamination hit set (``decontaminate.py``), so AQE
    decides unless the caller KNOWS the family universe is small.
    """
    present = docs.filter(
        F.col(family_col).isNotNull() & F.col(snapshot_col).isNotNull()
    )
    # NULL fingerprints can't carry calls, but the docs still exist for
    # trio completeness / exposure (a parent with unusable text is still
    # a parent — the reference requires the parent GENOTYPE defined at
    # the site, which maps to fingerprint presence, handled in fam_fp).
    d = present.filter(F.col(fingerprint_col).isNotNull())
    is_child = F.col(snapshot_col) == F.lit(child_snapshot)

    # Per-(family, fingerprint) presence — ONE uniform-key shuffle.
    fam_fp = d.groupBy(family_col, fingerprint_col).agg(
        F.sum(F.when(is_child, 1).otherwise(0)).alias("child_count"),
        F.sum(F.when(~is_child, 1).otherwise(0)).alias("parent_count"),
    )

    # Global fingerprint copy-count (site frequency numerator).
    fp_counts = d.groupBy(fingerprint_col).agg(F.count(F.lit(1)).alias("n_copies"))

    # Corpus total: single-row broadcast cross-join (host_qc.py pattern).
    totals = d.agg(F.count(F.lit(1)).alias("total_docs"))

    # Trio completeness + parent exposure per family (tiny table).
    fam_stats = present.groupBy(family_col).agg(
        F.sum(F.when(F.col(snapshot_col) == 0, 1).otherwise(0)).alias("n_parent_a"),
        F.sum(F.when(F.col(snapshot_col) == 1, 1).otherwise(0)).alias("n_parent_b"),
    )

    if broadcast_families:
        fam_stats = F.broadcast(fam_stats)
    candidates = (
        fam_fp.filter((F.col("child_count") > 0) & (F.col("parent_count") == 0))
        .join(fam_stats, family_col)
        .filter((F.col("n_parent_a") > 0) & (F.col("n_parent_b") > 0))
        .join(fp_counts, fingerprint_col)
        .crossJoin(F.broadcast(totals))
        .join(panel_af, fingerprint_col, "left")
        .withColumn("panel_af", F.coalesce(F.col("panel_af"), F.lit(0.0)))
    )

    site_freq_n = F.greatest(F.col("n_copies") - 1, F.lit(0)) / (
        F.col("total_docs") + F.lit(ext_n)
    )
    prior = F.greatest(F.col("panel_af"), F.col("site_freq_n"))
    exposure = F.col("n_parent_a") + F.col("n_parent_b")
    p_denovo = (F.lit(1.0) - F.col("prior")) / (
        F.lit(1.0) + exposure * F.col("prior")
    )
    confidence = (
        F.when(
            (F.col("p_denovo") > _P_HIGH) & (F.col("site_freq_n") < _FREQ_HIGH),
            "HIGH",
        )
        .when(F.col("p_denovo") > _P_MED, "MEDIUM")
        .otherwise("LOW")
    )
    scored = (
        candidates.withColumn("site_freq_n", F.round(site_freq_n, 9))
        .withColumn("prior", F.round(prior, 9))
        .withColumn("p_denovo", F.round(p_denovo, 9))
        .withColumn("confidence", confidence)
    )

    # One row per CHILD doc carrying the candidate fingerprint — joining
    # the rare candidate set back onto the child docs moves only hits.
    children = d.filter(is_child).select(
        F.col(id_col), F.col(family_col), F.col(fingerprint_col)
    )
    return children.join(
        scored.select(
            family_col,
            fingerprint_col,
            "n_copies",
            "site_freq_n",
            "prior",
            "p_denovo",
            "confidence",
        ),
        [family_col, fingerprint_col],
    )


def denovo_over_pages(
    pages: DataFrame,
    panel_af: DataFrame | None = None,
    *,
    text_col: str = "text",
    ext_n: int = DEFAULT_EXT_N,
) -> DataFrame:
    """Standalone de-novo analysis over a pages table — the analog of the
    reference running ``find_denovo_variants.py`` as its own script over
    the QC'd matrix table, not as an ``exome_qc.py`` stage.

    Families = host (from the url); snapshot windows = the three equal
    ``warc_ts`` tertiles of the observed crawl span (window 0/1 = the two
    parent crawls, window 2 = the newest = child) — pure expressions off
    a broadcast single-row min/max, so the assignment is deterministic at
    any parallelism. ``panel_af`` defaults to the reference-population
    pattern used by the ``denovo_content`` query: the fingerprint
    frequencies of the ``lang='en'`` sub-population (requires a ``lang``
    column), mirroring how the reference derives its prior table from a
    filtered view of the corpus (``find_denovo_variants.py:169-199``).
    """
    from ..functions.urltools import host_expr

    rows = pages.filter(F.col(text_col).isNotNull() & F.col("warc_ts").isNotNull())
    bounds = rows.agg(
        F.min(F.unix_timestamp("warc_ts")).alias("ts_min"),
        F.max(F.unix_timestamp("warc_ts")).alias("ts_max"),
    )
    span = F.col("ts_max") - F.col("ts_min") + F.lit(1)
    base = (
        rows.crossJoin(F.broadcast(bounds))
        .select(
            F.col("url").alias("doc_id"),
            host_expr(F.col("url")).alias("family"),
            F.least(
                F.floor(
                    (F.unix_timestamp("warc_ts") - F.col("ts_min")) * 3 / span
                ),
                F.lit(2),
            )
            .cast("int")
            .alias("snapshot"),
            F.sha2(F.col(text_col), 256).alias("fingerprint"),
        )
    )
    if panel_af is None:
        en = rows.filter(F.col("lang") == "en")
        panel_af = (
            en.groupBy(F.sha2(F.col(text_col), 256).alias("fingerprint"))
            .agg(F.count(F.lit(1)).alias("k"))
            .crossJoin(F.broadcast(en.agg(F.count(F.lit(1)).alias("n_en"))))
            .select(
                "fingerprint", F.round(F.col("k") / F.col("n_en"), 9).alias("panel_af")
            )
        )
    return call_denovo_content(base, panel_af, ext_n=ext_n)
