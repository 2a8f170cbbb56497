"""The flagship web-text QC pipeline — the 11-step exome_qc.py analog.

Stage map (SURVEY.md §7.1; execution order below — near-dup runs right
after the ingest snapshot so its sketch job scans the checkpoint
column-pruned, and cheap expression stages fuse lazily into the next
materialization):

  S0 ingest        html → extracted text (byte-identical), lineage cols  [ckpt]
  S1 enrich        host-metadata broadcast join + spam flags   [optional, lazy]
  S2 blocklist     url/host anti-list + substring flags        [optional, lazy]
  S2b decontaminate benchmark n-gram overlap flags             [optional, lazy]
  S2c host_cap     per-host doc quota (skew-safe top-N) flags  [optional, lazy]
  S5 near_dedup    MinHash-LSH → clusters → near_duplicate flags        [ckpt]
  S3 hard_filters  Gopher/C4 heuristics → low_pass_failing_qc            [lazy]
  S4 exact_dedup   sha2 content groups → exact_duplicate flags           [lazy]
  S4b cross_doc_lines corpus-level boilerplate-line flags      [optional, lazy]
  S4c strip_chrome  C4-style boilerplate-line REMOVAL (rewrites
                    text post-dedup, pre-scoring)               [optional, lazy]
  S9 scoring       fused langid+perplexity UDF → mismatch/ppl flags
                   + strict thresholds → final_failing_qc               [ckpt]
  S6 iter_outliers iterative global mean±kσ trim on the metric columns   [lazy]
  S10 segment_qc   per-language-segment stopword-density outliers        [lazy]
  S8 host_qc       per-host batch-stratified outlier flags               [lazy]
  S11 verdict      keep = all flag arrays empty; scrub keepers          [ckpt]

S6/S10 complete the reference's 11-step map (round-2 VERDICT #1): the
iterative PCA-outlier stage (``shared/samples_qc.py:131-257``, run on
every invocation at ``exome_qc/exome_qc.py:293-333`` step 6) and the
phenotype-stratified QC (``shared/variant_qc.py:902-981``, step 10).
Both read the s9 checkpoint column-pruned: S6's loop aggregates a
measures-only projection (never the text), S10 is one tiny groupBy over
the language segment broadcast back.

Every stage preserves row count and the url key set (README.md:51-53
invariant); every stage writes a resumable checkpoint with manifest
(the reference's checkpoint-per-step, ``exome_qc/exome_qc.py:113,...``).
Terminal down-sampling (training-mix quotas) is an EXPORT option —
``sources.sinks.write_final_table(sample_fractions=...)`` — so the
pipeline itself stays row-count-preserving.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.blocklist import flag_blocklisted, flag_substring_matches
from ..operators.dedup import flag_exact_duplicates, flag_near_duplicates
from ..operators.hard_filters import (
    FINAL,
    LOW_PASS,
    QualityThresholds,
    apply_hard_filters,
    thresholds_metadata,
)
from ..operators.ingest import ingest_pages
from ..operators.langid import flag_lang_mismatch, with_langid_expr
from ..operators.outliers import OUTLIER_MEASURES, flag_iterative_outliers
from ..operators.perplexity import flag_high_perplexity, with_perplexity, with_text_scores
from ..operators.host_qc import flag_host_outliers
from ..operators.segment_qc import flag_segment_outliers
from ..operators.scrub import apply_scrub, with_pii_hits
from ..operators.verdict import with_verdict
from ..sources.checkpoint import CheckpointStore
from .pipeline import Pipeline, Stage

DEFAULT_MAX_PERPLEXITY = 5000.0


def build_quality_pipeline(
    store: CheckpointStore,
    blocklist: DataFrame | None = None,
    host_metadata: DataFrame | None = None,
    max_spam_score: float = 0.8,
    url_substrings: Sequence[str] = (),
    low_pass: QualityThresholds = LOW_PASS,
    final: QualityThresholds = FINAL,
    max_perplexity: float = DEFAULT_MAX_PERPLEXITY,
    near_dup_threshold: float = 0.8,
    near_dup_algo: str = "minhash",
    near_dup_max_hamming: int = 3,
    use_udf_langid: bool = True,
    keep_html: bool = False,
    checkpoint_all: bool = False,
    outlier_k_sigma: float = 4.0,
    outlier_max_iter: int = 3,
    segment_k_sigma: float = 4.0,
    segment_min_n: int = 20,
    decontamination_benchmark: DataFrame | None = None,
    decontamination_ngram: int = 8,
    host_cap: int | None = None,
    cross_doc_dup_lines: bool = False,
    max_shared_line_frac: float = 0.6,
    strip_boilerplate_min_docs: int | None = None,
) -> Pipeline:
    """Stage order puts the near-dup stage right after the ingest snapshot so
    its sketch job reads the checkpoint directly (column-pruned to url/text)
    instead of re-running upstream flag stages; the cheap expression stages
    are lazy (``materialize=False``) and fuse into the next checkpoint —
    4 materializations instead of 8. ``checkpoint_all=True`` restores the
    reference's checkpoint-after-every-step behavior (finest-grained resume).
    """
    mat = checkpoint_all

    def _ingest(df: DataFrame) -> DataFrame:
        out = ingest_pages(df)
        # html is the dominant payload; downstream stages never read it and
        # it stays recoverable from the source snapshot (lineage columns) —
        # the reference's drop-heavy-fields pattern (P6, exome_qc.py:587)
        return out if keep_html else out.drop("html")

    stages: list[Stage] = [
        Stage("s0_ingest", _ingest, {"extractor": "body_p_v1", "keep_html": keep_html}),
    ]
    if host_metadata is not None:
        from ..operators.enrich import enrich_with_host_metadata, flag_spam_hosts

        stages.append(
            Stage(
                "s1_enrich",
                lambda df: flag_spam_hosts(
                    enrich_with_host_metadata(df, host_metadata), max_spam_score
                ),
                {"max_spam_score": max_spam_score},
                materialize=mat,
            )
        )
    if blocklist is not None or url_substrings:

        def _blk(df: DataFrame) -> DataFrame:
            if blocklist is not None:
                df = flag_blocklisted(df, blocklist)
            if url_substrings:
                df = flag_substring_matches(df, url_substrings)
            return df

        stages.append(
            Stage("s2_blocklist", _blk, {"substrings": list(url_substrings)}, materialize=mat)
        )
    if decontamination_benchmark is not None:
        from ..operators.decontaminate import flag_contaminated

        stages.append(
            Stage(
                "s2b_decontaminate",
                lambda df: flag_contaminated(
                    df, decontamination_benchmark, n=decontamination_ngram
                ),
                {"n": decontamination_ngram},
                materialize=mat,
            )
        )

    if host_cap is not None:
        # per-host doc quota (round-3 VERDICT #3): the reference applies
        # per-step membership filters inside its stage loop
        # (/root/reference/exome_qc/exome_qc.py:119-161); here the
        # curated-set rule is "at most host_cap docs per host", decided by
        # the skew-safe two-phase top-N and recorded as a flag
        from ..functions.urltools import host_expr
        from ..operators.sampling import flag_over_key_cap

        def _host_cap(df: DataFrame) -> DataFrame:
            had_host = "host" in df.columns  # s1 enrich may have added it
            if not had_host:
                df = df.withColumn("host", host_expr(F.col("url")))
            out = flag_over_key_cap(
                df,
                key_col="host",
                max_rows=host_cap,
                order_cols=("warc_ts",),
                id_col="url",
                tag="host_over_cap",
            )
            return out if had_host else out.drop("host")

        stages.append(
            Stage(
                "s2c_host_cap",
                _host_cap,
                {"max_rows": host_cap, "key": "host", "order": ["warc_ts"]},
                materialize=mat,
            )
        )

    stages += [
        Stage(
            "s5_near_dedup",
            # near_dup_algo="simhash" swaps in the 8-byte sketch engine
            # (round-5 VERDICT #2): same clustering/flags, cheaper sketch,
            # documented recall trade on scattered word edits
            lambda df: flag_near_duplicates(
                df,
                threshold=near_dup_threshold,
                algo=near_dup_algo,
                max_hamming=near_dup_max_hamming,
            ),
            {
                "threshold": near_dup_threshold,
                "algo": near_dup_algo,
                "max_hamming": near_dup_max_hamming,
            },
            account_flags="final_failing_qc",
        ),
        Stage(
            "s3_hard_filters",
            lambda df: apply_hard_filters(df, "low_pass_failing_qc", low_pass),
            thresholds_metadata(low_pass),
            materialize=mat,
        ),
        Stage(
            "s4_exact_dedup",
            lambda df: flag_exact_duplicates(df),
            {},
            materialize=mat,
        ),
    ]
    if cross_doc_dup_lines:
        # corpus-level boilerplate flags (round-3 VERDICT #3): the
        # cross-document analog of the reference's batch-stratified
        # metrics (/root/reference/shared/samples_qc.py:432-486) — a doc
        # whose lines mostly appear in OTHER docs is template chrome
        from ..operators.dedup import flag_cross_doc_dup_lines

        stages.append(
            Stage(
                "s4b_cross_doc_lines",
                lambda df: flag_cross_doc_dup_lines(
                    df, max_shared_frac=max_shared_line_frac
                ),
                {"max_shared_frac": max_shared_line_frac},
                materialize=mat,
            )
        )
    if strip_boilerplate_min_docs is not None:
        # C4-style chrome REMOVAL (rewrites `text` in place, so s9 scores
        # the content, not the nav bars). OPT-IN: with it on, the
        # byte-identity-to-upstream invariant intentionally no longer
        # holds for docs that carried chrome — that is the operator's
        # purpose, mirroring how apply_scrub rewrites keeper text at s11.
        # Runs AFTER both dedup stages so duplicates are detected on the
        # raw bytes the crawler saw.
        from ..functions.textmetrics import METRIC_NAMES, with_text_metrics
        from ..operators.dedup import strip_boilerplate_lines

        def _strip(df: DataFrame) -> DataFrame:
            out = strip_boilerplate_lines(
                df, min_docs=strip_boilerplate_min_docs
            )
            out = out.withColumn("text", F.col("text_clean")).drop("text_clean")
            # the metric columns materialized at s3 describe the PRE-strip
            # text; recompute them on the stripped content or s9's final
            # threshold flags (and the s6/s10/s8 outlier stages) would
            # score chrome that no longer exists (round-6 review)
            stale = [c for c in METRIC_NAMES if c in out.columns]
            if stale:
                out = with_text_metrics(out.drop(*stale))
            return out

        stages.append(
            Stage(
                "s4c_strip_chrome",
                _strip,
                {"min_docs": strip_boilerplate_min_docs},
                materialize=mat,
            )
        )
    stages += [
        Stage(
            "s9_scoring",
            lambda df: flag_high_perplexity(
                apply_hard_filters(
                    flag_lang_mismatch(
                        with_text_scores(df) if use_udf_langid else with_perplexity(with_langid_expr(df))
                    ),
                    "final_failing_qc",
                    final,
                    compute_metrics=False,
                ),
                max_perplexity,
            ),
            dict(
                thresholds_metadata(final),
                max_perplexity=max_perplexity,
                scorer="nb_trigram_v1" if use_udf_langid else "stopword_density_v1",
            ),
            account_flags="final_failing_qc",
        ),
        Stage(
            "s6_iterative_outliers",
            lambda df: flag_iterative_outliers(
                df, k_sigma=outlier_k_sigma, max_iter=outlier_max_iter
            ),
            {
                "measures": list(OUTLIER_MEASURES),
                "k_sigma": outlier_k_sigma,
                "max_iter": outlier_max_iter,
            },
            materialize=mat,
        ),
        Stage(
            "s10_segment_qc",
            lambda df: flag_segment_outliers(
                df, k_sigma=segment_k_sigma, min_segment_n=segment_min_n
            ),
            {
                "segment_col": "lang_id",
                "measure": "stopword_density",
                "k_sigma": segment_k_sigma,
                "min_segment_n": segment_min_n,
            },
            materialize=mat,
        ),
        Stage(
            "s8_host_qc",
            # batch-stratified when host metadata supplied the crawl_batch
            # column at s1 — the reference's per-batch sample-QC strata
            # (shared/samples_qc.py:432-486); global stats otherwise
            lambda df: flag_host_outliers(
                df, batch_col="crawl_batch" if host_metadata is not None else None
            ),
            {
                "k_sigma": 4.0,
                "batch_col": "crawl_batch" if host_metadata is not None else None,
            },
            materialize=mat,
        ),
        Stage(
            "s11_verdict",
            lambda df: apply_scrub(with_pii_hits(with_verdict(df))),
            {},
            # final accounting covers BOTH flag arrays so the S6/S10/S8
            # final_failing_qc tags show up in the terminal report
            account_flags=("low_pass_failing_qc", "final_failing_qc"),
        ),
    ]
    return Pipeline(stages, store)


def run_quality_pipeline(pages: DataFrame, store: CheckpointStore, **kwargs) -> DataFrame:
    return build_quality_pipeline(store, **kwargs).run(pages)


def summarize_verdicts(df: DataFrame) -> DataFrame:
    """Flagship report: per-source keep rate + top fail reasons
    (SURVEY.md §7.2's 'one real query')."""
    return (
        df.select(
            "source_file",
            F.col("keep"),
            F.explode_outer(
                F.concat(F.col("low_pass_failing_qc"), F.col("final_failing_qc"))
            ).alias("flag"),
        )
        .groupBy("source_file", "flag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"))
        .orderBy(F.desc("n"), "flag")
    )
