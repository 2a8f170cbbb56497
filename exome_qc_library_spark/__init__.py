"""exome_qc_library_spark — a from-scratch, PySpark-native web-text QC engine.

Re-expresses the query/data-processing capabilities of
``lea-urpa/exome_qc_library`` (Hail 0.2 exome-QC pipeline) as an idiomatic
Spark DataFrame engine targeting Common-Crawl-style web pages:

* staged **filter-and-annotate** semantics — per-record hard filters →
  batch metrics → fail-flag array columns → final keep/drop verdict
  (reference invariant: "no samples or variants are excluded — they are
  only marked", ``/root/reference/README.md:51-53``);
* checkpoint-after-each-stage with existence-gated resume
  (``/root/reference/exome_qc/exome_qc.py:73,113,124``,
  ``shared/utils.py:227-247``);
* vectorized pandas/Arrow UDFs only where pure DataFrame expressions
  cannot express the semantics (language-ID model scoring, perplexity);
  everything else stays JVM-side for whole-stage codegen.

Nothing here is copied from the reference — the reference is a Hail/JVM
engine; this package is a new design over the public PySpark API.
"""

__version__ = "0.1.0"
