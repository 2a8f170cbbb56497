"""Per-language mini-lexicons (public common/closed-class words).

Shared by three components so they agree by construction:
* the deterministic pages synthesizer (`synth.py`),
* the expression-based language-ID scorer (`operators/langid.py`),
* the generated DuckDB oracle SQL (`__spark_entry__.py`).

Analog of the reference's threshold dicts annotated into globals
(``/root/reference/shared/variant_qc.py:767-781``) — configuration data
that travels with the engine, not external files.
"""

from __future__ import annotations

LANGS: tuple[str, ...] = ("de", "en", "es", "fr", "zh")

LEXICONS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "and", "of", "to", "a", "in", "is", "was", "for", "with",
        "on", "that", "this", "it", "as", "are", "be", "at", "by", "from",
    ),
    "de": (
        "der", "die", "das", "und", "ist", "nicht", "ich", "zu", "mit", "ein",
        # "er", not "ser" (round-6 review: "ser" is the Spanish copula —
        # it credited the GERMAN density/trigram score on real Spanish
        # text, and the closed loop of synth/scorer/oracle sharing this
        # table meant no test could see it)
        "auf", "den", "sie", "er", "des", "im", "eine", "als", "auch", "sich",
    ),
    "fr": (
        "le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que",
        "pas", "des", "du", "il", "elle", "au", "plus", "par", "sur", "avec",
    ),
    "es": (
        "el", "los", "de", "que", "y", "en", "un", "una", "es", "por",
        "no", "se", "del", "las", "lo", "como", "para", "mas", "pero", "sus",
    ),
    "zh": (
        "wo", "ni", "ta", "shi", "zai", "you", "hen", "bu", "hao", "ma",
        "men", "zhe", "na", "ge", "shang", "xia", "lai", "qu", "shuo", "kan",
    ),
}

# topic words common to every language's synthetic docs (langid noise floor)
TOPIC_WORDS: tuple[str, ...] = (
    "data", "spark", "query", "table", "column", "filter", "join", "batch",
    "stream", "window", "vector", "hash", "sort", "merge", "scan", "agg",
    "row", "key", "value", "part", "group", "order", "line", "small",
    "big", "fast", "slow", "customer",
)
