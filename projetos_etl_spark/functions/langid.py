"""Heuristic language identification (SURVEY.md §2B text analysis /
BASELINE.json north star: "language-ID (n-gram heuristic)").

Pure built-in-function implementation — no Python in the data path:
1. a CJK codepoint-ratio test (any substantial Han coverage => ``zh``);
2. otherwise, per-language stopword hit counting over whitespace tokens,
   argmax with a deterministic tie order.

The stopword lists are tiny, embedded, and public-knowledge (the most
frequent function words of each language). Accuracy is tested on real
multilingual sentences in ``tests/test_text.py`` — the driver fixture's
``documents.text`` is synthetic word soup, so there the detector
legitimately returns 'en'/'und'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "it", "you", "that", "was"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "una", "por", "con"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "ich", "mit", "sie"],
    "fr": ["le", "la", "les", "et", "est", "une", "je", "que", "pas", "pour"],
}

#: deterministic preference order on ties
_LANG_ORDER = ["en", "es", "de", "fr"]


def _stopword_hits(tokens: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def detect_language(text: Column | str, min_hits: int = 1) -> Column:
    """Return a best-guess ISO 639-1 code ('und' when nothing matches)."""
    c = F.col(text) if isinstance(text, str) else text
    # CJK ratio: strip everything outside the Han block and compare length.
    han_len = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    tokens = F.split(F.lower(c), r"\s+")
    hits = {lang: _stopword_hits(tokens, lang) for lang in _LANG_ORDER}
    best = None
    for lang in _LANG_ORDER:
        score = hits[lang]
        if best is None:
            best = (score, F.lit(lang))
        else:
            best_score, best_lang = best
            keep = best_score >= score  # earlier language wins ties
            best = (
                F.when(keep, best_score).otherwise(score),
                F.when(keep, best_lang).otherwise(F.lit(lang)),
            )
    assert best is not None
    best_score, best_lang = best
    return (
        F.when(han_len * 5 >= F.length(c), F.lit("zh"))
        .when(best_score >= min_hits, best_lang)
        .otherwise(F.lit("und"))
    )
