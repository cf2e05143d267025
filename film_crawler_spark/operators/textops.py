"""Text-analysis column builders for a documents table: token counting,
whitespace normalization, language-ID heuristic, quality scoring,
fingerprinting. All pure Column expressions (JVM-side, codegen'd) —
each has an exact ANSI-SQL twin in the oracle suite, so semantics are
pinned by the DuckDB cross-check rather than by eyeballing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword markers for the n-gram heuristic; the
# padded-space trick (count of ' w ' occurrences) is what both engines
# can compute with plain string functions.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def norm_ws(text: Column) -> Column:
    """' '.join(s.split()) — reference spiders.py:877-878 (X3)."""
    return F.regexp_replace(F.trim(text), r"\s+", " ")


def token_count(text: Column) -> Column:
    """Whitespace tokenization count (\\S+ matches)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0)))


def char_count(text: Column) -> Column:
    return F.length(text)


def _occurrences(padded: Column, word: str) -> Column:
    """Occurrences of ' word ' in the space-padded, lowercased text.
    (length delta) / len(needle) — pure string math, engine-portable."""
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(norm_ws(text)), F.lit(" "))
    return {
        lang: sum((_occurrences(padded, w) for w in words), F.lit(0))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts; ties broken by fixed language order;
    all-zero => 'und' (undetermined)."""
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties => apply last
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best <= 0, F.lit("und")).otherwise(expr)


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: mean-word-length band,
    stopword presence, length band, alpha ratio. Rounded to 6 dp so the
    DuckDB twin hashes identically."""
    t = norm_ws(text)
    n_tok = token_count(t)
    n_chars = F.length(t)
    mean_wl = n_chars / F.greatest(n_tok, F.lit(1))
    alpha_ratio = (
        F.length(F.regexp_replace(t, r"[^a-zA-Z]", "")) / F.greatest(n_chars, F.lit(1))
    )
    en = lang_scores(t)["en"]
    stop_ratio = en / F.greatest(n_tok, F.lit(1))
    score = (
        F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * 2, F.lit(0.2))
        + alpha_ratio * F.lit(0.3)
    )
    return F.round(score, 6)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the lowercased, whitespace-collapsed
    text — the normalization-stable exact-dup key."""
    return F.md5(F.lower(norm_ws(text)))
