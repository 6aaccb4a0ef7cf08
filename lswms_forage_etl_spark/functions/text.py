"""Text-analysis scalar functions for large-scale training-data pipelines.

All pure Catalyst expressions (JVM-side, codegen) — language ID, quality
scoring, token counting, fingerprinting. Designed to run in the scan
projection over a 100 TB `documents` table: no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (empty tokens dropped)."""
    return F.filter(F.split(F.trim(_c(col)), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish proxy: alnum runs + individual punctuation marks, counted
    with one match-all regex — a cheap, deterministic stand-in for a real
    BPE count. The pattern avoids lookarounds so any RE2-class engine
    (including the DuckDB oracle) computes the identical count."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    stripped = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", "")
    return ((F.length(c) - F.length(stripped)).cast("double")
            / F.greatest(F.length(c), F.lit(1)).cast("double"))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    hits = F.size(F.array_intersect(toks, F.array(
        *[F.lit(w) for w in STOPWORDS[lang]])))
    # distinct stopwords present / distinct tokens — set-based, cheap
    return hits.cast("double") / F.greatest(
        F.size(F.array_distinct(toks)), F.lit(1)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]: length band +
    punctuation sanity + mean word length band."""
    c = _c(col)
    n = F.length(c).cast("double")
    tc = token_count(col).cast("double")
    mean_word = n / F.greatest(tc, F.lit(1.0))
    len_ok = F.when((n >= 50) & (n <= 10000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio(col) < 0.2, 1.0).otherwise(0.4)
    word_ok = F.when((mean_word >= 2.5) & (mean_word <= 12), 1.0).otherwise(0.5)
    # portable floor-based rounding so the DuckDB oracle matches bit-for-bit
    s = F.lit(10000.0)
    return F.floor((len_ok + punct_ok + word_ok) / F.lit(3.0) * s + F.lit(0.5)) / s


def lang_id(col: Column | str) -> Column:
    """Stopword-marker language ID over {en,es,fr,de}, 'und' when no
    marker hits. Deterministic tie-break by fixed language order."""
    toks = F.array_distinct(F.transform(tokens(col), lambda t: F.lower(t)))
    scores = [
        (lang, F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in ws]))))
        for lang, ws in STOPWORDS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace/case-normalized text —
    the exact-dedup key. (md5 rather than xxhash so the same fingerprint is
    computable by any engine.)"""
    norm = F.lower(F.regexp_replace(F.trim(_c(col)), r"\s+", " "))
    return F.md5(norm)
