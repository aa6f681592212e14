"""Text-analysis column functions for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage-codegen) — designed to
run over trillions of documents, so no Python in the hot path. Formulas
are deliberately simple/deterministic so a SQL oracle can reproduce them
exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny per-language stopword lists for the n-gram-free language heuristic.
LANG_STOPWORDS = {
    "en": ["the", "and", "is", "of", "to", "a", "in"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "los", "que", "es", "una"],
}


def token_count(c) -> Column:
    """Whitespace token count; 0 for empty/NULL-ish text."""
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("int")


def bpe_ish_token_count(c) -> Column:
    """A BPE-flavored proxy: count word pieces + standalone punctuation
    (regex token split), the standard cheap token estimator."""
    t = F.trim(F.coalesce(c, F.lit("")))
    toks = F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(toks).cast("int")


def punct_ratio(c) -> Column:
    """Punctuation chars / total chars (0 when empty)."""
    t = F.coalesce(c, F.lit(""))
    total = F.length(t)
    punct = total - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(c, lang: str = "en") -> Column:
    """Stopword tokens / total tokens."""
    t = F.lower(F.trim(F.coalesce(c, F.lit(""))))
    toks = F.split(t, r"\s+")
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
    total = F.size(toks)
    return F.when((F.length(t) == 0) | (total == 0), F.lit(0.0)).otherwise(
        n_stop / total
    )


def quality_score(c) -> Column:
    """Composite document quality in [0,1]: length factor x (1 - punct
    excess) x stopword presence. Cheap heuristic filter for pretraining
    corpora; formula chosen to be SQL-portable."""
    n_tok = token_count(c).cast("double")
    len_factor = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4)
    stop_bonus = F.least(stopword_ratio(c) * 5, F.lit(1.0))
    return F.round(len_factor * punct_penalty * (F.lit(0.5) + stop_bonus / 2), 6)


def lang_guess(c) -> Column:
    """Stopword-vote language ID over LANG_STOPWORDS; 'und' when no vote.
    Ties break by language-key order (en, de, fr, es)."""
    t = F.lower(F.trim(F.coalesce(c, F.lit(""))))
    toks = F.split(t, r"\s+")
    def _vote(stops):
        arr = F.array(*[F.lit(s) for s in stops])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    votes = [(lang, _vote(stops)) for lang, stops in LANG_STOPWORDS.items()]
    best_count = F.greatest(*[v for _, v in votes])
    result = F.lit("und")
    for lang, v in reversed(votes):
        result = F.when((best_count > 0) & (v == best_count), F.lit(lang)).otherwise(result)
    return result


def fingerprint64(c) -> Column:
    """Deterministic 64-bit document fingerprint over normalized text
    (lowercase, whitespace collapsed) — content-addressed dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(c, F.lit("")))), r"\s+", " ")
    return F.xxhash64(norm)
