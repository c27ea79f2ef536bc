"""Text-analysis functions for training-data pipelines: tokenization stats,
quality scoring, language-ID heuristic, fingerprinting inputs.

All Column-expression based (JVM-side); regexes kept to portable RE2-safe
constructs so DuckDB oracles can mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_RE = r"[^.,!?;:]"

# tiny marker-word sets per language (n-gram heuristic for lang-ID)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " y ", " de "],
    "zh": [" zh ", " shi ", " de "],
}


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (empty array for blank)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(ws_tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (regexp_extract_all — portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, PUNCT_RE, ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def avg_token_len(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    toks = ws_tokens(c)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def marker_hits(col: Column | str, marker: str) -> Column:
    """Occurrences of a marker substring via the replace-length trick —
    identical semantics in every SQL engine (no regex dialect risk)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit totals."""
    return {
        lang: sum((marker_hits(col, m) for m in markers), F.lit(0).cast("long"))
        for lang, markers in LANG_MARKERS.items()
    }


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length tokens and
    moderate length, penalizes punctuation soup. Mirrors the reference's
    table-level quality gate idea (>10% nulls -> reject,
    /root/reference/src/transform/validation.py:33-39) at document grain."""
    c = F.col(col) if isinstance(col, str) else col
    ntok = token_count(c).cast("double")
    atl = avg_token_len(c)
    pr = punct_ratio(c)
    len_term = F.least(ntok / F.lit(100.0), F.lit(1.0))
    tok_term = F.when((atl >= 3) & (atl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - pr * 5)
    return F.round(len_term * 0.4 + tok_term * 0.4 + punct_term * 0.2, 6)
