"""Text-analysis function surface ([EXT], SURVEY §2.11).

Dialect-portable building blocks: each is expressible with the same
semantics in Spark SQL and DuckDB SQL (the oracle), so quality scoring
and language-ID heuristics stay hash-checkable.  Everything is
map-side column math — no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny fixed stopword lists for the language-ID heuristic; counting
# occurrences via length-delta after replace() is dialect-portable
# (regexp flavors are not).
STOPWORDS = {
    "en": ["the", "a", "data"],
    "es": ["el", "la", "los"],
    "fr": ["le", "la", "les"],
    "de": ["der", "die", "das"],
    "zh": ["de", "le", "shi"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count without regex-dialect risk:
    ``len(text) - len(replace(text,' ','')) + 1`` on trimmed text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
    )


def occurrence_count(text: Column, needle: str) -> Column:
    """Number of occurrences of ``needle`` via length delta."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def punct_count(text: Column) -> Column:
    return sum(occurrence_count(text, c) for c in [".", ",", "!", "?"])


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Occurrences of ``" word "`` (space-delimited) summed over words."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return sum(occurrence_count(padded, f" {w} ") for w in words)


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
URL_RE = r"https?://[^ ]+"


def redact_pii(text: Column) -> Column:
    """Replace emails, phone numbers, and URLs with typed placeholder
    tokens.  The three patterns are dialect-portable (same semantics
    in Java regex and DuckDB's RE2; note DuckDB needs the 'g' flag —
    Spark replaces globally by default).  Order matters: URLs first so
    an address inside a URL is not half-redacted."""
    out = F.regexp_replace(text, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def corpus_quality_keep(text: Column) -> Column:
    """THE stage-1 corpus quality gate, defined once: token count in
    [20, 90] and distinct-token ratio >= 0.35.  Shared by
    ``corpus_build_funnel`` stage 1, ``streaming_corpus_quality_gate``
    (whose batch-parity claim depends on the predicates being
    literally identical), and their parity tests — a tweak here moves
    every consumer together instead of silently desynchronizing them.
    Column-expression helper (driver-side plan builder): safe to
    import package-level, unlike worker-shipped kernels."""
    from pyspark.sql import functions as F

    n_tok = F.size(F.split(text, " "))
    n_uniq = F.size(F.array_distinct(F.split(text, " ")))
    return n_tok.between(20, 90) & (n_uniq.cast("double") / n_tok >= 0.35)
