"""Text-analysis column functions (north-star C5 + training-data-pipeline
text ops). Everything is a composition of built-in functions, so the whole
pipeline stays inside whole-stage codegen -- at 100 TB these run at parquet
scan speed with zero Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny multilingual stopword table for the language-ID heuristic and the
# quality score's stopword ratio. Deliberately deterministic and public.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "de", "et", "un", "que", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization; empty strings dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# ---- token-ARRAY variants -------------------------------------------------
# Each *_of_tokens function computes over an existing array<string> column.
# A shared whitespace-token stage was measured and REJECTED (plans/text.py
# top-of-file note: the split is codegen-fused into the scan, so
# materializing it loses); these helpers are kept for a future
# tokenize-once pipeline where tokenization IS expensive -- e.g. a
# pandas-UDF BPE stage whose array output would be worth reusing. The
# text-input functions above stay as the one-shot convenience surface;
# where both exist, the text version delegates so the two can never drift.


def mean_token_length_of_tokens(toks: Column) -> Column:
    lens = F.transform(toks, lambda t: F.length(t))
    return (
        F.aggregate(lens, F.lit(0), lambda acc, x: acc + x).cast("double")
        / F.greatest(F.size(toks), F.lit(1))
    )


def stopword_count_of_tokens(toks: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))


def bigrams_of_tokens(toks: Column) -> Column:
    """Adjacent-token bigram array ('a b', 'b c', ...); empty below 2 tokens."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# GPT-2-ish pre-tokenizer regex, restricted to RE2-compatible constructs
# (no lookahead) so the identical pattern runs in the DuckDB oracle:
# runs of letters / digits / other-symbols, each with an optional leading
# space -- the shape BPE merge tables are trained over.
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def bpe_tokens(text: Column | str) -> Column:
    """BPE-style pre-tokenization (letters/digits/punct runs with leading
    space). A cheap, engine-portable proxy for LLM token counting -- the
    real tokenizer's merge step only ever shrinks this count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column | str, lang: str = "en") -> Column:
    return stopword_count_of_tokens(tokens(text), lang)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    return stopword_count(text, lang) / F.greatest(token_count(text), F.lit(1))


def mean_token_length(text: Column | str) -> Column:
    return mean_token_length_of_tokens(tokens(text))


def non_alpha_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [a-z ] after lower-casing --
    a punctuation/noise proxy for quality filtering."""
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, "[^a-z ]", "")
    return (F.length(lowered) - F.length(stripped)) / F.greatest(
        F.length(lowered), F.lit(1)
    )


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: favors texts with a sane length,
    some stopwords, and little non-alpha noise. The standard cheap pre-filter
    before expensive dedup/embedding stages in a training-data pipeline."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    length_ok = F.when((n >= 5) & (n <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(c) >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    noise_ok = F.when(non_alpha_ratio(c) <= 0.3, F.lit(0.3)).otherwise(F.lit(0.0))
    return length_ok + stop_ok + noise_ok


def lang_stopword_hits(text: Column | str, lang: str) -> Column:
    """Distinct stopwords of `lang` present in the text. array_intersect is a
    plain codegen'd expression -- unlike a filter() lambda it does not blow up
    the expression tree when referenced repeatedly (greatest + CASE arms),
    which made the first lang_id implementation ~50x slower."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens(F.lower(c))), words))


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language-ID heuristic: pick the language with the most
    distinct stopword hits; CJK-range characters short-circuit to 'zh'.
    Ties break by fixed language order (en, es, fr, de)."""
    c = F.col(text) if isinstance(text, str) else text
    cjk = F.regexp_count(c, F.lit(r"[一-鿿]"))
    scores = [(lang, lang_stopword_hits(c, lang)) for lang in ("en", "es", "fr", "de")]
    best = F.greatest(*[s for _, s in scores])
    guess = F.lit("unknown")
    for lang, s in reversed(scores):
        guess = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(guess)
    return F.when(cjk > 0, F.lit("zh")).otherwise(guess)


# PII patterns, restricted to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no lookaround, ASCII classes, \b word
# boundaries. Masking order is fixed (email, then IPv4, then phone) so both
# engines rewrite identically.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_PATTERN = r"\b[0-9]{3}-[0-9]{4}\b"

_PII_RULES = (
    (EMAIL_PATTERN, "<EMAIL>"),
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-type PII match counts (pre-masking, on the raw text)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_PATTERN)),
        "n_ips": F.regexp_count(c, F.lit(IPV4_PATTERN)),
        "n_phones": F.regexp_count(c, F.lit(PHONE_PATTERN)),
    }


def pii_mask(text: Column | str) -> Column:
    """Redact PII in a fixed rule order -- the scrubbing pass a training-data
    pipeline runs before anything is retained."""
    c = F.col(text) if isinstance(text, str) else text
    for pattern, token in _PII_RULES:
        c = F.regexp_replace(c, pattern, token)
    return c


def bigrams(text: Column | str) -> Column:
    """Adjacent-token bigram array; see bigrams_of_tokens."""
    return bigrams_of_tokens(tokens(text))


def fingerprint(text: Column | str) -> Column:
    """Normalization fingerprint: lower-case, collapse whitespace, md5.
    The exact-dedup key used before any fuzzy stage."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(normalized)


def rolling_hash_fingerprint(text: Column | str, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: md5 over every `window`-token
    shingle, keep the lexicographic minimum. Robust to local edits (the
    min-shingle survives unless the edit touches it)."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - window)
    shingles = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window)))
    )
    return F.when(n >= window, F.array_min(shingles)).otherwise(F.md5(F.concat_ws(" ", toks)))
