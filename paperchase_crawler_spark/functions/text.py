"""Text-analysis column builders for training-data pipelines.

Everything here is pure Catalyst column algebra (JVM-side, whole-stage
codegen; zero Python in the hot path), designed so an identical ANSI-SQL
formulation exists for the DuckDB oracle. Operators: token counting
(whitespace + BPE-ish regex), quality scoring (length/punct/stopword ratios),
language ID (stopword-hit heuristic), document fingerprinting (min-hash over
word k-grams using an md5-derived 60-bit integer, portable across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed stopword sets per language for the lang-id heuristic. The testdata
# corpus is synthetic; what matters is that the Spark and SQL formulations
# are identical functions of the text.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ich", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en"],
    "it": ["il", "la", "gli", "e", "è", "un", "una", "di"],
}

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[.,!?;:]"


def words(text: Column) -> Column:
    """Whitespace tokenization (single-space split; testdata is single-spaced)."""
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, PUNCT_PATTERN, "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.length(text)


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda w: F.array_contains(sw, F.lower(w))))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_hits(text, lang).cast("double") / token_count_ws(text)


def avg_token_len(text: Column) -> Column:
    return (
        F.aggregate(words(text), F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        .cast("double")
        / token_count_ws(text)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality heuristic: longer docs, low punctuation,
    healthy stopword density score higher. Deterministic column algebra."""
    length_term = F.least(F.lit(1.0), token_count_ws(text).cast("double") / F.lit(64.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(text) * 10.0)
    stop_term = F.least(F.lit(1.0), stopword_ratio(text, "en") * 5.0)
    return (length_term + punct_term + stop_term) / F.lit(3.0)


def langid(text: Column) -> Column:
    """Argmax over per-language stopword hit counts; ties broken by the fixed
    language order en,de,fr,es,it; zero hits everywhere → 'und'."""
    langs = list(STOPWORDS)
    hits = [stopword_hits(text, lg) for lg in langs]
    best = hits[0]
    for h in hits[1:]:
        best = F.greatest(best, h)
    out = F.lit("und")
    # reverse order so earlier languages win ties via later when() precedence
    for lg, h in zip(reversed(langs), reversed(hits)):
        out = F.when((h == best) & (best > 0), F.lit(lg)).otherwise(out)
    return out


def md5_int60(s: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5, base-16 →
    decimal. Identical in DuckDB: ``('0x' || substr(md5(s),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def word_kgrams(text: Column, k: int, distinct: bool = True) -> Column:
    """Array of word k-gram strings (space-joined), deduplicated by default.
    ``distinct=False`` skips the dedup pass for consumers whose reduction is
    duplicate-insensitive (min/minhash)."""
    w = words(text)
    n = F.size(w)
    if k <= 8:
        # unrolled element_at concat: identical string to concat_ws over
        # slice(w, i, k), but skips allocating a k-element array per gram
        # (the gram fan-out is the dominant per-row cost of the jaccard /
        # minhash / fingerprint family)
        def gram(i):
            return F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)])
    else:
        def gram(i):
            return F.concat_ws(" ", F.slice(w, i, k))

    grams = F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - (k - 1)), gram),
    ).otherwise(F.expr("array()").cast("array<string>"))
    return F.array_distinct(grams) if distinct else grams


def fingerprint(text: Column, k: int = 4) -> Column:
    """Document fingerprint: min md5-int over word k-grams (min-hash with a
    single hash function — the classic rolling-fingerprint reduction).
    min over the gram multiset == min over the distinct set, so the
    array_distinct pass (a hash set over every gram string) is skipped."""
    return F.array_min(F.transform(word_kgrams(text, k, distinct=False), md5_int60))
