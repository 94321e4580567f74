"""Text analysis: tokenization, quality scoring, language ID, fingerprints.

All expressions are built-in (split/filter/transform/aggregate/regexp) —
JVM-side, Arrow-free, codegen-friendly. At 100 TB these run as a single
projection over the scan: no shuffle, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.functions.numeric import stable_round

STOPWORDS = ("the", "a", "of", "and", "to", "in")

#: BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens, empty strings removed."""
    return F.filter(F.split(text, " "), lambda x: x != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)."""
    return F.regexp_count(F.lower(text), F.lit(BPE_ISH_PATTERN))


def quality_columns(text: Column) -> list[Column]:
    """Length/stopword/char-class quality signals + a combined score.

    The score formula is arbitrary but deterministic; what matters is the
    operator shape: pure per-row expressions over the scan.
    """
    toks = tokens(text)
    n = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    stop_cnt = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    nd = n.cast("double")
    avg_token_len = stable_round(sum_len / nd, 2)
    stopword_ratio = stable_round(stop_cnt / nd, 3)
    alnum_ratio = stable_round(
        F.length(F.regexp_replace(F.lower(text), r"[^a-z0-9]", ""))
        / F.length(text).cast("double"),
        3,
    )
    score = stable_round(
        F.least(nd / 100.0, F.lit(1.0)) * 0.5
        + stopword_ratio * 0.3
        + alnum_ratio * 0.2,
        4,
    )
    return [
        n.alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        stopword_ratio.alias("stopword_ratio"),
        alnum_ratio.alias("alnum_ratio"),
        score.alias("quality_score"),
    ]


#: marker-word table for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("und", "der", "die", "das"),
    "fr": ("le", "la", "les", "et"),
    "es": ("el", "los", "las", "una"),
}


def lang_id(text: Column) -> Column:
    """Pick the language with the most marker-word hits; ties broken by
    the fixed en>de>fr>es order; no hits -> 'und'."""
    toks = tokens(F.lower(text))
    scores = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*marks)))
        for lang, marks in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            out
        )
    return out


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def fingerprint128(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text."""
    return F.md5(normalized_text(text))


def fingerprint64(text: Column) -> Column:
    """64-bit-ish fingerprint: first 8 hex chars of md5 as a bigint —
    cheap join key for exact-dup clustering."""
    return F.conv(F.substring(fingerprint128(text), 1, 8), 16, 10).cast("bigint")
