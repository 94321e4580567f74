"""Text analysis: tokenization, quality scoring, language ID, fingerprints,
Unicode-normalization census.

All expressions are built-in (split/filter/transform/aggregate/regexp) —
JVM-side, Arrow-free, codegen-friendly. At 100 TB these run as a single
projection over the scan: no shuffle, no Python boundary. The ONE
exception is :func:`unicode_census`'s NFC check: Spark SQL has no
UAX#15 normalization function, so that single predicate crosses the
sanctioned Arrow boundary (``mapInPandas`` over stdlib ``unicodedata``,
the m2 pattern) while every other metric in the census stays JVM-side.
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
    # case-SENSITIVE by deliberate choice (round-13 review note): unlike
    # lang_id's markers (lowercased in round 12 so sentence-initial
    # 'The' votes), stopword_ratio measures raw-token density and its
    # DuckDB oracle mirrors this spelling exactly — changing either side
    # alone breaks x3/x18 parity, so the pair stays as-is by contract
    stop_cnt = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    # NULL-on-zero denominators (round-12 review): an empty or
    # whitespace-only doc has 0 tokens / 0 length, and under ANSI mode
    # — the DRIVER session's Spark 4 default, which get_spark does not
    # override — a bare 0/0 kills the job instead of yielding the NULL
    # ratios these signals mean ("no measurable tokens"). The when()
    # guard is the engine-portable NULLIF.
    nd = F.when(n > 0, n.cast("double"))
    tl = F.when(F.length(text) > 0, F.length(text).cast("double"))
    avg_token_len = stable_round(sum_len / nd, 2)
    stopword_ratio = stable_round(stop_cnt / nd, 3)
    alnum_ratio = stable_round(
        F.length(F.regexp_replace(F.lower(text), r"[^a-z0-9]", "")) / tl,
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
    """60-bit fingerprint: first 15 hex chars of md5 as a bigint —
    cheap join key for exact-dup clustering. 15 hex digits (round-13
    review: the old 8 gave only 32 bits, where a 100k-doc corpus
    already has >50% birthday-collision odds) is the widest md5 prefix
    that always fits a SIGNED bigint."""
    return F.conv(F.substring(fingerprint128(text), 1, 15), 16, 10).cast("bigint")


def unicode_census(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Unicode-hygiene census per ``group_col``: how much of the corpus
    a normalization pass would actually touch — the audit a real
    pipeline runs BEFORE deciding whether to pay for a full NFC/casefold
    rewrite of 100 TB of text.

    Per group: document count, docs NOT in NFC form (composed
    normalization per UAX#15 would change them), docs lowercasing would
    change, docs containing non-ASCII (UTF-8 bytes != chars — exact,
    no regex), and total chars vs bytes (the width profile; ASCII text
    has ratio 1, CJK ~3).

    Execution shape: ONE documents scan -> JVM projection for every
    metric except the NFC predicate, which crosses the sanctioned
    Arrow boundary once (``mapInPandas`` + stdlib ``unicodedata`` —
    Spark SQL has no UAX#15 function; ``is_normalized`` is the
    quick-check form that avoids materializing the normalized string),
    then one partial-aggregated groupBy on a tiny group domain. The
    oracle is DuckDB's ``nfc_normalize`` — two independent UAX#15
    implementations agreeing on the census.

    NULL text rows are counted in ``n_docs`` but in no change-flag (a
    rewrite pass would not touch them)."""
    per_doc = docs.select(
        F.col(group_col).alias("grp"),
        F.col(text_col).alias("__t"),
        (F.lower(F.col(text_col)) != F.col(text_col))
        .cast("int")
        .alias("casefold_changed"),
        (F.octet_length(F.col(text_col)) != F.length(F.col(text_col)))
        .cast("int")
        .alias("has_nonascii"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )

    # derive the group field's type from the input (round-13 review: a
    # hardcoded 'grp string' broke group_col on non-string columns at
    # the Arrow boundary)
    grp_type = per_doc.schema["grp"].dataType.simpleString()
    out_schema = (
        f"grp {grp_type}, casefold_changed int, has_nonascii int, "
        "n_chars int, n_bytes int, nfc_changed int"
    )

    def add_nfc(batches):
        import unicodedata

        for pdf in batches:
            pdf = pdf.copy()
            pdf["nfc_changed"] = [
                0
                if (not isinstance(t, str)) or unicodedata.is_normalized("NFC", t)
                else 1
                for t in pdf["__t"]
            ]
            yield pdf.drop(columns=["__t"])

    flagged = per_doc.mapInPandas(add_nfc, out_schema)
    return (
        flagged.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("nfc_changed"), F.lit(0))
            .cast("bigint")
            .alias("n_nfc_changed"),
            F.coalesce(F.sum("casefold_changed"), F.lit(0))
            .cast("bigint")
            .alias("n_casefold_changed"),
            F.coalesce(F.sum("has_nonascii"), F.lit(0))
            .cast("bigint")
            .alias("n_nonascii"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("sum_chars"),
            F.coalesce(F.sum("n_bytes"), F.lit(0)).cast("bigint").alias("sum_bytes"),
        )
        # NULLS LAST to match the DuckDB oracle's ASC default (round-13
        # review: Spark's bare asc is NULLS FIRST — a NULL group row
        # would order-diverge between the engines)
        .orderBy(F.asc_nulls_last(group_col))
    )


def langid_confusion(
    docs: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Corpus-level evaluation readback for :func:`lang_id`: the
    (labeled lang, predicted lang) confusion matrix with document
    counts — the aggregate quality report a pipeline publishes after a
    language-ID pass (x3 carries the per-document grain; this is the
    corpus grain). Pure JVM expressions over one scan + one tiny-domain
    hash aggregate."""
    pred = lang_id(F.col(text_col))
    return (
        docs.select(F.col(label_col).alias("lang"), pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        # NULLS LAST: match DuckDB's ASC default (see unicode_census)
        .orderBy(F.asc_nulls_last("lang"), F.asc_nulls_last("pred_lang"))
    )
