"""Distributed BPE vocabulary induction (tokenizer training).

The classic byte-pair-encoding merge learner (Sennrich-style, over the
word-type histogram): start from character symbols, repeatedly find the
most frequent adjacent symbol pair and fuse it, emitting the merge
table a tokenizer ships. This is the "train the tokenizer on the
corpus" step of a training-data pipeline — the one corpus-scale pass is
the word-frequency histogram (one groupBy over all tokens); every merge
round then works on the word-TYPE table, which is vocabulary-sized
(millions of rows at 100 TB, still distributed, never driver-side).

Spark-first iteration, the pagerank/connected-components discipline:

- NO driver-side collect anywhere. Each round's winning pair is a
  1-row DataFrame cross-joined (broadcast) back into the symbol table —
  the argmax stays on the cluster.
- The winner is made TOTAL by unioning a sentinel pair with count -1
  before the top-1: if a degenerate corpus exhausts its pairs early,
  the sentinel "wins", matches nothing (NUL bytes can't appear in a
  symbol), and the fixpoint just idles — no empty-frame collapse, no
  driver branch. Sentinel rounds are filtered from the output.
- ``localCheckpoint(eager=True)`` per round cuts the exponentially
  nesting lineage (12 rounds of fold-within-crossjoin would otherwise
  blow plan compilation long before data is the problem).
- The in-word merge is a sequential left-to-right greedy fold —
  inherently per-row work, expressed with ``F.aggregate`` over the
  symbol array (codegen'd HOF, no Python, no UDF).

Determinism: integer counts, ties broken by (pair_a, pair_b)
lexicographically — a pure function of the corpus token multiset,
independent of partitioning and scheduling (pinned by tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.llm.textstats import tokens

#: end-of-word marker symbol (standard BPE: lets merges learn suffixes
#: without bleeding across word boundaries)
WORD_END = "</w>"

_SENTINEL = "\x00"


def _merge_adjacent(syms: Column, a: Column, b: Column) -> Column:
    """Greedy left-to-right fuse of every non-overlapping (a, b)
    adjacency in ``syms`` — ``aaa`` under pair (a,a) becomes
    ``[aa, a]``, exactly the scan a sequential BPE trainer does.
    Fold state: (out array, one pending symbol)."""
    nul = F.lit(None).cast("string")
    init = F.struct(
        F.array().cast("array<string>").alias("out"), nul.alias("pend")
    )

    def step(acc: Column, s: Column) -> Column:
        fused = F.struct(
            F.concat(acc["out"], F.array(F.concat(a, b))).alias("out"),
            nul.alias("pend"),
        )
        carried = F.struct(
            F.when(
                acc["pend"].isNotNull(), F.concat(acc["out"], F.array(acc["pend"]))
            )
            .otherwise(acc["out"])
            .alias("out"),
            s.alias("pend"),
        )
        return F.when(
            acc["pend"].isNotNull() & (acc["pend"] == a) & (s == b), fused
        ).otherwise(carried)

    def finish(acc: Column) -> Column:
        return F.when(
            acc["pend"].isNotNull(), F.concat(acc["out"], F.array(acc["pend"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, init, step, finish)


def _pair_counts(
    words: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """(pair_a, pair_b, pair_count) over adjacent symbol positions,
    weighted by word frequency. Counts positions (``aaa`` contributes
    (a,a) twice) — the Sennrich convention; overlap resolution happens
    at merge time, not count time.

    ``num_partitions`` bounds the aggregation shuffle PER-PLAN: an
    explicit ``repartition(p, keys)`` whose exchange already satisfies
    the groupBy's clustered-distribution requirement, so EnsureRequirements
    adds no second exchange and the agg runs at exactly ``p`` tasks —
    without touching the session-global ``spark.sql.shuffle.partitions``
    (which a concurrent query on the shared session would silently
    inherit; the round-9 ADVICE item).

    Known trade (round-10 review): because the user exchange sits
    BELOW the aggregate, Catalyst plans no partial agg under it — the
    exchange ships raw (pair, n) position rows instead of
    map-side-combined partial counts. Acceptable here because the rows
    come from the word-TYPE histogram, not the corpus: total volume is
    sum(len(word)-1) over DISTINCT words (~vocab x avg word length
    narrow rows), and ``p`` is sized at ~50k types/partition, so the
    per-task shuffle stays ~10 MB however large the corpus; the
    map-side combine the old session-conf form got was a constant-
    factor saving on an already vocabulary-bounded exchange."""
    # guard the fully-merged single-symbol word: sequence(1, 0) would
    # DESCEND in Spark (the x42 lesson) and index past the array
    adj = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("a"),
                F.element_at("syms", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    pairs = words.select("n", F.explode(adj).alias("p")).select(
        F.col("p.a").alias("pair_a"), F.col("p.b").alias("pair_b"), "n"
    )
    if num_partitions:
        pairs = pairs.repartition(num_partitions, "pair_a", "pair_b")
    return pairs.groupBy("pair_a", "pair_b").agg(
        F.sum("n").alias("pair_count")
    )


def bpe_merges(
    docs: DataFrame,
    *,
    text_col: str = "text",
    rounds: int = 12,
) -> DataFrame:
    """Learn ``rounds`` BPE merges; returns (rank, pair_a, pair_b,
    merged, pair_count) — the ordered merge table, one row per real
    merge (degenerate sentinel rounds are filtered out)."""
    if rounds < 1:
        # fail BEFORE paying the corpus scan (round-13 review: rounds=0
        # crashed with IndexError after the histogram jobs already ran)
        raise ValueError(f"bpe_merges needs rounds >= 1, got {rounds!r}")
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        # zero-merge symbol split via the ONE shared fold expression
        # (round-13 review: this inlined the same split+end-marker
        # concat _word_syms_expr exists to centralize)
        .select("n", _word_syms_expr([]).alias("syms"))
        .localCheckpoint(eager=True)
    )
    # Size the ITERATION's partition count to the word-TYPE table, not
    # the corpus: AQE's parallelism-first coalescing keeps ~32 shuffle
    # partitions however small the vocabulary is, so every one of the
    # 12 rounds' checkpoint/argmax stages would run ~33 near-empty
    # tasks — pure scheduling overhead that dominates the trainer's
    # wall clock at bench scale. The histogram is already materialized,
    # so the count is a cached-read job; ~50k word types per partition
    # keeps millions-of-types corpora distributed (the 100 TB posture)
    # while a toy vocabulary iterates in one task. coalesce() is
    # narrow — no extra shuffle.
    sess = words.sparkSession
    n_types = words.count()
    parallelism = sess.sparkContext.defaultParallelism
    p = max(1, min(parallelism, n_types // 50_000 + 1))
    words = words.coalesce(p)
    sentinel = sess.createDataFrame(
        [(_SENTINEL, _SENTINEL, -1)], "pair_a string, pair_b string, pair_count long"
    )
    merge_rows: list[DataFrame] = []
    # the shuffle-partition bound is scoped PER-PLAN (an explicit
    # repartition(p, keys) inside _pair_counts whose exchange already
    # satisfies the groupBy's distribution requirement — no second
    # exchange): every shuffle in the loop is over vocabulary-sized
    # data, and the session-wide 32-partition floor would make each of
    # the ~2xrounds round jobs a ~33-task stage of near-empty tasks.
    # Nothing session-global is mutated, so concurrent queries on the
    # shared session — including this repo's own foreachBatch sinks —
    # keep their own shuffle width (round-9 ADVICE). The orderBy+limit
    # argmax plans as TakeOrdered (no full-sort shuffle) and the fuse
    # crossJoin is broadcast, so _pair_counts holds the loop's only
    # width-sensitive exchange.
    for r in range(1, rounds + 1):
        top = (
            _pair_counts(words, num_partitions=p)
            .unionByName(sentinel)
            .orderBy(
                F.desc("pair_count"), F.asc("pair_a"), F.asc("pair_b")
            )
            .limit(1)
            .localCheckpoint(eager=True)
        )
        merge_rows.append(top.select(F.lit(r).alias("rank"), "*"))
        if r == rounds:
            # the final round's fuse has no reader — skip it
            # (one fold + one checkpoint job saved per call)
            break
        words = (
            words.crossJoin(F.broadcast(top))
            .select(
                "n",
                _merge_adjacent(
                    F.col("syms"), F.col("pair_a"), F.col("pair_b")
                ).alias("syms"),
            )
            .localCheckpoint(eager=True)
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out.filter(F.col("pair_count") > 0).select(
        "rank",
        "pair_a",
        "pair_b",
        F.concat("pair_a", "pair_b").alias("merged"),
        "pair_count",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per document, the BPE
    symbol count and word count — the "tokenize with the shipped
    vocab" half of the pair. ``merges`` is an ORDERED list of
    (pair_a, pair_b) applied in rank order as the same greedy
    left-to-right fold as training, but the fold runs once per word
    TYPE and per-document totals come from a (doc, word)-grain count
    joined to the type table — the Sennrich-trainer caching trick. At
    corpus scale this trades the per-occurrence fold (rounds x corpus
    tokens of codegen'd scan work) for one narrow (doc_id, w, n)
    shuffle plus a vocab-sized fold; Zipf-hot words are map-side
    combined before they move. The type table derives from the SAME
    (doc, word) aggregate — one corpus scan and one corpus-grain
    shuffle total, not a second independent explode."""
    per_doc_word = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    types = (
        per_doc_word.select("w")
        .distinct()
        .select("w", F.size(_word_syms_expr(merges)).alias("n_syms"))
    )
    totals = (
        per_doc_word.join(types, "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n_occ") * F.col("n_syms"))
            .cast("bigint")
            .alias("n_bpe_symbols"),
            F.sum("n_occ").cast("bigint").alias("n_words"),
        )
    )
    # keep zero-token documents (round-13 review): explode emits no
    # rows for an empty/whitespace/NULL text, so the totals silently
    # LOST those doc_ids — a downstream join back onto the corpus
    # undercounted with no error. They tokenize to (0, 0), say so.
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(totals, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bpe_symbols", F.lit(0))
            .cast("bigint")
            .alias("n_bpe_symbols"),
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        )
    )


def _word_syms_expr(merges: list[tuple[str, str]]) -> Column:
    """The per-word-TYPE encode expression: split column ``w`` into
    character symbols + end marker, then apply ``merges`` in rank
    order as literal greedy folds. Shared by every type-grain encode
    consumer so the fold exists in exactly one place."""
    syms = F.concat(
        F.filter(F.split(F.col("w"), "(?!^)"), lambda x: x != F.lit("")),
        F.array(F.lit(WORD_END)),
    )
    for a, b in merges:
        syms = _merge_adjacent(syms, F.lit(a), F.lit(b))
    return syms


def _encoded_word_types(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
) -> DataFrame:
    """(w, n, syms) — one row per word TYPE with its corpus occurrence
    count and the BPE symbol array after applying ``merges`` in rank
    order. The encode core under :func:`bpe_symbol_topk` (corpus
    histogram): running the greedy fold once per distinct word instead
    of once per occurrence is exactly the word-histogram caching a
    sequential BPE trainer does, and at 100 TB it turns the encode
    from corpus-sized fold compute into one token groupBy plus
    vocabulary-sized compute."""
    types = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return types.select("w", "n", _word_syms_expr(merges).alias("syms"))


def bpe_symbol_topk(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Top-k corpus symbol histogram AFTER encoding: (symbol, n) —
    the vocabulary-usage profile a tokenizer report shows. The encode
    fold runs once per word TYPE with the occurrence count as the
    histogram weight (identical counts to the per-occurrence form:
    every occurrence of a word contributes its type's symbols once),
    so past the token groupBy everything is vocabulary-sized. Readback
    is one explode + one hash aggregate + a TakeOrderedAndProject head
    via operators.top_k (count DESC, symbol ASC: integer counts +
    unique symbols = a total order, engine-stable — and no global
    window, which the plan audit would rightly flag)."""
    from insect_observation_data_pipeline_spark.operators.topk import top_k

    hist = (
        _encoded_word_types(docs, merges, text_col=text_col)
        .select("n", F.explode("syms").alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    return top_k(hist, [F.col("n").desc(), F.col("symbol").asc()], k)
