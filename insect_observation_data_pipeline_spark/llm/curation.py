"""Corpus-curation operators: deterministic sampling, sequence packing,
PII redaction.

These are the pre-training data-prep steps that sit between dedup and
tokenization in a 100 TB pipeline. All three are single-projection or
single-window operators — no Python boundary, no extra shuffle beyond
the one the semantics require:

- ``stratified_hash_sample``: per-stratum downsampling by a
  deterministic hash of the row key (md5-based, engine-portable — the
  same idiom as ``textstats.fingerprint64``). Hash-mod sampling is THE
  scale-correct sampling primitive: re-runs select identical rows (no
  rand() seed coordination across executors), joins against a sampled
  table stay consistent, and rates are exact-in-expectation per
  stratum. One filter over the scan, no shuffle.
- ``pack_sequences``: contiguous token packing — order docs
  deterministically within each stratum, running-total their token
  counts, and cut packs at budget multiples (a doc belongs to the pack
  where its start offset lands). This is the distributed form of
  training sequence packing: one window shuffle per stratum, fully
  expressible in SQL (the exact first-fit greedy variant is a stateful
  scan; at scale the cumsum cut is the standard trade and its pack
  fill is within one doc of budget).
- ``redact_text``: URL / email / long-digit-run redaction via
  sequential regexp_replace — pure projection, replace-all semantics
  on both Spark and the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.cache import tag_intermediates


def hash_bucket(key: Column, buckets: int) -> Column:
    """Deterministic uniform bucket in [0, buckets) from md5 of the
    stringified key — portable bit-for-bit to any engine with md5."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def shard_assign(df: DataFrame, *, key_col: str, n_shards: int) -> DataFrame:
    """Attach a deterministic shard id: ``pmod(xxhash64(key), n)``.

    Content-addressed, not placement-addressed: a row's shard depends
    only on its key, never on cluster size, input partitioning, or task
    scheduling — so re-running the job, growing the cluster 10x, or
    resharding an incremental delta all assign identical shards. That is
    the property training dataloaders need (shard k is the same bytes on
    every rebuild) and what ``repartition(n)`` round-robin cannot give.
    """
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    n_shards: int,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write the corpus as ``n_shards`` balanced, deterministic shards.

    ``repartition(n, shard)`` then ``partitionBy(shard)``: every shard's
    rows land in one task, so each ``shard=k/`` directory holds exactly
    one file, sized ~|df|/n by xxhash64 uniformity (skew here is hash
    skew, i.e. none — unlike key-range sharding). ``sort_by`` orders
    rows inside each shard file (deterministic iteration order for the
    dataloader; better parquet stat locality). One shuffle total; at
    100 TB pick n so each shard is a few hundred MB — the dataloader's
    unit of parallel read."""
    out = shard_assign(df, key_col=key_col, n_shards=n_shards).repartition(
        n_shards, "shard"
    )
    out = out.sortWithinPartitions("shard", *sort_by) if sort_by else out
    out.write.partitionBy("shard").mode(mode).parquet(path)


def stratified_hash_sample(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    rates: dict[str, int],
    default_rate: int = 100,
    buckets: int = 100,
) -> DataFrame:
    """Keep a row iff its key's hash bucket < its stratum's rate (out of
    ``buckets``) — e.g. ``rates={'en': 25}`` keeps ~25% of English docs
    and ``default_rate`` percent of everything else. Corpus rebalancing
    (downsample the dominant language/source) as one scan-time filter."""
    rate = F.lit(default_rate)
    for stratum, pct in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(F.col(key_col), buckets) < rate)


def pack_sequences(
    df: DataFrame,
    *,
    token_col: str,
    budget: int,
    strata_col: str | None = None,
    order_col: str = "doc_id",
    range_bucket_width: int | None = None,
) -> DataFrame:
    """Assign each doc a pack_id: docs are laid out contiguously in
    ``order_col`` order (within ``strata_col`` if given) and a new pack
    starts at every ``budget`` token boundary; a doc joins the pack
    where its start offset lands. Adds ``pack_id`` and ``pack_offset``
    (the doc's token start within its stratum's layout).

    A per-stratum running total is a per-stratum TOTAL ORDER: the plain
    window form funnels each stratum through one task — fine for many
    small strata, a wall at 100 TB with a handful of languages.
    ``range_bucket_width`` switches to the distributed prefix-sum
    shape: (1) bucket rows by ``floor(order_col / width)`` — ordered,
    deterministic, no data pass; (2) per-(stratum, bucket) local
    cumsums run in parallel; (3) per-stratum bucket offsets come from a
    window over the TINY per-bucket totals frame (rows = buckets, not
    docs); (4) offset = bucket offset + local cumsum. Identical output
    to the naive form (same additions in the same order within a
    stratum — integer math, no float drift)."""
    part = [strata_col] if strata_col else []
    tok = F.col(token_col)
    in_cols = list(df.columns)
    if range_bucket_width is None:
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col(order_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        offset = (F.sum(tok).over(w) - tok).cast("bigint")
    else:
        from pyspark.sql.types import NumericType

        odt = df.schema[order_col].dataType
        if not isinstance(odt, NumericType):
            raise ValueError(
                f"range_bucket_width requires a numeric order_col, got "
                f"{order_col!r}: {odt.simpleString()} — buckets come from "
                f"floor({order_col}/width), whose NUMERIC ordering diverges "
                "from the naive window's lexicographic ordering on strings "
                "('99' sorts after '150' but buckets before it), silently "
                "producing different pack assignments (round-14 review)"
            )
        bucket = F.floor(F.col(order_col) / F.lit(range_bucket_width)).alias(
            "__bucket"
        )
        df = df.withColumn("__bucket", bucket)
        w_local = (
            Window.partitionBy(*part, "__bucket")
            .orderBy(F.col(order_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        totals = df.groupBy(*part, "__bucket").agg(
            F.sum(tok).cast("bigint").alias("__bucket_total")
        )
        w_bucket = (
            Window.partitionBy(*part)
            .orderBy(F.col("__bucket").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        offsets = totals.select(
            *part,
            "__bucket",
            (F.sum("__bucket_total").over(w_bucket) - F.col("__bucket_total"))
            .alias("__bucket_offset"),
        )
        # NULL-SAFE join keys (round-12 review): a NULL stratum or a
        # NULL order_col (floor(NULL/width) = NULL bucket; non-numeric
        # columns are rejected above)
        # flows through the naive window path (NULLS FIRST) but a plain
        # equi-join would silently drop it here, breaking the
        # "identical output to the naive form" guarantee with data
        # loss. The offsets frame is grouped from the same df, so the
        # NULL group exists on both sides; <=> matches it. Explicit
        # aliases: both sides share a lineage, so unqualified columns
        # are ambiguous to the analyzer.
        left, offs = df.alias("__pack_l"), offsets.alias("__pack_r")
        cond = F.lit(True)
        for c in [*part, "__bucket"]:
            cond = cond & F.col(f"__pack_l.{c}").eqNullSafe(
                F.col(f"__pack_r.{c}")
            )
        df = left.join(F.broadcast(offs), cond).select(
            "__pack_l.*", F.col("__pack_r.__bucket_offset")
        )
        offset = (
            F.col("__bucket_offset") + F.sum(tok).over(w_local) - tok
        ).cast("bigint")
    return df.select(
        *in_cols,
        offset.alias("pack_offset"),
        F.floor(offset / F.lit(budget)).cast("bigint").alias("pack_id"),
    )


def token_repetition(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Gopher-style per-doc repetition signals: how much of a document is
    the same token over and over (boilerplate, scraped nav bars, SEO spam
    — the classic pre-training junk signature).

    Per doc: ``n_tokens``, ``n_distinct``, ``top_token_n`` (occurrences
    of the most frequent token), ``distinct_frac`` = n_distinct/n_tokens,
    ``top_frac`` = top_token_n/n_tokens. Low distinct_frac or high
    top_frac flags the doc for the quality gate.

    Shape: explode tokens -> count per (doc, token) -> re-aggregate per
    doc. Two shuffles, both with map-side partial aggregation, both keyed
    on high-cardinality keys — no skew funnel, linear at 100 TB. Docs
    with zero tokens produce no row (nothing to measure).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit(""))
        ).alias("tok"),
    )
    per_tok = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("n"))
    from insect_observation_data_pipeline_spark.functions.numeric import stable_round

    agg = per_tok.groupBy(id_col).agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("top_token_n"),
    )
    nd = F.col("n_tokens").cast("double")
    return agg.select(
        id_col,
        "n_tokens",
        "n_distinct",
        "top_token_n",
        stable_round(F.col("n_distinct") / nd, round_digits).alias("distinct_frac"),
        stable_round(F.col("top_token_n") / nd, round_digits).alias("top_frac"),
    )


def token_prob_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Corpus-LM fluency score: each doc's mean unigram probability
    under the corpus's own token distribution, in ppm. Gibberish / rare-
    token junk scores low, natural running text high — the dependency-
    free stand-in for a KenLM perplexity gate.

    mean p = (sum over the doc's tokens of corpus_count(tok)) /
    (n_doc_tokens * corpus_total). Numerator and both denominator
    factors are exact INTEGER sums — the whole score is ONE float
    division, so it is bit-identical across engines and replays (the
    same no-libm trade as x17's ratio-idf: ln() would be prettier and
    platform-dependent). The n*ctf products and the n_tokens *
    corpus_total denominator are computed in DECIMAL(38,0), not
    BIGINT (round-12 review): at the advertised 100 TB posture a
    book-length doc times a ~2.5e13-token corpus total exceeds 2^63
    and ANSI mode would kill the job (legacy mode: silent negative
    scores). Decimal keeps the sums exact and order-independent —
    casting each factor to double instead would trade the determinism
    claim away.

    Shape: explode once; corpus term counts DERIVE from the per-doc tf
    aggregate (rows = distinct (doc, term)), so Catalyst reuses one
    exchange for both the corpus side and the doc side; the corpus
    total rides in as a broadcast 1-row frame. Token-keyed join with
    map-side combine — linear at 100 TB.
    """
    from insect_observation_data_pipeline_spark.functions.numeric import stable_round

    terms = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit(""))
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("n"))
    ctf = tf.groupBy("term").agg(F.sum("n").alias("ctf"))
    total = ctf.agg(F.sum("ctf").alias("corpus_total"))
    return (
        tf.join(ctf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(
                F.col("n").cast("decimal(19,0)")
                * F.col("ctf").cast("decimal(19,0)")
            ).alias("mass"),
            F.first("corpus_total").alias("corpus_total"),
        )
        .select(
            id_col,
            "n_tokens",
            stable_round(
                F.lit(1_000_000.0)
                * F.col("mass").cast("double")
                / (
                    F.col("n_tokens").cast("decimal(19,0)")
                    * F.col("corpus_total").cast("decimal(19,0)")
                ).cast("double"),
                round_digits,
            ).alias("mean_tok_ppm"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Bigram-LM fluency score (the CCNet/KenLM-style perplexity gate,
    one context order up from :func:`token_prob_score`'s unigram
    stand-in): train an add-k-smoothed bigram model ON THE CORPUS
    ITSELF, then score each doc by its mean per-bigram negative log
    likelihood (nats/bigram — the perplexity exponent). Word-salad
    junk whose tokens are individually common but never co-occur
    scores high (bad); natural running text scores low.

        p(v|u) = (c(u,v) + k) / (c(u) + k*V)

    with c(u) = count of u AS A CONTEXT (= sum_v c(u,v)) and V = the
    distinct tokens observed in bigram positions — both derived from
    the bigram relation so the model is self-consistent (sums of p
    over the V continuations of u are exactly 1).

    Spark-first shape, linear at 100 TB: bigrams come from ONE
    JVM-side transform over the token array (no self-join, no window);
    the per-(doc,bigram) multiplicity aggregate is the only
    corpus-sized shuffle, and everything model-sized (bigram counts,
    context counts, vocabulary) derives from it — Catalyst reuses that
    exchange, and the scoring join keys the distinct doc-bigram rows
    against the model on (u, v) with map-side combine. The ln() is the
    one libm call (the pagerank float-determinism precedent: both
    engines run IEEE doubles and differ only in summation order,
    absorbed by stable_round at ``round_digits``); everything inside
    it is a ratio of exact BIGINT counts.

    Docs with < 2 tokens carry no bigram evidence: n_bigrams = 0,
    avg_nll = NULL (left join back to the full doc set).
    """
    from insect_observation_data_pipeline_spark.functions.numeric import stable_round

    tk = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")
    )
    # the tokenize + bigram-struct transform + explode below is the
    # corpus-sized map stage; spread a single-split input first so it
    # doesn't serialize on one task (round 16, the doc_shingles idiom)
    from insect_observation_data_pipeline_spark.llm.dedup import spread_input

    pairs = spread_input(df).select(F.col(id_col), tk.alias("__tk")).filter(
        F.size("__tk") >= 2
    )
    bg = pairs.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(__tk) - 1), "
                "i -> struct(__tk[i-1] AS u, __tk[i] AS v))"
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.u").alias("u"), F.col("__bg.v").alias("v"))
    # dbg feeds the model (cbg -> cu/vocab/p) AND the scoring join;
    # cbg feeds three derivations. Without persists Catalyst re-derives
    # each from its own corpus scan (observed: 6 FileScans) — the x34b
    # tf lesson. Memory contract as operators/graph.py: released by
    # clearCache in multi-query harnesses.
    from pyspark import StorageLevel

    dbg = (
        bg.groupBy(id_col, "u", "v")
        .agg(F.count(F.lit(1)).alias("m"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cbg = (
        dbg.groupBy("u", "v")
        .agg(F.sum("m").alias("cuv"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cu = cbg.groupBy("u").agg(F.sum("cuv").alias("cu"))
    vocab = (
        cbg.select(F.col("u").alias("tok"))
        .union(cbg.select(F.col("v").alias("tok")))
        .agg(F.count_distinct("tok").alias("vsize"))
    )
    p = (
        cbg.join(cu, "u")
        .crossJoin(F.broadcast(vocab))
        .select(
            "u",
            "v",
            (
                (F.col("cuv") + F.lit(k))
                / (F.col("cu") + F.lit(k) * F.col("vsize")).cast("double")
            ).alias("p"),
        )
    )
    scored = (
        dbg.join(p, ["u", "v"])
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            (F.sum(F.col("m") * -F.log("p")) / F.sum("m")).alias("__nll"),
        )
    )
    out = (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            stable_round(F.col("__nll"), round_digits).alias("avg_nll"),
        )
    )
    return tag_intermediates(out, (dbg, cbg))


def temperature_mix(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    buckets: int = 100,
) -> DataFrame:
    """Temperature-flattened corpus mixing: downsample each stratum
    (language / source) toward a sqrt-scaled share, the multilingual-
    training rebalance that keeps tail languages while shrinking the head.

    Per-stratum keep rate (as a percent) is ``max(1, round(buckets *
    sqrt(n_stratum / n_max)))`` — the largest stratum keeps everything,
    a stratum 1% its size keeps ~10%. Only the alpha=0.5 temperature is
    offered because ``sqrt`` is IEEE correctly-rounded and therefore
    bit-identical across engines; an arbitrary ``pow(x, alpha)`` is
    libm-dependent and would poison deterministic-replay comparisons.

    Shape: one tiny count aggregate (rows = strata) broadcast back onto
    the scan, then the same deterministic md5-bucket filter as
    ``stratified_hash_sample``. Adds ``rate_pct``.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    n_max = counts.agg(F.max("__n").alias("__n_max"))
    from insect_observation_data_pipeline_spark.functions.numeric import stable_round

    rates = counts.crossJoin(F.broadcast(n_max)).select(
        strata_col,
        F.greatest(
            F.lit(1),
            stable_round(
                F.lit(float(buckets))
                * F.sqrt(F.col("__n").cast("double") / F.col("__n_max")),
                0,
            ).cast("int"),
        ).alias("rate_pct"),
    )
    # NULL-SAFE stratum join (round-12 review): counts/rates treat a
    # NULL stratum as its own group, but a plain equi-join would then
    # silently drop every NULL-stratum row regardless of its hash
    # bucket — stratified_hash_sample keeps NULL strata (default_rate),
    # so this sampler keeps them too, at their own sqrt-scaled rate.
    left, r = df.alias("__mix_l"), rates.alias("__mix_r")
    return (
        left.join(
            F.broadcast(r),
            F.col(f"__mix_l.{strata_col}").eqNullSafe(
                F.col(f"__mix_r.{strata_col}")
            ),
        )
        .select("__mix_l.*", F.col("__mix_r.rate_pct"))
        .filter(hash_bucket(F.col(key_col), buckets) < F.col("rate_pct"))
    )


#: redaction patterns, applied IN ORDER (URLs before emails before digit
#: runs, so an address inside a URL is already gone). Each pattern is
#: valid in both Java regex (Spark) and RE2 (DuckDB).
REDACTIONS: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{4,}", "<NUM>"),
)


def redact_text(text: Column) -> Column:
    """Sequentially replace every redaction pattern (all occurrences)."""
    out = text
    for pattern, token in REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def redaction_count(text: Column) -> Column:
    """How many redactions ``redact_text`` performs on ``text`` —
    counted on the same sequentially-rewritten intermediates so
    overlapping patterns are not double-counted."""
    out = text
    total = F.lit(0)
    for pattern, token in REDACTIONS:
        total = total + F.regexp_count(out, F.lit(pattern))
        out = F.regexp_replace(out, pattern, token)
    return total.cast("int")


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    key_col: str,
    k: int,
    seed: str = "ws0",
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the top-k
    rows by the Efraimidis–Spirakis exponential race — draw
    e_i = -ln(u_i) / w_i with u_i uniform in (0,1) and keep the k
    smallest. Inclusion probability of the first pick is exactly
    w_i / sum(w); the full k-subset follows successive
    weight-proportional draws. This is the quality-weighted corpus
    subsample of a training pipeline ("keep 10M docs, favor high
    quality score") — x14's hash-mod sampler is its unweighted,
    rate-based sibling.

    Determinism: u_i comes from the first 13 hex chars of
    md5(seed:key) mapped to (0,1) — a pure function of (seed, key),
    independent of partitioning, cluster size, or row order (the
    engine's x35/hash_bucket discipline), so REPLAYS on the same
    engine always select the same set. Across ENGINES, u_i is
    bit-identical but ln() is a libm call allowed to differ in the
    last ulp (Java Math.log is semi-monotonic, not correctly
    rounded), so the race value is rounded to 9 digits before ranking
    — the same k-boundary discipline as bm25_topk — and remaining
    grid-edge ulp flips are possible in principle but need the true
    value within one ulp of a 1e-9 grid line (round-12 review:
    previously this docstring overclaimed bit-for-bit cross-engine
    selection on the RAW race). Rows with weight <= 0 or NULL never
    qualify. Ties in the rounded race (including races below the
    grid) are broken by the key column, so the selected SET is stable
    under any sort-order difference on equal doubles.

    Scale shape: global top-k plans as TakeOrderedAndProject (partial
    per-partition heaps, no full sort, no shuffle of losers). With
    ``strata_col``, a per-stratum window rank replaces the global
    top-k (one hash-partitioned sort per stratum — "k per language"
    keeps every stratum represented).
    """
    # 13 hex chars = 52 bits: fits a double exactly, and +1 over 2^52+1
    # keeps u strictly inside (0, 1) so ln(u) is finite and != 0
    u = (F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))), 1, 13), 16, 10).cast("double") + F.lit(1.0)) / F.lit(float(2**52 + 2))
    w = F.col(weight_col).cast("double")
    from insect_observation_data_pipeline_spark.functions.numeric import stable_round

    race = stable_round((-F.log(u)) / w, 9)
    keyed = df.filter(w > 0).withColumn("__race", race)
    if strata_col is None:
        return (
            keyed.orderBy(F.col("__race").asc(), F.col(key_col).asc())
            .limit(k)
            .drop("__race")
        )
    win = Window.partitionBy(strata_col).orderBy(
        F.col("__race").asc(), F.col(key_col).asc()
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__race", "__rn")
    )


def mixture_plan(
    docs: DataFrame,
    *,
    strata_col: str = "source",
    text_col: str = "text",
    budget_tokens: int = 1_000_000,
) -> DataFrame:
    """Corpus mixture PLAN at the source grain — the Pile/LLaMA-style
    sampling-epochs table a training run is configured from: given a
    total token budget, flatten each source's natural token share
    toward sqrt (the alpha=0.5 temperature, same rationale as
    :func:`temperature_mix`: sqrt is IEEE correctly-rounded, arbitrary
    pow is libm-dependent) and report per source the natural token
    count, the flattened share, the planned token allocation, and the
    sampling EPOCHS = planned / natural — epochs > 1 means the tail
    source is up-sampled (multiple passes over it), < 1 means the head
    is down-sampled, which is exactly the per-document selection
    :func:`temperature_mix` / x23 then implements for the <= 1 case.

    Engine-exact arithmetic: the flattening weight is the INTEGER
    isqrt of the token count (floor(sqrt) + an integer correction for
    the borderline where the double sqrt of k^2 - eps rounds up to k),
    shares and planned tokens are integer DIV expressions over exact
    integer sums, and the single float column (epochs) is one division
    of identical exact integers in both engines, stable-rounded. A
    float weight SUM across sources would be partition-order-dependent
    and poison the cross-engine hash.

    Shape: one corpus scan -> per-source hash agg (rows = sources) ->
    broadcast 1-row totals -> projection. No window, no second scan.
    """
    from insect_observation_data_pipeline_spark.functions.numeric import stable_round
    from insect_observation_data_pipeline_spark.llm.textstats import token_count

    per = (
        docs.select(
            F.col(strata_col).alias("source"),
            token_count(F.col(text_col)).alias("__t"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__t").cast("bigint").alias("n_tokens"),
        )
    )
    w_raw = F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint")
    weight = (w_raw - (w_raw * w_raw > F.col("n_tokens")).cast("bigint")).alias(
        "weight"
    )
    weighted = per.select("source", "n_docs", "n_tokens", weight)
    totals = weighted.agg(F.sum("weight").cast("bigint").alias("__wsum"))
    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight",
            # zero guards (round-14 review): a source whose docs are all
            # empty text has n_tokens = 0 (and weight 0), and a corpus of
            # only such sources has __wsum = 0 — under the ANSI default
            # the bare divisions raise DIVIDE_BY_ZERO and kill the plan;
            # CASE branches evaluate lazily, so the degenerate rows get
            # NULL instead (no tokens -> no defined share/epochs)
            F.when(
                F.col("__wsum") > 0,
                F.expr("(1000000 * weight) DIV __wsum"),
            ).cast("bigint").alias("share_ppm"),
            F.when(
                F.col("__wsum") > 0,
                F.expr(f"({int(budget_tokens)} * weight) DIV __wsum"),
            ).cast("bigint").alias("planned_tokens"),
            F.when(
                (F.col("__wsum") > 0) & (F.col("n_tokens") > 0),
                stable_round(
                    F.expr(f"({int(budget_tokens)} * weight) DIV __wsum")
                    / F.col("n_tokens").cast("double"),
                    4,
                ),
            ).alias("epochs"),
        )
        .orderBy("source")
    )
