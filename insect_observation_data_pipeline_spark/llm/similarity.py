"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. Query side is broadcast (k
  query vectors), candidates stream through a single projection — no
  shuffle except the final per-query top-k, which TakeOrdered-style
  window keeps tiny.
- IVF top-k: the scale path. Vectors are pre-assigned to cells (here the
  testdata's label column stands in for a k-means assignment); a query
  probes only its nearest cell's vectors, pruning ~90% of the scan at 10
  cells — the standard inverted-file ANN trade.

Dot products use built-in higher-order functions (zip_with + aggregate)
over double-cast arrays — JVM-side, no Python — for the TOP-K paths,
where each row's vector meets few partners and the Arrow hop would cost
more than it saves. The PAIR-JOIN path (near_dup_pairs) defaults to a
vectorized gram-matrix kernel instead: there every vector meets every
cell-mate, so one BLAS matmul per cell amortizes the per-pair expression
overhead — measured 6x faster at sf0.1 (see near_dup_pairs docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.cache import tag_intermediates
from insect_observation_data_pipeline_spark.functions.numeric import stable_round


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """NULL for a zero-norm side (round-14 review): under the ANSI
    default a bare division raises DIVIDE_BY_ZERO and kills the job on
    the first all-zero embedding; CASE branches evaluate lazily, so the
    division never runs for the degenerate rows. A NULL similarity then
    fails every ``>= threshold`` filter and sorts last under ``desc``
    ranking in both engines — zero-norm vectors never pair."""
    a, b = _as_double(a), _as_double(b)
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def _with_norm(
    df: DataFrame, id_col: str, vec_col: str, id_out: str, vec_out: str, norm_out: str
) -> DataFrame:
    """Project (id, double vector, norm) — norms computed ONCE PER ROW.

    Inside a pair join, ``cosine()`` would recompute both norms per
    PAIR: three 64-element aggregates where one (the dot) suffices.
    Precomputing norms on each side before the join keeps the pair loop
    to a single dot product — the arithmetic ``dot/(n_a*n_b)`` is
    unchanged, so results are bit-identical to the naive form (no
    oracle-hash risk), but the HOF work per pair drops ~3x. At 100 TB
    you'd persist the normalized/norm columns with the embeddings.

    Zero-norm rows are DROPPED here (round-14 review): their cosine is
    undefined (0/0 raises under the ANSI default), and guarding the
    per-PAIR division instead was measured ~1.5-2x slower on x9's
    all-pairs loop — one per-ROW filter costs n, a per-pair branch
    costs n^2. A zero-norm vector therefore never pairs and never
    appears as a query or neighbor, the same drop semantics as
    near_dup_pairs' kernels."""
    v = _as_double(F.col(vec_col))
    return (
        df.select(F.col(id_col).alias(id_out), v.alias(vec_out))
        .withColumn(norm_out, norm(F.col(vec_out)))
        .filter(F.col(norm_out) != 0)
    )


def _pair_cosine(vec_a: str, vec_b: str, norm_a: str, norm_b: str) -> Column:
    # PRECONDITION: both sides are zero-norm-free (every caller builds
    # them through _with_norm's filter or its own norm != 0 filter), so
    # the bare division is ANSI-safe. Guarding per PAIR here instead
    # was measured ~1.5-2x slower on x9's all-pairs loop (round-14).
    return dot(F.col(vec_a), F.col(vec_b)) / (F.col(norm_a) * F.col(norm_b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine_sim), k rows per
    query. Broadcast the (small) query side; rank on rounded similarity
    with id tiebreak so results are total-ordered and engine-stable."""
    q = F.broadcast(
        _with_norm(queries, id_col, vec_col, "query_id", "q_vec", "q_norm")
    )
    c = _with_norm(candidates, id_col, vec_col, "neighbor_id", "c_vec", "c_norm")
    scored = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        stable_round(
            _pair_cosine("q_vec", "c_vec", "q_norm", "c_norm"), round_digits
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rn").alias("rank"))
    )


def cell_centroids(
    vectors: DataFrame,
    *,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell centroid = element-wise mean. posexplode -> avg per (cell,
    pos) -> rebuild array ordered by pos. Two shuffles over tiny data
    (cells x dims rows)."""
    exploded = vectors.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "v"),
    )
    per_dim = exploded.groupBy("cell", "pos").agg(F.avg("v").alias("v"))
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("centroid")
    )


def centroid_distances(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    round_digits: int = 4,
    centroid_digits: int = 6,
) -> DataFrame:
    """Cosine of every vector to its own cell's centroid — the embedding
    outlier score: low similarity = the vector sits far from its cluster
    (mislabeled data, noise, or genuinely novel content worth a look).

    The centroid element-wise mean is a cross-ROW aggregate, so its
    floating sum order is partition-dependent; rounding each component
    to ``centroid_digits`` (default 1e-6, ~1e7x the accumulation error
    of averaging a few thousand floats) before the distance makes the
    score replay- and engine-stable. The per-row cosine itself sums in
    array order (deterministic) and is rounded to ``round_digits``.

    Shape: centroids are cells x dims rows (tiny) -> broadcast back onto
    the scan; one projection per row. No shuffle touches the big side
    beyond the posexplode aggregate that builds the centroids.
    """
    cents = cell_centroids(vectors, cell_col=cell_col, vec_col=vec_col)
    cents = cents.select(
        "cell",
        F.transform(
            F.col("centroid"), lambda x: stable_round(x, centroid_digits)
        ).alias("centroid"),
    )
    v = vectors.select(
        F.col(id_col),
        F.col(cell_col).alias("cell"),
        _as_double(F.col(vec_col)).alias("vec"),
    )
    return v.join(F.broadcast(cents), "cell").select(
        id_col,
        F.col("cell").alias(cell_col),
        stable_round(cosine(F.col("vec"), F.col("centroid")), round_digits).alias(
            "centroid_sim"
        ),
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 3,
    round_digits: int = 4,
    nprobe: int = 1,
    centroid_digits: int = 6,
) -> DataFrame:
    """IVF ANN: route each query to its ``nprobe`` nearest cell
    centroids, then exact top-k within those cells only. nprobe is THE
    recall/cost knob of inverted-file ANN: scanned fraction ~= nprobe /
    n_cells, recall rises monotonically with it (each added cell can
    only add candidates). nprobe=1 is the cheapest/lowest-recall point;
    production pipelines tune it against a brute-force recall probe
    (see tests/test_llm.py::test_ivf_nprobe_recall_monotone).

    Centroid components are snapped at ``centroid_digits`` before
    routing (round-12 review): the element-wise mean folds in shuffle
    arrival order, so raw centroid doubles are partition-dependent and
    a c_sim within an ulp of a ``round_digits`` boundary could route a
    query to a different cell across replays/engines — the exact
    hazard :func:`centroid_distances` already rounds against. The
    DuckDB x10/x26 oracles snap their centroids identically."""
    cents = cell_centroids(candidates, cell_col=cell_col, vec_col=vec_col)
    cents = F.broadcast(
        cents.select(
            "cell",
            F.transform(
                F.col("centroid"), lambda x: stable_round(x, centroid_digits)
            ).alias("centroid"),
        )
    )
    q = _with_norm(queries, id_col, vec_col, "query_id", "q_vec", "q_norm")
    routed = (
        q.crossJoin(cents)
        .withColumn(
            "c_sim", stable_round(cosine(F.col("q_vec"), F.col("centroid")), round_digits)
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("c_sim"), F.asc("cell")
                )
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_vec", "q_norm", "cell")
    )
    c = (
        candidates.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(cell_col).alias("cell"),
            _as_double(F.col(vec_col)).alias("c_vec"),
        )
        .withColumn("c_norm", norm(F.col("c_vec")))
        # zero-norm candidates never pair (see _with_norm) — per-row
        # filter so the pair loop keeps the bare division
        .filter(F.col("c_norm") != 0)
    )
    scored = routed.join(c, "cell").select(
        "query_id",
        "neighbor_id",
        stable_round(
            _pair_cosine("q_vec", "c_vec", "q_norm", "c_norm"), round_digits
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rn").alias("rank"))
    )


def near_dup_pairs(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    threshold: float = 0.35,
    round_digits: int = 4,
    max_cell_rows: int | None = None,
    kernel: str = "gram",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by cluster cell.

    Cluster-then-dedup: the self-join runs only within a cell (equi-join
    on ``cell_col``, here the IVF/k-means assignment), so the pair space
    is sum(|cell|^2) instead of n^2 — the standard blocking trade for
    embedding dedup at 100 TB. ``a_id < b_id`` keeps each unordered pair
    once; similarity is rounded before thresholding so the cut is
    engine-stable.

    ``kernel`` picks the inner pair loop — the BLOCKING is identical:

    - ``"gram"`` (default): one Arrow batch per cell into
      ``applyInPandas``; the whole cell's pair space is a single BLAS
      gram matrix ``(M @ M.T) / outer(norms)``. Measured 6x faster than
      the hof kernel at sf0.1 (2000x64 vectors, 10 cells: 0.4 s vs
      2.4 s warm) — per-pair expression interpretation is the hof
      path's cost, and a matrix multiply amortizes it to nothing. The
      rounding formula is the same IEEE-754 ``floor(|x|*s + 0.5)``
      as :func:`stable_round`, so the cut is engine-stable either way.
    - ``"hof"``: pure-JVM self-join; each pair's dot is a zip_with +
      aggregate expression. No Python worker, no Arrow hop — the right
      choice when cells are huge and ``max_cell_rows`` must stay large
      (the gram kernel materializes a cap x cap float64 matrix per
      task: cap 2k ~ 32 MB, cap 10k ~ 800 MB — size the cap to the
      executor, or fall back to hof).

    Both kernels DROP pairs involving a zero-norm vector (round-14
    review unified this: the hof path's guarded cosine yields NULL,
    which fails the threshold filter; the gram path's numpy 0/0 yields
    NaN, which fails the same comparison) — and both drop NULL-cell
    (unassigned) vectors before pairing, so kernel and cap choice never
    change which pairs exist.

    ``max_cell_rows`` guards the skewed-mega-cell case: a cell with m
    rows puts an m^2 pair space in ONE shuffle partition. With the cap
    set, each oversized cell is split into g = ceil(m / cap) salt groups
    and the self-join runs as a grid join whose JOIN KEY is the full
    (cell, i, j) group pair: the a side keeps its own hash group as
    ``i`` and replicates over every ``j``, the b side keeps its own
    group as ``j`` and replicates over every ``i``, so pair (a, b)
    lands in exactly the one task keyed (cell, g_a, g_b) — EXACT, kept
    once by the id ordering filter, with per-task pair space bounded by
    ~cap^2 at the cost of replicating each side g times. Both salt
    columns MUST be in the join key (not post-join filters) or the
    mega-cell still hash-partitions on ``cell`` alone into one task.
    This is the salting rewrite for self-joins; sub-clustering (a
    secondary LSH split) is the lossy alternative when even g-fold
    replication is too much.
    """
    if kernel == "gram":
        return _near_dup_pairs_gram(
            vectors,
            id_col=id_col,
            vec_col=vec_col,
            cell_col=cell_col,
            threshold=threshold,
            round_digits=round_digits,
            max_cell_rows=max_cell_rows,
        )
    if kernel != "hof":
        raise ValueError(f"unknown kernel {kernel!r}; expected 'gram' or 'hof'")
    # zero-norm rows filtered per SIDE (n cost), keeping the per-pair
    # division bare — same drop semantics as the gram kernel's NaN
    a = (
        vectors.select(
            F.col(cell_col).alias("cell"),
            F.col(id_col).alias("a_id"),
            _as_double(F.col(vec_col)).alias("a_vec"),
        )
        .withColumn("a_norm", norm(F.col("a_vec")))
        .filter(F.col("a_norm") != 0)
    )
    b = (
        vectors.select(
            F.col(cell_col).alias("cell"),
            F.col(id_col).alias("b_id"),
            _as_double(F.col(vec_col)).alias("b_vec"),
        )
        .withColumn("b_norm", norm(F.col("b_vec")))
        .filter(F.col("b_norm") != 0)
    )
    sim = stable_round(
        _pair_cosine("a_vec", "b_vec", "a_norm", "b_norm"), round_digits
    )
    if max_cell_rows is None:
        joined = a.join(b, "cell")
    else:
        # per-cell salt-group count g; the grid frame is tiny (sum of g^2
        # over cells) and broadcast
        meta = vectors.groupBy(F.col(cell_col).alias("cell")).agg(
            F.ceil(F.count(F.lit(1)) / F.lit(max_cell_rows))
            .cast("int")
            .alias("g")
        )
        grid = (
            meta.withColumn("i", F.explode(F.sequence(F.lit(0), F.col("g") - 1)))
            .withColumn("j", F.explode(F.sequence(F.lit(0), F.col("g") - 1)))
            .select("cell", "g", "i", "j")
        )
        ga = F.pmod(F.xxhash64("a_id"), F.col("g")).cast("int")
        gb = F.pmod(F.xxhash64("b_id"), F.col("g")).cast("int")
        a_tagged = (
            a.join(F.broadcast(grid), "cell")
            .filter(ga == F.col("i"))
            .select("cell", "i", "j", "a_id", "a_vec", "a_norm")
        )
        b_tagged = (
            b.join(F.broadcast(grid), "cell")
            .filter(gb == F.col("j"))
            .select("cell", "i", "j", "b_id", "b_vec", "b_norm")
        )
        joined = a_tagged.join(b_tagged, ["cell", "i", "j"])
    return (
        joined.filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def semdedup_keep(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    threshold: float = 0.35,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """SemDeDup-style keep/drop over :func:`near_dup_pairs` — the
    embedding-path twin of the shingle policies (h3 containment,
    x7 MinHash): within each cluster cell, every near-duplicate pair
    (cosine >= threshold) drops its larger id, so the survivor set is
    exactly the ids never appearing as ``b_id``. Pairwise like the
    other keep/drop operators — deterministic, one extra anti-join over
    the pair set, SQL-expressible for the oracle. Scale posture is
    near_dup_pairs': cell blocking bounds the pair space, ``max_cell_rows``
    salts mega-cells.

    Output contract: (vec_id, keep, reason), reason in
    ('near_embedding', 'kept')."""
    pairs = near_dup_pairs(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        cell_col=cell_col,
        threshold=threshold,
        max_cell_rows=max_cell_rows,
    )
    losers = (
        pairs.select(F.col("b_id").alias(id_col))
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return (
        vectors.select(F.col(id_col))
        .join(losers, id_col, "left")
        .select(
            id_col,
            F.col("__drop").isNull().alias("keep"),
            F.when(F.col("__drop"), F.lit("near_embedding"))
            .otherwise(F.lit("kept"))
            .alias("reason"),
        )
    )


def _near_dup_pairs_gram(
    vectors: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    cell_col: str,
    threshold: float,
    round_digits: int,
    max_cell_rows: int | None,
) -> DataFrame:
    """Gram-matrix kernel for :func:`near_dup_pairs` (same contract).

    Uncapped: group by cell, one ``applyInPandas`` task per cell, pairs
    from one BLAS matmul. Capped: the same (cell, i, j) salt grid as the
    hof path, expressed as SIDE-TAGGED REPLICATION — a row with hash
    group ``t`` enters task (cell, t, j) as an ``a``-side row for every
    ``j`` and task (cell, i, t) as a ``b``-side row for every ``i``, so
    task (cell, i, j) holds exactly groups i (side a) and j (side b)
    and computes their cross gram. The ``a_id < b_id`` mask keeps each
    unordered pair in exactly one task (the (j, i) mirror task sees the
    opposite orientation), identical to the hof grid join's dedup.
    GroupBy on (cell, i, j) puts the salt in the SHUFFLE KEY, so no
    mega-cell ever lands in one task; per-task memory is the cap x cap
    float64 gram (size the cap to the executor; see kernel docstring).
    """
    import numpy as np
    import pandas as pd

    id_type = vectors.schema[id_col].dataType.simpleString()
    out_schema = f"a_id {id_type}, b_id {id_type}, cosine_sim double"
    scale = float(10**round_digits)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        if "side" in pdf.columns:
            a_rows = pdf[pdf["side"] == "a"]
            b_rows = pdf[pdf["side"] == "b"]
        else:
            a_rows = b_rows = pdf
        empty = pd.DataFrame(
            {
                "a_id": pdf["_id"].iloc[:0],
                "b_id": pdf["_id"].iloc[:0],
                "cosine_sim": pd.Series([], dtype="float64"),
            }
        )
        if a_rows.empty or b_rows.empty:
            return empty
        ma = np.vstack(a_rows["vec"].to_numpy()).astype(np.float64)
        mb = np.vstack(b_rows["vec"].to_numpy()).astype(np.float64)
        na = np.sqrt((ma * ma).sum(axis=1))
        nb = np.sqrt((mb * mb).sum(axis=1))
        # zero-norm rows produce NaN here (0/0), which fails the
        # threshold comparison below — same drop semantics as the hof
        # kernel's NULL-guarded cosine; errstate just silences the
        # expected divide warnings
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = (ma @ mb.T) / np.outer(na, nb)
        # stable_round, vectorized: floor(|x|*s + 0.5)/s with sign back
        rounded = (
            np.floor(np.abs(sim) * scale + 0.5)
            / scale
            * np.where(sim < 0, -1.0, 1.0)
            + 0.0
        )
        a_ids = a_rows["_id"].to_numpy()
        b_ids = b_rows["_id"].to_numpy()
        keep = (a_ids[:, None] < b_ids[None, :]) & (rounded >= threshold)
        ia, ib = np.nonzero(keep)
        if not len(ia):
            return empty
        return pd.DataFrame(
            {"a_id": a_ids[ia], "b_id": b_ids[ib], "cosine_sim": rounded[ia, ib]}
        )

    src = vectors.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("vec"),
    ).filter(
        # NULL cell = unassigned: the hof kernel's equi-join and this
        # path's capped meta-join both drop it implicitly, but the
        # uncapped groupBy kept the NULL group and paired unassigned
        # vectors with each other (round-14 review) — filter once here
        # so every kernel/cap combination blocks identically
        F.col("cell").isNotNull()
    )
    if max_cell_rows is None:
        return src.groupBy("cell").applyInPandas(kern, out_schema)
    meta = src.groupBy("cell").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(max_cell_rows)).cast("int").alias("g")
    )
    tagged = src.join(F.broadcast(meta), "cell").withColumn(
        "grp", F.pmod(F.xxhash64("_id"), F.col("g")).cast("int")
    )
    others = F.explode(F.sequence(F.lit(0), F.col("g") - 1))
    a_side = tagged.select(
        "cell",
        F.col("grp").alias("i"),
        others.alias("j"),
        F.lit("a").alias("side"),
        "_id",
        "vec",
    )
    b_side = tagged.select(
        "cell",
        others.alias("i"),
        F.col("grp").alias("j"),
        F.lit("b").alias("side"),
        "_id",
        "vec",
    )
    return (
        a_side.unionByName(b_side)
        .groupBy("cell", "i", "j")
        .applyInPandas(kern, out_schema)
    )


def kmeans_fit(
    vectors: DataFrame,
    *,
    k: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column — the real
    trainer behind IVF cell assignment (x10/x26 use the testdata label
    as a stand-in; this produces the same shape from raw vectors).

    Deterministic init, no RNG: seeds are the k rows with the smallest
    ``xxhash64(id)`` (a uniform pseudo-random draw any rerun reproduces).
    Each round is one broadcast-join assignment pass (n x k distance
    rows, argmin via ``min_by``) and one element-wise mean aggregate
    (posexplode -> groupBy (cluster, pos) -> rebuild array sorted by
    pos) — two shuffles per round over NARROW frames, never a collect
    of the vectors. A cluster that loses all members keeps its previous
    centroid (left join + coalesce).

    Float caveat: grouped ``avg`` folds in shuffle arrival order, so
    centroid doubles are not bit-stable across partitionings; for
    well-separated data assignments are stable (tested), but this is an
    iterative algorithm with no cross-engine oracle by design.

    Returns (cell int, centroid array<double>).
    """
    from pyspark import StorageLevel

    # v feeds 2*iters+1 consumers (seed draw, then per-round the
    # assignment cross-join AND the mean pass); without persisting it
    # the caller's full vector lineage re-executes each time — the
    # x34b 6x-recompute lesson, same as pagerank's persist
    # (round-12 review). Released before returning.
    v = vectors.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("vec")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # the numbering window runs over <= k rows by construction (post
    # limit); the constant partition key keeps it honest under the
    # engine-wide no-unpartitioned-window audit — it IS one tiny task
    seeds = (
        v.withColumn("h", F.xxhash64("_id"))
        .orderBy("h", "_id")
        .limit(k)
        .withColumn(
            "cell",
            (
                F.row_number().over(
                    Window.partitionBy(F.lit(0)).orderBy("h", "_id")
                )
                - 1
            ).cast("int"),
        )
        .select("cell", F.col("vec").alias("centroid"))
    )
    cents = seeds.localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = _assign_cells(v, cents)
        elems = assigned.join(v, "_id").select(
            "cell", F.posexplode("vec").alias("pos", "val")
        )
        means = (
            elems.groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("new_centroid")
            )
        )
        cents = (
            cents.join(means, "cell", "left")
            .select(
                "cell",
                F.coalesce(F.col("new_centroid"), F.col("centroid")).alias(
                    "centroid"
                ),
            )
            .localCheckpoint(eager=True)
        )
    # safe to release: every iteration's cents is an EAGER
    # localCheckpoint, so the returned frame no longer references v
    v.unpersist()
    return cents


def round_centroids(centroids: DataFrame, digits: int = 6) -> DataFrame:
    """Element-wise :func:`stable_round` of a (cell, centroid) frame.

    Trained centroids are cross-row float means, so their low bits are
    partition-order noise (see :func:`kmeans_fit`'s float caveat).
    Rounding each component at ``digits`` (default 1e-6, ~1e7x the
    accumulation error of averaging a few thousand doubles) snaps every
    run/engine/partitioning to the same centroid values, which makes
    every DOWNSTREAM consumer (assignment, IVF routing, probe scoring)
    deterministic — the same trick x24 uses (``centroid_digits``).
    Apply before persisting a trained model or pinning an oracle."""
    return centroids.select(
        "cell",
        F.transform(
            F.col("centroid"), lambda x: stable_round(x, digits)
        ).alias("centroid"),
    )


def _assign_cells(v: DataFrame, cents: DataFrame) -> DataFrame:
    """(_id, cell): nearest centroid by squared L2, id-stable tiebreak."""
    d2 = F.aggregate(
        F.zip_with(F.col("vec"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        v.crossJoin(F.broadcast(cents))
        .select("_id", "cell", d2.alias("d2"))
        .groupBy("_id")
        .agg(F.min_by(F.struct("d2", "cell"), F.struct("d2", "cell")).alias("best"))
        .select("_id", F.col("best.cell").alias("cell"))
    )


def kmeans_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its trained cell: (id, cell). One
    broadcast pass — the write-side of IVF index maintenance."""
    v = vectors.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("vec")
    )
    return _assign_cells(v, centroids).select(
        F.col("_id").alias(id_col), "cell"
    )


def quantize_int8(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_digits: int = 6,
) -> DataFrame:
    """Per-vector symmetric int8 quantization summary — the storage /
    serving compression step for embedding columns (4x smaller than
    float32, 8x than float64; dot products stay rank-faithful).

    scale = max|x_i| (1.0 for an all-zero vector), q_i = the HALF_UP
    integer of x_i / scale * 127 — every step an IEEE-754 double op via
    the :func:`stable_round` formula, so any engine derives identical
    integers. Output is one row per vector with exact-integer proofs of
    the quantized array (codes are in [-127, 127], so no array column
    needs to cross the oracle hash): l1 norm and a position-weighted
    checksum (sum q_i * i, 1-based), plus the rounded scale.

    The scale expression is referenced inside the per-element lambda and
    Catalyst's project-collapse may inline it, making the projection
    O(d^2) per row — at d=64 that is 4k flops/row (irrelevant, no
    shuffle, scan-parallel); for 1k+-dim vectors persist the scale
    column behind an exchange/checkpoint first and re-measure."""
    v = _as_double(F.col(vec_col))
    base = vectors.select(F.col(id_col), v.alias("e"))
    sc_raw = F.aggregate(
        F.col("e"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
    )
    base = base.withColumn(
        "sc", F.when(sc_raw == F.lit(0.0), F.lit(1.0)).otherwise(sc_raw)
    )
    q = F.transform(
        F.col("e"),
        lambda x: stable_round(x / F.col("sc") * F.lit(127.0), 0).cast("long"),
    )
    base = base.withColumn("q", q)
    weighted = F.transform(F.col("q"), lambda x, i: x * (i.cast("long") + 1))
    return base.select(
        id_col,
        stable_round(F.col("sc"), scale_digits).alias("scale_q"),
        F.size("e").cast("int").alias("n_dims"),
        F.aggregate(
            F.transform(F.col("q"), F.abs), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("q_l1"),
        F.aggregate(
            weighted, F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("q_checksum"),
    )


def hyperplanes(planes: int = 4, dims: int = 64) -> list[list[float]]:
    """Deterministic ±1 random-projection hyperplanes.

    Component (p, d) is +1/-1 from the parity of md5("p:d") — no RNG, so
    Spark, the DuckDB oracle, and any re-run derive identical planes
    (same portability rule as the md5 min-hash in dedup.py).
    """
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest(), 16) % 2 == 0
            else -1.0
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """SimHash-style bucket id: one sign bit per hyperplane, concatenated.

    Fails loudly on a vector whose length differs from the hyperplane
    dims (round-12 review): ``zip_with`` pads the shorter side with
    NULLs, so a mismatched ``dims`` made every dot product NULL, every
    sign bit '0', and silently collapsed ALL vectors into one bucket —
    degenerating the bucket equi-join into a full cross join with no
    error. The guard is one size() comparison per row, JVM-side."""
    v = _as_double(vec)
    dims = len(planes[0])
    bits = [
        F.when(dot(v, F.array(*[F.lit(x) for x in h])) > 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for h in planes
    ]
    return F.when(F.size(v) == F.lit(dims), F.concat(*bits)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("lsh_bucket: embedding length "),
                F.coalesce(F.size(v).cast("string"), F.lit("NULL")),
                F.lit(f" != hyperplane dims {dims}"),
            )
        )
    )


def _flip_bit(bucket: Column, p: int, planes: int) -> Column:
    """Bucket string with the 1-indexed p-th sign bit inverted."""
    return F.concat(
        F.substring(bucket, 1, p - 1),
        F.when(F.substring(bucket, p, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
        F.substring(bucket, p + 1, planes - p),
    )


def probe_buckets(bucket: Column, planes: int, probe_bits: int = 1) -> Column:
    """Multi-probe bucket set: the exact bucket plus every bucket within
    Hamming distance ``probe_bits`` (1 = flip each single bit, 2 adds all
    bit pairs). All probes are distinct strings, so a candidate — which
    lives in exactly one bucket — can match at most one probe and no
    dedup is needed after the bucket join."""
    from itertools import combinations

    out = [bucket]
    for r in range(1, probe_bits + 1):
        for ps in combinations(range(1, planes + 1), r):
            b = bucket
            for p in ps:
                b = _flip_bit(b, p, planes)
            out.append(b)
    return F.array(*out)


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    planes: int = 4,
    dims: int = 64,
    round_digits: int = 4,
    probe_bits: int = 0,
) -> DataFrame:
    """LSH-bucketed ANN: exact top-k within the query's sign bucket(s).

    The bucket equi-join replaces IVF's centroid routing — no training
    step, bucket count = 2^planes, and the candidate scan per query
    shrinks by ~2^planes. ``probe_bits`` turns on multi-probe: each
    query also searches every bucket within that Hamming distance,
    trading a (planes choose probe_bits)-fold wider probe set for
    recall — the standard knob when a true neighbor lands one sign flip
    away. Only the QUERY side fans out (queries << candidates), so the
    candidate table is never replicated and the join stays a bucket
    equi-join.
    """
    hp = hyperplanes(planes, dims)
    q = (
        _with_norm(queries, id_col, vec_col, "query_id", "q_vec", "q_norm")
        .withColumn("bucket", lsh_bucket(F.col("q_vec"), hp))
    )
    if probe_bits:
        q = q.withColumn(
            "bucket", F.explode(probe_buckets(F.col("bucket"), planes, probe_bits))
        )
    c = (
        _with_norm(candidates, id_col, vec_col, "neighbor_id", "c_vec", "c_norm")
        .withColumn("bucket", lsh_bucket(F.col("c_vec"), hp))
    )
    scored = q.join(c, "bucket").select(
        "query_id",
        "neighbor_id",
        stable_round(
            _pair_cosine("q_vec", "c_vec", "q_norm", "c_norm"), round_digits
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rn").alias("rank"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Lexical top-k retrieval: Okapi BM25 with the Lucene-style
    non-negative idf — the keyword complement to the embedding ANN
    family (brute_force_topk / ivf_topk / lsh_topk).

        score(q, d) = sum over query terms t of
            ln(1 + (N - df + 0.5)/(df + 0.5))
            * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len_d / avgdl))

    N = total docs, avgdl = total corpus tokens / N (zero-token docs
    count in N — the convention is documented, not load-bearing).

    Spark-first shape, linear at 100 TB: ONE corpus-sized shuffle (the
    per-(doc, term) tf aggregate; persisted because doc lengths, df,
    and the scoring join all derive from it); the query-term relation
    broadcasts into the tf scan so only candidate postings survive to
    the scoring join, exactly an inverted-index probe — Catalyst
    prunes every non-query term at the join instead of a full-corpus
    score. Final per-query top-k is one window over (typically) a few
    thousand candidates.

    Cross-engine determinism: every input to ln() and the score ratio
    is an exact BIGINT count (tf, df, N, total tokens); ln is the one
    libm call (the pagerank precedent). The top-k ORDERING is computed
    on the ROUNDED score with id tie-break — ranking on the raw double
    would let a last-ulp summation difference flip two near-equal
    scores across engines at the k boundary.
    """
    # the tokenize+explode feeding the tf aggregate is the corpus-sized
    # map stage; on a single-split input (every testdata parquet is one
    # file/one row group) it serializes on one task — spread first
    # (round 16, the doc_shingles idiom; structurally a no-op whenever
    # the scan already yields enough splits)
    from insect_observation_data_pipeline_spark.llm.dedup import spread_input

    tf_src = spread_input(docs).select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    )
    from pyspark import StorageLevel

    tf = (
        tf_src.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    doclen = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")).crossJoin(
        tf.agg(F.sum("tf").alias("total_tokens"))
    )
    qt = queries.select(
        F.col(query_id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(query_text_col)), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    ).distinct()
    # df over QUERY TERMS ONLY (round-14 review): a join cannot push
    # below an aggregate, so the old groupBy-then-join aggregated df for
    # the entire corpus vocabulary and then threw away every non-query
    # term. Semi-restricting the postings to query terms BEFORE the
    # groupBy shuffles only candidate postings; the df values are
    # identical (all (doc, term) rows of a kept term survive the join).
    df_t = (
        tf.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    cand = tf.join(F.broadcast(qt), "term")
    scored = (
        cand.join(F.broadcast(df_t), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            query_id_col,
            id_col,
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b)
                        * F.col("dl")
                        / (
                            F.col("total_tokens")
                            / F.col("n_docs").cast("double")
                        )
                    )
                )
            ).alias("__s"),
        )
        .groupBy(query_id_col, id_col)
        .agg(stable_round(F.sum("__s"), round_digits).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )
    return tag_intermediates(out, (tf,))


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: int = 60,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (Cormack et al.:
    score(q, d) = sum over systems of 1/(c + rank)) — the standard
    hybrid-retrieval combiner: rank positions, not raw scores, so a
    BM25 ranking and a cosine ranking fuse without calibration.

    Spark shape: each ranking projects to (query, id, 1/(c+rank));
    union + one hash aggregate fuses them — no N-way outer join, one
    shuffle regardless of system count. Determinism: ranks are exact
    ints, each contribution is one double division, and the fused
    ordering uses the ROUNDED score with id tie-break (the bm25_topk
    k-boundary discipline). Output: (query, rank, id, rrf_score,
    n_systems) with rank <= k.
    """
    from functools import reduce

    if not rankings:
        raise ValueError(
            "rrf_fuse needs at least one ranking DataFrame, got []"
        )
    parts = [
        r.select(
            F.col(query_col),
            F.col(id_col),
            (
                F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col).cast("double"))
            ).alias("__contrib"),
        )
        for r in rankings
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy(query_col, id_col)
        .agg(
            stable_round(F.sum("__contrib"), round_digits).alias("rrf_score"),
            F.count(F.lit(1)).cast("int").alias("n_systems"),
        )
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_col, "rank", id_col, "rrf_score", "n_systems")
    )
