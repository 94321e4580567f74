"""Approximate aggregates: the opt-in scale variants.

Oracle-checked queries use exact aggregation (`countDistinct`,
`percentile`) because hash equality demands it (SURVEY §4.5). At 100 TB
the approximate forms are the default choice — constant memory per group
instead of per-distinct-value state:

- ``approx_distinct``: HyperLogLog++ (`approx_count_distinct`), rsd
  defaults to 5%; sketch size ~ (1.04/rsd)^2 registers regardless of
  cardinality.
- ``approx_quantiles``: Greenwald-Khanna (`percentile_approx`) with a
  relative-error accuracy knob; exact percentile would buffer the whole
  group.

Both are single-pass, partial-aggregable (map-side combine), and plan
inside whole-stage codegen — the skew-safe exact rewrite lives in
``operators.skew.salted_count_distinct`` when exactness is required.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, *, rsd: float = 0.05) -> Column:
    """HLL++ distinct-count estimate with relative standard deviation ``rsd``."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(
    col: Column | str, probabilities: Sequence[float], *, accuracy: int = 10_000
) -> Column:
    """Approximate quantiles at the given probabilities (array result).

    ``accuracy`` trades memory for error: relative error <= 1/accuracy.
    """
    return F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )


def cm_weights(term_counts, term_col: str, cnt_col: str, *,
               depth: int = 3, width: int = 1024):
    """Count-min sketch TABLE from exact per-term counts: one row per
    (sketch row, bucket) with the summed weight of all terms hashing
    there. This is the mergeable fixed-size state (depth x width cells)
    a 100 TB frequency pipeline keeps INSTEAD of vocabulary-sized exact
    counts — per partition the map-side combine caps at depth*width
    rows no matter how many distinct terms pass through, and cross-
    shard merge is cellwise addition (the same property the HLL/GK
    audit pins for distinct/quantiles). Estimates read back as
    min over rows of the term's bucket weight: never an underestimate
    (every occurrence of the term is in each of its buckets), over by
    at most the colliding mass, bounded by ~N/width per row."""
    if depth < 1 or width < 1:
        raise ValueError(f"cm_weights needs depth/width >= 1, got {depth}/{width}")
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("cm_row")
    # NULL terms are excluded like hll_registers/binned_histogram do
    # (round-13 review): md5(concat(row, ':', NULL)) is NULL, so a NULL
    # term minted a phantom (cm_row, NULL) bucket that absorbed its
    # counts — the per-row weight total then disagreed with N and the
    # documented ~N/width bound
    exploded = term_counts.where(F.col(term_col).isNotNull()).select(
        F.col(term_col).alias("__term"), F.col(cnt_col).alias("__cnt"), rows
    )
    bucketed = exploded.select(
        "cm_row",
        "__cnt",
        _cm_bucket_expr("__term", "cm_row", width).alias("bucket"),
    )
    return bucketed.groupBy("cm_row", "bucket").agg(
        F.sum("__cnt").alias("weight")
    )


def _cm_bucket_expr(term_col: str, row_col: str, width: int) -> Column:
    """Count-min hash, row index as a COLUMN (post-explode form): the
    single spelling of the bucket formula (a scalar-row twin named
    cm_bucket was deleted in round 12 — it had no callers and two
    copies of the formula could drift apart). md5-prefix arithmetic
    (no engine-private hash), so any engine — and the DuckDB oracle —
    lands every term in the same bucket:
    bucket = int(md5(row ':' term)[:8], 16) % width."""
    h = F.md5(
        F.concat(F.col(row_col).cast("string"), F.lit(":"), F.col(term_col))
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def binned_quantiles(
    rows: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    width: int = 8,
    pcts: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """Mergeable fixed-width-histogram quantile sketch with an
    engine-portable (oracle-checkable) readback.

    The third member of the deterministic sketch family (count-min
    :func:`cm_weights` for frequencies, :func:`hll_registers` for
    distincts): per group the state is one row per OCCUPIED bin of
    width ``width`` — bounded by the value range, independent of row
    count — and cross-shard/epoch merge is cellwise ``cnt`` addition
    (pinned by tests/test_llm.py::test_binned_quantiles_merge), exactly
    the property a 100 TB pipeline needs where the EXACT interpolated
    percentile (``f_tokens_percentile``) would buffer whole groups and
    Spark's own GK sketch (:func:`approx_quantiles`) has no
    engine-portable readback for hash comparison.

    Readback: for each integer percentile ``p`` the estimate is the
    UPPER edge ``(bin + 1) * width`` of the first bin whose cumulative
    count reaches rank ``ceil(p * total / 100)`` — the inverse-CDF rank
    quantile coarsened to bin resolution, so the true rank value lies
    in ``(est - width, est]``. Rank arithmetic is pure integer
    (``(p * total + 99) DIV 100``): no float literal whose binary
    rounding could differ between engines at exact-integer boundaries.
    """
    hist = binned_histogram(rows, value_col, group_cols, width=width)
    return histogram_quantiles_readback(hist, group_cols, width=width, pcts=pcts)


def binned_histogram(
    rows: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    width: int = 8,
) -> DataFrame:
    """The sketch STATE: one (group, bin, cnt) row per occupied
    fixed-width bin. This is what a multi-epoch pipeline persists —
    merge across shards/epochs by summing ``cnt`` per (group, bin)
    (cellwise addition, like cm_weights; pinned by
    tests/test_llm.py::test_binned_quantiles_merge).

    NULL values are excluded before bucketing: a NULL bin would count
    toward ``total`` in the rank readback yet never be selectable as an
    estimate (biasing quantiles upward), and engines disagree on NULL
    ordering in the cumulative window (Spark NULLS FIRST vs DuckDB
    NULLS LAST), so the readback would not be engine-portable on
    nullable inputs."""
    if width < 1:
        raise ValueError(f"binned_histogram needs width >= 1, got {width!r}")
    # Exact floor division, branched on the value type (round-13 review
    # introduced DIV for exactness; round-14 ADVICE: DIV fails analysis
    # outright on DOUBLE/FLOAT — DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES).
    # Integral/decimal inputs take the DIV path: Spark's `/` casts to
    # DOUBLE and mis-bins |values| > 2^53 (epoch nanos), while DIV with
    # the negative-remainder correction matches DuckDB's exact integer
    # `//` at any magnitude. Fractional inputs keep F.floor(col/width):
    # they are already doubles, so the division loses nothing, and floor
    # handles negatives directly.
    dtype = rows.schema[value_col].dataType.simpleString()
    if dtype in ("double", "float"):
        bin_expr = F.floor(F.col(value_col) / F.lit(width)).cast("long")
    else:
        bin_expr = F.expr(
            f"`{value_col}` DIV {width} - "
            f"CASE WHEN `{value_col}` % {width} < 0 THEN 1 ELSE 0 END"
        ).cast("long")
    binned = rows.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        bin_expr.alias("bin"),
    )
    return binned.groupBy(*group_cols, "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def histogram_quantiles_readback(
    hist: DataFrame,
    group_cols: Sequence[str] = (),
    *,
    width: int = 8,
    pcts: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """Quantile readback over a (group, bin, cnt) histogram (see
    :func:`binned_quantiles` for the rank semantics)."""
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cdf = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_all)
    )
    ests = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"({p} * total + 99) DIV 100"),
                (F.col("bin") + 1) * width,
            )
        ).alias(f"p{p}_hi")
        for p in pcts
    ]
    return cdf.groupBy(*group_cols).agg(
        F.max("total").alias("n_rows"),
        F.count(F.lit(1)).alias("n_bins"),
        *ests,
    )


_HLL_REST_MASK = (1 << 52) - 1  # low 52 bits of the 60-bit md5 prefix


def hll_bucket_rho(term: Column, *, p: int = 8) -> tuple[Column, Column]:
    """Deterministic HyperLogLog (bucket, rho) for one value.

    Engine-portable analogue of :func:`_cm_bucket_expr`: the hash is the first
    15 hex chars of md5 (60 bits, fits a signed 64-bit int on any
    engine), the top ``p`` bits pick the register and rho is the number
    of leading zeros in the remaining ``52 - (p - 8)`` bits plus one.
    Bit length comes from the base-2 string render (``conv`` here,
    ``bin()`` in DuckDB) — pure integer/string ops, no libm, so every
    engine lands every value in the same register with the same rho.
    """
    h60 = F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")
    shift = 60 - p
    mask = (1 << shift) - 1
    bucket = F.shiftright(h60, shift)
    rest = h60.bitwiseAND(F.lit(mask))
    width = shift + 1  # rho when rest == 0: all `shift` bits are zero
    rho = F.when(rest == 0, F.lit(width)).otherwise(
        F.lit(width) - F.length(F.conv(rest.cast("string"), 10, 2))
    )
    return bucket, rho


def hll_registers(
    rows: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    p: int = 8,
) -> DataFrame:
    """HyperLogLog register TABLE: one row per (group, bucket) with the
    max rho observed — the fixed-size (2^p rows per group) MERGEABLE
    distinct-count state a 100 TB pipeline keeps instead of exact
    per-value sets. Merge across shards/epochs is ``max`` per bucket
    (pinned by tests/test_llm.py::test_hll_registers_merge), the same
    cellwise property the count-min table (:func:`cm_weights`) has for
    frequencies. Duplicate values are free: max() absorbs them, so the
    input needs no pre-distinct shuffle. Estimates read back via the
    standard harmonic mean; see the x40 query for the exact-arithmetic
    readback the DuckDB oracle replays bit-identically.

    NULL values are filtered (round-12 review): the sketch estimates
    ``COUNT(DISTINCT value)``, which ignores NULLs in every SQL
    engine — without the filter, md5(NULL) = NULL creates a phantom
    (bucket NULL, max_rho NULL) register row that hll_state's
    count(1) counts into regs_used while its NULL term vanishes from
    sum(), biasing the estimate (the same NULL class
    :func:`binned_histogram` filters against).
    """
    bucket, rho = hll_bucket_rho(F.col(value_col), p=p)
    keyed = rows.filter(F.col(value_col).isNotNull()).select(
        *group_cols, bucket.alias("bucket"), rho.alias("rho")
    )
    return keyed.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("max_rho")
    )


# HLL readback constants (p=8): m=256 registers over the top 8 of a
# 60-bit md5 prefix; alpha_m * m^2 for the harmonic estimate. The SAME
# literals are embedded in the DuckDB oracles (x40, w2b) so both
# engines run the identical float expression on identical exact
# integers.
HLL_M = 256
HLL_AM2 = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M
HLL_INV53 = 2.0**-53


def hll_state(regs: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Collapse a :func:`hll_registers` table to one exact-integer row
    per group: ``regs_used`` (registers hit) and ``sum_scaled`` =
    sum(2^(53 - max_rho)) — each term a dyadic power, the total an
    exact BIGINT < 2^63, so the whole reduction is integer-exact and
    cross-shard mergeable state stays mergeable (a merged register
    table folds to the same row)."""
    return regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("regs_used"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(53) - F.col("max_rho")).cast("long")
        ).alias("sum_scaled"),
    )


def hll_estimate(regs_used: Column, sum_scaled: Column) -> Column:
    """Deterministic HLL readback from the :func:`hll_state` integers
    (p=8, m=256): the only float ops are one add + one divide (plus ln
    on the small-range linear-counting branch) from exact integer
    inputs, so any engine embedding the same literals computes the
    bit-identical double — the property the x40/w2b DuckDB oracles
    replay."""
    zeros = (F.lit(HLL_M) - regs_used).cast("double")
    raw = F.lit(HLL_AM2) / (zeros + sum_scaled * F.lit(HLL_INV53))
    return F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * HLL_M)),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)


def hll_sql(value_expr: str) -> dict[str, str]:
    """DuckDB fragments mirroring :func:`hll_bucket_rho` /
    :func:`hll_estimate` bit-for-bit at p=8 — the ONE place the SQL
    twin of the register kernel is spelled (round-11 review: the x40
    and w2b oracle builders each hand-copied these strings; a drift in
    one would silently attest a stale formula). Returns:

    - ``bucket`` / ``rho``: per-value register coordinates from
      ``md5(value_expr)`` (60-bit prefix, top 8 bits the register,
      53-wide leading-zero rank on the rest — ``4503599627370495`` is
      the 52-bit rest mask);
    - ``est``: the readback, assuming columns ``regs_used`` and
      ``sum_scaled`` (from the :func:`hll_state` shape) are in scope.
    """
    h60 = f"('0x' || substr(md5({value_expr}), 1, 15))::BIGINT"
    rest = f"({h60} & 4503599627370495)"
    raw = (
        f"{HLL_AM2!r} / (({HLL_M} - regs_used) + sum_scaled * {HLL_INV53!r})"
    )
    est = (
        f"CASE WHEN ({HLL_M} - regs_used) > 0 AND ({raw}) <= {2.5 * HLL_M!r} "
        f"THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - regs_used)) "
        f"ELSE {raw} END"
    )
    return {
        "bucket": f"{h60} >> 52",
        "rho": f"CASE WHEN {rest} = 0 THEN 53"
               f" ELSE 53 - length(bin({rest})) END",
        "est": est,
    }
