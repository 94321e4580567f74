from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.functions.dates import build_observation_date, clamp_day
from insect_observation_data_pipeline_spark.functions.numeric import stable_round, sround_sql
from insect_observation_data_pipeline_spark.functions.text import (
    normalize_na,
    parse_first_name,
    parse_last_name,
    species_case,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_name_parsing(spark):
    cases = [
        ("R. E. Chapman", "R. E.", "Chapman"),
        ("The North London Natural History Society", None,
         "The North London Natural History Society"),
        ("A. Smith", "A.", "Smith"),
    ]
    for full, first, last in cases:
        assert _one(spark, parse_first_name(F.lit(full))) == first
        assert _one(spark, parse_last_name(F.lit(full))) == last


def test_species_case(spark):
    assert _one(spark, species_case(F.lit("apis MELLIFERA"))) == "Apis mellifera"
    assert _one(spark, species_case(F.lit(" prunella vulgaris "))) == "Prunella vulgaris"


def test_normalize_na(spark):
    assert _one(spark, normalize_na(F.lit("  NA "))) is None
    assert _one(spark, normalize_na(F.lit("   "))) is None
    assert _one(spark, normalize_na(F.lit(" x "))) == "x"


def test_clamp_day_reference_quirks(spark):
    # Feb always clamps to 28, even leap years (04_ETL1_part3.sql:370-377)
    # no year parameter: Feb clamps to 28 EVEN IN LEAP YEARS (the
    # reference quirk) — the signature itself now says so (round 13)
    assert _one(spark, clamp_day(F.lit(2), F.lit(29))) == 28
    assert _one(spark, clamp_day(F.lit(4), F.lit(31))) == 30
    assert _one(spark, clamp_day(F.lit(1), F.lit(31))) == 31


def test_build_observation_date_placeholders(spark):
    d = _one(
        spark,
        build_observation_date(F.lit(2019), F.lit(None).cast("int"), F.lit(None).cast("int")),
    )
    assert str(d) == "2019-01-01"  # January placeholder
    assert (
        _one(
            spark,
            build_observation_date(F.lit(None).cast("int"), F.lit(6), F.lit(14)),
        )
        is None
    )


def test_stable_round_matches_duckdb_on_boundaries(spark):
    """The exact failure class that broke native round(): halfway shortest
    reprs like 189/40 = 4.725."""
    vals = [189 / 40, 0.125, -0.125, 2.675, 1e15 / 7, 0.0, -0.0049999]
    con = duckdb.connect()
    for v in vals:
        for d in (2, 3, 4):
            s_val = _one(spark, stable_round(F.lit(v), d))
            # CAST: a bare 4.725 literal is DECIMAL in DuckDB, not DOUBLE
            d_val = con.execute(
                f"SELECT {sround_sql(f'CAST({v!r} AS DOUBLE)', d)}"
            ).fetchone()[0]
            assert s_val == d_val, (v, d, s_val, d_val)


def test_approx_distinct_within_tolerance(spark):
    """HLL++ estimate lands within 3x the configured rsd of exact."""
    from insect_observation_data_pipeline_spark.functions import approx_distinct
    from insect_observation_data_pipeline_spark.sources.parquet import read_table

    l = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    exact = l.select(F.countDistinct("l_partkey").alias("n")).collect()[0]["n"]
    est = l.select(approx_distinct("l_partkey", rsd=0.05).alias("n")).collect()[0]["n"]
    assert abs(est - exact) / exact <= 0.15


def test_sketch_audit_verdicts_partitioning_invariant(spark):
    """f_sketch_audit's oracle contract is `sketch_ok` = TRUE for every
    (flag, metric) row, and the driver runs it on a session whose
    partition layout we don't control — so the verdicts must hold under
    radically different partitionings. HLL is per-register max-merged
    (value IDENTICAL under any split); GK percentile summaries can
    differ per merge order but must stay far inside the 1% tolerance."""
    from insect_observation_data_pipeline_spark.queries.testdata import f_sketch_audit
    from insect_observation_data_pipeline_spark.sources.parquet import read_table

    base = f_sketch_audit(spark, "/root/testdata/sf0.001")
    assert all(r["sketch_ok"] for r in base.collect())

    l = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    for parts in (1, 17):
        shuffled = l.repartition(parts)
        g = shuffled.groupBy("l_returnflag").agg(
            F.count_distinct("l_orderkey").alias("exact_d"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("hll_d"),
            F.percentile("l_extendedprice", 0.95).alias("exact_p95"),
            F.expr(
                "approx_percentile(l_extendedprice, 0.95, 10000)"
            ).alias("gk_p95"),
        )
        for r in g.collect():
            assert abs(r["hll_d"] - r["exact_d"]) <= 0.05 * r["exact_d"], (
                parts,
                r,
            )
            assert abs(r["gk_p95"] - r["exact_p95"]) <= 0.01 * r["exact_p95"], (
                parts,
                r,
            )


def test_approx_quantiles_close_to_exact(spark):
    from insect_observation_data_pipeline_spark.functions import approx_quantiles
    from insect_observation_data_pipeline_spark.sources.parquet import read_table

    l = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    got = l.select(
        approx_quantiles("l_extendedprice", [0.5, 0.9]).alias("q")
    ).collect()[0]["q"]
    exact = l.selectExpr(
        "percentile(l_extendedprice, array(0.5, 0.9)) AS q"
    ).collect()[0]["q"]
    for est, ex in zip(got, exact):
        assert abs(est - ex) / ex <= 0.01


def test_cm_sketch_one_sided_and_exact_when_wide(spark):
    """Count-min property pins on a corpus engineered to collide: with
    width 4 every term shares buckets, so estimates may overestimate
    but NEVER underestimate (every occurrence of a term lands in each
    of its own buckets); with a width far beyond the vocabulary the
    3-row min recovers the exact count for every term."""
    from pyspark.sql import functions as F

    from insect_observation_data_pipeline_spark.functions import approx

    rows = [(t, c) for t, c in
            [("a", 100), ("b", 40), ("c", 7), ("d", 3), ("e", 1),
             ("f", 999), ("g", 12), ("h", 5)]]
    tf = spark.createDataFrame(rows, "term string, exact_cnt long")

    def estimates(width):
        wts = approx.cm_weights(tf, "term", "exact_cnt", depth=3, width=width)
        probes = tf.select(
            "term", "exact_cnt",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("cm_row"),
        ).withColumn("bucket", approx._cm_bucket_expr("term", "cm_row", width))
        return {
            r["term"]: (r["exact_cnt"], r["est"])
            for r in probes.join(wts, ["cm_row", "bucket"])
            .groupBy("term", "exact_cnt")
            .agg(F.min("weight").alias("est"))
            .collect()
        }

    tight = estimates(4)
    assert len(tight) == 8
    assert all(est >= cnt for cnt, est in tight.values())  # one-sided
    assert any(est > cnt for cnt, est in tight.values())   # collisions real
    wide = estimates(1 << 20)
    assert all(est == cnt for cnt, est in wide.values())   # exact when wide


def test_hll_registers_ignore_nulls(spark):
    """Round-12 review: the register table estimates COUNT(DISTINCT),
    which ignores NULLs — md5(NULL)=NULL used to add a phantom
    (NULL, NULL) register row that inflated regs_used and biased the
    readback. Register tables with and without NULL rows must be
    identical."""
    from insect_observation_data_pipeline_spark.functions import approx

    base = [(str(i),) for i in range(50)]
    clean = spark.createDataFrame(base, "v string")
    dirty = spark.createDataFrame(base + [(None,)] * 7, "v string")
    snap = lambda df: {  # noqa: E731
        (r["bucket"], r["max_rho"])
        for r in approx.hll_registers(df, "v").collect()
    }
    regs_clean, regs_dirty = snap(clean), snap(dirty)
    assert regs_dirty == regs_clean
    assert all(b is not None for b, _ in regs_clean)


def test_hash_sk_distinguishes_null_positions(spark):
    """Round-13 review: Spark's xxhash64 SKIPS NULL children, so without
    per-column isNull flags ('X', NULL), (NULL, 'X') and ('X',) all
    hashed identically — guaranteed surrogate-key collisions on keys
    differing only in NULL position."""
    from insect_observation_data_pipeline_spark.functions.keys import hash_sk

    df = spark.range(1)
    lit = lambda v: F.lit(v).cast("string")
    vals = [
        hash_sk("t", [lit("X"), lit(None)]),
        hash_sk("t", [lit(None), lit("X")]),
        hash_sk("t", [lit("X")]),
        hash_sk("t", [lit(None), lit(None)]),
    ]
    row = df.select(*[v.alias(f"h{i}") for i, v in enumerate(vals)]).collect()[0]
    hashes = [row[f"h{i}"] for i in range(len(vals))]
    assert len(set(hashes)) == len(hashes), hashes


def test_cm_weights_excludes_null_terms_and_guards_shape(spark):
    """Round-13 review: NULL terms minted a phantom NULL bucket that
    absorbed their counts (md5(concat(...NULL)) is NULL); they are
    excluded like the sibling sketches, and degenerate depth/width
    raise."""
    import pytest

    from insect_observation_data_pipeline_spark.functions import approx

    tf = spark.createDataFrame(
        [("a", 3), (None, 5), ("b", 2)], "term string, cnt int"
    )
    w = approx.cm_weights(tf, "term", "cnt", depth=2, width=8)
    rows = w.collect()
    assert all(r["bucket"] is not None for r in rows)
    # per sketch row, total weight == sum of NON-NULL term counts
    per_row = {}
    for r in rows:
        per_row[r["cm_row"]] = per_row.get(r["cm_row"], 0) + r["weight"]
    assert per_row == {0: 5, 1: 5}
    with pytest.raises(ValueError, match="depth/width"):
        approx.cm_weights(tf, "term", "cnt", depth=0)


def test_binned_histogram_exact_at_large_magnitudes(spark):
    """Round-13 review: float division mis-bins |values| > 2^53 (epoch
    nanos); DIV with the negative correction is exact at any magnitude
    and floors negatives like the DuckDB oracle's // operator."""
    import pytest

    from insect_observation_data_pipeline_spark.functions import approx

    big = (1 << 60) + 7  # float(v)/8 would round the low bits away
    df = spark.createDataFrame(
        [(big,), (-17,), (15,), (None,)], "v long"
    )
    got = {
        r["bin"]: r["cnt"]
        for r in approx.binned_histogram(df, "v", width=8).collect()
    }
    assert got == {big // 8: 1, -17 // 8: 1, 15 // 8: 1}  # python // = floor
    with pytest.raises(ValueError, match="width"):
        approx.binned_histogram(df, "v", width=0)


def test_binned_histogram_fractional_values(spark):
    """Round-14 ADVICE: the SQL DIV rewrite fails analysis outright on
    DOUBLE/FLOAT value columns (DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES);
    fractional inputs must take the F.floor(col/width) path and still
    floor negatives like DuckDB's // on doubles."""
    from insect_observation_data_pipeline_spark.functions import approx

    df = spark.createDataFrame(
        [(16.5,), (-0.25,), (7.999,), (None,)], "v double"
    )
    got = {
        r["bin"]: r["cnt"]
        for r in approx.binned_histogram(df, "v", width=8).collect()
    }
    assert got == {2: 1, -1: 1, 0: 1}
    # the quantile readback built on top must analyze too
    q = approx.binned_quantiles(df, "v", width=8, pcts=(50,)).collect()
    assert q[0]["n_rows"] == 3
