"""Source-layer tests: JSONL quarantine ingest and compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from insect_observation_data_pipeline_spark.sources.jsonl import read_jsonl, split_corrupt
from insect_observation_data_pipeline_spark.sources.parquet import compact, read_table

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_jsonl_quarantine_split(spark, tmp_path):
    """Malformed AND schema-violating lines land in quarantine with the
    raw line preserved; clean rows come out typed. One text scan, no
    cache (the reader avoids Spark's internal _corrupt_record column,
    which can't be queried uncached)."""
    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "hello world"}\n')
        f.write('{"doc_id": 2, "text": "ok"}\n')
        f.write("{broken json!!\n")
        f.write('{"doc_id": "not-an-int", "text": "bad type"}\n')
    good, bad = split_corrupt(read_jsonl(spark, p, DOC_SCHEMA))
    assert sorted((r["doc_id"], r["text"]) for r in good.collect()) == [
        (1, "hello world"),
        (2, "ok"),
    ]
    assert good.schema["doc_id"].dataType == LongType()
    bad_rows = bad.collect()
    assert {r["error_message"] for r in bad_rows} == {"Malformed JSON line."}
    assert sorted(r["row_data"] for r in bad_rows) == [
        '{"doc_id": "not-an-int", "text": "bad type"}',
        "{broken json!!",
    ]


def test_jsonl_all_clean_roundtrip(spark, tmp_path):
    """Clean-file fast path: quarantine empty, all rows typed."""
    p = str(tmp_path / "clean.jsonl")
    with open(p, "w") as f:
        for i in range(100):
            f.write(f'{{"doc_id": {i}, "text": "doc {i}"}}\n')
    good, bad = split_corrupt(read_jsonl(spark, p, DOC_SCHEMA))
    assert good.count() == 100 and bad.count() == 0


def test_compact_reduces_file_count(spark, tmp_path):
    """64-way fragmented dataset compacts to the size-derived partition
    count (1 for KB-scale data) with identical contents; works for both
    the coalesce and shuffle paths."""
    frag = str(tmp_path / "frag.parquet")
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    docs.repartition(64).write.parquet(frag)
    assert len(glob.glob(os.path.join(frag, "part-*.parquet"))) == 64

    for shuffle, name in ((False, "out_c.parquet"), (True, "out_r.parquet")):
        out = str(tmp_path / name)
        compacted = compact(spark.read.parquet(frag), shuffle=shuffle)
        compacted.write.parquet(out)
        files = glob.glob(os.path.join(out, "part-*.parquet"))
        assert len(files) == 1, (name, len(files))
        before = docs.select("doc_id").orderBy("doc_id").collect()
        after = (
            spark.read.parquet(out).select("doc_id").orderBy("doc_id").collect()
        )
        assert before == after


def test_write_range_sorted_disjoint_file_ranges(spark, tmp_path):
    """write_range_sorted yields the zone-map layout: per-file
    [min, max] key ranges are pairwise disjoint and rows are sorted
    within each file, so min/max stats prune at read time. A filtered
    read still returns exactly the right rows."""
    import glob

    import pyarrow.parquet as pq

    from insect_observation_data_pipeline_spark.sources.parquet import (
        read_table,
        write_range_sorted,
    )

    out = str(tmp_path / "orders_ranged")
    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    write_range_sorted(orders, out, sort_by=("o_orderdate",), num_files=6)

    spans = []
    for f in glob.glob(out + "/*.parquet"):
        t = pq.read_table(f, columns=["o_orderdate"])
        col = t.column("o_orderdate").to_pylist()
        if not col:
            continue
        assert col == sorted(col), "rows not sorted within file"
        spans.append((min(col), max(col)))
    assert len(spans) > 1
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {hi1} > {lo2}"

    got = spark.read.parquet(out).filter("o_orderdate >= DATE'1995-01-01'")
    want = orders.filter("o_orderdate >= DATE'1995-01-01'")
    assert got.count() == want.count()


def _scan_output_rows(df) -> int:
    """Rows the parquet SCAN produced (post row-group pruning, pre
    Spark-side Filter) — read from the executed plan's leaf metric
    after an action. This is the IO-skip observable: with filter
    pushdown, row groups whose min/max stats exclude the predicate are
    never decoded, so scan output < file row count proves pruning."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    scan = plan.collectLeaves().apply(0)
    return int(scan.metrics().apply("numOutputRows").value())


def test_write_range_sorted_scan_skips_row_groups(spark, tmp_path):
    """The zone-map layout's PAYOFF, measured at the engine: the same
    point-range predicate over the same rows decodes a fraction of the
    data when the table is range-clustered (write_range_sorted) vs a
    hash-scattered layout — parquet min/max stats let the reader skip
    whole files/row groups, which at 100 TB is the difference between
    touching a handful of files and scanning the table."""
    from insect_observation_data_pipeline_spark.sources.parquet import (
        read_table,
        write_range_sorted,
    )

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    total = orders.count()

    ranged = str(tmp_path / "orders_zonemap")
    write_range_sorted(orders, ranged, sort_by=("o_orderkey",), num_files=8)
    scattered = str(tmp_path / "orders_scattered")
    orders.repartition(8).write.parquet(scattered)

    pred = "o_orderkey BETWEEN 100 AND 400"
    sorted_scan = _scan_output_rows(spark.read.parquet(ranged).filter(pred))
    scattered_scan = _scan_output_rows(spark.read.parquet(scattered).filter(pred))

    # identical results either way...
    assert (
        spark.read.parquet(ranged).filter(pred).count()
        == spark.read.parquet(scattered).filter(pred).count()
        == orders.filter(pred).count()
    )
    # ...but the scattered layout decodes every row (every row group's
    # [min,max] spans the predicate) while the clustered one decodes
    # only the row groups covering the key range
    assert scattered_scan == total
    # ~20% of the key space lands in <= 3 of 8 range files (sampled
    # boundaries are uneven, so allow up to half the table)
    assert sorted_scan <= total // 2, (
        f"range-clustered scan decoded {sorted_scan}/{total} rows — "
        "row-group skipping is not happening"
    )


def test_write_zordered_skips_files_on_both_dims(spark, tmp_path):
    """The Z-order claim, measured: with two independent uniform dims,
    a narrow filter on EITHER dim touches a small fraction of the
    z-ordered files (each file's min/max covers a narrow rectangle),
    while the single-key range-sorted layout only skips on its sort
    key — a filter on the other dim touches every file. File-touch
    counts come from input_file_name() over the filtered scan."""
    from pyspark.sql import functions as F

    from insect_observation_data_pipeline_spark.sources.parquet import (
        write_range_sorted,
        write_zordered,
    )

    n = 40_000
    # two decorrelated uniform dims derived from id (multiplicative
    # hashing mod a prime), deterministic
    base = spark.range(n).select(
        ((F.col("id") * 48271) % 99991).alias("x"),
        ((F.col("id") * 16807) % 99991).alias("y"),
    )
    zpath = str(tmp_path / "zord")
    lpath = str(tmp_path / "linear")
    write_zordered(base, zpath, zorder_by=("x", "y"), bits=8, num_files=16)
    write_range_sorted(base, lpath, sort_by=("x",), num_files=16)

    def files_touched(path: str, pred: str) -> int:
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    total_z = files_touched(zpath, "1=1")
    total_l = files_touched(lpath, "1=1")
    assert total_z >= 8 and total_l >= 8

    # ~2% slice on each dim
    for dim in ("x", "y"):
        pred = f"{dim} >= 50000 AND {dim} < 52000"
        zt = files_touched(zpath, pred)
        assert zt <= total_z // 2, (dim, zt, total_z)
    lt_x = files_touched(lpath, "x >= 50000 AND x < 52000")
    lt_y = files_touched(lpath, "y >= 50000 AND y < 52000")
    assert lt_x <= 2  # the sort key prunes hard
    assert lt_y == total_l  # the other dim prunes nothing
    # both-dim conjunction: z-order compounds the pruning
    zt_xy = files_touched(
        zpath, "x >= 50000 AND x < 52000 AND y >= 50000 AND y < 52000"
    )
    assert zt_xy <= 4, zt_xy

    # layout changes bytes, never rows
    assert spark.read.parquet(zpath).count() == n


def test_compact_rejects_cbo_less_join_estimate(spark, tmp_path):
    """Round-12 review: for a join without CBO stats Catalyst's
    sizeInBytes is the PRODUCT of child sizes — repartition(n) on it
    overflowed Java's int and coalesce(n) was a silent no-op. compact()
    must refuse the unusable estimate loudly."""
    import pytest

    from insect_observation_data_pipeline_spark.sources.parquet import compact

    p = str(tmp_path / "t.parquet")
    spark.range(0, 50_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    # the CBO-less estimate is the PRODUCT of child sizes: three
    # ~236 KB scans estimate as ~1.3e16 "bytes" (~1e8 partitions) for
    # a join whose true output is 50k rows — at real 1 GB+ inputs a
    # single join already crosses the guard
    joined = (
        df.join(df.selectExpr("id", "pad AS pad2"), "id")
        .join(df.selectExpr("id", "pad AS pad3"), "id")
    )
    with pytest.raises(ValueError, match="not a usable measurement"):
        compact(joined, shuffle=True)
    # scans keep working
    assert compact(df).rdd.getNumPartitions() >= 1


def test_jsonl_blank_and_null_lines(spark, tmp_path):
    """Round-13 review: blank/whitespace-only lines are record
    SEPARATORS (dropped); a line the parser yields no record for (bare
    'null' -> NULL struct, corrupt field unset) is QUARANTINED with its
    raw text — neither may land in GOOD as an all-NULL row."""
    from insect_observation_data_pipeline_spark.sources.jsonl import read_jsonl, split_corrupt
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "text": "ok"}\n')
        f.write("\n")            # blank: dropped
        f.write("   \n")         # whitespace-only: dropped
        f.write("\t\t\n")        # tab-only: dropped (r14 ADVICE: trim
        f.write(" \t \r\n")      # only caught spaces; CR/tab leaked)
        f.write("null\n")        # parses to no record: quarantined
        f.write('{"id": "x"}\n')  # type mismatch: quarantined
    schema = StructType(
        [StructField("id", LongType()), StructField("text", StringType())]
    )
    good, bad = split_corrupt(read_jsonl(spark, p, schema))
    grows = good.collect()
    assert [(r["id"], r["text"]) for r in grows] == [(1, "ok")]
    brows = {r["row_data"] for r in bad.collect()}
    assert brows == {"null", '{"id": "x"}'}


def test_csv_staging_rejects_default_collision_and_header_drift(
    spark, tmp_path
):
    """Round-13 review: (a) a defaults key naming a file column raises
    instead of silently constant-overwriting every row; (b) a file
    whose header ORDER drifted from the declared columns fails loudly
    (enforceSchema=False) instead of silently mis-mapping positionally."""
    import pytest

    from insect_observation_data_pipeline_spark.sources.csv import read_csv_staging

    p = str(tmp_path / "inst.csv")
    with open(p, "w") as f:
        f.write("city,institution\n")  # swapped vs declared order
        f.write("Leeds,Solo Lab\n")
    with pytest.raises(ValueError, match="collide"):
        read_csv_staging(
            spark, p, ["institution", "city"], defaults={"city": "X"}
        )
    with pytest.raises(Exception, match="(?i)header|schema"):
        read_csv_staging(spark, p, ["institution", "city"]).collect()


def test_write_zordered_rejects_reserved_column(spark, tmp_path):
    from insect_observation_data_pipeline_spark.sources.parquet import write_zordered
    import pytest

    df = spark.range(4).withColumn("__z", F.lit(1))
    with pytest.raises(ValueError, match="__z"):
        write_zordered(df, str(tmp_path / "z"), zorder_by=("id",))


def test_get_spark_rejects_zero_shuffle_partitions():
    import pytest

    from insect_observation_data_pipeline_spark import get_spark

    with pytest.raises(ValueError, match="shuffle_partitions"):
        get_spark("t", shuffle_partitions=0)
