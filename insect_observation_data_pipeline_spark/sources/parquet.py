"""Parquet table sources.

The engine's warehouse layout is one directory per layer with one parquet
dataset per table (``<dir>/<table>.parquet``). Reads are plain
``spark.read.parquet`` so Catalyst gets column pruning + predicate pushdown
into the vectorized parquet reader for free — at 100 TB this (plus partition
pruning on partitioned layouts) is the single biggest lever, so nothing here
may wrap the scan in an opaque UDF or RDD.

Replaces the reference's postgres_fdw cross-database hop
(/root/reference/03_sql/03_olap/06_connect_olap_to_oltp.sql:3-18): both
layers live in one Spark warehouse, so a "foreign" table is just another
parquet path (or ``spark.read.jdbc`` for a genuinely remote RDBMS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    """Read one warehouse table. Column pruning/pushdown stay enabled.

    Files written with nanosecond-precision timestamps (unsupported by
    Spark's parquet reader) are read via the legacy nanos-as-long path and
    the column is rebuilt as a microsecond timestamp with exact integer
    ``div 1000`` truncation — bit-identical to DuckDB/pyarrow's ns->us
    truncation, so oracle comparisons stay exact.

    NOT thread-safe for nanos files: the legacy conf is session-global
    during the save/set/restore window, so a concurrent reader on
    another thread could observe it. Single-threaded drivers (this
    engine's model) are unaffected; guard with a lock if a multi-
    threaded driver ever shares the session.
    """
    path = f"{base_dir}/{name}.parquet"
    nanos_cols = _nanos_timestamp_columns(path)
    if not nanos_cols:
        return _normalize_ntz(spark.read.parquet(path))
    # The legacy conf is consumed at schema-inference time (verified: the
    # relation keeps its long-typed columns and executes fine after the
    # conf is restored), so scope it to this read instead of leaking a
    # session-global behavior change to later unrelated parquet reads.
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
    from pyspark.sql import functions as F

    for col in nanos_cols:
        if df.schema[col].dataType.simpleString() == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return _normalize_ntz(df)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Pin every TIMESTAMP_NTZ column to TIMESTAMP — read_table's dtype
    contract on ANY session. Parquet files written without the
    UTC-adjusted flag (all the testdata timestamps) are inferred as NTZ
    by any session with Spark 4.x's default
    ``spark.sql.parquet.inferTimestampNTZ=true`` — the driver's shape;
    our own session factory pins that conf off (session.py), which is
    why the drift only ever showed on the driver (the j14 failure:
    ``unix_micros``/``withWatermark`` reject NTZ). Normalizing at the
    read boundary closes the whole class for every query that loads
    data through read_table. The cast reinterprets the wall clock in
    the session tz — the identity on the instant for the UTC sessions
    this engine documents (session.py)."""
    from pyspark.sql import functions as F

    for f in df.schema.fields:
        if f.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def _nanos_timestamp_columns(path: str) -> set[str]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer.

    Driver-side footer peek (pyarrow) — O(KB), no data read. Needed because
    Spark either rejects nanos outright or (with the legacy conf) exposes
    them as raw longs with no marker of their true type.
    """
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pq.ParquetDataset(path).schema
        return {
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        }
    except Exception:
        return set()


def read_tables(
    spark: SparkSession, base_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: read_table(spark, base_dir, n) for n in names}


def register_views(
    spark: SparkSession, base_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Expose the warehouse tables as temp views: the SQL surface.

    After this, every workload expressible in the DataFrame library runs
    as ``spark.sql(...)`` too — both compile to the same Catalyst plans
    (SURVEY §3 EP3: queries are dual DataFrame/SQL functions).
    """
    for name in names:
        read_table(spark, base_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...],
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write a table hive-partitioned (+ optionally sorted within files).

    Partition columns become directories, so any filter on them prunes
    whole partitions at plan time (`PartitionFilters` in explain) — the
    100 TB analog of an index. ``sort_by`` clusters rows inside each file
    so min/max row-group stats make non-partition predicates selective
    too (poor man's Z-order). Keep partition cardinality moderate
    (<= ~10k dirs): tiny partitions mean tiny files and listing overhead.
    """
    out = df.repartition(*[df[c] for c in partition_by])
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.partitionBy(*partition_by).mode(mode).parquet(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    *,
    sort_by: tuple[str, ...],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write globally range-clustered, within-file sorted parquet.

    ``repartitionByRange`` samples the sort key and assigns each output
    file a DISJOINT key range; ``sortWithinPartitions`` orders rows
    inside each file. The result is the zone-map layout: every file's
    parquet min/max stats cover a narrow slice of the key space, so a
    later filtered scan skips whole files/row-groups at the reader
    instead of scanning everything — the flat-layout complement to
    ``write_partitioned`` for HIGH-cardinality keys (timestamps, ids)
    where one-directory-per-value is impossible. At 100 TB this is the
    difference between a point-range query touching a handful of files
    and touching the whole table. ``num_files`` defaults to the session
    shuffle parallelism; size it as table_bytes / ~128 MB."""
    out = (
        df.repartitionByRange(num_files, *sort_by)
        if num_files
        else df.repartitionByRange(*sort_by)
    )
    out.sortWithinPartitions(*sort_by).write.mode(mode).parquet(path)


#: compact() refuses plans whose size estimate implies more partitions
#: than this — at the 128 MB default target that is 128 TB of data,
#: past which the estimate is a CBO-less join blowup, not a scan size.
_COMPACT_MAX_PARTITIONS = 1 << 20


def compact(df: DataFrame, *, target_partition_bytes: int = 128 << 20,
            shuffle: bool = False) -> DataFrame:
    """Right-size output partitioning before a write: the small-files
    fix for ingest layers that accumulate thousands of KB-scale files
    (every file costs a task + an open + footer IO downstream — at
    100 TB the listing alone can dominate).

    The partition count comes from Catalyst's own size estimate for the
    plan (for file scans: the sum of file sizes — a metadata lookup, NO
    data pass), divided by the target. ``shuffle=False`` (default) uses
    ``coalesce`` — merges partitions with zero shuffle, the cheap path
    for read-compact-rewrite jobs; ``shuffle=True`` uses
    ``repartition`` for an even rebalance when the inputs are skewed.

    Scans are the supported input: for derived plans without CBO
    stats (e.g. a join), Catalyst's estimate is the PRODUCT of child
    sizes — astronomically large, not a measurement — and blindly
    using it made ``repartition(n)`` overflow Java's int while the
    default ``coalesce(n)`` became a silent no-op (round-12 review).
    Estimates above ``_COMPACT_MAX_PARTITIONS`` (1M partitions = 128 TB
    at the default target, comfortably past the engine's design
    posture) now raise instead.
    """
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n = max(1, -(-size // target_partition_bytes))
    if n > _COMPACT_MAX_PARTITIONS:
        raise ValueError(
            f"compact: Catalyst sizeInBytes estimate {size} "
            f"(-> {n} partitions at {target_partition_bytes} B each) is "
            "not a usable measurement — non-scan plans without CBO "
            "statistics default to the product of child sizes. compact() "
            "right-sizes file SCANS; write the derived frame first or "
            "repartition it explicitly"
        )
    return df.repartition(n) if shuffle else df.coalesce(n)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: tuple[str, ...],
    num_buckets: int = 32,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write a managed table hash-bucketed on the join/agg key.

    Two tables bucketed on the same key with the same bucket count join
    with NO shuffle on either side (bucketing is a persisted
    pre-shuffle) — the co-located-join lever for fact-to-fact joins at
    100 TB, where broadcasting is impossible and a per-query shuffle of
    the big side dominates runtime. ``sort_by`` additionally pre-sorts
    within buckets, letting sort-merge join skip its sort.

    ``path`` makes the table EXTERNAL at that location (the data
    outlives the metastore — the shape for incrementally-grown state
    like the streaming dedup index, where each epoch appends bucketed
    files and every later join reads them bucket-aligned).
    """
    writer = df.write.bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.mode(mode).format("parquet").saveAsTable(table)


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_by: tuple[str, ...],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-order clustered on MULTIPLE dimensions — the
    multi-dim complement of :func:`write_range_sorted` (whose single
    sort key gives perfect min/max locality on that key and none on
    any other). Each dimension is normalized to a ``bits``-bit bucket
    on its [min, max] range (equi-width — one tiny agg for the bounds;
    heavily skewed dims should be pre-transformed, e.g. log), the
    bucket bits are interleaved into one z-value (dimension-rotating
    bit order, the standard Morton curve), and files are range-
    partitioned + sorted on it. Because the space-filling curve keeps
    z-adjacent rows close in EVERY dimension, each file's parquet
    min/max stats cover a narrow rectangle of the key space, and a
    selective filter on ANY zorder dimension skips most files — the
    public OPTIMIZE-ZORDER technique, built from plain expressions.

    All arithmetic is JVM expressions (shift/and/or built from the
    bounds literals); the only driver-side data is the 2-value bounds
    row per dimension."""
    from pyspark.sql import functions as F

    dims = list(zorder_by)
    if not dims:
        raise ValueError("zorder_by must name at least one column")
    if "__z" in df.columns:
        # withColumn would silently REPLACE the caller's column and the
        # final drop would erase it from the written output (round-13
        # review)
        raise ValueError("df already has a '__z' column — rename it first")
    if bits * len(dims) > 63:
        # Java shift amounts wrap mod 64: past 63 bits the interleave
        # would silently fold one dimension's bits onto another's and
        # break z-injectivity — fail loudly instead
        raise ValueError(
            f"bits * len(zorder_by) = {bits * len(dims)} exceeds the "
            "63-bit z-value budget; lower bits or drop dimensions"
        )
    # the bounds agg executes df's WHOLE plan once and the write
    # executes it again — pin it for the pair (round-13 review: for a
    # derived df the recompute doubled the job; for a plain scan the
    # persist is near-free because the agg only reads the dim columns)
    df = df.persist()
    try:
        bounds = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(dims)],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(dims)],
        ).collect()[0]
        n_buckets = (1 << bits) - 1
        bucket_cols = []
        for i, c in enumerate(dims):
            mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
            span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
            b = F.least(
                F.lit(n_buckets),
                F.floor(
                    (F.coalesce(F.col(c).cast("double"), F.lit(mn or 0.0)) - F.lit(mn or 0.0))
                    / F.lit(span)
                    * F.lit(float(n_buckets + 1))
                ).cast("long"),
            )
            bucket_cols.append(b)
        z = F.lit(0).cast("long")
        for i in range(bits):
            for d, b in enumerate(bucket_cols):
                bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit, i * len(dims) + d))
        out = df.withColumn("__z", z)
        out = (
            out.repartitionByRange(num_files, "__z")
            if num_files
            else out.repartitionByRange("__z")
        )
        out.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)
    finally:
        df.unpersist()
