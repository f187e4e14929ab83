"""Parquet table loading for the driver's synthetic star schema.

Columnar scans give us what the reference hand-implements: column pruning
(reference bag_parser.py:97-99 whitelists XML fields) and early filtering
(reference bag_parser.py:106-107) arrive free via Catalyst pushdown into the
parquet reader — verify with .explain() showing PushedFilters/ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
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
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin timestamp semantics to UTC even under a caller-owned session —
    # date formatting/extraction must match the (naive-timestamp) oracle
    # regardless of the host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet carries INT64 TIMESTAMP(NANOS), which vanilla Spark
        # refuses; read nanos as long and rebuild a (microsecond) timestamp.
        # Runtime conf so it also works under a driver-owned session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            # integer div, NOT `/ 1000`: float division of ~1.7e18 nanos
            # exceeds double's 2^53 precision and lands a micro off
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """S11 replacement: the reference builds B-tree indices on join keys
    (reference database_sqlite.py:274-289) to make its update-joins cheap.
    Spark has no indices; the equivalent is bucketed storage — data
    pre-shuffled into ``num_buckets`` files by key at WRITE time so every
    later join/aggregation on that key is exchange-free (the one-time
    shuffle is amortized over all downstream readers, exactly what an
    index build is). At 100 TB: bucket both sides of the recurring big-big
    join (nummers ⋈ verblijfsobjecten) on the join key with equal bucket
    counts; optional sortBy gives sort-merge join its order for free."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> int:
    """S10: small-file compaction — the engine's stand-in for the
    reference's post-shrink ``VACUUM`` (reference utils_sqlite_shrink.py:
    1-13, database_sqlite.py:51-52) and for Delta ``OPTIMIZE``.

    Streaming sinks and fine-grained ingests leave thousands of tiny files;
    at 100 TB the file-listing and per-file open costs dominate scans long
    before the bytes do. Rewrites ``path`` (or writes to ``out_path``) as
    ceil(total_bytes / target) files via a round-robin repartition — no
    shuffle key, so data distributes evenly regardless of skew in the
    original layout. Returns the output file count. Writing to a NEW
    directory then swapping is the crash-safe pattern at scale (never
    compact in place without a commit protocol); in-place here relies on
    Spark's job-level atomic commit, matching the reference's
    drop-then-VACUUM sequencing.
    """
    import math

    from py4j.java_gateway import java_import

    df = spark.read.parquet(path)
    jvm = spark.sparkContext._jvm
    java_import(jvm, "org.apache.hadoop.fs.Path")
    hadoop_path = jvm.Path(path)
    fs = hadoop_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    total = sum(
        f.getLen()
        for f in fs.listStatus(hadoop_path)
        if f.getPath().getName().endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    dest = out_path or path
    if dest == path:
        # materialize before overwriting the input we are reading
        df = df.localCheckpoint(eager=True)
    df.repartition(n_files).write.mode("overwrite").parquet(dest)
    return n_files


def write_partitioned(
    df: DataFrame, out_dir: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned layout (``out_dir/col=value/…``) — the
    directory-level complement to ``write_bucketed``: bucketing organizes
    WITHIN files by join key; partitioning organizes the DIRECTORY tree by
    a low-cardinality scan key (almost always the date) so Catalyst prunes
    whole partitions from a scan before reading a byte — .explain shows
    the predicate under PartitionFilters, not PushedFilters. The standard
    100 TB table layout: partition by ingest date, bucket by join key,
    compact per partition (compact_parquet)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_dir)


def overwrite_partitions_dynamic(
    df: DataFrame, out_dir: str, partition_cols: list[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present in
    ``df``, leave every other partition untouched — the idempotent
    incremental-load pattern (re-running a day's ingest rewrites that
    day's directory and nothing else; a plain overwrite would drop the
    whole table). Writer-level option, no session mutation, so concurrent
    jobs with static overwrite semantics are unaffected."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(out_dir)
    )


def read_merged_schema(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union parquet generations whose schemas
    drifted (columns added over time), resolving to the merged schema
    with NULLs where an older file lacks a column. ``mergeSchema`` makes
    the footer reconciliation explicit and one-time per query — the
    default (first-file schema) silently DROPS new columns, which at
    100 TB means a backfill reading a year of daily drops quietly loses
    the fields added mid-year. Renames/type changes still need an
    explicit migration; this covers the additive case that dominates."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
