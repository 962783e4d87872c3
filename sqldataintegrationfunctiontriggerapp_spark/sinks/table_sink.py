"""Table sinks: partitioned / bucketed lake writes.

The layout decisions that make a 100 TB table queryable:

- **Partition by a low-cardinality pruning column** (date, region): a query
  with a partition predicate reads only matching directories -- the
  partition-pruning analog of the reference's per-table change feeds.
- **Bucket by the join/dedup key**: two tables bucketed the same way
  equi-join WITHOUT a shuffle (bucket-local sort-merge). This is the
  pre-partitioning the reference's keyed batch loop (sql.txt:113-134)
  hand-rolls.
- **Control file count**: `target_file_partitions` repartitions before the
  write so a partition doesn't fragment into thousands of tiny files (the
  classic small-files failure at scale); at 100 TB aim for ~128 MB-1 GB
  files per spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    target_file_partitions: int | None = None,
) -> None:
    """Directory-partitioned parquet. With dynamic partition overwrite the
    engine replaces only the partitions present in `df` (the incremental
    refresh shape), not the whole table."""
    out = df
    if target_file_partitions is not None:
        out = df.repartition(target_file_partitions, *partition_cols)
    (
        out.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table (bucketBy requires saveAsTable).
    Joining two tables bucketed on the same key with the same bucket count
    is shuffle-free; the sort makes it merge-ready."""
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def compact_partition(
    spark, path: str, partition_col: str, partition_value, target_files: int = 1
) -> None:
    """Rewrite one partition into `target_files` files (small-file
    compaction -- the maintenance job that keeps streaming sinks healthy).
    Uses dynamic partition overwrite so only the named partition changes."""
    part = spark.read.parquet(path).where(F.col(partition_col) == partition_value)
    (
        part.repartition(target_files)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
