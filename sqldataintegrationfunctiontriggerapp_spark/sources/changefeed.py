"""Change-feed source -- the engine's version of the SqlTrigger input
binding (SqlTriggerFunctions.cs:31-56; semantics README.md:19-23).

The reference delivers per-table batches of *current row states* with an
operation tag, ordered and checkpointed. Two Spark shapes:

- **Batch incremental scan**: rows with change-timestamp past a high-water
  mark; the watermark predicate pushes into the parquet scan (row-group
  min/max skipping), so an incremental read of a time-partitioned 100 TB
  table touches only new files.
- **Streaming**: `readStream` file source; Structured Streaming's
  checkpointLocation supplies the lease/offset semantics
  (`maxFilesPerTrigger` == Sql_Trigger_MaxBatchSize, Trigger.ProcessingTime
  == Sql_Trigger_PollingIntervalMs).

Both emit the change-record envelope `(operation, item-columns...)`
mirroring SqlChange<T> {Operation, Item} (SqlTriggerFunctions.cs:34).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def with_operation(df: DataFrame, operation: str = "Update") -> DataFrame:
    """Tag rows with the SqlChange.Operation enum (Insert|Update|Delete).
    A plain snapshot scan cannot distinguish operations (the reference gets
    them from SQL Server change tracking), so callers pass the tag; a CDF
    source would carry its own _change_type."""
    return df.withColumn("operation", F.lit(operation))


def batch_changes(
    df: DataFrame,
    ts_col: str,
    watermark,
    operation: str = "Update",
    max_batch_rows: int | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Batch analog of one trigger delivery: rows changed since `watermark`,
    optionally capped at max_batch_rows in change order (Sql_Trigger_
    MaxBatchSize, local.settings.json:8). The cap uses a global sort limit --
    cheap because TakeOrderedAndProject never materializes a full sort."""
    out = df.where(F.col(ts_col) > F.lit(watermark))
    if max_batch_rows is not None:
        out = out.orderBy(*(order_cols or [ts_col])).limit(max_batch_rows)
    return with_operation(out, operation)


def latest_state_per_key(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """'Only the latest data changes are delivered. This is not a change log.'
    (README.md:21) -- collapse multiple changes per key to the current state."""
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_changes(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
    operation: str = "Update",
) -> DataFrame:
    """Streaming change feed over a file source. Checkpointing (the lease
    table analog, README.md:19) is configured on the writeStream side."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return with_operation(reader.load(path), operation)
