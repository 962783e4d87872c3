"""Keyed state table -- the engine's replacement for durable entities
(EntityFunctions.cs) and orchestration instance registries.

Schema: (entity_type, key, value, updated_at). The reference keeps two
entity families keyed by table name -- LastError {message, date}
(EntityFunctions.cs:8-27) and AllowedColumns {csv} (:32-47) -- plus
singleton orchestration instances keyed by table (RetryFunctions.cs:92).
All three map onto rows here.

Storage: a parquet directory laid out as
``entity_type=<t>/bucket=<md5(key) % N>/``; an upsert reads, merges, and
overwrites ONLY the one (entity_type, bucket) partition its key hashes to,
so concurrent upserts against different tables touch disjoint files and the
write cost is O(keys-in-bucket), never O(state). Point lookups (`get`) read
one partition directory. On a cluster this layout maps 1:1 onto a Delta
table partitioned the same way with `MERGE INTO`; the API is shaped so that
swap is one method body. The md5 bucket (not Spark's hash()) keeps the
layout engine-portable and stable across versions.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

# data files inside a partition carry only the non-partition columns
_PART_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

N_BUCKETS = 16

LAST_ERROR = "LastError"          # EntityFunctions.cs:8
ALLOWED_COLUMNS = "AllowedColumns"  # EntityFunctions.cs:32


def key_bucket(key: str, n_buckets: int = N_BUCKETS) -> int:
    """Stable, engine-portable bucket id for a state key."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n_buckets


class StateStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _partition_dir(self, entity_type: str, key: str) -> str:
        return os.path.join(
            self.path,
            f"entity_type={entity_type}",
            f"bucket={key_bucket(key)}",
        )

    def _read_partition(self, part_dir: str) -> DataFrame:
        if not os.path.isdir(part_dir):
            return self.spark.createDataFrame([], _PART_SCHEMA)
        return self.spark.read.schema(_PART_SCHEMA).parquet(part_dir)

    def _read(self) -> DataFrame:
        if not os.path.isdir(self.path) or not os.listdir(self.path):
            return self.spark.createDataFrame([], STATE_SCHEMA)
        df = (
            self.spark.read.schema(_PART_SCHEMA)
            .option("basePath", self.path)
            .parquet(self.path)
        )
        # partition-dir columns come back from directory names; normalize
        # types/order to STATE_SCHEMA
        return df.select(
            F.col("entity_type").cast("string"),
            "key",
            "value",
            "updated_at",
        )

    def upsert(self, entity_type: str, key: str, value: str | None) -> None:
        """MERGE-style last-writer-wins upsert (EntityFunctions.cs Save ops),
        rewriting only the (entity_type, bucket) partition the key lives in --
        untouched keys' files are never rewritten (asserted in
        tests/test_state_retry.py)."""
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        part_dir = self._partition_dir(entity_type, key)
        new = self.spark.createDataFrame([(key, value, now)], _PART_SCHEMA)
        merged = self._read_partition(part_dir).unionByName(new)
        w = Window.partitionBy("key").orderBy(F.desc("updated_at"))
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        # The partition is tiny (one row per table in this bucket): collect +
        # rewrite is bounded, and decoupling read from overwrite avoids
        # reading the files being replaced.
        rows = latest.collect()
        out = self.spark.createDataFrame(rows, _PART_SCHEMA)
        out.coalesce(1).write.mode("overwrite").parquet(part_dir)

    def get(self, entity_type: str, key: str) -> str | None:
        """Keyed point lookup (ClientAllowedColumnsFunction.cs:47-56): reads
        exactly one partition directory."""
        rows = (
            self._read_partition(self._partition_dir(entity_type, key))
            .where(F.col("key") == key)
            .select("value")
            .collect()
        )
        return rows[0]["value"] if rows else None

    def save_last_error(self, table: str, message: str) -> None:
        """A10: LastError upsert with UTC stamp (EntityFunctions.cs:17-21,
        signaled at ExecuteTriggerHelper.cs:129-131)."""
        self.upsert(LAST_ERROR, table, message)

    def save_allowed_columns(self, table: str, csv: str) -> None:
        """A11 (ClientAllowedColumnsFunction.cs:16-26)."""
        self.upsert(ALLOWED_COLUMNS, table, csv)

    def get_allowed_columns(self, table: str) -> str | None:
        return self.get(ALLOWED_COLUMNS, table)

    def as_dataframe(self) -> DataFrame:
        return self._read()
