"""Keyed state table -- the engine's replacement for durable entities
(EntityFunctions.cs) and orchestration instance registries.

Schema: (entity_type, key, value, updated_at). The reference keeps two
entity families keyed by table name -- LastError {message, date}
(EntityFunctions.cs:8-27) and AllowedColumns {csv} (:32-47) -- plus
singleton orchestration instances keyed by table (RetryFunctions.cs:92).
All three map onto rows here.

Storage: a parquet directory, updated by read-modify-overwrite MERGE
emulation (last-writer-wins per key). On a cluster this would be a Delta
table and `MERGE INTO`; the API is shaped so that swap is one method body.
The state table is tiny (one row per (entity, table)) -- rewriting it is
O(number of tables), never O(data).
"""

from __future__ import annotations

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

LAST_ERROR = "LastError"          # EntityFunctions.cs:8
ALLOWED_COLUMNS = "AllowedColumns"  # EntityFunctions.cs:32


class StateStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], STATE_SCHEMA)
        return self.spark.read.schema(STATE_SCHEMA).parquet(self.path)

    def upsert(self, entity_type: str, key: str, value: str | None) -> None:
        """MERGE-style last-writer-wins upsert (EntityFunctions.cs Save ops)."""
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        new = self.spark.createDataFrame(
            [(entity_type, key, value, now)], STATE_SCHEMA
        )
        merged = self._read().unionByName(new)
        w = Window.partitionBy("entity_type", "key").orderBy(F.desc("updated_at"))
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        # Small-state read-modify-overwrite; Delta MERGE at cluster scale.
        rows = latest.collect()
        out = self.spark.createDataFrame(rows, STATE_SCHEMA)
        out.coalesce(1).write.mode("overwrite").parquet(self.path)

    def get(self, entity_type: str, key: str) -> str | None:
        """Keyed point lookup (ClientAllowedColumnsFunction.cs:47-56)."""
        rows = (
            self._read()
            .where((F.col("entity_type") == entity_type) & (F.col("key") == key))
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
