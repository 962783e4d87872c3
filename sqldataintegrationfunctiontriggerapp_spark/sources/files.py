"""File-format sources: schema-explicit CSV / JSON(-lines) / parquet readers.

The reference reads only SQL Server tables (SqlTrigger binding) and emits
JSON (HttpPostAction.cs:36); an analytics engine needs the standard lake
formats too. Rules that hold at 100 TB:

- Schemas are explicit (no inference pass over petabytes). `schema` is a
  StructType or DDL string; inference is opt-in for interactive use only.
- CSV/JSON parse errors land in a `_corrupt_record` column (PERMISSIVE)
  instead of killing the job -- the batch-level error routing the reference
  does with try/catch (ExecuteTriggerHelper.cs:120-158) done per-row.
- Readers return plain DataFrames: filters/projections layered on top still
  push into the scan (parquet) or prune columns at parse time (CSV/JSON
  with a declared schema parse only the referenced fields in Spark's
  vectorized readers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_parquet(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    delimiter: str = ",",
    keep_corrupt: bool = True,
) -> DataFrame:
    """CSV with explicit schema; malformed rows kept in _corrupt_record
    (PERMISSIVE) unless keep_corrupt=False (DROPMALFORMED)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE" if keep_corrupt else "DROPMALFORMED")
    )
    if schema is not None:
        reader = reader.schema(schema)
        if keep_corrupt:
            reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    else:
        reader = reader.option("inferSchema", "true")  # interactive only
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema=None,
    multiline: bool = False,
    keep_corrupt: bool = True,
) -> DataFrame:
    """JSON-lines (or multiline arrays) with explicit schema; malformed rows
    kept in _corrupt_record."""
    reader = spark.read.option("multiLine", str(multiline).lower()).option(
        "mode", "PERMISSIVE" if keep_corrupt else "DROPMALFORMED"
    )
    if schema is not None:
        reader = reader.schema(schema)
        if keep_corrupt:
            reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)
