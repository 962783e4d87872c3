"""Fixture-table catalog.

Registers the driver-generated parquet tables (TESTDATA.md) as temp views so
operators can be written either in the DataFrame API or Spark SQL. At cluster
scale these would be catalog tables (Delta/Iceberg) -- the temp-view
registration is the only local-mode concession.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst pushes projection + predicates into it.

    events.ts is physically TIMESTAMP(NANOS). pyspark 4.1.2 reads it natively
    as TIMESTAMP_NTZ truncated to microseconds -- the same truncation DuckDB
    applies coercing ns to its us TIMESTAMP, so oracle comparisons stay
    exact. Older runtimes honor spark.sql.legacy.parquet.nanosAsLong=true and
    scan int64 nanoseconds instead; the branch below converts those by the
    same floor division. Streaming plans that need an event-time watermark
    cast NTZ to the session-UTC TIMESTAMP at the watermark site
    (streaming/windows.py _ltz).

    The conf is set here (not only in session.get_session) because callers --
    the correctness driver, notebooks -- hand us their own bare SparkSession;
    it is runtime-settable SQL conf, so this works on any session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(f"fixture table {name!r} not found at {path}")
    df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view named after itself."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
