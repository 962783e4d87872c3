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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
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
    if spread:
        # The local fixtures are single-row-group files, so the scan -- and
        # everything fused into its stage (filters, projections, the PARTIAL
        # side of aggregates) -- runs as ONE task. Callers whose heavy work
        # happens before the first exchange opt in here: a round-robin
        # repartition spreads that work across cores. Conditional on input
        # bytes vs the split size (a filesystem stat, no plan analysis): a
        # table big enough to produce >= 2 splits per core already
        # parallelizes in the scan, so on a cluster -- or any properly
        # split input -- this is a no-op and no shuffle is added. The
        # condition IS the 100 TB safety.
        split_bytes = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b")
        )
        if os.path.isdir(path):
            n_bytes = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if os.path.isfile(os.path.join(path, f))
            )
        else:
            n_bytes = os.path.getsize(path)
        target = spark.sparkContext.defaultParallelism
        # approx scan splits = n_bytes / split_bytes; spread only when that
        # undershoots half the cores
        if n_bytes < split_bytes * max(1, target // 2):
            df = df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view named after itself."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
