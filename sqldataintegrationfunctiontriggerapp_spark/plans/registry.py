"""Registration plumbing for the driver contract (__spark_entry__.py).

Each registered query is ``fn(spark, sf_dir) -> DataFrame``; the optional
``oracle`` is an ANSI-SQL string DuckDB runs against the same parquet (views
pre-registered by the driver). Column names are aliased identically on both
sides because the driver's comparator sorts columns by name before hashing.

Numeric-parity rules used throughout (see plans/_util.py):
- SUM/AVG over doubles go through an exact DECIMAL accumulator on BOTH sides
  (float addition is order-dependent; Spark and DuckDB would otherwise differ
  in the last ulp and fail the value hash).
- DuckDB ``SUM(BIGINT)`` returns HUGEINT; oracles cast back to BIGINT.
- Timestamps are cast explicitly where the parquet physical type is ns.
- Double LITERALS in oracles must be ``CAST('<repr>' AS DOUBLE)`` string
  parses: DuckDB types a bare 17-digit literal DECIMAL(17,16), and the
  decimal->double hop can land 1 ulp off Python's repr round-trip
  (found by embedding_random_projection; same family as the
  plans/graph.py decimal-cast finding).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
