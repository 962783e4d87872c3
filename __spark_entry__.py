"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship star-join query at sf0.001;
`queries()`/`oracle_sql()` expose the full operator registry from
sqldataintegrationfunctiontriggerapp_spark.plans (SURVEY.md §2 coverage), each
PySpark query paired with a DuckDB-runnable ANSI-SQL oracle where the
semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqldataintegrationfunctiontriggerapp_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; approximate or
    non-SQL-expressible ops (approx_count_distinct, ann_lsh_topk) are omitted
    and get the driver's rows-only check."""
    return dict(plans.ORACLES)
