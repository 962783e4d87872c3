"""Query registry: every operator in SURVEY.md §2 that is SQL-expressible is
registered here as a (PySpark builder, ANSI-SQL oracle) pair; the driver runs
both at sf0.01 and hash-compares. Import side effect: all query modules
register themselves.
"""

from sqldataintegrationfunctiontriggerapp_spark.plans.registry import ORACLES, QUERIES, register

# Importing the modules populates the registry.
from sqldataintegrationfunctiontriggerapp_spark.plans import (  # noqa: E402,F401
    advanced,
    behavioral,
    cdc,
    cleaning,
    dedup,
    graph,
    ingest,
    layout,
    multimodal,
    relational,
    retrieval,
    sampling,
    similarity,
    skew,
    text,
    tpch,
    windows,
)

__all__ = ["QUERIES", "ORACLES", "register"]
