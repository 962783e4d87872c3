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


# Sweep priority: the driver checks queries in this dict's insertion order
# and has a finite per-round budget (~50/round). Since r09 the order is
# GENERATED, not narrated (VERDICT r08 #5): `tools/gen_sweep.py` derives it
# from the CORRECTNESS_r*.json history (each query's latest hash-green
# round) plus the round's changed-code set (git diff vs the round-boundary
# commit, resolved through the package import graph at query-function
# granularity), writes `_sweep_order.py` (checked in, machine-produced),
# and this module imports it. Invariants the generator enforces: changed
# code ALWAYS jumps to the head, then oldest evidence first, registry
# order as the deterministic tie-break. Rerun the tool before round close.
try:
    from _sweep_order import SWEEP_PRIORITY as _SWEEP_PRIORITY
except ImportError:  # registry order is the (still valid) fallback
    _SWEEP_PRIORITY: list[str] = []


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _SWEEP_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(plans.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query -- zero rows-only
    entries. The deterministic-approximate ANN queries, the sketch
    accuracy-contract queries, the five streaming parity queries (batch
    oracles the engine's multi-batch replay must hash-equal), and the
    byte-deterministic multimodal feature stub (mirrored through ascii()
    on the pure-ASCII fixture) all carry exact oracles."""
    return _ordered(dict(plans.ORACLES))
