"""Registered queries for the explicit skew-mitigation operators.

Reference scope note: the reference app (andre-maree/
SqlDataIntegrationFunctionTriggerApp) has no skew handling — its batches are
capped at 100 rows (`local.settings.json:8-9`), so skew cannot exist. At
100 TB it is the difference between a job finishing and one straggler
reducer running for hours, so operators/skew.py carries the two explicit
mitigations (salted two-phase aggregation, salted replicated join) for the
cases AQE's runtime skew-join splitting cannot see. They were test-only
until r08; these entries put them under the driver's hash gate.

Both operators are drop-in equivalents of the unsalted op, so each oracle
is simply the PLAIN GROUP BY / JOIN — the hash match proves the salting
rewrite is semantics-preserving, which is the entire contract.

Numeric parity: aggregates are count/sum-of-integer/max only (exact in any
accumulation order); DuckDB SUM(BIGINT) returns HUGEINT, cast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from sqldataintegrationfunctiontriggerapp_spark.plans.registry import register

_SALTED_AGG_ORACLE = """
    SELECT l_returnflag,
           COUNT(l_orderkey) AS cnt,
           CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumber,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
"""


@register("skew_salted_agg", oracle=_SALTED_AGG_ORACLE)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted groupBy on the 3-key zipfian-shaped l_returnflag
    (each key holds ~1/3 of ALL lineitem rows — exactly the hot-key shape a
    plain hash agg funnels into 3 reducers). Phase 1 spreads each key over
    16 salts; phase 2 combines the partials. Oracle is the plain GROUP BY:
    the hash match IS the semantics-preservation proof."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )
    return salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "cnt": ("count", "l_orderkey"),
            "sum_linenumber": ("sum", "l_linenumber"),
            "max_qty": ("max", "l_quantity"),
        },
        n_salt=16,
    )


_SALTED_JOIN_ORACLE = """
    SELECT c.c_mktsegment,
           COUNT(*) AS cnt,
           CAST(SUM(o.o_orderkey) AS BIGINT) AS sum_orderkey
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


@register("skew_salted_join", oracle=_SALTED_JOIN_ORACLE)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join: the big (fact) side gets a deterministic
    per-row salt, the dimension side is exploded across all 16 salts, and
    the join runs on (key, salt) so a hot customer's orders land on 16
    reducers instead of one. The post-join rollup keys on c_mktsegment so
    the oracle compare stays 5 rows; count + integer sum are
    order-independent. Oracle is the plain join — semantics-preservation
    under the hash gate."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    joined = salted_join(orders, cust, on=["o_custkey"], n_salt=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("o_orderkey").alias("sum_orderkey"),
    )
