"""Relational operator coverage (SURVEY.md §2.A/§2.B/§2.D).

Each query exercises one operator family from the reference's surface --
projection, predicates (incl. BETWEEN sql.txt:124), equi/semi/anti/outer
joins (update-join sql.txt:126-129), MIN/MAX aggregates (sql.txt:116,
RetryFunctions.cs:141), TOP/limit (sql.txt:108), CTEs (sql.txt:121-125),
keyed range batching (sql.txt:113-134) -- plus the analytics upgrades
(rollup/cube/grouping sets, distinct counts, pivot, set ops) that a query
engine needs and the reference delegates to SQL Server.

Scale notes: every query here is a scan -> (optional broadcast/shuffle
join) -> partial+final hash aggregate plan. Dimension joins (nation,
region, small filtered orders) are explicitly broadcast; fact-fact joins
(lineitem x orders) shuffle on the join key, which AQE coalesces/splits at
runtime. Filters and projections sit directly on the parquet scan so
Catalyst pushes them into the reader (verified via .explain in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.plans._util import (
    DEC,
    davg,
    dsum,
    revenue_expr,
    revenue_col,
    sql_davg,
    sql_dsum,
    sql_revenue,
)
from sqldataintegrationfunctiontriggerapp_spark.plans.registry import register


# --------------------------------------------------------------------------
# Aggregations (B5/B6 min-max; groupBy aggregate upgrade)
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_revenue('sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: 8 aggregates over two group keys."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    charge = revenue_expr() * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            revenue_col("sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_revenue('revenue')},
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship star join (customer |X| orders |X| lineitem) + top-10 revenue.

    customer is filtered then broadcast; orders |X| lineitem shuffles on the
    order key. TakeOrderedAndProject keeps the top-k driver-side tiny.
    """
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    co = orders.join(F.broadcast(cust), cust.c_custkey == orders.o_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        li.join(co, li.l_orderkey == co.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_col("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "minmax_agg",
    oracle="""
    SELECT MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
           COALESCE(MAX(CASE WHEN o_orderstatus = 'X' THEN o_orderkey END), -1)
             AS max_missing
    FROM orders
    """,
)
def minmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar MIN/MAX (sql.txt:116; attempt-count poll RetryFunctions.cs:141)
    plus the NULL-sentinel handling of RetryFunctions.cs:146-157 via COALESCE."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.coalesce(
            F.max(F.when(F.col("o_orderstatus") == "X", F.col("o_orderkey"))),
            F.lit(-1),
        ).alias("max_missing"),
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_extendedprice', 'sum_price')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice", "sum_price"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct -- the at-scale replacement for exact
    COUNT(DISTINCT) (single pass, no shuffle explosion, mergeable sketches).

    Hash-checkable accuracy contract (VERDICT r04 "Next round" #2): Spark's
    HLL++ estimate and DuckDB's sketch diverge bit-for-bit, so the ESTIMATE
    itself can't be hashed -- instead the query emits the exact count plus a
    boolean asserting the sketch landed within tolerance, and the oracle
    computes the exact side with a literal TRUE. The sketch's accuracy
    contract (rsd 0.01 -> 5x slack at 5%) IS the hashed value; a broken or
    wildly-drifting sketch flips the boolean and fails the hash.

    Plan-shape trap, learned the hard way: putting countDistinct and
    approx_count_distinct in ONE agg makes Catalyst's distinct-rewrite
    compute partial HLL sketches keyed by (l_returnflag, l_orderkey) -- one
    ~10 KB rsd=0.01 buffer PER DISTINCT ORDERKEY (~6 GB of aggregation
    state at sf0.1, OOM), not per flag. Instead dedupe first, then
    aggregate: HLL over a set equals HLL over the multiset, so the estimate
    is identical, count(*) of the deduped rows IS the exact distinct count,
    and the sketch buffer exists only once per flag. The exact side is of
    course the expensive half at 100 TB -- that is inherent to an
    accuracy-contract query; production code runs the sketch alone."""
    li = load_table(spark, sf_dir, "lineitem")
    dist = li.select("l_returnflag", "l_orderkey").distinct()
    exact = F.count("l_orderkey")
    approx = F.approx_count_distinct("l_orderkey", 0.01)
    return dist.groupBy("l_returnflag").agg(
        exact.alias("exact_orders"),
        (
            F.abs(approx.cast("double") / exact.cast("double") - 1.0) <= 0.05
        ).alias("within_tol"),
    )


# --------------------------------------------------------------------------
# Predicates / limit (B4, B7)
# --------------------------------------------------------------------------

@register(
    "between_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 1499
      AND o_orderstatus IN ('O', 'F')
      AND o_totalprice IS NOT NULL
    """,
)
def between_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN range predicate (sql.txt:124) + IN + null predicate; all three
    push down to the parquet scan as data filters."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderkey").between(1000, 1499)
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "top_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 1000
    """,
)
def top_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT TOP (1000) (sql.txt:108-111): Spark plans TakeOrderedAndProject,
    a per-partition top-k + driver merge -- no global sort even at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Joins (B9 + engine upgrades)
# --------------------------------------------------------------------------

@register(
    "cte_update_join",
    oracle=f"""
    WITH cte AS (
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_orderkey BETWEEN 0 AND 4999
    )
    SELECT c.c_nationkey,
           COUNT(*) AS n_orders,
           {sql_dsum('c.c_acctbal', 'sum_bal')}
    FROM customer c
    JOIN cte ON cte.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def cte_update_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + keyed inner join, the shape of the reference's batched
    update-join (sql.txt:121-129)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cte = o.where(F.col("o_orderkey").between(0, 4999)).select(
        "o_orderkey", "o_custkey"
    )
    return (
        c.join(cte, cte.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("c_acctbal", "sum_bal"))
    )


@register(
    "join_broadcast_star",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers,
           {sql_dsum('c.c_acctbal', 'sum_acctbal')}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with two explicitly-broadcast dimensions: no shuffle for the
    joins at any scale; only the final aggregate exchanges 25 rows."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "sum_acctbal"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS == left-semi join; Spark never materializes the right side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS == left-anti join. The build side is filtered to
    high-value orders (the join_semi mirror) so the result is non-empty by
    construction -- the unfiltered variant matched every customer and its
    0-row oracle check verified nothing (r01 sweep)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_full_outer",
    oracle="""
    WITH co AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         su AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(co.nk, su.nk) AS nationkey,
           COALESCE(co.n_cust, 0) AS n_cust,
           COALESCE(su.n_supp, 0) AS n_supp
    FROM co FULL OUTER JOIN su ON co.nk = su.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "theta_range_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           {sql_revenue('revenue')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
       AND l.l_shipdate BETWEEN o.o_orderdate
                            AND o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
)
def theta_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join with a range residual: Spark evaluates the BETWEEN as a
    post-join filter on the shuffled equi join, so it stays a sort-merge
    join (never a cartesian) at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 90 DAY"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"), revenue_col("revenue"))
    )


# --------------------------------------------------------------------------
# Set operations (§2.D)
# --------------------------------------------------------------------------

@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT with a non-empty result by construction (customers who placed
    no order since 1999 -- round-2 sweeps showed the old
    customer-vs-supplier nation EXCEPT was structurally empty, a 0-row
    oracle row that verified nothing)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)


# --------------------------------------------------------------------------
# Pivot, range batching, scalar functions
# --------------------------------------------------------------------------

@register(
    "pivot_status",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_open,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


@register(
    "range_batching",
    oracle=f"""
    SELECT CAST(floor(o_orderkey / 500) AS BIGINT) AS batch_id,
           COUNT(*) AS n,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY CAST(floor(o_orderkey / 500) AS BIGINT)
    """,
)
def range_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed batch chunking (WHILE loop over id ranges, @batchSize=500,
    sql.txt:113-134) -- in Spark this is just a group-by over the bucket id;
    the distributed analog of the reference's driver-side loop."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_orderkey") / 500).alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            dsum("o_totalprice", "sum_price"),
        )
    )


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT DISTINCT
           o_orderpriority,
           TRIM(string_split(o_orderpriority, '-')[1]) AS priority_code,
           LOWER(TRIM(string_split(o_orderpriority, '-')[2])) AS priority_label,
           REPLACE(o_orderpriority, '-', ':') AS replaced,
           SUBSTRING(o_orderpriority, 1, 1) AS first_char,
           LENGTH(o_orderpriority) AS len
    FROM orders
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar-string surface in one query: split+trim
    (ClientAllowedColumnsFunction.cs:58-65), replace (:21), substring
    (HttpPostAction.cs:62), case folding (ExecuteTriggerHelper.cs:69)."""
    o = load_table(spark, sf_dir, "orders")
    sp = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderpriority",
        F.trim(sp.getItem(0)).alias("priority_code"),
        F.lower(F.trim(sp.getItem(1))).alias("priority_label"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit(":")).alias("replaced"),
        F.substring("o_orderpriority", 1, 1).alias("first_char"),
        F.length("o_orderpriority").alias("len"),
    ).distinct()


@register(
    "timestamp_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_orderdate,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_m,
           (o_orderdate + INTERVAL 168 HOUR < TIMESTAMP '1995-02-01')
             AS timed_out
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def timestamp_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp arithmetic incl. the retry-timeout predicate
    `start + INTERVAL n HOURS < now` (RetryFunctions.cs:129-132) with a fixed
    'now' so the oracle is deterministic."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_m"),
        (
            F.col("o_orderdate") + F.expr("INTERVAL 168 HOUR")
            < F.lit("1995-02-01").cast("timestamp")
        ).alias("timed_out"),
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {sql_revenue('revenue')}
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name IN ('ASIA', 'AMERICA')
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way join: revenue by supplier nation where customer
    and supplier share a nation inside a region filter.

    Plan shape at scale: the dimension chain region->nation->supplier is
    broadcast (all tiny relative to facts); orders |X| lineitem is the one
    real shuffle, on the order key; the local-supplier condition
    (s_nationkey = c_nationkey) rides the supplier join as an extra equi-key
    instead of a post-join filter, so the join itself prunes non-local rows.
    """
    r = load_table(spark, sf_dir, "region").where(
        F.col("r_name").isin("ASIA", "AMERICA")
    )
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    co = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(revenue_col("revenue"))
    )


@register(
    "q7_nation_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS cust_nation,
           n2.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           {sql_revenue('revenue')}
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped cross-nation trade volume: revenue between DIFFERENT
    customer and supplier nations by ship year (the inequality predicate
    n1 <> n2 is a post-join filter on two broadcast dimensions)."""
    nat = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("cnk"),
                               F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cnk"),
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("snk"),
                               F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("snk"),
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    co = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(revenue_col("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
           {sql_revenue('revenue')}
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: top-20 customers by revenue
    lost to returns in one year. The returnflag filter prunes lineitem at
    the scan; nation broadcasts; the single fact-fact shuffle is
    orders |X| lineitem on the order key; TakeOrderedAndProject keeps the
    global top-20 without a full sort."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue_col("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "monthly_order_trend",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def monthly_order_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month rollup of order volume, spend, and distinct buyers --
    the date_trunc bucketing every reporting pipeline needs. One
    partial/final hash aggregate; COUNT(DISTINCT) expands to the standard
    two-phase expand+aggregate, still one shuffle on the month key."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "argmax_per_group",
    oracle="""
    SELECT c_nationkey, c_name AS top_customer, c_acctbal AS top_balance
    FROM (
        SELECT c_nationkey, c_name, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_name DESC) AS rn
        FROM customer)
    WHERE rn = 1
    """,
)
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax as a plain aggregate: max over (balance, name) structs -- one
    partial/final hash aggregate, no window, no sort, no row expansion. The
    struct's lexicographic ordering makes ties deterministic (name breaks
    them), which is what lets the window-based oracle match exactly. At
    100 TB this is the shape to prefer over row_number()=1: map-side combine
    reduces each partition to one struct per group before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    best = F.max(F.struct("c_acctbal", "c_name")).alias("b")
    return (
        c.groupBy("c_nationkey")
        .agg(best)
        .select(
            "c_nationkey",
            F.col("b.c_name").alias("top_customer"),
            F.col("b.c_acctbal").alias("top_balance"),
        )
    )


@register(
    "null_safe_join",
    oracle="""
    WITH a AS (
        SELECT NULLIF(event_type, 'click') AS k, COUNT(*) AS n_a
        FROM events WHERE user_id % 2 = 0 GROUP BY NULLIF(event_type, 'click')
    ),
    b AS (
        SELECT NULLIF(event_type, 'click') AS k, COUNT(*) AS n_b
        FROM events WHERE user_id % 2 = 1 GROUP BY NULLIF(event_type, 'click')
    )
    SELECT a.k, n_a, n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of dropping out -- the semantics MERGE-style CDC joins
    need when the business key is nullable. Still a hash-joinable equi-key
    (Spark plans EqualNullSafe as a join key, not a filter)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("click")).alias("k")
    a = ev.where(F.col("user_id") % 2 == 0).groupBy(k).agg(
        F.count(F.lit(1)).alias("n_a"))
    b = ev.where(F.col("user_id") % 2 == 1).groupBy(k).agg(
        F.count(F.lit(1)).alias("n_b"))
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("k"), "n_a", "n_b"
    )


@register(
    "map_agg_event_counts",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY event_type) AS type_counts
    FROM c GROUP BY user_id
    """,
)
def map_agg_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-style aggregation: each user's event-type histogram collapsed to
    one deterministic row (sorted key:count list). collect_list arrival
    order is shuffle-dependent, so array_sort before join is what makes the
    result reproducible -- the same pattern as string_agg_ordered, applied
    to building map columns. Sorting STRUCTS of (event_type, n) and only
    then rendering 'type:count' matches the oracle's ORDER BY event_type
    for ANY type names; sorting the concatenated strings would diverge when
    one type is a prefix of another followed by a char < ':' (ADVICE r02)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return c.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_type", "n"))),
                lambda x: F.concat(
                    x["event_type"], F.lit(":"), x["n"].cast("string")
                ),
            ),
            ",",
        ).alias("type_counts")
    )


@register(
    "histogram_value_buckets",
    oracle="""
    SELECT CAST(floor(value / 10) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS bucket_sum
    FROM events
    GROUP BY CAST(floor(value / 10) AS BIGINT)
    """,
)
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of a measure: bucket id by floor division, one
    partial/final hash aggregate -- the binning shape behind every
    distribution dashboard; cardinality is bounded by the bucket count, not
    the row count."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 10).cast("long")
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum("value", "bucket_sum"),
    )


@register(
    "profile_events_table",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_props,
           MIN(CAST(ts AS TIMESTAMP)) AS min_ts,
           MAX(CAST(ts AS TIMESTAMP)) AS max_ts,
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative_value
    FROM events
    """,
)
def profile_events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling in one scan: row count, key cardinalities, null rate,
    time range, and a domain-rule violation count -- the data-quality gate a
    pipeline runs before promoting a batch (the analytics generalization of
    the reference's per-batch validation logging, HttpPostAction.cs:44).
    All aggregates fuse into a single partial/final pass."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).cast("long")
        .alias("n_null_props"),
        F.min(ts).alias("min_ts"),
        F.max(ts).alias("max_ts"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).cast("long")
        .alias("n_negative_value"),
    )


@register(
    "dq_constraint_report",
    oracle="""
    WITH a AS (
        SELECT COUNT(*) AS n,
               COUNT(DISTINCT o_orderkey) AS dk,
               COUNT(o_custkey) AS ck,
               SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                        THEN 1 ELSE 0 END) AS st,
               SUM(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN o_orderdate BETWEEN TIMESTAMP '1992-01-01'
                                             AND TIMESTAMP '1998-12-31'
                        THEN 1 ELSE 0 END) AS dt,
               COUNT(DISTINCT o_orderpriority) AS dp
        FROM orders
    )
    SELECT * FROM (
        SELECT 'orderkey_unique' AS constraint_name,
               CAST(dk AS DOUBLE) / CAST(n AS DOUBLE) AS metric,
               CAST(dk AS DOUBLE) / CAST(n AS DOUBLE) = 1.0 AS passed FROM a
        UNION ALL
        SELECT 'custkey_complete',
               CAST(ck AS DOUBLE) / CAST(n AS DOUBLE),
               CAST(ck AS DOUBLE) / CAST(n AS DOUBLE) = 1.0 FROM a
        UNION ALL
        SELECT 'status_in_domain',
               CAST(st AS DOUBLE) / CAST(n AS DOUBLE),
               CAST(st AS DOUBLE) / CAST(n AS DOUBLE) = 1.0 FROM a
        UNION ALL
        SELECT 'totalprice_nonnegative',
               CAST(tp AS DOUBLE) / CAST(n AS DOUBLE),
               CAST(tp AS DOUBLE) / CAST(n AS DOUBLE) = 1.0 FROM a
        UNION ALL
        SELECT 'orderdate_in_range',
               CAST(dt AS DOUBLE) / CAST(n AS DOUBLE),
               CAST(dt AS DOUBLE) / CAST(n AS DOUBLE) = 1.0 FROM a
        UNION ALL
        SELECT 'priority_cardinality_max5',
               CAST(dp AS DOUBLE),
               CAST(dp AS DOUBLE) <= 5.0 FROM a
    )
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint gate (the Deequ/expectations
    shape): uniqueness, completeness, set-membership, non-negativity,
    date-range, and cardinality-cap constraints over `orders`, each
    reported as (constraint_name, metric, passed). profile_events_table
    above DESCRIBES a table; this query JUDGES one -- the pass/fail row set
    a pipeline gates a batch promotion on, generalizing the reference's
    per-batch validation logging (HttpPostAction.cs:44).

    Shape at 100 TB: every constraint folds into ONE wide aggregate over a
    single scan (the two distinct counts rewrite to an Expand of the count
    buffers only -- cheap, unlike per-value sketch buffers; see
    approx_count_distinct above), then a 1-row stack() unpivots to the
    6-row report. No joins, no second pass; ratios are exact long/long
    divisions so the oracle hash matches bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    lo = F.lit("1992-01-01").cast("timestamp")
    hi = F.lit("1998-12-31").cast("timestamp")
    agg = o.agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct("o_orderkey").alias("_dk"),
        F.count("o_custkey").alias("_ck"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("_st"),
        F.sum(F.when(F.col("o_totalprice") >= 0, 1).otherwise(0)).alias("_tp"),
        F.sum(
            F.when(F.col("o_orderdate").between(lo, hi), 1).otherwise(0)
        ).alias("_dt"),
        F.countDistinct("o_orderpriority").alias("_dp"),
    )

    def ratio(c: str) -> Column:
        return F.col(c).cast("double") / F.col("_n").cast("double")

    m = agg.select(
        ratio("_dk").alias("m1"), ratio("_ck").alias("m2"),
        ratio("_st").alias("m3"), ratio("_tp").alias("m4"),
        ratio("_dt").alias("m5"), F.col("_dp").cast("double").alias("m6"),
    )
    return m.select(
        F.expr(
            "stack(6, "
            "'orderkey_unique', m1, m1 = 1.0D, "
            "'custkey_complete', m2, m2 = 1.0D, "
            "'status_in_domain', m3, m3 = 1.0D, "
            "'totalprice_nonnegative', m4, m4 = 1.0D, "
            "'orderdate_in_range', m5, m5 = 1.0D, "
            "'priority_cardinality_max5', m6, m6 <= 5.0D"
            ") AS (constraint_name, metric, passed)"
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecast revenue: pure filter + single global
    aggregate. The whole predicate (date range, discount band, quantity
    cap) sits directly on the parquet scan so every conjunct pushes into
    the reader; the aggregate is one partial/final pair with a decimal
    accumulator -- at 100 TB this is a scan-bound query and nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    f = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.where(f).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(100.0 * SUM(CAST(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue_pct,
           CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo share: fact scan with a pushed date filter,
    BROADCAST join to the part dimension (small side, no fact shuffle),
    conditional aggregation into one partial/final pass. The classic
    star-join probe pattern at any scale."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(
        F.col("p_type") == "PROMO", revenue_expr()
    ).otherwise(F.lit(0.0))
    j = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    return j.agg(
        (
            F.lit(100.0) * F.sum(promo.cast(DEC)).cast("double")
            / F.sum(revenue_expr().cast(DEC)).cast("double")
        ).alias("promo_revenue_pct"),
        dsum(promo, "promo_revenue"),
    )


# --------------------------------------------------------------------------
# Bucketed co-located join (layout-driven shuffle elimination)
# --------------------------------------------------------------------------

def _colocated_tables(spark: SparkSession, sf_dir: str):
    """Session-memoized bucketed copies of customer and orders, both
    bucketed 8 ways on the customer key (sinks/table_sink.write_bucketed).
    The one-time write is the layout investment; every subsequent join on
    the key is bucket-local. The StagedDir cleans the files up on stage
    eviction; table names embed an sf_dir tag so fixture switches never
    collide in the session catalog."""
    import hashlib
    import os
    import tempfile

    from sqldataintegrationfunctiontriggerapp_spark.plans._util import (
        StagedDir,
        session_stage,
    )
    from sqldataintegrationfunctiontriggerapp_spark.sinks.table_sink import (
        write_bucketed,
    )

    def build():
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        base = tempfile.mkdtemp(prefix=f"colocated_{tag}_")
        import atexit
        import shutil

        atexit.register(shutil.rmtree, base, ignore_errors=True)
        tc, to = f"colocated_cust_{tag}", f"colocated_ord_{tag}"
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("c_custkey"), "o_totalprice"
        )
        write_bucketed(c, tc, "c_custkey", 8, path=os.path.join(base, "c"))
        write_bucketed(o, to, "c_custkey", 8, path=os.path.join(base, "o"))
        return (StagedDir(base), tc, to)

    return session_stage(spark, sf_dir, "colocated_cust_ord_8", build)


@register(
    "join_bucketed_colocated",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o.o_totalprice', 'total_price')}
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout-driven join: both sides pre-bucketed 8 ways on the
    customer key, so the equi-join runs bucket-local sort-merge with ZERO
    exchange on either side (plan-shape pinned) -- the co-location strategy
    that turns the biggest recurring cost of a 100 TB star join (the
    fact-table shuffle) into a one-time write-side investment. The merge
    hint only rules out broadcast; the bucket layout is what satisfies the
    join's distribution requirement. The oracle is the PLAIN join over the
    raw parquet -- the hash match proves the bucketed layout changed the
    physical plan and nothing else (the skew_salted_* evidence pattern)."""
    _, tc, to = _colocated_tables(spark, sf_dir)
    j = spark.table(tc).hint("merge").join(spark.table(to), "c_custkey")
    return j.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


# --- k-anonymity audit --------------------------------------------------------
_KANON_K = 5


@register(
    "k_anonymity_report",
    oracle=f"""
    WITH q AS (
        SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
        FROM customer
    )
    SELECT nationkey, mktsegment, bal_bucket,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           COUNT(*) >= {_KANON_K} AS meets_k
    FROM q GROUP BY nationkey, mktsegment, bal_bucket
    """,
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation, market
    segment, account-balance bucket): one row per equivalence class with
    its size and whether it meets k = 5 (_KANON_K). The privacy-governance
    companion to gdpr_forget_propagation: before releasing a dataset, the
    classes below k are the re-identification risk — they must be
    suppressed or the buckets coarsened, and this table IS that decision
    input.

    Parity: the only non-integer step is floor(acctbal / 1000.0) — one
    IEEE division + floor on identical doubles; counts and the k
    predicate are exact integers.

    Scale shape: one scan, one hash aggregate on the quasi-identifier
    key (map-side combinable); output is class-grain, bounded by the
    quasi-identifier domain, not row count."""
    c = load_table(spark, sf_dir, "customer")
    q = c.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias(
            "bal_bucket"
        ),
    )
    return q.groupBy("nationkey", "mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("class_size"),
        (F.count(F.lit(1)) >= _KANON_K).alias("meets_k"),
    )


# --- 2-D skyline --------------------------------------------------------------


@register(
    "skyline_2d_parts",
    oracle="""
    WITH pts AS (
        SELECT p_partkey, p_retailprice AS price, p_size AS size FROM part
    ),
    per_price AS (
        SELECT price, MIN(size) AS min_size_here
        FROM pts GROUP BY price
    ),
    pref AS (
        SELECT price, min_size_here,
               MIN(min_size_here) OVER (
                   ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS min_size_cheaper
        FROM per_price
    )
    SELECT p.p_partkey, p.price AS p_retailprice, p.size AS p_size
    FROM pts p JOIN pref f ON f.price = p.price
    WHERE NOT (
        (f.min_size_cheaper IS NOT NULL AND f.min_size_cheaper <= p.size)
        OR f.min_size_here < p.size
    )
    """,
)
def skyline_2d_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier, minimize BOTH retail price and size):
    parts not dominated by any part that is <= in both dimensions and <
    in at least one. The multi-objective shortlist shape ("cheapest
    options per size class") that a naive NOT EXISTS expresses as an
    O(n^2) theta self-join; this is the sort-scan formulation: a part is
    dominated iff the minimum size among STRICTLY cheaper parts is <= its
    size, or the minimum size AT its own price is < its size.

    Equal (price, size) duplicates are mutually non-dominating and all
    kept — pinned by the same-price leg using strict <.

    Parity: pure comparisons on raw column values — no arithmetic at all,
    so no float contract.

    Scale shape: one hash aggregate to price grain, then a prefix-min
    window over DISTINCT prices (domain-bounded: quantized currency in a
    fixed range — metadata-grain next to the row count; were the price
    domain itself huge, the prefix-min would two-phase over price-range
    buckets the way the KMV bottom-k salts), and one price-keyed equi-join
    back. No self-join, no n^2 pair work."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )
    per_price = p.groupBy("price").agg(F.min("size").alias("min_size_here"))
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    pref = per_price.withColumn(
        "min_size_cheaper", F.min("min_size_here").over(w)
    )
    joined = p.join(pref, "price")
    dominated = (
        F.col("min_size_cheaper").isNotNull()
        & (F.col("min_size_cheaper") <= F.col("size"))
    ) | (F.col("min_size_here") < F.col("size"))
    return joined.where(~dominated).select(
        "p_partkey",
        F.col("price").alias("p_retailprice"),
        F.col("size").alias("p_size"),
    )
