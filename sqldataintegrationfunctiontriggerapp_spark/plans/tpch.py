"""TPC-H-shaped decision-support queries, adapted to the fixture schema.

The fixtures are a reduced TPC-H (no partsupp, no commit/receipt dates, no
shipmode/comment columns -- FIXTURES.md), so each query keeps its canonical
TPC-H *plan shape* (the thing that matters at 100 TB: which side shuffles,
what broadcasts, where the predicate sits) while substituting available
columns for the missing ones. Reference-side analog: the B-section SQL
surface (SqlScripts/sql.txt:108-134 exercises scans, TOP, BETWEEN, CTE and
update-joins); these queries are the analytics extension of that surface.

Numeric parity follows plans/_util.py: double SUM/AVG through DECIMAL(18,6)
accumulators on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.plans._util import (
    DEC,
    SQL_REVENUE_EXPR,
    dsum,
    revenue_expr,
    sql_revenue,
)
from sqldataintegrationfunctiontriggerapp_spark.plans.registry import register


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped priority count: orders in one quarter that had at
    least one line shipped >30 days after ordering (the fixture's analog of
    commitdate < receiptdate). The EXISTS is a LEFT SEMI join -- each order
    emitted at most once no matter how many late lines -- with the date
    filter pushed to the orders scan BEFORE the join, so only one quarter
    of the fact table shuffles. The non-equi ship-date conjunct rides the
    equi-join on l_orderkey as a post-join filter; at 100 TB both sides
    shuffle on orderkey once and the semi-join short-circuits per key."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
                    THEN {SQL_REVENUE_EXPR} ELSE 0 END AS DECIMAL(18,6)))
                AS DOUBLE)
           / CAST(SUM(CAST({SQL_REVENUE_EXPR} AS DECIMAL(18,6))) AS DOUBLE)
             AS mkt_share,
           {sql_revenue('total_revenue')}
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region ON r_regionkey = cn.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped national market share: of revenue sold into one
    region, the fraction supplied by one nation, per year. Plan shape: the
    two fact tables (lineitem, orders) shuffle-join on orderkey once;
    every dimension -- supplier, customer, nation x2, region -- broadcasts,
    so the fact stream is never reshuffled after that first join. The
    share is a conditional-sum / sum pair in ONE aggregate pass, not two
    joined aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = cust.join(
        F.broadcast(n.select("n_nationkey", "n_regionkey")),
        F.col("n_nationkey") == F.col("c_nationkey"),
    ).join(
        F.broadcast(
            load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
        ),
        F.col("r_regionkey") == F.col("n_regionkey"),
    ).select("c_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey").join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey", "supp_nation")
    j = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cn), F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", revenue_expr()).otherwise(
        F.lit(0.0)
    )
    return j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        (
            F.sum(nation_rev.cast(DEC)).cast("double")
            / F.sum(revenue_expr().cast(DEC)).cast("double")
        ).alias("mkt_share"),
        dsum(revenue_expr(), "total_revenue"),
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity
                    AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY sn.n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped product profit by supplier nation and year, for parts
    matching a name pattern. Cost proxy is 0.1 * p_retailprice * l_quantity
    (the fixtures have no partsupp.ps_supplycost). The p_name LIKE filter
    lands on the part DIMENSION before it broadcasts, so the selective
    broadcast-hash join prunes the fact stream early; orders shuffle-joins
    the surviving lines on orderkey -- one fact shuffle total."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    sn = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").select(
                "n_nationkey", F.col("n_name").alias("nation")
            )
        ),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey", "nation")
    profit = revenue_expr() - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sn), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return j.groupBy(
        "nation", F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(dsum(profit, "profit"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(({SQL_REVENUE_EXPR}) AS DECIMAL(18,6))) AS dec_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    -- compare on the DECIMAL like the Spark plan; cast to double only in
    -- the projection, so a revenue tie that rounds to the same double
    -- cannot admit an extra row on one side only
    SELECT s_suppkey, s_name, CAST(dec_rev AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE dec_rev = (SELECT MAX(dec_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: per-supplier revenue over a quarter,
    then the supplier(s) achieving the maximum. The scalar max rides a
    1-row broadcast back onto the aggregate (no second scan of the fact
    table, no global sort); equality on the revenue double is safe because
    both engines build it from the same decimal accumulator. supplier is a
    broadcast dimension."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    # ONE decimal aggregate per supplier, reused for both the scalar max and
    # the output column so the equality compares identical values
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(revenue_expr().cast(DEC)).alias("dec_rev")
    )
    top = per_supp.agg(F.max("dec_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(top), F.col("dec_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("dec_rev").cast("double").alias("total_revenue"))
    )


@register(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped supplier variety: how many distinct suppliers ship
    each surviving (brand, type, size) combination, with exclusion
    predicates on the dimension. All three filters sit on the part table
    BEFORE it broadcasts (the fixture's lineitem is the part-supplier
    bridge; TPC-H proper uses partsupp). COUNT(DISTINCT) expands to the
    standard two-phase expand+aggregate -- one shuffle on the group key."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
        SELECT l_partkey AS pq_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pq_partkey = l_partkey
    WHERE p_brand = 'Brand#12' AND l_quantity < 0.5 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped small-quantity revenue: lines of one brand whose
    quantity is under half the part's average quantity. The per-part
    average is a correlated scalar subquery in the spec; here it is one
    hash aggregate over the fact table joined back on partkey -- the
    decorrelated form every optimizer rewrites to. The brand filter
    broadcasts from the part dimension; the avg-quantity side shuffles on
    partkey (it is fact-derived, so it cannot broadcast at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12").select(
        "p_partkey"
    )
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
    )
    return j.agg(
        (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_revenue('revenue')}, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive predicate: revenue over an OR of three
    (brand, size-range, quantity-range) conjunctions spanning both join
    sides. Catalyst cannot push the whole disjunction below the join, but
    it DOES derive and push the single-side implications (the union of
    brand/size bands to the part scan, the quantity hull to the lineitem
    scan) -- the point of this shape. part broadcasts; one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(dsum(revenue_expr(), "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(c_acctbal) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped idle high-balance customers: above the average
    positive balance yet never ordered, counted per market segment (the
    fixture's stand-in for the spec's phone country code). The scalar
    average is a 1-row broadcast cross join; the NOT EXISTS is a LEFT ANTI
    join shuffling both sides on custkey ("no RECENT order" -- the date
    filter sits on the orders scan before the anti join, which is what
    keeps its build side small). At 100 TB the anti join is the only
    shuffle -- the filter and aggregate are map-side around it."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count("c_acctbal")
        ).alias("a")
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = c.crossJoin(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"), dsum("c_acctbal", "total_bal")
    )


@register(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 14 DAY
    GROUP BY l_linestatus
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped priority split: for lines shipped well after
    ordering in one year (the fixture's stand-in for the spec's
    shipmode/receipt-date class), how many belong to urgent orders vs the
    rest. One fact-fact shuffle join on orderkey; the two-way conditional
    count folds into a single partial/final aggregate pass -- the classic
    'pivot two classes without a pivot' shape."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 14 DAYS")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(~urgent, 1).otherwise(0)).cast("long").alias("low_line_count"),
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH w AS (
        SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        FROM lineitem l1, orders
        WHERE o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM w JOIN supplier ON s_suppkey = w.l_suppkey
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped waiting-supplier count: suppliers who were the SOLE
    late shipper on a finished multi-supplier order (late = shipped >60
    days after ordering, the fixture's receipt-vs-commit stand-in). numwait
    counts distinct (order, supplier) wait events -- one per order, however
    many of the supplier's lines were late -- pinned on both sides.

    The spec writes this as EXISTS + correlated NOT EXISTS; the engine form
    decorrelates both into ONE aggregate over the joined fact: per
    (order, supplier), count the order's distinct suppliers and its
    distinct LATE suppliers (conditional count_distinct in the same pass),
    keep rows where the supplier is late, the order has >= 2 suppliers,
    and exactly 1 late supplier. Two fact shuffles total (orderkey join,
    orderkey aggregate) -- no correlated re-scans, which is exactly what an
    optimizer must do to survive this query at scale."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    # the supplier's own late lines, one row per (order, supplier)
    late_pairs = (
        j.where(late).select("l_orderkey", "l_suppkey").distinct()
    )
    waiting = late_pairs.join(
        per_order.where(
            (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        ),
        "l_orderkey",
        "left_semi",
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ),
    pse AS (SELECT * FROM ps JOIN eur ON s_suppkey = l_suppkey),
    mc AS (SELECT l_partkey AS mc_partkey, MIN(cost) AS min_cost
           FROM pse GROUP BY l_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, cost
    FROM pse
    JOIN part ON p_partkey = l_partkey
             AND p_size = 9 AND p_type = 'SMALL'
    JOIN mc ON mc_partkey = l_partkey AND cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped minimum-cost supplier. The fixtures have no partsupp,
    so supply cost is derived from the fact table (the q16 bridge
    convention): cost(part, supplier) = MIN unit price over their lines --
    a double MIN, deterministic on both engines. The spec's correlated
    scalar subquery (min cost over the region's suppliers for this part)
    decorrelates to one per-part aggregate joined back on
    (partkey, cost = min_cost) -- equality on the identical MIN double is
    exact. Region/nation/supplier and the size+type-filtered part are all
    broadcast dimensions; the only shuffles are the two partkey-grain
    aggregates of the fact-derived cost table. Top-100 by account balance
    is TakeOrderedAndProject, never a global sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    pse = ps.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
    mc = pse.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 9) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_brand")
    return (
        pse.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            mc,
            (F.col("mc_partkey") == F.col("l_partkey"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
        SELECT l_partkey AS ps_partkey,
               SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6)))
                   AS dec_v
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT ps_partkey, CAST(dec_v AS DOUBLE) AS part_value
    FROM pv
    WHERE dec_v * 1000 > (SELECT SUM(dec_v) FROM pv)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped important stock: per-part inventory value for one
    nation's suppliers, keeping parts above a fraction of the nation total.
    Without partsupp, value(part) = SUM(extendedprice * quantity) over the
    nation's lines (decimal accumulator both sides). The spec's HAVING
    scalar subquery is the 1-row-total pattern: aggregate once, broadcast
    the single total row back with a crossJoin, compare in exact decimal
    (value * 1000 > total -- integer-scaled so no double threshold enters
    the comparison). One fact shuffle on partkey; supplier and nation
    broadcast; no global sort (the driver compare is order-insensitive and
    a total order over every surviving part is pure cost at scale)."""
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    pv = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast(DEC))
            .alias("dec_v")
        )
    )
    tot = pv.agg(F.sum("dec_v").alias("tot"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(F.col("dec_v") * F.lit(1000) > F.col("tot"))
        .select("ps_partkey", F.col("dec_v").cast("double").alias("part_value"))
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    WITH oq AS (
        SELECT l_orderkey,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS dec_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(dec_qty AS DOUBLE) AS sum_qty
    FROM oq
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 (exact schema fit -- no partsupp needed): customers whose
    orders total > 300 units. The IN-subquery-with-HAVING decorrelates to
    the qualifying-orders aggregate joined back to orders on orderkey;
    the quantity sum from that same aggregate IS the output column, so the
    fact table is scanned and shuffled exactly once. The >300 filter is
    highly selective (static plan keeps a shuffle join on orderkey; AQE
    converts it to broadcast at runtime when the survivor set is small --
    the right call at 100 TB where qualification volume is data-dependent).
    customer broadcasts. Top-100 via TakeOrderedAndProject with an
    o_orderkey tiebreak so ties at the cut line are deterministic."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    oq = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("dec_qty")
    ).where(F.col("dec_qty") > 300)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        oq.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("dec_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "q20_potential_promotion",
    oracle="""
    SELECT s_name, n_name, s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 50
    )
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped promotion candidates: suppliers who moved > 50
    units of some 'small…'-named part during 1995. The spec compares
    partsupp availability against half the shipped volume; without
    partsupp the shipped-volume side carries the whole predicate (same
    plan skeleton: name-filtered part broadcast into the date-pruned fact,
    (supplier, part)-grain aggregate, HAVING threshold, semi join into
    supplier). The decimal quantity sum keeps the threshold exact. The
    IN is a LEFT SEMI join -- each supplier emitted once no matter how
    many qualifying parts. nation broadcasts for the name; no sort (the
    compare is order-insensitive; s_name is unique anyway)."""
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    qual = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("dec_q"))
        .where(F.col("dec_q") > 50)
        .select("l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", "s_acctbal")
    )
