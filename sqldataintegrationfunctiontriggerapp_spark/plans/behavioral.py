"""Behavioral / time-series analytics over `events` and `orders` -- the
product-analytics batch a training-data or CDC pipeline grows once raw
ingestion works: distribution banding, deciles, Pareto concentration,
gap-filled daily series, window dedup, burst detection, and DAU/WAU.

Scale notes: every query is scan -> keyed window or partial/final hash
aggregate. Windows always partition on a real key (user, type, nation) --
never a global single-partition window. The date spine in the gap-fill
query is GENERATED (sequence/explode), not scanned, and joined broadcast;
the DAU/WAU rolling-distinct is re-expressed as an explode-to-covered-days
equi-aggregate instead of a range self-join, so at 100 TB it stays a 7x
fan-out of the (already user-day-deduped) activity table rather than a
non-equi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.plans._util import DEC
from sqldataintegrationfunctiontriggerapp_spark.plans.registry import register


@register(
    "quantile_bands_per_type",
    oracle="""
    WITH q AS (
        SELECT event_type,
               ROUND(quantile_cont(value, 0.25), 4) AS q1,
               ROUND(quantile_cont(value, 0.50), 4) AS q2,
               ROUND(quantile_cont(value, 0.75), 4) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CASE WHEN e.value < q.q1 THEN 'B1'
                WHEN e.value < q.q2 THEN 'B2'
                WHEN e.value < q.q3 THEN 'B3'
                ELSE 'B4' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS band_sum
    FROM events e JOIN q ON q.event_type = e.event_type
    GROUP BY e.event_type, band
    """,
)
def quantile_bands_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution banding: per-type quartile cutoffs (tiny aggregate),
    broadcast back onto the fact scan, band counts in one more aggregate.
    The two-pass agg-then-broadcast-join shape is the scale-safe way to
    band by a computed distribution -- the cutoff table is O(types), never
    shuffled with the facts. Exact percentile buffers each group's values
    (fine for bounded per-type cardinality; swap percentile_approx's
    mergeable sketch for unbounded groups -- see percentile_approx)."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 4).alias("q1"),
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("q2"),
        F.round(F.expr("percentile(value, 0.75)"), 4).alias("q3"),
    )
    band = (
        F.when(F.col("value") < F.col("q1"), "B1")
        .when(F.col("value") < F.col("q2"), "B2")
        .when(F.col("value") < F.col("q3"), "B3")
        .otherwise("B4")
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type", band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("band_sum"),
        )
    )


@register(
    "event_value_ntiles",
    oracle="""
    WITH t AS (
        SELECT event_type, value,
               ntile(4) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS tile
        FROM events
    )
    SELECT event_type, CAST(tile AS INTEGER) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM t GROUP BY event_type, tile
    """,
)
def event_value_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count quartile assignment (NTILE) per event type, summarized to
    tile boundaries. The window partitions on event_type -- parallel across
    types -- and orders by (value, event_id) so tie rows land
    deterministically in the same tile in any engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(4).over(w).alias("tile"))
        .groupBy("event_type", F.col("tile").cast("int").alias("tile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "orders_pareto_share",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS revenue_dec
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    ),
    tot AS (
        SELECT nationkey, SUM(revenue_dec) AS nation_rev
        FROM rev GROUP BY nationkey
    ),
    ranked AS (
        SELECT r.nationkey, r.custkey, r.revenue,
               row_number() OVER (PARTITION BY r.nationkey
                                  ORDER BY r.revenue_dec DESC, r.custkey)
                   AS rnk,
               CAST(SUM(r.revenue_dec) OVER (
                        PARTITION BY r.nationkey
                        ORDER BY r.revenue_dec DESC, r.custkey) AS DOUBLE)
               / CAST(t.nation_rev AS DOUBLE) AS cum_share
        FROM rev r JOIN tot t ON t.nationkey = r.nationkey
    )
    SELECT nationkey, custkey, revenue, CAST(rnk AS INTEGER) AS rnk, cum_share
    FROM ranked WHERE rnk <= 5
    """,
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto curve): top-5 customers per nation with
    their cumulative share of nation revenue. Per-customer rollup first
    (shrinks facts to one row per customer), then nation-partitioned rank +
    running share -- the window never sees raw orders, and partitioning on
    nation keeps it parallel. Decimal accumulators make the running sums
    engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["custkey"])
        .groupBy("nationkey", "custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue_dec"))
        .withColumn("revenue", F.col("revenue_dec").cast("double"))
    )
    tot = rev.groupBy("nationkey").agg(
        F.sum("revenue_dec").alias("nation_rev")
    )
    w = Window.partitionBy("nationkey").orderBy(
        F.desc("revenue_dec"), "custkey"
    )
    return (
        rev.join(F.broadcast(tot), "nationkey")
        .select(
            "nationkey",
            "custkey",
            "revenue",
            F.row_number().over(w).cast("int").alias("rnk"),
            (
                F.sum("revenue_dec").over(w).cast("double")
                / F.col("nation_rev").cast("double")
            ).alias("cum_share"),
        )
        .where(F.col("rnk") <= 5)
    )


@register(
    "gap_fill_daily_counts",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS d0,
               CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) AS d1
        FROM events
    ),
    spine AS (
        SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day, et.event_type
        FROM bounds
        CROSS JOIN (SELECT DISTINCT event_type FROM events) et
    ),
    daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,6))) AS v
        FROM events GROUP BY day, event_type
    )
    SELECT s.day, s.event_type,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(d.v, 0) AS DOUBLE) AS value_sum
    FROM spine s
    LEFT JOIN daily d ON d.day = s.day AND d.event_type = s.event_type
    """,
)
def gap_fill_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series: a GENERATED (day x type) spine left-joined
    to the real daily rollup, zeros where nothing happened -- what every
    downstream chart/model expects from a time series. The spine is
    sequence()-generated metadata (days x types rows, never a scan) and the
    rollup reduces facts before any join, so the join sides are tiny at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("timestamp").cast("date")
    bounds = ev.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    types = ev.select("event_type").distinct()
    spine = (
        bounds.crossJoin(types)
        .select(
            F.explode(F.sequence("d0", "d1")).alias("day"), "event_type"
        )
    )
    daily = ev.groupBy(day.alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("v"),
    )
    return (
        spine.join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("v"), F.lit(0)).cast("double").alias("value_sum"),
        )
    )


@register(
    "sliding_dedup_window",
    oracle="""
    WITH g AS (
        SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               epoch(CAST(ts AS TIMESTAMP))
               - epoch(lag(CAST(ts AS TIMESTAMP)) OVER (
                     PARTITION BY user_id, event_type
                     ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap
        FROM events
    )
    SELECT event_id, user_id, event_type, ts
    FROM g WHERE gap IS NULL OR gap > 600
    """,
)
def sliding_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window dedup: drop an event when the same (user, type) fired
    within the previous 600 s -- the batch expression of streaming
    `dropDuplicatesWithinWatermark`. One keyed window (lag), no self-join;
    epoch doubles carry microsecond precision exactly in both engines."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id", "event_type").orderBy(ts, "event_id")
    gap = ts.cast("double") - F.lag(ts.cast("double")).over(w)
    return (
        ev.select("event_id", "user_id", "event_type", ts.alias("ts"),
                  gap.alias("gap"))
        .where(F.col("gap").isNull() | (F.col("gap") > 600))
        .drop("gap")
    )


@register(
    "bursty_users",
    oracle="""
    WITH b AS (
        SELECT user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
                   AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY user_id, bucket
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS max_burst,
           CAST(COUNT(*) AS BIGINT) AS n_active_hours
    FROM b GROUP BY user_id
    HAVING MAX(n) >= 2
    """,
)
def bursty_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: users whose peak 1-hour tumbling-window event count
    reaches the threshold -- abuse/bot triage shape. Two stacked hash
    aggregates ((user, hour) then user), both map-side combinable; no
    windows, no joins."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(
        F.col("ts").cast("timestamp").cast("double") / 3600
    ).cast("long")
    b = ev.groupBy("user_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        b.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("max_burst"),
            F.count(F.lit(1)).cast("long").alias("n_active_hours"),
        )
        .where(F.col("max_burst") >= 2)
    )


@register(
    "daily_active_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events
    ),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    covered AS (
        SELECT user_id,
               CAST(UNNEST(generate_series(day, day + 6, INTERVAL 1 DAY))
                    AS DATE) AS day
        FROM ud
    ),
    wau AS (
        SELECT day, COUNT(DISTINCT user_id) AS wau
        FROM covered GROUP BY day
    )
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
    FROM dau d
    JOIN wau w ON w.day = d.day
    JOIN bounds b ON d.day BETWEEN b.d0 AND b.d1
    """,
)
def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day. The rolling distinct
    is re-expressed as an equi-aggregate: dedupe to user-days (the big
    reduction), explode each user-day to the 7 future days it covers, then
    one COUNT DISTINCT per day -- no non-equi range self-join, no windowed
    distinct (which Spark cannot do exactly). 7x fan-out of the deduped
    activity table is the whole cost at any scale."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("timestamp").cast("date")
    ud = ev.select("user_id", day.alias("day")).distinct()
    bounds = ud.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    covered = ud.select(
        "user_id",
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("day"),
    )
    wau = covered.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .crossJoin(F.broadcast(bounds))
        .where(F.col("day").between(F.col("d0"), F.col("d1")))
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            (F.col("dau").cast("double") / F.col("wau").cast("double"))
            .alias("stickiness"),
        )
    )


@register(
    "robust_outliers_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, m.med, abs(e.value - m.med) AS d
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, ROUND(quantile_cont(d, 0.5), 4) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           MIN(dev.med) AS med,
           MIN(mad.mad) AS mad,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    """,
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counting via median absolute deviation: per event
    type, the median, the MAD, and how many events sit more than 3 MADs
    from the median -- the quality gate that survives heavy-tailed value
    distributions where mean/stddev z-scores drown. Median and MAD are
    rounded to 4 decimals on both engines (same convention as the
    percentiles query) so the interpolated quantile agrees bit-for-bit
    before it feeds the comparison.

    Plan: two grouped exact-percentile passes (each a shuffle on
    event_type) with the tiny per-type medians BROADCAST back onto the
    scan between them, then one final aggregate. At 100 TB the exact
    median would move to percentile_approx; the plan shape -- aggregate,
    broadcast join, aggregate -- is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(d, 0.5)"), 4).alias("mad")
    )
    out = F.when(F.col("d") > F.lit(3) * F.col("mad"), F.lit(1)).otherwise(F.lit(0))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(out).cast("long").alias("n_outliers"),
        )
    )


# --- EWMA burst detection ----------------------------------------------------
# alpha = 1/2 makes every EWMA weight a power of two: the contribution of
# the day at distance d is x * 2^-d, so scaling by 2^16 turns the whole
# truncated (16-day) EWMA into EXACT integer arithmetic -- the only float
# op is one final division by 65536.0, and the burst predicate never
# leaves integers at all (x * 2^16 > 3 * sum_scaled). The weight table is
# generated once and spliced into BOTH sides verbatim.
_EWMA_W = 16
_EWMA_CASE = " ".join(
    f"WHEN {d} THEN {1 << (_EWMA_W - d)}" for d in range(1, _EWMA_W + 1)
)

_EWMA_ORACLE = f"""
    WITH dc AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                   AS day,
               COUNT(*) AS n
        FROM events GROUP BY event_type, day
    ),
    hist AS (
        SELECT c.event_type, c.day, c.n,
               SUM(p.n * CASE c.day - p.day {_EWMA_CASE} END) AS sum_scaled
        FROM dc c
        LEFT JOIN dc p ON p.event_type = c.event_type
                      AND p.day BETWEEN c.day - {_EWMA_W} AND c.day - 1
        GROUP BY c.event_type, c.day, c.n
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
           CAST(sum_scaled AS DOUBLE) / 65536.0 AS ewma_expected,
           COALESCE(n * 65536 > 3 * sum_scaled, FALSE) AS is_burst
    FROM hist
"""


@register("ewma_burst_daily", oracle=_EWMA_ORACLE)
def ewma_burst_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily burst detection against an exponentially
    weighted moving average of the preceding 16 days (alpha = 1/2,
    truncated): a day is a burst when its count exceeds 3x the EWMA of
    its own history. Complements bursty_users (peak-vs-threshold, no
    baseline): this one adapts the baseline per series, the
    alerting/anomaly shape for ingestion-rate monitoring.

    Determinism: the alpha = 1/2 truncation makes every weight a power of
    two, so the weighted history sum is EXACT BIGINT arithmetic (see the
    weight-table preamble); the burst predicate compares integers only,
    and the single double division at the end is one IEEE op on identical
    operands. Missing days contribute zero on both sides (the history
    join simply has no row).

    Scale shape: the raw scan collapses to (type, day) grain FIRST (hash
    aggregate, map-side combinable) -- the history self-join then runs on
    series-grain rows (|types| x |days|), with fan-out capped at 16 rows
    per day by the BETWEEN band. No windows over raw events, no
    fact-grain shuffle beyond the first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("timestamp").cast("double") / 86400).cast(
        "long"
    )
    dc = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    c = dc.alias("c")
    p = dc.alias("p")
    w = F.expr(f"CASE c.day - p.day {_EWMA_CASE} END")
    hist = (
        c.join(
            p,
            (F.col("p.event_type") == F.col("c.event_type"))
            & F.col("p.day").between(
                F.col("c.day") - _EWMA_W, F.col("c.day") - 1
            ),
            "left",
        )
        .groupBy(F.col("c.event_type"), F.col("c.day"), F.col("c.n"))
        .agg(F.sum(F.col("p.n") * w).alias("sum_scaled"))
    )
    return hist.select(
        F.col("c.event_type").alias("event_type"),
        F.col("c.day").alias("day"),
        F.col("c.n").cast("long").alias("n_events"),
        (F.col("sum_scaled").cast("double") / F.lit(65536.0)).alias(
            "ewma_expected"
        ),
        F.coalesce(
            F.col("c.n") * 65536 > 3 * F.col("sum_scaled"), F.lit(False)
        ).alias("is_burst"),
    )
