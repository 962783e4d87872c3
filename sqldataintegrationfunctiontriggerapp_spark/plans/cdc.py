"""CDC-pipeline-shaped queries: the reference's change-feed operators
re-expressed as oracle-checkable batch queries (SURVEY.md §2.A).

The `events` fixture stands in for a change feed: `event_id` is the change
sequence, `user_id` the row key, `ts` the change time, `event_type` maps onto
operation kinds, and `props` is the JSON payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.operators.projection import (
    project_allowlist,
    union_allowlists,
)
from sqldataintegrationfunctiontriggerapp_spark.plans.registry import register


@register(
    "allowlist_projection",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate
    FROM orders
    """,
)
def allowlist_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3+A4: union of a 'config' CSV and a 'client' CSV, case-insensitive
    matching (note the deliberately wrong-cased names), resolved driver-side
    into a select that Catalyst pushes into the parquet reader."""
    allow = union_allowlists("O_ORDERKEY, o_custkey", " o_OrderDate ,, ")
    return project_allowlist(load_table(spark, sf_dir, "orders"), allow)


@register(
    "identifier_normalization",
    oracle="""
    SELECT DISTINCT
        '[dbo].[' || o_orderstatus || ']' AS raw_name,
        regexp_replace('[dbo].[' || o_orderstatus || ']', '\\[|\\]', '', 'g')
          AS normalized
    FROM orders
    """,
)
def identifier_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: bracket-stripping table-name normalization
    (ClientAllowedColumnsFunction.cs:21) as a set-level transform."""
    o = load_table(spark, sf_dir, "orders")
    raw = F.concat(F.lit("[dbo].["), F.col("o_orderstatus"), F.lit("]"))
    return o.select(
        raw.alias("raw_name"),
        F.regexp_replace(raw, r"\[|\]", "").alias("normalized"),
    ).distinct()


@register(
    "json_envelope",
    oracle="""
    SELECT o_orderkey,
           CAST(to_json(struct_pack(
               operation := 'Update',
               o_orderkey := o_orderkey,
               o_orderstatus := o_orderstatus,
               o_orderpriority := o_orderpriority
           )) AS VARCHAR) AS payload
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def json_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: the change-batch JSON envelope (HttpPostAction.cs:36) -- operation
    plus the projected row serialized to one JSON document per change."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.lit("Update").alias("operation"),
                F.col("o_orderkey"),
                F.col("o_orderstatus"),
                F.col("o_orderpriority"),
            )
        ).alias("payload"),
    )


@register(
    "retry_classification",
    oracle="""
    SELECT status,
           CASE WHEN status IN (408, 429) OR status >= 500
                THEN 'retryable' ELSE 'fatal' END AS classification,
           COUNT(*) AS n
    FROM (SELECT 100 + (event_id % 600) AS status FROM events) t
    WHERE NOT (status >= 200 AND status < 300)
    GROUP BY status,
           CASE WHEN status IN (408, 429) OR status >= 500
                THEN 'retryable' ELSE 'fatal' END
    """,
)
def retry_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: retryable-vs-fatal HTTP status classification
    (HttpPostAction.cs:74-83) over a synthetic status column."""
    ev = load_table(spark, sf_dir, "events")
    status = (F.lit(100) + F.col("event_id") % 600).alias("status")
    df = ev.select(status)
    cls = F.when(
        F.col("status").isin(408, 429) | (F.col("status") >= 500), "retryable"
    ).otherwise("fatal")
    return (
        df.where(~((F.col("status") >= 200) & (F.col("status") < 300)))
        .groupBy("status", cls.alias("classification"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "error_truncation",
    oracle="""
    SELECT doc_id,
           SUBSTRING(text, 1, 500) AS err_500,
           SUBSTRING(text, 1, 40) AS err_40,
           LENGTH(SUBSTRING(text, 1, 40)) AS err_40_len
    FROM documents
    """,
)
def error_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: bound diagnostic payloads to the first N chars
    (HttpPostAction.cs:60-63)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring("text", 1, 500).alias("err_500"),
        F.substring("text", 1, 40).alias("err_40"),
        F.length(F.substring("text", 1, 40)).alias("err_40_len"),
    )


@register(
    "retry_backoff",
    oracle="""
    SELECT retry_count,
           LEAST(6 + retry_count, 12) AS linear_minutes,
           ROUND(LEAST(10.0 * pow(1.125, retry_count), 300.0), 4) AS expo_seconds,
           (retry_count = 4) AS notify_now,
           COUNT(*) AS n
    FROM (SELECT event_id % 20 AS retry_count FROM events) t
    GROUP BY retry_count
    """,
)
def retry_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12+A15+A20: capped-linear orchestrated backoff
    (RetryFunctions.cs:30-33), exponential activity backoff (:41-48), and the
    notify-on-Nth-retry threshold trigger (:170-173)."""
    ev = load_table(spark, sf_dir, "events")
    df = ev.select((F.col("event_id") % 20).alias("retry_count"))
    g = df.groupBy("retry_count").agg(F.count(F.lit(1)).alias("n"))
    return g.select(
        "retry_count",
        F.least(F.lit(6) + F.col("retry_count"), F.lit(12)).alias("linear_minutes"),
        F.round(
            F.least(
                F.lit(10.0) * F.pow(F.lit(1.125), F.col("retry_count")),
                F.lit(300.0),
            ),
            4,
        ).alias("expo_seconds"),
        (F.col("retry_count") == 4).alias("notify_now"),
        "n",
    )


@register(
    "cdc_latest_state",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) t
    WHERE rn = 1
    """,
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: keyed latest-wins compaction -- the engine-side construction of the
    reference's 'current state of changed rows' delivery (README.md:5,:21).
    One shuffle on the key; at 100 TB the key partitioning is reused by any
    downstream per-key op."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
                "event_type", "value")
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: JSON extraction from a string column (events.props)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_int"),
    ).where(F.col("k_int") >= 50)


@register(
    "purge_retention",
    oracle="""
    SELECT event_type AS status, COUNT(*) AS kept
    FROM events
    WHERE NOT (event_type = 'purchase'
               AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-25'
           OR event_type IN ('error', 'signup')
               AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08')
    GROUP BY event_type
    """,
)
def purge_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24: age+status retention purge (CleanupFunction.cs:13-34) expressed as
    the surviving-rows filter: 'completed' rows kept 7 days ('purchase' here),
    'failed-ish' rows kept a longer window -- the inverse of the DELETE."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    purge = (
        (F.col("event_type") == "purchase") & (ts < F.lit("2024-01-25").cast("timestamp"))
    ) | (
        F.col("event_type").isin("error", "signup")
        & (ts < F.lit("2024-01-08").cast("timestamp"))
    )
    return (
        ev.where(~purge)
        .groupBy(F.col("event_type").alias("status"))
        .agg(F.count(F.lit(1)).alias("kept"))
    )


@register(
    "changefeed_watermark",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
    FROM events
    WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-28'
    """,
)
def changefeed_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 batch analog: 'changed since high-water mark' incremental scan; the
    predicate pushes to parquet min/max row-group stats, so an incremental
    read of a 100 TB time-partitioned table touches only new files."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        F.col("ts").cast("timestamp") > F.lit("2024-01-28").cast("timestamp")
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
             "event_type")


@register(
    "scd2_history",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(ts AS TIMESTAMP) AS valid_from,
           lead(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS valid_to,
           CAST(lead(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) IS NULL AS INT) AS is_current
    FROM events
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) history materialization from
    the change feed: each change event becomes a version row with a
    [valid_from, valid_to) interval, closed by the key's next change
    (lead over user_id ordered by event time); the open interval marks the
    current state. This is the standard warehouse consumption of the CDC
    stream the reference only forwards (README.md:5, 'current row state' --
    here with full history retained). One shuffle on the key; at 100 TB
    incremental runs close only the previously-open intervals of keys seen
    in the new batch."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(ts, "event_id")
    valid_to = F.lead(ts).over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        ts.alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().cast("int").alias("is_current"),
    )


@register(
    "cdc_merge_upsert",
    oracle="""
    WITH snapshot AS (
        SELECT user_id, event_type, value, ts FROM (
            SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
            FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-28')
        WHERE rn = 1),
    delta AS (
        SELECT user_id, event_type, value, ts FROM (
            SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
            FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-28')
        WHERE rn = 1)
    SELECT COALESCE(d.user_id, s.user_id) AS user_id,
           COALESCE(d.event_type, s.event_type) AS event_type,
           COALESCE(d.value, s.value) AS value,
           COALESCE(d.ts, s.ts) AS ts,
           CASE WHEN d.user_id IS NULL THEN 'unchanged'
                WHEN s.user_id IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action
    FROM snapshot s FULL OUTER JOIN delta d USING (user_id)
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on DataFrames (B-family; EntityFunctions.cs-style
    upsert generalized to a table): a pre-watermark per-key snapshot merged
    with the post-watermark delta -- matched keys take the delta row
    (WHEN MATCHED UPDATE), new keys insert, untouched keys carry forward.
    Spark-first shape: both sides reduce to one row per key BEFORE the full
    outer join, so the join carries |keys| rows, not |events|; on Delta/
    Iceberg this plan IS what MERGE INTO compiles to. The state store's
    partitioned upsert (state.py) is the keyed-point-write analog."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    cutoff = F.lit("2024-01-28").cast("timestamp")
    cols = ["user_id", "event_type", "value"]

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(F.desc(ts), F.desc("event_id"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(*cols, ts.alias("ts"))
        )

    snapshot = latest(ev.where(ts < cutoff))
    delta = latest(ev.where(ts >= cutoff))
    s = snapshot.select([F.col(c).alias(f"s_{c}") for c in snapshot.columns])
    d = delta.select([F.col(c).alias(f"d_{c}") for c in delta.columns])
    joined = s.join(d, s["s_user_id"] == d["d_user_id"], "full_outer")
    return joined.select(
        F.coalesce("d_user_id", "s_user_id").alias("user_id"),
        F.coalesce("d_event_type", "s_event_type").alias("event_type"),
        F.coalesce("d_value", "s_value").alias("value"),
        F.coalesce("d_ts", "s_ts").alias("ts"),
        F.when(F.col("d_user_id").isNull(), F.lit("unchanged"))
        .when(F.col("s_user_id").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("merge_action"),
    )


@register(
    "agg_incremental_maintenance",
    oracle="""
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           MAX(ts) AS last_ts,
           CASE WHEN COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-28'
                                THEN 1 END) = 0 THEN 'unchanged'
                WHEN COUNT(CASE WHEN ts < TIMESTAMP '2024-01-28'
                                THEN 1 END) = 0 THEN 'inserted'
                ELSE 'updated' END AS refresh_action
    FROM events
    GROUP BY user_id, event_type
    """,
)
def agg_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (IVM): refresh a standing per-key
    aggregate table from a CDC delta WITHOUT rescanning the base -- the
    aggregate-level sibling of cdc_merge_upsert's row-level MERGE, and the
    pattern that keeps derived tables current over a 100 TB fact stream
    (recomputing them per batch is the thing a pipeline at that scale
    cannot afford). Base partials (pre-watermark; standing for the
    persisted aggregate table a production run would READ, not compute)
    full-outer-merge with the delta's partials: counts add, sums add IN
    DECIMAL before the final double cast (two partial decimal sums combine
    exactly; summing doubles would drift from the recompute), min/max take
    least/greatest (null-skipping), and refresh_action classifies each key
    the way an audit log would.

    THE ORACLE IS THE FULL RECOMPUTE over base+delta, so the value hash is
    the incremental-equals-recompute proof, not a re-statement of the merge.

    Scale shape: both sides reduce map-side to one row per (user_id,
    event_type) BEFORE the merge join, so the join carries |keys| aggregate
    rows, never |events|; the delta side's shuffle carries only the batch.
    Insert-only deltas keep every combine associative -- retractions (CDC
    deletes) would need the count/sum to subtract and min/max to fall back
    to a per-key rescan, which is exactly why production IVM engines
    restrict DELETE support; documented, not implemented.

    Reference parity: the reference maintains running per-entity state one
    HTTP batch at a time (EntityFunctions.cs keyed upsert); this is that
    capability re-expressed as a set-oriented refresh."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    cutoff = F.lit("2024-01-28").cast("timestamp")
    return incremental_agg_merge(
        ev.where(ts < cutoff), ev.where(ts >= cutoff)
    )


def incremental_agg_merge(ev_base: DataFrame, ev_delta: DataFrame) -> DataFrame:
    """The partials + full-outer combine behind agg_incremental_maintenance,
    over any pair of event frames (extracted so the branch-coverage test can
    drive the 'inserted' action, which the fixture's key distribution never
    produces -- every sf0.01 key exists pre-cutoff)."""
    ts = F.col("ts").cast("timestamp")
    keys = ["user_id", "event_type"]
    dec = "decimal(18,6)"

    def partials(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias(f"{tag}_n"),
            F.sum(F.col("value").cast(dec)).alias(f"{tag}_sum"),
            F.min("value").alias(f"{tag}_min"),
            F.max("value").alias(f"{tag}_max"),
            F.max(ts).alias(f"{tag}_ts"),
        )

    base = partials(ev_base, "b")
    delta = partials(ev_delta, "d")
    merged = base.join(delta, on=keys, how="full_outer")
    zero = F.lit(0).cast("decimal(28,6)")
    return merged.select(
        *keys,
        (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
        .cast("long")
        .alias("n_events"),
        (F.coalesce("b_sum", zero) + F.coalesce("d_sum", zero))
        .cast("double")
        .alias("sum_value"),
        F.least("b_min", "d_min").alias("min_value"),
        F.greatest("b_max", "d_max").alias("max_value"),
        F.greatest("b_ts", "d_ts").alias("last_ts"),
        F.when(F.col("d_n").isNull(), F.lit("unchanged"))
        .when(F.col("b_n").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("refresh_action"),
    )


@register(
    "agg_incremental_retract",
    oracle="""
    WITH latest AS (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM latest WHERE rn = 1
    GROUP BY event_type
    """,
)
def agg_incremental_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION-capable incremental maintenance -- the boundary
    agg_incremental_maintenance documents, implemented for the aggregates
    where it is actually possible: an aggregate over a MUTABLE keyed table
    (each user's latest row; an upsert retracts the old version's
    contribution and inserts the new one's, possibly in a different group).
    COUNT and SUM are subtractable, so the standing per-event_type
    aggregate refreshes as base - retractions + insertions without
    rescanning the base: retractions are the pre-cutoff latest rows of
    exactly the users the delta touches (a semi join against the delta's
    keys), insertions are the delta's latest rows. MIN/MAX are deliberately
    absent -- they are NOT subtractable (retracting the current minimum
    forces a per-group rescan), which is the precise reason the insert-only
    sibling carries them and this one does not.

    Sums subtract IN DECIMAL (b - r + i combined before the double cast:
    decimal subtraction is exact, so moving a user across groups cannot
    leave drift in either group); counts are longs. Groups whose count
    reaches zero are dropped, matching the recompute. THE ORACLE IS AGAIN
    THE FULL RECOMPUTE -- latest row per user over base+delta, aggregated
    directly -- so the hash is the retract-refresh-equals-recompute proof.

    Scale shape: every stage reduces before it joins -- per-user latest
    rows via one keyed window each side, group-level aggregates before the
    three-way full-outer combine, which therefore carries |event_types|
    rows. The delta's key set drives the semi join, so a small batch
    touches only its own users' old rows regardless of base size."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    cutoff = F.lit("2024-01-28").cast("timestamp")
    return incremental_retract_merge(
        ev.where(ts < cutoff), ev.where(ts >= cutoff)
    )


def _latest_per_user(df: DataFrame) -> DataFrame:
    """Each user's latest (event_type, value) row -- the mutable keyed
    table both retraction merges maintain aggregates over."""
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.desc(ts), F.desc("event_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "event_type", "value")
    )


def incremental_retract_merge(
    ev_base: DataFrame, ev_delta: DataFrame
) -> DataFrame:
    """The latest-per-key -> retract/insert -> subtractable-combine behind
    agg_incremental_retract, over any pair of event frames (extracted so
    the zero-count-group drop and the cross-group move -- both unreachable
    or unprovoked at fixture cardinalities -- can be pinned directly)."""
    latest = _latest_per_user
    dec = "decimal(18,6)"

    def grouped(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias(f"{tag}_n"),
            F.sum(F.col("value").cast(dec)).alias(f"{tag}_sum"),
        )

    pre = latest(ev_base)
    delta = latest(ev_delta)
    base = grouped(pre, "b")
    retract = grouped(
        pre.join(delta.select("user_id"), "user_id", "semi"), "r"
    )
    insert = grouped(delta, "i")
    merged = base.join(retract, "event_type", "full_outer").join(
        insert, "event_type", "full_outer"
    )
    zero = F.lit(0).cast("decimal(28,6)")
    n = (
        F.coalesce("b_n", F.lit(0))
        - F.coalesce("r_n", F.lit(0))
        + F.coalesce("i_n", F.lit(0))
    )
    s = (
        F.coalesce("b_sum", zero)
        - F.coalesce("r_sum", zero)
        + F.coalesce("i_sum", zero)
    )
    return merged.select(
        "event_type",
        n.cast("long").alias("n_users"),
        s.cast("double").alias("sum_value"),
    ).where(F.col("n_users") > 0)


def _retract_minmax_parts(ev_base: DataFrame, ev_delta: DataFrame):
    """Shared stages of the MIN/MAX-capable retraction merge: per-user
    latest rows each side, the retracted/remaining split of the base, and
    the per-group partials (count, decimal sum, min, max) for base,
    retracted, and inserted rows. Returned as a tuple so the merge and the
    rescan-scope helper (and its test pin) derive from ONE construction."""
    pre = _latest_per_user(ev_base)
    delta = _latest_per_user(ev_delta)
    touched_users = delta.select("user_id")
    retracted = pre.join(touched_users, "user_id", "semi")
    remaining = pre.join(touched_users, "user_id", "anti")
    dec = "decimal(18,6)"

    def grouped(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias(f"{tag}_n"),
            F.sum(F.col("value").cast(dec)).alias(f"{tag}_sum"),
            F.min("value").alias(f"{tag}_min"),
            F.max("value").alias(f"{tag}_max"),
        )

    return (
        grouped(pre, "b"),
        grouped(retracted, "r"),
        grouped(delta, "i"),
        remaining,
    )


def retract_rescan_scope(ev_base: DataFrame, ev_delta: DataFrame) -> DataFrame:
    """The groups whose retraction REQUIRES a rescan: a retracted row
    achieved the group's standing min or max (r_min == b_min or
    r_max == b_max -- retracted rows are a subset of the base, so equality
    is exactly 'the extremum was among the retracted'). Everything else
    combines incrementally. Exposed so the touched-groups-only shape is
    directly testable."""
    base, retract, _, _ = _retract_minmax_parts(ev_base, ev_delta)
    return (
        base.join(retract, "event_type")
        .where(
            (F.col("r_min") == F.col("b_min"))
            | (F.col("r_max") == F.col("b_max"))
        )
        .select("event_type")
    )


def incremental_retract_minmax_merge(
    ev_base: DataFrame, ev_delta: DataFrame
) -> DataFrame:
    """Retraction-capable IVM INCLUDING min/max (r10, verdict #4) -- the
    production fallback agg_incremental_retract documents: min/max are not
    subtractable, so a group that loses its extremum is RESCANNED, but the
    rescan is scoped to exactly those groups (retract_rescan_scope) --
    a group whose retracted rows never held the extremum combines
    incrementally (least/greatest with the insert side), same as the
    insert-only sibling. The rescan reads the REMAINING base rows (anti
    join against the delta's users) semi-joined to the flagged groups; on
    a group-partitioned standing layout that semi join partition-prunes,
    so a small delta rescans only the few groups it actually dethroned --
    the standard IVM move (cf. Gupta/Mumick's bounded-rescan treatment of
    non-distributive aggregates).

    Duplicates make the equality test conservative, never wrong: if
    another remaining row ties the retracted extremum, the rescan simply
    rediscovers the same value. COUNT/SUM subtract exactly as in
    agg_incremental_retract (decimal combine); groups emptied by the
    retraction drop (n_users = 0), and an all-rows-retracted group's
    rescan is NULL-min/max, so least/greatest fall through to the insert
    side alone."""
    base, retract, insert, remaining = _retract_minmax_parts(
        ev_base, ev_delta
    )
    scope = (
        base.join(retract, "event_type")
        .where(
            (F.col("r_min") == F.col("b_min"))
            | (F.col("r_max") == F.col("b_max"))
        )
        .select("event_type")
    )
    rescan = (
        remaining.join(scope, "event_type", "semi")
        .groupBy("event_type")
        .agg(F.min("value").alias("s_min"), F.max("value").alias("s_max"))
    )
    merged = (
        base.join(retract, "event_type", "full_outer")
        .join(insert, "event_type", "full_outer")
        .join(rescan, "event_type", "left")
    )
    zero = F.lit(0).cast("decimal(28,6)")
    n = (
        F.coalesce("b_n", F.lit(0))
        - F.coalesce("r_n", F.lit(0))
        + F.coalesce("i_n", F.lit(0))
    )
    s = (
        F.coalesce("b_sum", zero)
        - F.coalesce("r_sum", zero)
        + F.coalesce("i_sum", zero)
    )
    # NULL semantics make the branches total: a missing side compares to
    # NULL -> false, so insert-only groups and untouched groups take the
    # incremental branch, where least/greatest skip the NULL operand.
    new_min = F.when(
        F.col("r_min") == F.col("b_min"), F.least("s_min", "i_min")
    ).otherwise(F.least("b_min", "i_min"))
    new_max = F.when(
        F.col("r_max") == F.col("b_max"), F.greatest("s_max", "i_max")
    ).otherwise(F.greatest("b_max", "i_max"))
    return merged.select(
        "event_type",
        n.cast("long").alias("n_users"),
        s.cast("double").alias("sum_value"),
        new_min.alias("min_value"),
        new_max.alias("max_value"),
    ).where(F.col("n_users") > 0)


@register(
    "agg_incremental_retract_minmax",
    oracle="""
    WITH latest AS (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM latest WHERE rn = 1
    GROUP BY event_type
    """,
)
def agg_incremental_retract_minmax(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """agg_incremental_retract extended with the scoped-rescan min/max --
    same cutoff split, same mutable keyed table, now maintaining ALL of
    count/sum/min/max under retraction. THE ORACLE IS THE FULL RECOMPUTE
    (latest row per user over base+delta, aggregated directly), so the
    driver hash proves the incremental refresh -- including which groups
    were rescanned vs combined -- equals recomputing from scratch."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    cutoff = F.lit("2024-01-28").cast("timestamp")
    return incremental_retract_minmax_merge(
        ev.where(ts < cutoff), ev.where(ts >= cutoff)
    )


_AGG_STATE_DEC = "decimal(28,6)"


def agg_state_merge(state: DataFrame | None, ev_delta: DataFrame) -> DataFrame:
    """CHAINABLE IVM refresh (r10, verdict #8): merge a STANDING per-key
    aggregate TABLE with one micro-batch of events. incremental_agg_merge
    recomputes the base side's partials from base EVENTS each call --
    right for a one-shot refresh, but a standing table maintained across
    micro-batches must merge from its own aggregates, never re-touching
    historical events. The sum is carried IN DECIMAL in the state schema
    (the double cast happens once, at read time), so an arbitrary chain
    of refreshes is exactly associative and equals the full recompute --
    which is what streaming_ivm_parity's driver hash proves batch by
    batch. min/max/last_ts combine with null-skipping least/greatest;
    insert-only by construction (the retraction siblings document and
    implement the subtractability boundary).

    Scale shape: the delta reduces map-side to one row per key before the
    merge join; the standing side is |keys| aggregate rows (persisted,
    bucketable by key so the refresh join co-locates); per batch the join
    carries |keys| + |batch keys| rows, never |events|."""
    ts = F.col("ts").cast("timestamp")
    keys = ["user_id", "event_type"]
    delta = ev_delta.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("d_n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast(_AGG_STATE_DEC)
        .alias("d_sum"),
        F.min("value").alias("d_min"),
        F.max("value").alias("d_max"),
        F.max(ts).alias("d_ts"),
    )
    if state is None:
        return delta.select(
            *keys,
            F.col("d_n").alias("n_events"),
            F.col("d_sum").alias("sum_dec"),
            F.col("d_min").alias("min_value"),
            F.col("d_max").alias("max_value"),
            F.col("d_ts").alias("last_ts"),
        )
    merged = state.join(delta, on=keys, how="full_outer")
    zero = F.lit(0).cast(_AGG_STATE_DEC)
    return merged.select(
        *keys,
        (F.coalesce("n_events", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
        .cast("long")
        .alias("n_events"),
        (F.coalesce("sum_dec", zero) + F.coalesce("d_sum", zero))
        .cast(_AGG_STATE_DEC)
        .alias("sum_dec"),
        F.least("min_value", "d_min").alias("min_value"),
        F.greatest("max_value", "d_max").alias("max_value"),
        F.greatest("last_ts", "d_ts").alias("last_ts"),
    )


def ivm_retract_refresh(
    users: DataFrame | None, aggs: DataFrame | None, ev_delta: DataFrame
):
    """CHAINABLE retraction-capable IVM refresh (r10): the streaming form
    of incremental_retract_merge. Standing state is TWO tables -- the
    per-user latest row (user_id, event_type, value, ts, event_id) and
    the per-group aggregate (event_type, n_users, sum_dec in DECIMAL) --
    and one micro-batch refreshes both: the batch's per-user winners
    RETRACT the standing rows of exactly the users they replace (a semi
    join against the batch's keys; the generic winner rule takes the
    newer of standing-vs-batch by (ts, event_id), so an out-of-order
    batch cannot regress a key), and the aggregates refresh as
    base - retract + insert in exact decimal. Returns the refreshed
    (users, aggs) pair; both are |keys|-bounded, never |events|.

    Hash-equality of the chained result with the full recompute
    (streaming_ivm_retract_parity's oracle) is the proof that per-batch
    retraction through the deployed delivery path composes exactly."""
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.desc(ts), F.desc("event_id"))
    cols = ["user_id", "event_type", "value", "ts", "event_id"]

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.select(*cols)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def grouped(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias(f"{tag}_n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast(_AGG_STATE_DEC)
            .alias(f"{tag}_sum"),
        )

    dl = latest(ev_delta)
    if users is None:
        first = grouped(dl, "i").select(
            "event_type",
            F.col("i_n").alias("n_users"),
            F.col("i_sum").alias("sum_dec"),
        )
        return dl, first
    keys = dl.select("user_id")
    touched_old = users.join(keys, "user_id", "semi")
    # generic winner: newer of (standing row, batch row) per touched user
    winners = latest(touched_old.unionByName(dl))
    retract = grouped(touched_old, "r")
    insert = grouped(winners, "i")
    zero = F.lit(0).cast(_AGG_STATE_DEC)
    merged = aggs.join(retract, "event_type", "full_outer").join(
        insert, "event_type", "full_outer"
    )
    new_aggs = merged.select(
        "event_type",
        (
            F.coalesce("n_users", F.lit(0))
            - F.coalesce("r_n", F.lit(0))
            + F.coalesce("i_n", F.lit(0))
        )
        .cast("long")
        .alias("n_users"),
        (
            F.coalesce("sum_dec", zero)
            - F.coalesce("r_sum", zero)
            + F.coalesce("i_sum", zero)
        )
        .cast(_AGG_STATE_DEC)
        .alias("sum_dec"),
    ).where(F.col("n_users") > 0)
    new_users = users.join(keys, "user_id", "anti").unionByName(winners)
    return new_users, new_aggs


_GDPR_ORACLE = """
    WITH forget AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ),
    o_purged AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM forget)
    ),
    o_retained AS (
        -- NOT EXISTS, not NOT IN: the Spark plan is an anti-join, which
        -- RETAINS rows whose FK is NULL; NOT IN would drop them via
        -- three-valued NULL comparison. Pin anti-join semantics on both
        -- sides so a nullable-FK fixture cannot split the engines.
        SELECT o_orderkey FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM forget f
                          WHERE f.c_custkey = o.o_custkey)
    ),
    l_retained AS (
        SELECT l_orderkey FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM o_purged p
                          WHERE p.o_orderkey = l.l_orderkey)
    ),
    c_stats AS (
        SELECT COUNT(*) FILTER (c_custkey % 97 = 0) AS purged,
               COUNT(*) FILTER (c_custkey % 97 <> 0) AS retained
        FROM customer
    ),
    o_stats AS (
        SELECT (SELECT COUNT(*) FROM o_purged) AS purged,
               (SELECT COUNT(*) FROM o_retained) AS retained
    ),
    l_stats AS (
        SELECT (SELECT COUNT(*) FROM lineitem)
               - (SELECT COUNT(*) FROM l_retained) AS purged,
               (SELECT COUNT(*) FROM l_retained) AS retained
    ),
    orphans AS (
        -- referential-integrity audit across the two INDEPENDENT retain
        -- paths: a retained lineitem whose parent is not in the retained
        -- order set is a cascade violation (0 when consistent)
        SELECT COUNT(*) AS n FROM l_retained l
        WHERE NOT EXISTS (SELECT 1 FROM o_retained o
                          WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT 'customer' AS table_name, CAST(purged AS BIGINT) AS purged_rows,
           CAST(retained AS BIGINT) AS retained_rows,
           CAST(0 AS BIGINT) AS orphans_after FROM c_stats
    UNION ALL
    SELECT 'orders', CAST(purged AS BIGINT), CAST(retained AS BIGINT),
           CAST(0 AS BIGINT) FROM o_stats
    UNION ALL
    SELECT 'lineitem', CAST(purged AS BIGINT), CAST(retained AS BIGINT),
           (SELECT CAST(n AS BIGINT) FROM orphans) FROM l_stats
"""


@register("gdpr_forget_propagation", oracle=_GDPR_ORACLE)
def gdpr_forget_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade: given a forget-list of customers
    (c_custkey % 97 = 0 -- a deterministic stand-in for the per-request
    key list), propagate the delete through the foreign-key chain
    customer -> orders -> lineitem and report, per table, purged vs
    retained row counts plus a referential-integrity audit: the retained
    lineitems are checked against the retained orders, two INDEPENDENTLY
    computed sets (orders retained via the forget anti-join, lineitems
    retained via the purged-order-key anti-join) -- any disagreement
    (NULL keys, dangling foreign keys, drifted cascade logic) surfaces as
    orphans_after > 0.

    Reference tie-in: the reference ships CDC deltas to an external
    consumer (SURVEY §2.A); a deletion cascade is the compliance-driven
    delta a deployment must compute and replay downstream. The
    purge/retain split is exactly the frame pair a writer would persist;
    returning the audit keeps it oracle-checkable.

    Scale shape: the forget list is a key-filtered slice of the customer
    dim -- broadcastable by size estimation, so the orders pass is one
    broadcast semi/anti join (no fact shuffle). The purged/retained ORDER
    KEY sets are fact-proportional and are NOT broadcast: the lineitem
    passes shuffle on l_orderkey (AQE picks the strategy), the same
    fact-to-fact discipline as the span-dedup family. Counts are exact
    BIGINTs; no float contract needed.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    forget = cust.where(F.col("c_custkey") % 97 == 0)
    o_purged = orders.join(
        forget, orders["o_custkey"] == forget["c_custkey"], "semi"
    ).select("o_orderkey")
    o_retained = orders.join(
        forget, orders["o_custkey"] == forget["c_custkey"], "anti"
    ).select("o_orderkey")
    l_purged = li.join(
        o_purged, li["l_orderkey"] == o_purged["o_orderkey"], "semi"
    )
    l_retained = li.join(
        o_purged, li["l_orderkey"] == o_purged["o_orderkey"], "anti"
    )
    orphans = l_retained.join(
        o_retained, l_retained["l_orderkey"] == o_retained["o_orderkey"], "anti"
    ).agg(F.count(F.lit(1)).alias("orph"))

    def counts(name: str, purged: DataFrame, retained: DataFrame,
               orph: DataFrame) -> DataFrame:
        return (
            purged.agg(F.count(F.lit(1)).alias("purged_rows"))
            .crossJoin(F.broadcast(
                retained.agg(F.count(F.lit(1)).alias("retained_rows"))
            ))
            .crossJoin(F.broadcast(orph))
            .select(
                F.lit(name).alias("table_name"),
                "purged_rows",
                "retained_rows",
                F.col("orph").cast("long").alias("orphans_after"),
            )
        )

    zero = spark.range(1).select(F.lit(0).alias("orph"))
    c_retained = cust.where(F.col("c_custkey") % 97 != 0)
    return (
        counts("customer", forget, c_retained, zero)
        .unionAll(counts("orders", o_purged, o_retained, zero))
        .unionAll(counts("lineitem", l_purged, l_retained, orphans))
    )
