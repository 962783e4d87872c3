"""Streaming analytics: watermarked event-time windows, session windows, and
streaming dedup -- the analytics upgrade over the reference's processing-time
loop, bounded by the same 7-day retention idea (CHANGE_RETENTION,
sql.txt:89 -> withWatermark('ts', '7 days')).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqldataintegrationfunctiontriggerapp_spark.plans._util import dsum

DEFAULT_RETENTION = "7 days"  # B12: CHANGE_RETENTION 7 days (sql.txt:89)


def _ltz(df: DataFrame, ts_col: str) -> DataFrame:
    """Event-time columns must be TIMESTAMP (with local tz): Spark rejects
    watermarks on TIMESTAMP_NTZ, and pyspark 4.1.2 reads the fixtures'
    parquet TIMESTAMP(NANOS) as NTZ natively (the legacy nanosAsLong conf no
    longer applies). The session timezone is pinned UTC, so the cast is
    value-preserving; applying it on batch frames too keeps the
    batch-vs-stream outputs of these helpers comparable tuple-for-tuple."""
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = DEFAULT_RETENTION,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling/sliding event-time aggregate with late-data bound. Works on
    both batch and streaming frames (watermark is a no-op in batch)."""
    events = _ltz(events, ts_col)
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        df.groupBy(win.alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), key_col, "n", "sum_value")
    )


def session_windows(
    events: DataFrame,
    gap: str = "1 hour",
    watermark: str = DEFAULT_RETENTION,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Native session_window aggregation (gap-close semantics)."""
    events = _ltz(events, ts_col)
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "session_value"))
        .select(key_col, F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events", "session_value")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    upper: str = "1 hour",
    watermark: str = DEFAULT_RETENTION,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: right events within
    (left_ts, left_ts + upper] of a left event with the same key -- the
    streaming form of the as-of/theta correlation the batch plans express
    (e.g. purchases joined to the views that preceded them). Both sides are
    watermarked, and the time-range predicate is what lets Spark bound the
    join state: each side's buffered rows are dropped once the other side's
    watermark passes their ts + upper. Works identically on batch frames
    (watermarks no-op). Caller pre-aliases ts columns distinctly.

    how='left_outer' emits unmatched left rows with a NULL right_ts; in
    streaming that emission happens only once the watermark proves no match
    can still arrive (left row older than watermark - upper), which is why
    the watermark is mandatory there -- batch emits them immediately."""
    left = _ltz(left, left_ts)
    right = _ltz(right, right_ts)
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    lk, rk = f"l_{key}", f"r_{key}"
    l = left.withColumnRenamed(key, lk)
    r = right.withColumnRenamed(key, rk)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how).select(
        F.col(lk).alias(key), left_ts, right_ts
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = DEFAULT_RETENTION,
) -> DataFrame:
    """Streaming exact dedup with bounded state: the A21 singleton-by-key /
    A22 suppress-repeats analog. State per key is dropped once the watermark
    passes -- the knob that keeps 100 TB/day streams from accumulating
    unbounded dedup state."""
    events = _ltz(events, ts_col)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
