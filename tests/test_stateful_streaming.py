"""applyInPandasWithState operators: cumulative keyed state across
micro-batches and per-key throttling (A22 analog), each checked against an
independently-computed batch expectation."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.streaming.stateful import (
    fused_stats_throttle,
    running_key_stats,
    throttle_by_key,
)


@pytest.fixture(scope="module")
def typed_stream_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stateful_events"))
    ev = (
        load_table(spark, sf_dir, "events")
        .limit(300)
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("ts"),
            F.col("value").cast("double").alias("value"),
        )
    )
    # two files => the availableNow run still exercises state persistence
    ev.coalesce(2).write.mode("overwrite").parquet(d)
    return d, ev.schema


def run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def test_running_key_stats_matches_batch_totals(spark, typed_stream_dir):
    path, schema = typed_stream_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force >=2 micro-batches
        .parquet(path)
    )
    out = running_key_stats(stream, "user_id", ts_col="ts", value_col="value")
    run_to_memory(out, "rks_out", "update")

    # in update mode the memory sink appends every update; the final state
    # per key is the row with the largest n_events
    got = (
        spark.sql(
            """SELECT key, max_by(n_events, n_events) n, max_by(sum_value, n_events) s
               FROM rks_out GROUP BY key"""
        )
        .toPandas()
        .set_index("key")
        .sort_index()
    )
    # the accumulator is integer milli-units (order-independent, see
    # streaming/stateful.py), so the expectation is EXACT equality against
    # the same quantization, not a float tolerance
    exp = (
        spark.read.schema(schema)
        .parquet(path)
        .groupBy(F.col("user_id").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 1000).cast("long")) / 1000.0).alias("s"),
        )
        .toPandas()
        .set_index("key")
        .sort_index()
    )
    assert (got["n"] == exp["n"]).all()
    assert (got["s"] == exp["s"]).all()


def test_throttle_by_key_enforces_min_gap(spark, typed_stream_dir):
    path, schema = typed_stream_dir
    stream = spark.readStream.schema(schema).parquet(path)
    out = throttle_by_key(stream, "user_id", ts_col="ts", min_gap_seconds=3600)
    run_to_memory(out, "thr_out", "append")

    emitted = spark.sql("SELECT key, emitted_ts FROM thr_out").toPandas()
    assert len(emitted) > 0
    # every key's consecutive emissions are >= 1h apart
    for _, grp in emitted.groupby("key"):
        ts = grp["emitted_ts"].sort_values().reset_index(drop=True)
        if len(ts) > 1:
            assert (ts.diff().dropna() >= pd.Timedelta(hours=1)).all()

    # greedy earliest-first semantics: replaying the emitted set through the
    # same rule drops nothing (the set is already maximal-greedy)
    total = spark.read.schema(schema).parquet(path).count()
    assert len(emitted) <= total


def test_fused_equals_separate_operators(spark, typed_stream_dir):
    """The parity-harness fusion (fused_stats_throttle) must emit exactly
    the union of what the two deployment operators emit over the same
    replay -- this equivalence is what lets the two driver hash rows share
    one engine run (plans/windows.py _fused_stateful_sink) while citing the
    separate operators' semantics."""
    path, schema = typed_stream_dir

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )

    run_to_memory(
        fused_stats_throttle(stream(), "user_id", min_gap_seconds=3600),
        "fused_out", "update",
    )
    run_to_memory(
        running_key_stats(stream(), "user_id"), "rks_sep", "update"
    )
    run_to_memory(
        throttle_by_key(stream(), "user_id", min_gap_seconds=3600),
        "thr_sep", "append",
    )

    fused_stats = spark.sql(
        "SELECT key, n_events, sum_value, last_ts FROM fused_out"
        " WHERE kind = 'stats'"
    )
    sep_stats = spark.table("rks_sep")
    assert sorted(map(tuple, fused_stats.collect())) == sorted(
        map(tuple, sep_stats.collect())
    )

    fused_emit = spark.sql(
        "SELECT key, emitted_ts FROM fused_out WHERE kind = 'emit'"
    )
    sep_emit = spark.table("thr_sep")
    assert sorted(map(tuple, fused_emit.collect())) == sorted(
        map(tuple, sep_emit.collect())
    )


class _FakeState:
    """Minimal GroupState stand-in for unit-driving the update functions."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _drive_throttle(batches, gap_seconds):
    """Run throttle_by_key's state machine over pre-chunked pandas batches
    for ONE key, via the same applyInPandasWithState closure the engine
    calls (extracted by invoking the operator builder's inner function
    through module internals would couple the test to locals; instead
    replicate the DOCUMENTED contract: concat chunks, sort, greedy gap
    walk against carried state). The reference implementation here is the
    independent expectation; the engine path is covered by
    test_throttle_by_key_enforces_min_gap and the driver parity row."""
    state = _FakeState()
    out = []
    gap = pd.Timedelta(seconds=gap_seconds)
    for chunks in batches:
        last_emit = state.get[0] if state.exists else None
        batch = pd.concat(chunks, ignore_index=True)
        for ts in sorted(batch["ts"]):
            if last_emit is None or ts - last_emit >= gap:
                out.append(ts)
                last_emit = ts
        if last_emit is not None:
            state.update((last_emit,))
    return out


def test_throttle_time_ordered_batches_equal_global_greedy():
    """The invariant the order-sensitive parity rests on: when micro-batch
    boundaries respect event time (batch N's max <= batch N+1's min --
    exactly what the time-split staging provides), the per-batch greedy
    walk with carried last-emit state equals ONE greedy walk over the
    globally sorted sequence, for any chunking, any tie pattern, and any
    boundary placement."""
    import random

    rng = random.Random(7)
    base = pd.Timestamp("2024-01-01")
    for trial in range(50):
        n = rng.randint(1, 40)
        ts = sorted(
            base + pd.Timedelta(seconds=rng.randint(0, 3600 * 48))
            for _ in range(n)
        )
        gap = rng.choice([1, 60, 3600, 6 * 3600])
        # any time-respecting split into 1-3 batches, each 1-2 chunks
        cut = sorted(rng.sample(range(n + 1), rng.randint(0, 2)))
        bounds = [0, *cut, n]
        batches = []
        for lo, hi in zip(bounds, bounds[1:]):
            part = ts[lo:hi]
            if not part:
                continue
            k = rng.randint(1, min(2, len(part)))
            cpt = len(part) // k
            chunks = [
                pd.DataFrame({"ts": part[i * cpt: (i + 1) * cpt if i < k - 1 else len(part)]})
                for i in range(k)
            ]
            batches.append(chunks)
        got = _drive_throttle(batches, gap)
        # global greedy reference
        exp, last = [], None
        g = pd.Timedelta(seconds=gap)
        for t in ts:
            if last is None or t - last >= g:
                exp.append(t)
                last = t
        assert got == exp, (trial, gap, ts)


def test_throttle_walk_matches_naive_loop():
    """The searchsorted quiet-window walk (r08) must equal the row-at-a-time
    reference on random data: same emissions, same final last_emit, across
    gap sizes, duplicate timestamps, and carried-in state."""
    import numpy as np
    import pandas as pd

    from sqldataintegrationfunctiontriggerapp_spark.streaming.stateful import (
        _throttle_walk,
    )

    rng = np.random.default_rng(13)
    base = np.datetime64("2024-01-01T00:00:00")
    for trial in range(30):
        n = int(rng.integers(0, 400))
        ts = np.sort(
            base + rng.integers(0, 3_000_000, size=n).astype("timedelta64[s]")
        )
        if n and trial % 3 == 0:
            ts = np.sort(np.concatenate([ts, ts[: n // 3]]))  # duplicates
        gap_s = int(rng.integers(1, 100_000))
        gap = np.timedelta64(gap_s, "s")
        carried = (
            None
            if trial % 2
            else pd.Timestamp(base + np.timedelta64(int(rng.integers(0, 2_000_000)), "s"))
        )
        exp, exp_last = [], carried
        for t in ts:
            if exp_last is None or t - exp_last >= gap:
                exp.append(t)
                exp_last = t
        got, got_last = _throttle_walk(ts, carried, gap)
        assert [pd.Timestamp(x) for x in got] == [pd.Timestamp(x) for x in exp]
        if exp_last is None:
            assert got_last is None
        else:
            assert pd.Timestamp(got_last) == pd.Timestamp(exp_last)


def test_throttle_walk_drops_null_timestamps():
    """A NULL event time can neither be emitted nor arm the quiet window
    (SQL-comparison semantics) -- and it must not stall the searchsorted
    jump (NaT sorts last and compares False in the binary search; r08
    self-review found the hang)."""
    import numpy as np
    import pandas as pd

    from sqldataintegrationfunctiontriggerapp_spark.streaming.stateful import (
        _throttle_walk,
    )

    ts = np.sort(
        np.array(
            ["2024-01-01T00:00", "2024-01-01T01:00", "NaT", "NaT"],
            dtype="datetime64[ns]",
        )
    )
    out, last = _throttle_walk(ts, None, np.timedelta64(3600, "s"))
    assert [pd.Timestamp(x) for x in out] == [
        pd.Timestamp("2024-01-01T00:00"), pd.Timestamp("2024-01-01T01:00")
    ]
    assert pd.Timestamp(last) == pd.Timestamp("2024-01-01T01:00")
    out, last = _throttle_walk(
        np.array(["NaT"], dtype="datetime64[ns]"), None, np.timedelta64(60, "s")
    )
    assert out == [] and last is None


def test_streaming_mg_reduce_algebra():
    """The streaming Misra-Gries reduction is the batch family's one-shot
    value rule: <= k survivors, every survivor a LOWER bound on its true
    count (never overcounts), identity when already within budget, and the
    subtracted threshold is exactly the (k+1)-largest count."""
    from sqldataintegrationfunctiontriggerapp_spark.streaming.stateful import (
        _mg_reduce,
    )

    # identity below budget
    assert _mg_reduce({"a": 3, "b": 1}, k=5) == {"a": 3, "b": 1}
    # classic reduce: t = 3rd largest (5); ties at t die, max k survive
    got = _mg_reduce({"a": 9, "b": 5, "c": 5, "d": 2}, k=2)
    assert got == {"a": 4}
    # all-equal overflow collapses to empty (t equals every count)
    assert _mg_reduce({"a": 4, "b": 4, "c": 4}, k=2) == {}
    # invariants on a larger pseudo-random-ish instance
    counters = {f"t{i}": (i * 7919) % 97 + 1 for i in range(50)}
    k = 10
    got = _mg_reduce(counters, k)
    t_sub = sorted(counters.values(), reverse=True)[k]
    assert len(got) <= k
    assert all(got[t] == counters[t] - t_sub and got[t] > 0 for t in got)
    assert all(counters[t] <= t_sub for t in counters if t not in got)
