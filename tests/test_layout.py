"""zorder_layout: the bit-interleave rule, pruning soundness, and the
layout comparison itself (plans/layout.py)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.plans.layout import (
    z_interleave_col,
    z_interleave_sql,
    zorder_layout,
)


def _z_ref(x: int, y: int, nbits: int = 8) -> int:
    z = 0
    for i in range(nbits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=20, deadline=None)
def test_duckdb_interleave_matches_python_reference(pairs):
    con = duckdb.connect()
    expr = z_interleave_sql("x", "y")
    vals = ", ".join(f"({x}, {y})" for x, y in pairs)
    got = con.sql(
        f"SELECT {expr} AS z FROM (VALUES {vals}) AS t(x, y)"
    ).fetchall()
    assert [r[0] for r in got] == [_z_ref(x, y) for x, y in pairs]


def test_spark_interleave_matches_python_reference(spark):
    pairs = [(0, 0), (255, 255), (255, 0), (0, 255), (1, 2), (170, 85),
             (200, 13), (7, 249)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = df.select(z_interleave_col(F.col("x"), F.col("y")).alias("z"))
    assert [r.z for r in got.orderBy("x", "y").collect()] == [
        z for _, _, z in sorted((x, y, _z_ref(x, y)) for x, y in pairs)
    ]
    # z-order curve property: interleaving is a bijection on the 16-bit grid
    assert _z_ref(255, 255) == 65535 and _z_ref(0, 0) == 0


@pytest.fixture(scope="module")
def layout_rows(spark, sf_dir):
    return zorder_layout(spark, sf_dir).collect()


def test_layout_conserves_rows_and_bounds(spark, sf_dir, layout_rows):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    by_layout = {}
    for r in layout_rows:
        by_layout.setdefault(r.layout, []).append(r)
    assert set(by_layout) == {"zorder", "linear"}
    for layout, rows in by_layout.items():
        assert sum(r.n_rows for r in rows) == n, layout
        assert all(0 <= r.bucket <= 255 for r in rows), layout
        assert all(r.min_day <= r.max_day and r.min_part <= r.max_part
                   for r in rows), layout


def test_prunable_buckets_really_contain_no_box_rows(spark, sf_dir,
                                                     layout_rows):
    """Soundness of the skip decision: re-derive the box from the global
    bounds and check every PRUNABLE bucket's envelope truly misses it --
    a false skip would silently drop query results at 100 TB."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
        .cast("long").alias("day"),
        F.col("l_partkey").alias("part"),
    )
    b = li.agg(F.min("day"), F.max("day"), F.min("part"), F.max("part"))
    day_lo, day_hi, p_lo, p_hi = b.collect()[0]
    box_d = (day_lo + (day_hi - day_lo) // 2,
             day_lo + ((day_hi - day_lo) * 3) // 4)
    box_p = (p_lo, p_lo + (p_hi - p_lo) // 16)
    for r in layout_rows:
        misses = (r.max_day < box_d[0] or r.min_day > box_d[1]
                  or r.max_part < box_p[0] or r.min_part > box_p[1])
        assert r.prunable == misses, r


def test_zorder_skips_at_least_as_much_as_linear(layout_rows):
    """The point of the operator: for a box narrow in the NON-sort
    dimension, the z-order layout must let the box query skip at least as
    many rows as the date-sorted layout (strictly more on the fixtures)."""
    skipped = {"zorder": 0, "linear": 0}
    for r in layout_rows:
        if r.prunable:
            skipped[r.layout] += r.n_rows
    assert skipped["zorder"] >= skipped["linear"], skipped


def test_compaction_apply_pruning_envelope_survives_rewrite(spark):
    # sf0.01, not the sf0.001 test default: the tiny fixture packs into a
    # single bin per event_type, which leaves nothing to prune
    sf_dir = "/root/testdata/sf0.01"
    """A day-range query against the COMPACTED layout, routed through the
    plan's (day_from, day_to) envelope, must (a) carry a non-empty
    partition filter on bin in the physical plan and (b) return exactly
    the rows a full-scan day filter returns -- the end-to-end claim that
    compaction preserved time-range prunability."""
    from sqldataintegrationfunctiontriggerapp_spark.plans.layout import (
        _compaction_dirs,
    )

    _small, compacted = _compaction_dirs(spark, sf_dir)
    cdf = spark.read.parquet(str(compacted))
    day = F.floor(
        F.col("ts").cast("timestamp").cast("double") / 86400
    ).cast("long")
    # pick a mid-corpus 3-day window from the data itself
    lo_hi = cdf.select(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    ).collect()[0]
    lo = lo_hi["lo"] + (lo_hi["hi"] - lo_hi["lo"]) // 2
    hi = lo + 2
    # metadata pass: bins whose planned envelope overlaps the window
    envelopes = (
        cdf.withColumn("d", day)
        .groupBy("event_type", "bin")
        .agg(F.min("d").alias("day_from"), F.max("d").alias("day_to"))
        .where((F.col("day_from") <= hi) & (F.col("day_to") >= lo))
        .select("bin")
        .distinct()
        .collect()
    )
    bins = sorted(r["bin"] for r in envelopes)
    assert bins and len(bins) < cdf.select("bin").distinct().count(), (
        "the 3-day window must prune at least one bin for this test to "
        "witness pruning"
    )
    pruned = cdf.where(F.col("bin").isin(bins)).where(day.between(lo, hi))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert scan_lines and all(
        "PartitionFilters: []" not in ln for ln in scan_lines
    ), f"bin filter did not reach the scan:\n{plan}"
    full = cdf.where(day.between(lo, hi))
    assert pruned.count() == full.count() > 0


# --- atomic layout swap (sinks/table_sink.publish_layout, r13) ------------


def _mk_layout(tmp_path, name: str, files: dict[str, str]) -> str:
    d = tmp_path / name
    d.mkdir()
    for fn, content in files.items():
        (d / fn).write_text(content)
    return str(d)


def test_publish_layout_swap_and_gc(tmp_path):
    from sqldataintegrationfunctiontriggerapp_spark.sinks.table_sink import (
        publish_layout,
        table_current,
    )

    root = str(tmp_path / "tbl")
    v1 = publish_layout(root, _mk_layout(tmp_path, "s1", {"a": "1"}))
    assert table_current(root) == v1
    # keep=1: publishing v2 GCs v1
    v2 = publish_layout(root, _mk_layout(tmp_path, "s2", {"a": "2"}))
    assert table_current(root) == v2
    import os

    assert not os.path.exists(v1)
    # keep=2 retains the superseded layout for audits
    v3 = publish_layout(root, _mk_layout(tmp_path, "s3", {"a": "3"}), keep=2)
    assert table_current(root) == v3 and os.path.exists(v2)
    # failed validation: table untouched, staging intact
    staging = _mk_layout(tmp_path, "s4", {"a": "bad"})
    with pytest.raises(ValueError):
        publish_layout(root, staging, validate=lambda p: (_ for _ in ()).throw(
            ValueError("checksum drift")
        ))
    assert table_current(root) == v3 and os.path.exists(staging)


def test_publish_layout_crash_between_every_step(tmp_path):
    """Kill the protocol at every step boundary: readers must see a
    complete layout (old before the pointer swap, new after), and a
    retried job must converge with orphans garbage-collected."""
    import os

    from sqldataintegrationfunctiontriggerapp_spark.sinks.table_sink import (
        publish_layout,
        table_current,
    )

    class Crash(RuntimeError):
        pass

    for crash_at in ("validated", "renamed", "published", "gc"):
        root = str(tmp_path / f"tbl_{crash_at}")
        old = publish_layout(root, _mk_layout(tmp_path, f"o_{crash_at}", {"a": "old"}))

        def fault(step, crash_at=crash_at):
            if step == crash_at:
                raise Crash(step)

        staging = _mk_layout(tmp_path, f"n_{crash_at}", {"a": "new"})
        with pytest.raises(Crash):
            publish_layout(root, staging, _fault=fault)
        cur = table_current(root)
        content = (
            open(os.path.join(cur, "a")).read()
        )
        if crash_at in ("validated", "renamed"):
            # crash before the commit point: readers still on the old
            # layout, and it is fully intact
            assert cur == old and content == "old"
        else:
            # crash after the commit point: the new layout is live/intact
            assert content == "new"
        # a retried job converges regardless of where the crash hit
        retry = _mk_layout(tmp_path, f"r_{crash_at}", {"a": "retry"})
        final = publish_layout(root, retry)
        assert table_current(root) == final
        assert open(os.path.join(final, "a")).read() == "retry"
        # GC after the successful retry: only the live version remains
        vdirs = [d for d in os.listdir(root) if d.startswith("v")]
        assert vdirs == [os.path.basename(final)]


def test_publish_layout_orphans_never_count_toward_keep(tmp_path):
    """ADVICE r13 regression: a crash between rename and pointer swap
    leaves an orphan ABOVE the committed head. With keep=2, the next
    successful publish must retain the genuinely COMMITTED previous
    layout and delete the never-published orphan -- not the reverse."""
    import os

    from sqldataintegrationfunctiontriggerapp_spark.sinks.table_sink import (
        publish_layout,
        table_current,
    )

    class Crash(RuntimeError):
        pass

    root = str(tmp_path / "tbl")
    committed = publish_layout(root, _mk_layout(tmp_path, "s1", {"a": "good"}))
    # crash after rename, before pointer swap: orphan v2 above committed v1
    def fault(step):
        if step == "renamed":
            raise Crash(step)

    with pytest.raises(Crash):
        publish_layout(root, _mk_layout(tmp_path, "s2", {"a": "orphan"}),
                       _fault=fault)
    assert table_current(root) == committed
    assert os.path.exists(os.path.join(root, "v2"))  # the orphan
    # next publish with keep=2: v3 live, v1 (committed) retained for
    # audits, v2 (orphan) deleted
    v3 = publish_layout(root, _mk_layout(tmp_path, "s3", {"a": "new"}),
                        keep=2)
    assert table_current(root) == v3
    assert os.path.exists(committed), "committed previous layout was GC'd"
    assert open(os.path.join(committed, "a")).read() == "good"
    assert not os.path.exists(os.path.join(root, "v2")), "orphan retained"


def test_publish_layout_concurrent_reader_race(tmp_path):
    """VERDICT r13 #7: a reader thread resolving `table_current` and
    reading the layout in a tight loop across 20 publishes must never
    observe a missing directory, a missing file, or torn content -- the
    os.replace pointer commit plus keep=2 retention is the guarantee."""
    import os
    import threading

    from sqldataintegrationfunctiontriggerapp_spark.sinks.table_sink import (
        publish_layout,
        table_current,
    )

    root = str(tmp_path / "tbl")
    publish_layout(root, _mk_layout(tmp_path, "seed", {"a": "p0"}))

    stop = threading.Event()
    failures: list[str] = []
    reads = [0]

    def reader():
        while not stop.is_set():
            try:
                cur = table_current(root)
                content = open(os.path.join(cur, "a")).read()
                if not (content.startswith("p")
                        and content[1:].isdigit()):
                    failures.append(f"torn content {content!r}")
                reads[0] += 1
            except Exception as e:  # missing dir/file = a failed read
                failures.append(f"{type(e).__name__}: {e}")

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        for i in range(1, 21):
            publish_layout(
                root, _mk_layout(tmp_path, f"s{i}", {"a": f"p{i}"}), keep=2
            )
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not failures, failures[:5]
    assert reads[0] > 100  # the loop actually raced the swaps


def test_compaction_fixture_reads_through_swapped_pointer(spark, sf_dir):
    """The registered audit's `compacted` dir IS the pointer-resolved live
    layout of the versioned table root, and the pre-compaction layout is
    retained (keep=2) for the files_before audit."""
    import os

    from sqldataintegrationfunctiontriggerapp_spark.plans.layout import (
        _compaction_dirs,
    )
    from sqldataintegrationfunctiontriggerapp_spark.sinks.table_sink import (
        table_current,
    )

    small, compacted = _compaction_dirs(spark, sf_dir)
    root = os.path.dirname(str(compacted))
    assert table_current(root) == str(compacted)
    assert os.path.basename(str(compacted)) == "v2"
    assert os.path.basename(str(small)) == "v1" and os.path.exists(small)
