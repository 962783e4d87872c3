"""Shared helpers for oracle-parity queries.

Summing doubles is order-dependent, and Spark and DuckDB do not traverse rows
in the same order, so a plain double SUM/AVG would drift in the last ulp and
fail the driver's value hash. The fix used throughout the registry:

1. compute the per-row expression in DOUBLE (IEEE ops are deterministic and
   identical in both engines),
2. cast the per-row value to DECIMAL(18,6) (half-up rounding in both engines,
   applied to the same binary double => identical),
3. SUM the decimals (exact, order-independent),
4. cast the aggregate back to DOUBLE (deterministic).

This costs one extra cast per row and keeps the aggregation entirely inside
whole-stage codegen; at 100 TB it changes nothing about the plan shape
(still a partial/final hash aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"

# Session-scoped shared-stage memo (used by plans/dedup.py for the minhash/
# ngram families and plans/similarity.py for the IVF index): expensive
# localCheckpointed builds computed once per (application, sf_dir, stage)
# and reused by every family member in the suite.
_STAGE_CACHE: dict[tuple[str, str, str], object] = {}

# Stage ledger (VERDICT r11 #1): access order, executor-storage attribution,
# and the set of stages touched since the last between-queries tick. Stage
# residency was measured bending sf10 results (dedup_embedding_cosine
# 162.2 s in-subset vs 96.1 s solo) and OOMing the 8 g 20M-vector ANN run;
# the ledger bounds resident checkpoint blocks under a configurable budget
# with LRU eviction at query boundaries (never mid-query: an in-use
# localCheckpoint is unrecomputable once its blocks drop).
_STAGE_SEQ = 0
_STAGE_META: dict[tuple[str, str, str], dict] = {}
_STAGE_ACTIVE: set[tuple[str, str, str]] = set()


class StagedDir(str):
    """A session_stage value that is a filesystem path owned by the stage:
    evicting it removes the directory (plus whatever atexit hook the
    builder registered for process-exit cleanup -- rmtree of a gone path is
    a no-op). Keeps staged directories bounded by LIVE memo entries, not by
    how many times a long-lived driver switched fixture dirs."""


# Spill-safe stage materialization (VERDICT r12 #1). Diagnosis from the 8 g
# sfb10 repro: the stage BUILD survives (the SQL columnar cache spills
# gracefully -- "Persisting block to disk instead"), and so does the first
# consumer; what OOMs is CONSUMING a disk-spilled localCheckpoint --
# MEMORY_AND_DISK(deserialized) blocks are Java-serialized on spill, and 32
# concurrent tasks each rehydrating a ~150 MB block through
# UnsafeRow.readExternal blow the heap (observed stack: JavaDeserialization
# Stream -> OutOfMemoryError at stage 67/68 of crossdoc_span_removal_auto).
# So stages whose MEASURED materialized size exceeds a heap-derived
# threshold are written to LOCAL PARQUET and read back instead: consumers
# stream-scan compressed columnar files with scan-buffer-bounded memory, no
# storage-pool interaction, honest file-size stats for free. Small stages
# keep the localCheckpoint fast path (zero plan change at sf <= 0.1).
_SPILL_ROOT: str | None = None


def _stage_spill_root() -> str:
    global _SPILL_ROOT
    if _SPILL_ROOT is None:
        import atexit
        import os
        import shutil
        import tempfile

        _SPILL_ROOT = tempfile.mkdtemp(
            prefix="spark_graft_stages_",
            dir=os.environ.get("SPARK_GRAFT_STAGE_SPILL_DIR"),
        )
        atexit.register(shutil.rmtree, _SPILL_ROOT, ignore_errors=True)
    return _SPILL_ROOT


def _spill_threshold_bytes(spark) -> float:
    """Cached-stage size above which truthful_ckpt lands on local parquet.

    SPARK_GRAFT_STAGE_MODE forces a branch (memory = always checkpoint,
    the pre-r13 behavior, kept for A/B ladders; disk = always parquet);
    SPARK_GRAFT_STAGE_SPILL_MB pins the threshold. Default: heap/32 with
    a 256 MB floor. The constant is calibrated by the sf10 minhash family
    at 8 g: a FAMILY holds 3-4 big stages at once (shingles, signatures,
    jacc0), the threshold compares COLUMNAR-CACHE bytes, and the
    checkpoint the memory branch builds is typically 2-4x larger -- at
    heap/8 every minhash stage individually stayed under the line, their
    AGGREGATE 3.4 GB of checkpoint residency starved execution memory,
    and run 4/4 of the 8 g ladder died with UNABLE_TO_ACQUIRE_MEMORY;
    heap/32 per stage bounds a 4-stage family near heap/8 of cache
    (~heap/3 checkpoint) if it all stayed resident, and in practice sends
    the big members to parquet. The floor keeps default-1g test/bench
    sessions (stage caches there are tens of MB) entirely on the fast
    path."""
    import os

    mode = os.environ.get("SPARK_GRAFT_STAGE_MODE", "auto")
    if mode == "memory":
        return float("inf")
    if mode == "disk":
        return -1.0
    if os.environ.get("SPARK_GRAFT_STAGE_SPILL_MB"):
        return int(os.environ["SPARK_GRAFT_STAGE_SPILL_MB"]) * 1024.0 * 1024.0
    try:
        heap = int(
            spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
        )
    except Exception:
        heap = 1 << 30
    return max(256.0 * 1024 * 1024, heap / 32.0)


def _family_admission_bytes(spark) -> float:
    """FAMILY-aggregate admission bound (VERDICT r13 #4): the per-stage
    heap/32 constant is calibrated to 3-4-stage families -- a 6-stage
    family each individually under the line would re-create the aggregate
    starvation the r12 minhash trio hit at heap/8. This makes the bound
    structural instead of calibrated: before choosing the memory branch,
    truthful_ckpt checks CURRENT resident stage storage (checkpoint
    blocks, measured via getRDDStorageInfo) and spills when
    resident + new_cache_bytes would exceed max(heap/8, 512 MB). The
    512 MB floor keeps default-1g test/bench sessions untouched (the full
    sf0.1 sweep's largest per-query resident peak is 151 MB --
    BENCH_FULL r13), so the sf0.1 plans and bench are unchanged; at 8 g
    the bound is 1 GB of aggregate residency, the level the r13
    calibration targeted for a 4-stage family, now enforced for ANY
    family size. SPARK_GRAFT_STAGE_FAMILY_MB pins it for tests/ladders;
    STAGE_MODE=memory/disk still forces the branch outright."""
    import os

    if os.environ.get("SPARK_GRAFT_STAGE_FAMILY_MB"):
        return int(os.environ["SPARK_GRAFT_STAGE_FAMILY_MB"]) * 1024.0 * 1024.0
    try:
        heap = int(
            spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
        )
    except Exception:
        heap = 1 << 30
    return max(512.0 * 1024 * 1024, heap / 8.0)


def truthful_ckpt(df):
    """Materialize a stage so that (a) its size statistics are honest,
    (b) the materialization survives ``spark.catalog.clearCache()``, and
    (c) a stage bigger than the heap degrades to disk instead of dying:

    1. persist + count -- the InMemoryRelation accumulates REAL bytes (a
       checkpoint of a raw explode inherits the pre-explode estimate:
       measured 25.1 MiB reported for 3.5 GiB), and the SQL cache build
       spills under pressure instead of failing;
    2. read the measured size off the materialized cache;
    3. SMALL stage: localCheckpoint of the cache (LogicalRDD snapshots the
       honest sizeInBytes; RDD-level blocks survive clearCache -- verified
       4,468,320 bytes reported before and after unpersist+clearCache);
       BIG stage: write local parquet from the cache and read it back
       (consumers stream compressed columnar files; no Java-deser
       rehydration of spilled blocks -- the 8 g OOM class retired);
    4. release the now-redundant SQL-cache copy.

    The parquet branch tags the returned frame with a ``StagedDir`` via
    ``_staged_dir`` so ledger eviction / sf_dir switch / drop_stage remove
    the directory with the memo entry.

    Admission is per-stage AND per-family: a stage spills when its own
    measured cache bytes exceed the heap/32 threshold, OR when adding it
    to the CURRENTLY RESIDENT stage storage would cross the family bound
    (see _family_admission_bytes) -- so a 6-stage family of individually
    small stages degrades to disk exactly like one big stage would."""
    spark = df.sparkSession
    resident_before = storage_bytes(spark)
    cached = df.persist()
    cached.count()
    try:
        size = int(
            cached._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        size = 0
    over_family = (
        resident_before + size > _family_admission_bytes(spark)
        and _spill_threshold_bytes(spark) != float("inf")  # MODE=memory wins
    )
    if size > _spill_threshold_bytes(spark) or over_family:
        import tempfile

        path = tempfile.mkdtemp(prefix="stage_", dir=_stage_spill_root())
        cached.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        out._staged_dir = StagedDir(path)
    else:
        out = cached.localCheckpoint()
    cached.unpersist()
    return out


def _release_stage(value, blocking: bool = False) -> None:
    """Best-effort release of an evicted stage's executor storage.

    The cached stage values are localCheckpointed DataFrames, and
    ``DataFrame.unpersist()`` does NOT free checkpoint blocks (it only
    uncaches CacheManager entries -- verified empirically: RDD storage info
    is unchanged after ``unpersist(blocking=True)``). A checkpointed
    DataFrame's analyzed plan is a ``LogicalRDD`` wrapping the persisted
    RDD, so unpersisting THAT rdd is what actually drops the blocks
    (verified: storage-info count goes to 0). Plain ``unpersist()`` runs
    too, covering any persist()-cached value; never-persisted plans and
    stopped sessions make both calls harmless no-ops / ignored failures."""
    items = value if isinstance(value, (tuple, list)) else (value,)
    for item in items:
        if isinstance(item, StagedDir):
            import shutil

            shutil.rmtree(item, ignore_errors=True)
            continue
        sd = getattr(item, "_staged_dir", None)
        if sd is not None:
            # parquet-backed truthful_ckpt stage: evicting it removes the
            # spill directory (the frame holds no executor storage)
            import shutil

            shutil.rmtree(sd, ignore_errors=True)
            continue
        try:
            plan = item._jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() == "LogicalRDD":
                # blocking=True inside the ledger's eviction loop (ADVICE
                # r12): the tick re-samples residency after each victim, and
                # a non-blocking release would overstate post-eviction bytes
                plan.rdd().unpersist(blocking)
        except Exception:
            pass
        try:
            item.unpersist(blocking)
        except Exception:
            pass


def session_stage(spark, sf_dir: str, name: str, build):
    """Memoize `build()` per (applicationId, sf_dir, name).

    Two evictions keep the cache bounded (ADVICE r04 #1):
    - entries from other (stopped) applications: their DataFrames pin py4j
      references to defunct JVMs and can never be served again;
    - entries from the LIVE application but a different sf_dir: a long-lived
      driver sweeping several fixture dirs would otherwise pin every dir's
      localCheckpointed stages on the executors forever. Suites run one
      sf_dir at a time, so cross-dir thrash is not a real access pattern.
    """
    global _STAGE_SEQ
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, name)
    if key not in _STAGE_CACHE:
        for old in [k for k in _STAGE_CACHE if k[0] != app or k[1] != sf_dir]:
            if old[0] == app:
                _release_stage(_STAGE_CACHE[old])
            del _STAGE_CACHE[old]
            _STAGE_META.pop(old, None)
            _STAGE_ACTIVE.discard(old)
        _STAGE_CACHE[key] = build()
        _STAGE_META[key] = {"rdd_ids": _stage_rdd_ids(_STAGE_CACHE[key])}
    _STAGE_SEQ += 1
    _STAGE_META.setdefault(key, {"rdd_ids": []})["seq"] = _STAGE_SEQ
    _STAGE_ACTIVE.add(key)
    return _STAGE_CACHE[key]


def _stage_rdd_ids(value) -> list[int]:
    """RDD ids backing a stage value's localCheckpoint blocks (empty for
    scalars / StagedDir / never-checkpointed frames) -- lets the ledger
    attribute executor storage per stage from getRDDStorageInfo."""
    ids: list[int] = []
    items = value if isinstance(value, (tuple, list)) else (value,)
    for item in items:
        if isinstance(item, StagedDir):
            continue
        try:
            plan = item._jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() == "LogicalRDD":
                ids.append(plan.rdd().id())
        except Exception:
            pass
    return ids


def storage_bytes(spark) -> int:
    """Total resident RDD storage (memory + disk) in this application --
    the quantity the stage ledger bounds and the bench harness samples
    for its per-query peak column."""
    total = 0
    try:
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
            total += int(info.memSize()) + int(info.diskSize())
    except Exception:
        pass
    return total


def _stage_resident_bytes(spark) -> dict[tuple[str, str, str], int]:
    """Per-stage resident bytes, from the ledger's RDD-id attribution."""
    by_id: dict[int, int] = {}
    try:
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
            by_id[int(info.id())] = int(info.memSize()) + int(info.diskSize())
    except Exception:
        return {}
    return {
        key: sum(by_id.get(rid, 0) for rid in meta.get("rdd_ids", []))
        for key, meta in _STAGE_META.items()
    }


def _stage_disk_bytes() -> int:
    """Bytes held by parquet-backed (spill-branch) stages -- visibility
    only: they use local disk, not executor storage, so the memory budget
    does not govern them; sf_dir switch / drop_stage / process exit are
    what bound their lifetime."""
    import os

    total = 0
    for value in _STAGE_CACHE.values():
        items = value if isinstance(value, (tuple, list)) else (value,)
        for item in items:
            p = (
                item if isinstance(item, StagedDir)
                else getattr(item, "_staged_dir", None)
            )
            if not p:
                continue
            try:
                for root, _dirs, files in os.walk(p):
                    for f in files:
                        try:
                            total += os.path.getsize(os.path.join(root, f))
                        except OSError:
                            pass
            except OSError:
                pass
    return total


def stage_ledger_tick(spark, budget_bytes: int | None = None) -> dict:
    """Between-queries ledger maintenance: evict least-recently-used stages
    while tracked stage storage exceeds the budget, then reset the
    active-set protection window.

    Call ONLY at query boundaries (bench.py / verify_oracle.py do): stages
    touched since the previous tick are protected, because evicting a
    localCheckpoint a running query still references fails that query
    (lineage is truncated -- the blocks are the data). Eviction deletes the
    memo entry too, so the next consumer transparently rebuilds.

    Budget: ``budget_bytes`` arg, else $SPARK_GRAFT_STAGE_BUDGET_MB
    (default 2048). Returns {"stage_bytes", "global_bytes", "evicted"}.
    """
    import os

    if budget_bytes is None:
        budget_bytes = (
            int(os.environ.get("SPARK_GRAFT_STAGE_BUDGET_MB", "2048"))
            * 1024 * 1024
        )
    evicted: list[str] = []
    sizes = _stage_resident_bytes(spark)
    while True:
        total = sum(sizes.values())
        if total <= budget_bytes:
            break
        # LRU among evictable entries that actually hold resident bytes
        # (evicting a 0-byte entry frees nothing and forces a rebuild)
        candidates = [
            k for k in _STAGE_CACHE
            if k not in _STAGE_ACTIVE and sizes.get(k, 0) > 0
        ]
        if not candidates:
            break
        victim = min(candidates, key=lambda k: _STAGE_META[k].get("seq", 0))
        _release_stage(_STAGE_CACHE[victim], blocking=True)
        del _STAGE_CACHE[victim]
        _STAGE_META.pop(victim, None)
        evicted.append(victim[2])
        sizes = _stage_resident_bytes(spark)
    _STAGE_ACTIVE.clear()
    return {
        "stage_bytes": sum(sizes.values()),
        "global_bytes": storage_bytes(spark),
        "disk_bytes": _stage_disk_bytes(),
        "evicted": evicted,
    }


def drop_stage(spark, sf_dir: str, name: str) -> None:
    """Explicitly release one memoized stage (blocks + memo entry) -- for
    builders that materialize a frame to answer a one-off question (e.g.
    the span route's df table on corpora where the route then decides the
    frame is never needed again). No-op if absent; the next
    session_stage call transparently rebuilds."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _STAGE_CACHE:
        _release_stage(_STAGE_CACHE.pop(key))
        _STAGE_META.pop(key, None)
        _STAGE_ACTIVE.discard(key)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double expression, as double."""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-decimal average returned as double (decimal sum / count)."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# sum(l_extendedprice * (1 - l_discount)) -- the TPC-H revenue expression.
# (Built lazily: pyspark Columns cannot be constructed before a session exists.)
def revenue_expr() -> Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


SQL_REVENUE_EXPR = "l_extendedprice * (1 - l_discount)"


def revenue_col(alias: str = "revenue") -> Column:
    return dsum(revenue_expr(), alias)


def sql_revenue(alias: str = "revenue") -> str:
    return sql_dsum(SQL_REVENUE_EXPR, alias)
