"""Stage-ledger behavior (VERDICT r11 #1): shared-stage checkpoint
residency is bounded by LRU eviction at query boundaries, evicted stages
transparently rebuild, and the active-set window protects stages touched
since the last tick (a mid-query eviction would kill the consumer --
localCheckpoint blocks ARE the data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.plans import _util as U
from sqldataintegrationfunctiontriggerapp_spark.plans.dedup import _truthful_ckpt


def _mk_stage(spark, name: str, builds: dict):
    def build():
        builds[name] = builds.get(name, 0) + 1
        # ~64k rows of longs: enough resident bytes to attribute/evict
        return _truthful_ckpt(
            spark.range(65536).select(
                F.col("id"), (F.col("id") * 2).alias("v")
            )
        )

    return U.session_stage(spark, "/ledger-test", name, build)


def _drop_test_stages():
    for key in [k for k in U._STAGE_CACHE if k[1] == "/ledger-test"]:
        U._release_stage(U._STAGE_CACHE[key])
        del U._STAGE_CACHE[key]
        U._STAGE_META.pop(key, None)
        U._STAGE_ACTIVE.discard(key)


def test_ledger_attributes_and_evicts_lru(spark):
    _drop_test_stages()
    builds: dict = {}
    a = _mk_stage(spark, "stage_a", builds)
    b = _mk_stage(spark, "stage_b", builds)
    c = _mk_stage(spark, "stage_c", builds)
    assert a.count() == b.count() == c.count() == 65536

    sizes = U._stage_resident_bytes(spark)
    keyed = {k[2]: v for k, v in sizes.items() if k[1] == "/ledger-test"}
    assert all(keyed.get(n, 0) > 0 for n in ("stage_a", "stage_b", "stage_c"))

    # end of "query 1": all three were touched -> protected this tick even
    # under a zero budget
    summary = U.stage_ledger_tick(spark, budget_bytes=0)
    assert all(n not in summary["evicted"]
               for n in ("stage_a", "stage_b", "stage_c"))

    # "query 2" touches only stage_c (now MRU); the next tick under a
    # budget smaller than the three stages must evict the LRU ones
    # (a then b) and keep c
    _mk_stage(spark, "stage_c", builds)
    keep = keyed["stage_c"]
    summary = U.stage_ledger_tick(spark, budget_bytes=keep + 1)
    assert "stage_a" in summary["evicted"]
    assert "stage_b" in summary["evicted"]
    assert "stage_c" not in summary["evicted"]
    assert builds == {"stage_a": 1, "stage_b": 1, "stage_c": 1}

    # evicted stages rebuild on demand; survivors stay memoized
    _mk_stage(spark, "stage_a", builds)
    _mk_stage(spark, "stage_c", builds)
    assert builds["stage_a"] == 2
    assert builds["stage_c"] == 1
    _drop_test_stages()


def test_evicted_stage_storage_is_released(spark):
    _drop_test_stages()
    builds: dict = {}
    _mk_stage(spark, "stage_big", builds)
    before = U._stage_resident_bytes(spark)
    big = [v for k, v in before.items() if k[2] == "stage_big"][0]
    assert big > 0
    U.stage_ledger_tick(spark, budget_bytes=0)   # protected (active)
    summary = U.stage_ledger_tick(spark, budget_bytes=0)  # now evictable
    assert "stage_big" in summary["evicted"]
    after = {k[2]: v for k, v in U._stage_resident_bytes(spark).items()}
    assert "stage_big" not in after
    _drop_test_stages()


def test_truthful_ckpt_disk_branch_spills_and_releases(spark, monkeypatch):
    """Forced-disk truthful_ckpt: the stage lands on local parquet (no
    executor storage), reads back identically, is visible to the tick's
    disk_bytes column, and drop_stage removes the directory."""
    import os

    _drop_test_stages()
    monkeypatch.setenv("SPARK_GRAFT_STAGE_MODE", "disk")

    def build():
        return U.truthful_ckpt(
            spark.range(1000).select(
                F.col("id"), (F.col("id") * 3).alias("v")
            )
        )

    df = U.session_stage(spark, "/ledger-test", "disk_stage", build)
    path = getattr(df, "_staged_dir", None)
    assert path is not None and os.path.isdir(path)
    assert df.count() == 1000
    assert df.agg(F.sum("v")).collect()[0][0] == 3 * 999 * 1000 // 2
    # no executor storage attributed: disk stages live outside the memory
    # budget, but the tick reports their bytes
    sizes = {k[2]: v for k, v in U._stage_resident_bytes(spark).items()}
    assert sizes.get("disk_stage", 0) == 0
    assert U._stage_disk_bytes() > 0
    U.drop_stage(spark, "/ledger-test", "disk_stage")
    assert not os.path.exists(path)
    _drop_test_stages()


def test_truthful_ckpt_threshold_picks_branch(spark, monkeypatch):
    """Auto mode: a tiny stage stays a localCheckpoint (no _staged_dir), a
    stage above a forced-low threshold goes to parquet."""
    _drop_test_stages()
    monkeypatch.delenv("SPARK_GRAFT_STAGE_MODE", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_STAGE_SPILL_MB", "100000")
    small = U.truthful_ckpt(spark.range(100).select("id"))
    assert getattr(small, "_staged_dir", None) is None
    small.unpersist()
    monkeypatch.setenv("SPARK_GRAFT_STAGE_SPILL_MB", "0")
    big = U.truthful_ckpt(spark.range(5000).select("id"))
    assert getattr(big, "_staged_dir", None) is not None
    U._release_stage(big)


def test_truthful_ckpt_family_aggregate_admission(spark, monkeypatch):
    """VERDICT r13 #4: the per-stage threshold judges stages one at a
    time; a 6-stage family each under the line can still starve the heap
    in aggregate. The structural bound: once RESIDENT stage storage plus
    the new stage's cache bytes cross the family bound, later members
    spill to parquet even though each is individually under the per-stage
    threshold."""
    _drop_test_stages()
    monkeypatch.delenv("SPARK_GRAFT_STAGE_MODE", raising=False)
    # per-stage threshold far above any member: the old rule keeps ALL
    # of them memory-resident
    monkeypatch.setenv("SPARK_GRAFT_STAGE_SPILL_MB", "100000")
    # family bound = whatever is already resident (other tests in the
    # shared session may hold blocks) + ~2 MB of headroom: members are
    # ~0.5-1.5 MB each, so the first stage stays on the fast path and
    # later ones must spill
    base_mb = U.storage_bytes(spark) // (1024 * 1024)
    monkeypatch.setenv("SPARK_GRAFT_STAGE_FAMILY_MB", str(base_mb + 2))

    members = []
    try:
        for i in range(6):
            df = U.truthful_ckpt(
                spark.range(65536).select(
                    F.col("id"), (F.col("id") * (i + 1)).alias("v")
                )
            )
            members.append(df)
        spilled = [m for m in members
                   if getattr(m, "_staged_dir", None) is not None]
        resident = [m for m in members
                    if getattr(m, "_staged_dir", None) is None]
        # early members fit under the bound; later ones spill -- both
        # branches must be exercised by the same family
        assert resident and spilled, (
            f"{len(resident)} resident / {len(spilled)} spilled"
        )
        # the first member (empty ledger) is memory-resident, the last
        # (residency saturated) is on parquet
        assert getattr(members[0], "_staged_dir", None) is None
        assert getattr(members[-1], "_staged_dir", None) is not None
        # every member is still correct regardless of branch
        for i, m in enumerate(members):
            assert m.agg(F.sum("v")).first()[0] == (i + 1) * (
                65535 * 65536 // 2
            )
    finally:
        for m in members:
            U._release_stage(m)


def test_truthful_ckpt_family_bound_leaves_small_sessions_alone(
    spark, monkeypatch
):
    """The 512 MB family floor: with no env pin, a handful of small
    stages all stay on the localCheckpoint fast path (sf0.1's largest
    per-query resident peak is 151 MB -- the bound must not reshape
    small-session plans)."""
    _drop_test_stages()
    monkeypatch.delenv("SPARK_GRAFT_STAGE_MODE", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_STAGE_FAMILY_MB", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_STAGE_SPILL_MB", "100000")
    members = [
        U.truthful_ckpt(spark.range(10000).select("id")) for _ in range(3)
    ]
    try:
        assert all(
            getattr(m, "_staged_dir", None) is None for m in members
        )
    finally:
        for m in members:
            U._release_stage(m)
