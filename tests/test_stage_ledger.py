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
