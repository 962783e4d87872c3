"""Catalog helpers: byte-conf parsing for the spread heuristic (ADVICE r03).

No SparkSession needed -- pure parsing. The spread gate itself is covered
indirectly by every sweep query via load_table(spread=True) callers.
"""

from __future__ import annotations

import pytest

from sqldataintegrationfunctiontriggerapp_spark.catalog import _parse_byte_conf


@pytest.mark.parametrize(
    ("raw", "expect"),
    [
        ("134217728", 134217728),      # plain int (Spark's default form)
        ("134217728b", 134217728),     # explicit bytes suffix
        ("128m", 128 << 20),           # JavaUtils short suffix
        ("128MB", 128 << 20),          # human-readable, any case
        (" 1g ", 1 << 30),             # whitespace tolerated
        ("2t", 2 << 40),
    ],
)
def test_parse_byte_conf_suffixes(raw, expect):
    assert _parse_byte_conf(raw) == expect


@pytest.mark.parametrize("raw", ["", "mb", "garbage", "12.5m", "-1m", "²b"])
def test_parse_byte_conf_falls_back_on_unparseable(raw):
    # the value only tunes a local heuristic: never raise, use the default
    assert _parse_byte_conf(raw) == 134217728


def test_session_stage_eviction_frees_checkpoint_blocks(spark, monkeypatch, tmp_path):
    # ADVICE r04 #1 regression: inserting a stage for a new sf_dir must
    # evict same-app entries for other dirs AND release their
    # localCheckpoint storage (DataFrame.unpersist alone does NOT free
    # checkpoint blocks -- the eviction goes through the LogicalRDD's rdd).
    # The memo is swapped for a fresh dict so the test never evicts real
    # stages other tests in this session built (monkeypatch restores it).
    from sqldataintegrationfunctiontriggerapp_spark.plans import _util

    monkeypatch.setattr(_util, "_STAGE_CACHE", {})

    def stored_ids():
        return {
            info.id()
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    before = stored_ids()
    _util.session_stage(
        spark, "/fake/dir_a", "evict_test",
        lambda: spark.range(1000).localCheckpoint(),
    )
    a_ids = stored_ids() - before
    assert a_ids, "stage build should have checkpointed storage"
    staged = tmp_path / "staged_dir"
    staged.mkdir()
    _util.session_stage(
        spark, "/fake/dir_b", "evict_test",
        lambda: (_util.StagedDir(str(staged)), spark.range(10).localCheckpoint()),
    )
    after = stored_ids()
    assert not (a_ids & after), "evicted stage's checkpoint blocks remain"
    # StagedDir values: eviction must remove the directory itself
    _util.session_stage(
        spark, "/fake/dir_c", "evict_test", lambda: spark.range(1)
    )
    assert not staged.exists(), "evicted StagedDir was not removed"
