"""Registry contract sanity (the full oracle comparison runs via
tools/verify_oracle.py; these are fast structural checks kept in CI)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 50


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0].revenue >= rows[-1].revenue


def test_declared_rows_only_set_is_intentional():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    rows_only = set(qs) - set(os_)
    # EVERY registered query now carries an exact oracle; growing this set
    # needs a written reason. (History: the deterministic-approximate ANN
    # entries gained exact oracles in r4 -- md5-derived planes/pivots are
    # SQL-expressible even though the search is approximate; the sketch
    # aggregates gained accuracy-contract oracles in r5 -- exact value plus
    # a within-tolerance boolean; and the last holdout,
    # multimodal_feature_extract, gained one in r5 because its stub
    # features are byte-deterministic and the pure-ASCII fixture lets
    # DuckDB mirror bytes through ascii().)
    assert rows_only == set()
