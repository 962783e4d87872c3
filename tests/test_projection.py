"""Allowlist projection parity (reference ExecuteTriggerHelper.cs:88-113,
ClientAllowedColumnsFunction.cs:58-65)."""

from __future__ import annotations

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.operators.projection import (
    normalize_table_name,
    parse_columns,
    project_allowlist,
    union_allowlists,
)


def test_parse_columns_trims_and_drops_empties():
    assert parse_columns(" Id , Name ,, LastUpdate ,") == ["Id", "Name", "LastUpdate"]
    assert parse_columns("") == []
    assert parse_columns(None) == []


def test_normalize_table_name():
    assert normalize_table_name("[dbo].[TrackingDemo]") == "dbo.TrackingDemo"


def test_union_is_case_insensitive():
    assert union_allowlists("Id,NAME", "name, lastupdate") == {
        "id", "name", "lastupdate"
    }


def test_project_keeps_only_allowlisted_case_insensitive(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    out = project_allowlist(o, {"O_ORDERKEY", "o_custkey"})
    assert out.columns == ["o_orderkey", "o_custkey"]


def test_empty_allowlist_passes_all_columns(spark, sf_dir):
    # README.md:39: no allowlist configured => nothing is removed
    o = load_table(spark, sf_dir, "orders")
    assert project_allowlist(o, None).columns == o.columns
    assert project_allowlist(o, set()).columns == o.columns


def test_projection_pushes_into_parquet_scan(spark, sf_dir):
    # Catalyst must prune at the reader: ReadSchema carries only kept columns.
    o = load_table(spark, sf_dir, "orders")
    plan = project_allowlist(o, {"o_orderkey"})._jdf.queryExecution().executedPlan().toString()
    assert "o_custkey" not in plan
