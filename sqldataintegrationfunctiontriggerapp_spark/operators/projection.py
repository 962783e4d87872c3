"""Allowlist projection -- the reference's core relational operator.

Reference behavior (all citations into /root/reference):
- Per-row removal of columns not in the allowlist
  (ExecuteTriggerHelper.cs:88-113); no allowlist configured => pass all
  columns through (README.md:39).
- The allowlist is the union of a config CSV and a client-supplied CSV
  (ExecuteTriggerHelper.cs:65-86), parsed by splitting on ',', trimming, and
  dropping empties (ClientAllowedColumnsFunction.cs:58-65).
- Matching is case-insensitive (StringComparer.OrdinalIgnoreCase,
  ExecuteTriggerHelper.cs:69).
- Table identifiers are normalized by stripping '[' and ']'
  (ClientAllowedColumnsFunction.cs:21,:49).

Spark design: the allowlist is resolved driver-side into a plain `select`,
so Catalyst's ColumnPruning pushes the projection into the parquet scan --
the reference prunes per row in C#, we prune at the reader. A 100 TB scan
that keeps 2 of 16 columns reads ~1/8 of the bytes.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def parse_columns(csv: str | None) -> list[str]:
    """CSV -> column list: split on ',', trim, drop empties
    (ClientAllowedColumnsFunction.cs:58-65)."""
    if not csv:
        return []
    return [c.strip() for c in csv.split(",") if c.strip()]


def normalize_table_name(table: str) -> str:
    """Strip square brackets: '[dbo].[T]' -> 'dbo.T'
    (ClientAllowedColumnsFunction.cs:21)."""
    return table.replace("[", "").replace("]", "")


def union_allowlists(*csvs: str | None) -> set[str]:
    """Case-insensitive union of any number of CSV allowlists
    (ExecuteTriggerHelper.cs:65-86)."""
    out: set[str] = set()
    for csv in csvs:
        out.update(c.lower() for c in parse_columns(csv))
    return out


def project_allowlist(df: DataFrame, allowed: Iterable[str] | None) -> DataFrame:
    """Keep only allowlisted columns, case-insensitively; empty/None allowlist
    passes everything through (README.md:39). Column order of the source is
    preserved, mirroring the reference's in-place removal semantics."""
    allow = {a.lower() for a in allowed} if allowed else set()
    if not allow:
        return df
    kept = [c for c in df.columns if c.lower() in allow]
    return df.select(*kept)
