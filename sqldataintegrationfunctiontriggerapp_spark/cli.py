"""Thin request-handling shim over the keyed state table -- the engine's
analog of the reference's HTTP config API
(ClientAllowedColumnsFunction.cs:16-56: GET/POST of a table's client
allowed-columns CSV) and of the LastError read path. The reference exposes
these as Azure Function HTTP endpoints; in a batch engine the same surface
is a CLI (or any caller of StateStore -- this module is deliberately just
argument parsing around it).

Usage:
    python -m sqldataintegrationfunctiontriggerapp_spark.cli \
        allowed-columns set --state-path P --table T --columns a,b,c
    python -m sqldataintegrationfunctiontriggerapp_spark.cli \
        allowed-columns get --state-path P --table T
    python -m sqldataintegrationfunctiontriggerapp_spark.cli \
        last-error get --state-path P --table T

Prints the value (or nothing with rc=1 when absent), mirroring the
reference's 200-with-body / 404 split.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from sqldataintegrationfunctiontriggerapp_spark.state import (
    ALLOWED_COLUMNS,
    LAST_ERROR,
    StateStore,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sqldataintegrationfunctiontriggerapp_spark.cli")
    sub = p.add_subparsers(dest="entity", required=True)
    for entity in ("allowed-columns", "last-error"):
        ep = sub.add_parser(entity)
        esub = ep.add_subparsers(dest="action", required=True)
        get = esub.add_parser("get")
        get.add_argument("--state-path", required=True)
        get.add_argument("--table", required=True)
        if entity == "allowed-columns":
            st = esub.add_parser("set")
            st.add_argument("--state-path", required=True)
            st.add_argument("--table", required=True)
            st.add_argument("--columns", required=True)
    return p


def run(args: argparse.Namespace, spark: SparkSession) -> tuple[int, str | None]:
    """Returns (exit_code, value) so tests can call it without a subprocess."""
    store = StateStore(spark, args.state_path)
    entity = ALLOWED_COLUMNS if args.entity == "allowed-columns" else LAST_ERROR
    if args.action == "set":
        store.save_allowed_columns(args.table, args.columns)
        return 0, args.columns
    value = store.get(entity, args.table)
    return (0, value) if value is not None else (1, None)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from sqldataintegrationfunctiontriggerapp_spark.session import get_session

    rc, value = run(args, get_session(app_name="state-cli"))
    if value is not None:
        print(value)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
