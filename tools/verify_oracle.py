"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
width, and order-insensitive values (exact; floats must be bit-identical --
that is the bar the registry's decimal-accumulator convention targets).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from sqldataintegrationfunctiontriggerapp_spark.catalog import TABLES
from sqldataintegrationfunctiontriggerapp_spark.session import get_session
import __spark_entry__ as entrymod


def canon(rows, ndigits=None):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [[row[c] for c in scols] for row in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, spark {t_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            orel = con.sql(oracles[name])
            ocols_raw = orel.columns
            order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
            ocols = [ocols_raw[i] for i in order]
            orows = [[r[i] for i in order] for r in orel.fetchall()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            problems.append(f"schema: spark={scols} duck={ocols}")
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} duck={len(orows)}")
        if not problems:
            cs, co = canon(srows), canon(orows)
            if cs != co:
                for i, (a, b) in enumerate(zip(cs, co)):
                    if a != b:
                        problems.append(f"first value diff at sorted row {i}:\n  spark={a}\n  duck ={b}")
                        break
                else:
                    problems.append("value diff in trailing rows")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(
                f"PASS  {name} ({len(srows)} rows, spark {t_spark:.1f}s,"
                f" duck {time.time()-t0:.1f}s)"
            )
    print(
        f"\n{n_checked - len(failures)}/{n_checked} checked ok"
        f" ({len(queries)} registered); failures: {failures}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
