"""Driver-contract smoke test: the correctness driver hands queries() its OWN
bare SparkSession (no sqldataintegrationfunctiontriggerapp_spark.session
involvement), so every query must be self-sufficient about session conf --
this is the exact gap that shipped round 1's nanos bug (VERDICT.md What's
wrong #1). Runs in a subprocess so no conf from the test session's JVM leaks.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("bare-driver").getOrCreate()
assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) in (None, "false")

import __spark_entry__ as entrymod

qs = entrymod.queries()
# one events-table query (nanos ts), one relational, one pandas-UDF path
for name in ("changefeed_watermark", "q1_pricing_summary", "pandas_udf_quality"):
    df = qs[name](spark, "/root/testdata/sf0.001")
    n = df.count()
    assert n >= 0, name
    print(f"{name}: {n} rows", file=sys.stderr)
print("BARE_OK")
spark.stop()
"""


def test_bare_session_runs_events_queries():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-3000:]}"
    assert "BARE_OK" in proc.stdout


def test_derive_shuffle_partitions_rule(tmp_path):
    """Explode-aware bytes-derived shuffle sizing: cpu floor below ~16 MB
    logical bytes/partition, ceil above it, the documents table amplified
    by the posting-explode factor, capped, and robust to a missing fixture
    dir. (Sparse non-parquet payloads exercise the file-size fallback.)"""
    from sqldataintegrationfunctiontriggerapp_spark.session import (
        _DOC_EXPLODE_AMP,
        _SHUFFLE_PARTITION_CAP,
        _SHUFFLE_TARGET_BYTES,
        derive_shuffle_partitions,
    )

    assert derive_shuffle_partitions(str(tmp_path / "missing"), 32) == 32
    small = tmp_path / "small"
    small.mkdir()
    (small / "t.parquet").write_bytes(b"x" * 1024)
    assert derive_shuffle_partitions(str(small), 32) == 32
    big = tmp_path / "big"
    big.mkdir()
    with open(big / "t.parquet", "wb") as f:
        f.truncate(100 * _SHUFFLE_TARGET_BYTES)  # sparse 1.6 GB
    assert derive_shuffle_partitions(str(big), 32) == 100
    assert derive_shuffle_partitions(str(big), 128) == 128
    # a documents table counts (1 + amp)x: the span/shingle explode seam
    docs = tmp_path / "docs"
    docs.mkdir()
    with open(docs / "documents.parquet", "wb") as f:
        f.truncate(10 * _SHUFFLE_TARGET_BYTES)
    assert derive_shuffle_partitions(str(docs), 32) == 10 * (
        1 + _DOC_EXPLODE_AMP
    )
    with open(big / "u.parquet", "wb") as f:
        f.truncate(_SHUFFLE_PARTITION_CAP * 2 * _SHUFFLE_TARGET_BYTES)
    assert derive_shuffle_partitions(str(big), 32) == _SHUFFLE_PARTITION_CAP
