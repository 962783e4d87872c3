"""Text-format ingestion round-trips: JSONL and CSV -- the two formats
training corpora actually arrive in (web-crawl dumps, vendor exports)
before anything becomes parquet. Each query stages the documents table in
the text format ONCE per session, reads it back through the engine's
source (explicit schema -- production never infers), and emits per-row
fidelity evidence (md5 of the text plus the identifying columns). The
oracle is the PARQUET ground truth, so the driver hash proves the
write -> escape -> parse -> read chain is lossless: any quoting, escaping,
null-vs-empty, or encoding drift in either direction breaks the hash.

Scale shape: both sources split by line/record and read in parallel
exactly like parquet (JSONL is splittable by construction; the CSV reader
is run in multiLine=false mode here, the splittable fast path, because the
staged write quotes embedded newlines away -- see csv options below). The
staging write is the same one-shuffle discipline as the partitioned
layout stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.plans.registry import register

_ROUNDTRIP_ORACLE = """
SELECT doc_id, source,
       CAST(LENGTH(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""


def _staged_text_format(spark: SparkSession, sf_dir: str, fmt: str,
                        **options) -> str:
    """Write documents in `fmt` once per session+sf_dir; returns the dir."""
    import hashlib
    import os
    import tempfile

    from sqldataintegrationfunctiontriggerapp_spark.plans._util import (
        StagedDir,
        session_stage,
    )

    def build():
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        base = tempfile.mkdtemp(prefix=f"ingest_{fmt}_{tag}_")
        path = os.path.join(base, f"documents_{fmt}")
        w = load_table(spark, sf_dir, "documents").write
        for k, v in options.items():
            w = w.option(k, v)
        getattr(w, fmt)(path)
        return StagedDir(path)

    return session_stage(spark, sf_dir, f"documents_as_{fmt}", build)


@register("jsonl_ingest_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def jsonl_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL (one JSON object per line -- the de-facto LLM corpus
    interchange format) through the engine's own writer and reader:
    documents -> .write.json (standard JSON string escaping: embedded
    newlines, quotes, and control characters become \\n, \\", \\uXXXX,
    which is exactly what keeps the format line-splittable) -> read back
    with the EXPLICIT parquet schema (inference is a correctness and
    stability hazard in production ingest; cf. reference
    Function1.cs:31-38 deserializing typed config rather than guessing).
    Output hashes md5(text) per row against the parquet ground truth --
    the oracle never sees the JSON, so a lossy escape or parse on either
    leg breaks the driver hash.

    At 100 TB this is the entry point of every pipeline stage upstream of
    parquet: JSONL splits by line, so the read parallelizes exactly like
    the parquet scan, and the explicit schema keeps one malformed vendor
    record from silently retyping a column for the whole job."""
    docs = load_table(spark, sf_dir, "documents")
    path = _staged_text_format(spark, sf_dir, "json")
    back = spark.read.schema(docs.schema).json(str(path))
    return back.select(
        "doc_id",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    )


@register("csv_ingest_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def csv_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV through the engine's writer and reader with the quoting rules
    pinned explicitly (header, quote '"', escape '"' -- RFC-4180 doubled
    quotes, NOT the backslash default that round-trips badly against
    other tools; empty string vs NULL disambiguated via emptyValue), read
    back with the explicit schema. Same parquet-ground-truth oracle as
    the JSONL sibling: the hash catches any quote/escape/null asymmetry
    between the write and read legs -- the classic silent corpus
    corruption when CSV options drift between producer and consumer.

    multiLine stays FALSE (the splittable fast path): Spark's CSV writer
    quotes embedded newlines, but reading those back requires
    multiLine=true, which makes files unsplittable -- so production
    either bans embedded newlines at write time or pays the single-task
    read. The fixture text is newline-free; a corpus that is not should
    arrive as JSONL (the sibling query) instead."""
    docs = load_table(spark, sf_dir, "documents")
    path = _staged_text_format(
        spark, sf_dir, "csv",
        header="true", quote='"', escape='"', emptyValue="",
    )
    back = (
        spark.read.schema(docs.schema)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", "")
        .csv(str(path))
    )
    return back.select(
        "doc_id",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    )
