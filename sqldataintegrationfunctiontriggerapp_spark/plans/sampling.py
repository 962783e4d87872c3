"""Training-data sampling operators: deterministic hash splits and
per-group quota sampling.

Random sampling is useless at 100 TB pipeline scale -- re-runs must land
every row in the same split, with no RNG state shared across 1000
executors. Both operators derive their randomness from md5 of the row key,
so they are pure column expressions: reproducible, embarrassingly parallel,
and identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.plans.registry import register

# hex-string thresholds: md5 < '1a' ~ 0x1a/0x100 = 10.2% (val),
# '1a' <= md5 < '34' ~ next 10.2% (test), rest train. String comparison on
# the hex digest is engine-independent.
_VAL_HI = "1a"
_TEST_HI = "34"


def split_assign(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    h = F.md5(F.col(key_col).cast("string"))
    return df.withColumn(
        "split",
        F.when(h < _VAL_HI, F.lit("val"))
        .when(h < _TEST_HI, F.lit("test"))
        .otherwise(F.lit("train")),
    )


@register(
    "train_val_split",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{_VAL_HI}' THEN 'val'
                    WHEN md5(CAST(doc_id AS VARCHAR)) < '{_TEST_HI}' THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    )
    SELECT split, COUNT(*) AS n, CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id
    FROM s GROUP BY split
    """,
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment from md5(key): every re-run
    and every engine lands each row in the same split -- the only split
    semantics that survive incremental re-processing. Summarized per split
    (the assignment itself is row-level)."""
    d = split_assign(load_table(spark, sf_dir, "documents"))
    return d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "quota_per_source",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE rn <= 20
    """,
)
def quota_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling (cap each domain/source at N docs -- the
    standard mixture-balancing op before training): deterministic priority
    by md5(key), one window shuffle on the group key."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("doc_id", "source")
    )


@register(
    "corpus_shards",
    oracle="""
    WITH s AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
               CAST((instr('0123456789abcdef',
                           substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                    % 8 AS INT) AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM s
    """,
)
def corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training: md5-derived shard id plus a
    stable within-shard position -- the write layout for epoch shuffling
    (readers stream shards in order, data arrives pre-shuffled). A true
    global row_number would serialize on one task; per-shard numbering keeps
    one independent sort per shard, so the 'shuffle' scales with shard
    count, and the assignment is reproducible across engines and re-runs."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    nib = F.expr(
        "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1"
    )
    shard = (nib % 8).cast("int")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("h")
    )


@register(
    "stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn,
           CAST(n_lang AS BIGINT) AS n_lang
    FROM ranked
    WHERE rn <= CAST(ceil(0.1 * n_lang) AS BIGINT)
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional stratified sample: exactly ceil(10%) of every language
    stratum, chosen by deterministic md5 priority -- the mixture-preserving
    downsample a corpus ablation needs (vs quota_per_source's fixed cap).
    One window shuffle on the stratum key computes rank and stratum size in
    the same pass; no second scan, no driver-side stratum list."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("lang")
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1)).over(wn).cast("long").alias("n_lang"),
        )
        .where(F.col("rn") <= F.ceil(0.1 * F.col("n_lang")).cast("long"))
    )


@register(
    "pack_documents_greedy",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                   - n_tokens AS offset_tokens
        FROM toks
    )
    SELECT doc_id, source, n_tokens,
           CAST(offset_tokens // 512 AS BIGINT) AS bin_id,
           CAST(offset_tokens % 512 AS BIGINT) AS bin_offset
    FROM packed
    """,
)
def pack_documents_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-then-chunk): concatenate each source's
    documents in id order and cut every 512 tokens; a document's bin is
    where its first token lands -- the packing layout LLM pretraining uses
    (documents may straddle bins; the trainer masks across boundaries).
    One running sum per source partition -- never a global window -- and
    the token count is the whitespace tokenizer both engines share."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    ).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id")
    offset = (
        F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        d.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .select(
            "doc_id", "source", "n_tokens",
            F.floor(offset / 512).cast("long").alias("bin_id"),
            (offset % 512).cast("long").alias("bin_offset"),
        )
    )


@register(
    "mixture_sampling_weights",
    oracle="""
    WITH s AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(CAST(sqrt(n_docs) AS DECIMAL(18,6))) AS DOUBLE) AS z,
                 CAST(SUM(n_docs) AS BIGINT) AS total
          FROM s)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(sqrt(n_docs) AS DOUBLE) / z AS sample_p,
           CAST(sqrt(n_docs) AS DOUBLE) / z * total AS expected_docs
    FROM s, t
    """,
)
def mixture_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling over sources: each source's
    per-epoch sampling probability proportional to n_docs^0.5 (temperature
    tau=2 in the n^(1/tau) convention multilingual/pretraining mixtures
    use), plus the expected document count it implies. Upweights the tail
    sources without letting a giant crawl dominate.

    Plan: one hash aggregate to per-source counts (tiny: one row per
    source), one 1-row global aggregate for the normalizer, broadcast back.
    The fact table is scanned ONCE regardless of corpus size; sqrt is
    IEEE-correctly-rounded so both engines agree bit-for-bit, and the
    normalizer sum runs through the decimal accumulator like every other
    order-sensitive double sum in the registry."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    t = s.agg(
        F.sum(F.sqrt("n_docs").cast("decimal(18,6)")).cast("double").alias("z"),
        F.sum("n_docs").alias("total"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        (F.sqrt("n_docs") / F.col("z")).alias("sample_p"),
        (F.sqrt("n_docs") / F.col("z") * F.col("total")).alias("expected_docs"),
    )


@register(
    "weighted_systematic_sample",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, n_chars,
               SUM(n_chars) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_after,
               SUM(n_chars) OVER (PARTITION BY source) AS total
        FROM documents
    ),
    b AS (SELECT *, cum_after - n_chars AS cum_before FROM t)
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST((cum_after * 5) // total AS INTEGER) AS pick_idx
    FROM b
    WHERE total > 0 AND (cum_after * 5) // total > (cum_before * 5) // total
    """,
)
def weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic size-proportional sampling, k=5 docs per source:
    systematic (fixed-interval) selection over an md5-shuffled order with
    selection probability proportional to n_chars -- the classic
    probability-proportional-to-size design used to draw inspection /
    eval samples from a training mixture where long documents should be
    proportionally represented. Selected are exactly the docs whose
    cumulative-weight interval crosses a multiple of total/k; a document
    longer than total/k can absorb several boundaries and is still
    emitted once (so a source can yield fewer than k rows -- inherent to
    PPS systematic sampling, not a defect).

    Determinism without ANY floating point: the cumulative weights are
    BIGINT sums and the boundary test compares integer divisions
    (cum*k) div total -- bit-exact on both engines by construction, no
    decimal accumulator needed. The md5 order is the same engine-
    independent shuffle as the split/quota operators above.

    Plan: one keyed window partition per source (the per-source running
    sum parallelizes across sources; no global sort), a same-partition
    total, and a filter -- one shuffle on source at any corpus size. The
    `total > 0` CASE guards mirror the cosine family's lesson: ANSI-mode
    integer div-by-zero must be impossible in the EXPRESSION, not just
    filtered upstream."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    wo = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wall = Window.partitionBy("source")
    k = F.lit(5)
    t = (
        d.withColumn(
            "cum_after",
            F.sum("n_chars").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("total", F.sum("n_chars").over(wall))
        .withColumn("cum_before", F.col("cum_after") - F.col("n_chars"))
    )
    pick_after = F.when(
        F.col("total") > 0, F.expr("(cum_after * 5) div total")
    ).otherwise(F.lit(-1))
    pick_before = F.when(
        F.col("total") > 0, F.expr("(cum_before * 5) div total")
    ).otherwise(F.lit(-1))
    return (
        t.withColumn("pick_idx", pick_after.cast("int"))
        .where((F.col("total") > 0) & (pick_after > pick_before))
        .select(
            "source", "doc_id", F.col("n_chars").cast("long").alias("n_chars"),
            "pick_idx",
        )
    )


def shuffle_key(key_col: str = "doc_id", seed: int = 42):
    """The deterministic shuffle order: md5 of (seed, key). Uniform over the
    hex-string domain, so a global sort on it is a skew-free range shuffle,
    and the same seed reproduces the same permutation on any cluster size."""
    return F.md5(
        F.concat(F.lit(f"shuffle:{seed}:"), F.col(key_col).cast("string"))
    )


@register(
    "dataset_shuffle_deterministic",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               md5('shuffle:42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents
        ORDER BY shuffle_key, doc_id
        LIMIT 100
    )
    SELECT CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT)
               AS position,
           doc_id, shuffle_key
    FROM s
    """,
)
def dataset_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global dataset shuffle -- the 'shuffle before packing'
    step every LLM training pipeline runs so that adjacent source documents
    never land in the same training batch. The permutation is a sort on
    md5(seed, doc_id): seeded (re-runs and resumes see the identical
    order), uniform (the sort's range partitioning is skew-free by
    construction -- no hot reducer regardless of how the input is laid
    out), and expressible as a plain column so the whole thing is one
    Catalyst sort with zero driver state. At 100 TB the production shape is
    `df.repartitionByRange(N, shuffle_key()).sortWithinPartitions(...)` --
    a single range shuffle writes the shuffled corpus; no RNG is ever
    shared across executors.

    The registered evidence takes the FIRST 100 documents of the shuffled
    order: orderBy(key).limit(k) compiles to TakeOrderedAndProject (each
    task keeps a k-row heap, the driver merges P*k rows -- bounded
    metadata, never a single-partition global sort), and the position
    column comes from a row_number window over the already-collected 100
    rows (bounded, not data-scale). The md5-hex order is engine-independent
    (same idiom as split_assign above), so the oracle mirrors the exact
    permutation prefix, positions included; `doc_id` breaks the
    (structurally impossible, but stated) md5-collision tie on both sides."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    t = (
        d.withColumn("shuffle_key", shuffle_key())
        .orderBy("shuffle_key", "doc_id")
        .limit(100)
    )
    w = Window.orderBy("shuffle_key", "doc_id")
    return t.withColumn(
        "position", F.row_number().over(w).cast("long")
    ).select("position", "doc_id", "shuffle_key")
