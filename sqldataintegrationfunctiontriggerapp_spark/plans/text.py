"""Text-analysis queries over `documents` (north-star C5 + text ops for a
training-data pipeline). The Spark side uses the column-function library in
functions/text.py; the oracle mirrors each formula in DuckDB SQL so the
driver hash-checks the semantics, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.functions import text as TX
from sqldataintegrationfunctiontriggerapp_spark.plans.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents arrives as a single small parquet split; spread the
    expression-heavy per-row text work over every core (the 100 TB input has
    plenty of splits -- this only matters for small-file local runs)."""
    d = load_table(spark, sf_dir, "documents")
    return d.repartition(spark.sparkContext.defaultParallelism, "doc_id")

# DuckDB fragments mirroring functions/text.py
_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
_STOP_EN = "('the', 'a', 'of', 'to', 'and', 'in', 'is')"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct,
           CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE)
             / greatest(len({_TOKS}), 1) AS mean_token_len,
           CAST(len(list_filter({_TOKS}, x -> lower(x) IN {_STOP_EN})) AS DOUBLE)
             / greatest(len({_TOKS}), 1) AS stopword_ratio
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, mean token length,
    stopword ratio -- all inside whole-stage codegen."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TX.token_count("text").cast("long").alias("n_tokens"),
        TX.distinct_token_count("text").cast("long").alias("n_distinct"),
        TX.mean_token_length("text").alias("mean_token_len"),
        (
            TX.stopword_count("text", "en").cast("double")
            / F.greatest(TX.token_count("text"), F.lit(1))
        ).alias("stopword_ratio"),
    )


@register(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TX.BPE_PATTERN}')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-style token counting: GPT-2-ish pre-tokenizer regex (RE2-safe, so
    the IDENTICAL pattern runs in both engines) next to the whitespace count.
    The real BPE merge step only shrinks the pre-token count, so this is the
    conservative budget estimate a data pipeline needs."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TX.bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
        TX.token_count("text").cast("long").alias("n_ws_tokens"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               len({_TOKS}) AS n_tokens,
               CAST(len(list_filter({_TOKS}, x -> lower(x) IN {_STOP_EN})) AS DOUBLE)
                 / greatest(len({_TOKS}), 1) AS stop_ratio,
               CAST(length(lower(text))
                    - length(regexp_replace(lower(text), '[^a-z ]', '', 'g'))
                    AS DOUBLE)
                 / greatest(length(lower(text)), 1) AS noise_ratio
        FROM documents
    )
    SELECT doc_id,
           (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END
            + CASE WHEN stop_ratio >= 0.05 THEN 0.3 ELSE 0.0 END
            + CASE WHEN noise_ratio <= 0.3 THEN 0.3 ELSE 0.0 END) AS quality,
           noise_ratio
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio / punctuation-noise heuristic,
    the cheap pre-filter stage of a training-data pipeline."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TX.quality_score("text").alias("quality"),
        TX.non_alpha_ratio("text").alias("noise_ratio"),
    )


@register(
    "text_lang_id",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               list_distinct(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS t,
               length(text)
                 - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g'))
                 AS cjk
        FROM documents
    ),
    t AS (
        SELECT doc_id, lang, cjk,
          len(list_distinct(list_intersect(t, ['the','a','of','to','and','in','is']))) AS s_en,
          len(list_distinct(list_intersect(t, ['el','la','de','que','y','en','un']))) AS s_es,
          len(list_distinct(list_intersect(t, ['le','la','de','et','un','que','est']))) AS s_fr,
          len(list_distinct(list_intersect(t, ['der','die','das','und','ist','ein','zu']))) AS s_de
        FROM toks
    )
    SELECT doc_id, lang AS actual_lang,
           CASE WHEN cjk > 0 THEN 'zh'
                WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'unknown'
                WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                ELSE 'de' END AS guessed_lang
    FROM t
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword votes + CJK short-circuit). The fixture
    text shares one vocabulary, so the interesting contract is that Spark and
    the oracle agree on the same deterministic guess."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        TX.lang_id("text").alias("guessed_lang"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CASE WHEN len({_TOKS}) >= 8 THEN
             list_min([md5(array_to_string(({_TOKS})[i:i+7], ' '))
                       for i in range(1, len({_TOKS}) - 6)])
           ELSE md5(array_to_string({_TOKS}, ' ')) END AS rolling_fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text (exact-dedup key) and
    a winnowing-style min-of-rolling-shingle-hashes fingerprint (stable under
    local edits)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TX.fingerprint("text").alias("fp"),
        TX.rolling_hash_fingerprint("text", 8).alias("rolling_fp"),
    )


@register(
    "term_frequencies",
    oracle=f"""
    SELECT term, COUNT(*) AS n
    FROM (SELECT UNNEST({_TOKS}) AS term FROM documents) t
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
)
def term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: tokenize -> explode -> count -- corpus term frequencies, top 20."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(20)
    )


@register(
    "doc_length_histogram",
    oracle="""
    WITH h AS (
        SELECT lang, CAST(n_chars // 100 AS BIGINT) AS bucket, COUNT(*) AS n
        FROM documents GROUP BY lang, bucket
    ),
    t AS (SELECT lang, SUM(n) AS lang_n FROM h GROUP BY lang)
    SELECT h.lang, h.bucket, CAST(h.n AS BIGINT) AS n_docs,
           CAST(h.n AS DOUBLE) / CAST(t.lang_n AS DOUBLE) AS share
    FROM h JOIN t ON t.lang = h.lang
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition: per-language document-length histogram (100-char
    buckets) with within-language share -- the length-distribution check
    that precedes any truncation/packing decision in a training pipeline.
    Two stacked aggregates + a broadcast join against the per-language
    totals (O(langs) rows); exact integer ratios keep the shares
    engine-identical."""
    d = load_table(spark, sf_dir, "documents")
    h = d.groupBy(
        "lang", (F.col("n_chars") / 100).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = h.groupBy("lang").agg(F.sum("n").alias("lang_n"))
    return (
        h.join(F.broadcast(t), "lang")
        .select(
            "lang",
            "bucket",
            F.col("n").cast("long").alias("n_docs"),
            (F.col("n").cast("double") / F.col("lang_n").cast("double"))
            .alias("share"),
        )
    )


@register(
    "doc_chunk_spans",
    oracle=f"""
    WITH t AS (SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents),
    u AS (
        SELECT doc_id, n_tokens,
               UNNEST([i for i in range(0, (n_tokens - 1) // 64 + 1)]) AS gs
        FROM t WHERE n_tokens > 0
    )
    SELECT doc_id,
           CAST(gs AS BIGINT) AS chunk_idx,
           CAST(LEAST(64, n_tokens - gs * 64) AS BIGINT) AS chunk_tokens
    FROM u
    """,
)
def doc_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking layout: each document split into 64-token chunks
    (last chunk ragged) -- the row-expansion that feeds context-window
    packing, embedding indexing, and chunked retrieval corpora. The chunk
    spans are COMPUTED (sequence + explode over the token count), not
    produced by re-splitting the text n times, so the scan reads each
    document once and the fan-out is pure expression work that scales
    linearly with output rows."""
    d = _docs(spark, sf_dir)
    n = F.size(TX.tokens("text")).alias("n_tokens")
    t = d.select("doc_id", n).where(F.col("n_tokens") > 0)
    idx = F.explode(
        F.sequence(F.lit(0).cast("long"), ((F.col("n_tokens") - 1) / F.lit(64)).cast("long"))
    ).alias("chunk_idx")
    return t.select("doc_id", idx, "n_tokens").select(
        "doc_id",
        "chunk_idx",
        F.least(F.lit(64).cast("long"), F.col("n_tokens") - F.col("chunk_idx") * 64)
        .cast("long")
        .alias("chunk_tokens"),
    )
