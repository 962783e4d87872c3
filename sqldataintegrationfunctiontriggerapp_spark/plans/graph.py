"""Graph query: PageRank over the nation-level trade graph.

Reference scope note: the reference app (andre-maree/
SqlDataIntegrationFunctionTriggerApp) has no graph operator; this is part
of the mandated large-scale-pipeline surface (SURVEY.md §2.C), extending
the iterative family (connected components, k-means) with the
join-aggregate power-iteration shape.

Graph: one directed edge supplier-nation → customer-nation per lineitem
(weight = lineitem count). Deriving the edges is the 100 TB-scale part —
a lineitem-fact shuffle through supplier/orders/customer — and happens
exactly ONCE: the ≤ |nations|² aggregated edge list is localCheckpointed
before the rank loop, so the three iterations never re-run the fact joins.

Float-parity contract: per-edge contributions are FLOORed to BIGINT at
fixed-point scale 10^15 before the in-edge SUM (the only order-dependent
step) — floor of an identical double is an identical integer, and the
integer SUM is exact, so iteration order and partitioning cannot move a
bit. (A DECIMAL(28,18) cast was tried first and measured 1 ulp apart:
Spark converts double→DECIMAL via the shortest-string repr, DuckDB via
the exact binary expansion.) Every other op is elementwise double
arithmetic written with IDENTICAL association on both engines — see
operators/graph.py. The oracle spells each double literal as
CAST(x AS DOUBLE) (DuckDB bare 0.85 is a DECIMAL literal) and mirrors
the (1.0 - d) subtraction instead of folding it to 0.15, because Python's
1.0 - 0.85 is not the double nearest 0.15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.operators.graph import pagerank
from sqldataintegrationfunctiontriggerapp_spark.plans.registry import register

_PR_ITERS = 3
_PR_DAMPING = 0.85

# The recurrence, once per iteration (chained CTEs). Contribution order of
# operations mirrors operators/graph.py exactly (same association):
#   share   = CAST(w AS DOUBLE) / CAST(out_w AS DOUBLE)
#   contrib = CAST(FLOOR((rank * share) * 1e15) AS BIGINT)  -- exact SUM
#   rank'   = base + d * (CAST(COALESCE(SUM, 0) AS DOUBLE) / 1e15)
# DuckDB's FLOOR(double) returns double, so the BIGINT cast makes the SUM
# an exact integer sum (HUGEINT accumulator) like Spark's SUM(BIGINT).
_PR_STEP = """
    r{i} AS (
        SELECT nd.node,
               ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n)
               + CAST(0.85 AS DOUBLE)
                 * (CAST(COALESCE(SUM(
                        CAST(FLOOR((r.rank * (CAST(e.w AS DOUBLE)
                                              / CAST(d.out_w AS DOUBLE)))
                                   * CAST(1000000000000000 AS DOUBLE))
                             AS BIGINT)
                    ), 0) AS DOUBLE)
                    / CAST(1000000000000000 AS DOUBLE)) AS rank
        FROM nodes nd CROSS JOIN nnodes nn
        LEFT JOIN edges e ON e.dst = nd.node
        LEFT JOIN r{prev} r ON r.node = e.src
        LEFT JOIN outdeg d ON d.src = e.src
        GROUP BY nd.node, nn.n
    )"""

_PR_ORACLE = (
    """
    WITH edges AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               COUNT(*) AS w
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    outdeg AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    nnodes AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
        SELECT nd.node, CAST(1.0 AS DOUBLE) / nn.n AS rank
        FROM nodes nd CROSS JOIN nnodes nn
    ),"""
    + ",".join(
        _PR_STEP.format(i=i, prev=i - 1) for i in range(1, _PR_ITERS + 1)
    )
    + f"""
    SELECT node AS nationkey, rank AS pagerank FROM r{_PR_ITERS}
    """
)


@register("pagerank_nations", oracle=_PR_ORACLE)
def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 iterations, d = 0.85) over the supplier-nation →
    customer-nation lineitem-count graph. One fact shuffle builds the edge
    list; the rank loop runs on the checkpointed ≤ n² aggregate. See
    operators/graph.py for the determinism contract."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(ords, F.col("l_orderkey") == ords["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
        .localCheckpoint()  # ≤ |nations|² rows; reused every iteration
    )
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    ranks = pagerank(edges, nodes, iterations=_PR_ITERS, damping=_PR_DAMPING)
    return ranks.select(
        F.col("node").alias("nationkey"), F.col("rank").alias("pagerank")
    )


# The minhash >= 0.7 near-dup pair chain, as the oracle's edge builder
# (verbatim the dedup_minhash_lsh oracle CTEs, symmetrized to an
# undirected unit-weight edge list).
_DUP_EDGES = """
    tokd AS (
        SELECT doc_id, UNNEST(list_distinct(
            [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
        )) AS shingle
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents)
        WHERE len(toks) >= 3
    ),
    bands AS (SELECT CAST(range AS INTEGER) AS band FROM range(8)),
    sig AS (
        SELECT doc_id, band,
               MIN(md5(CAST(band * 2 AS VARCHAR) || '|' || shingle))
               || MIN(md5(CAST(band * 2 + 1 AS VARCHAR) || '|' || shingle)) AS sig
        FROM tokd CROSS JOIN bands
        GROUP BY doc_id, band
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tokd GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
        FROM cand c
        JOIN tokd ea ON ea.doc_id = c.doc_a
        JOIN tokd eb ON eb.doc_id = c.doc_b AND eb.shingle = ea.shingle
        GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.7
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst, 1 AS w FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst, 1 AS w FROM pairs
    )
"""

_DUP_PR_ORACLE = (
    "WITH "
    + _DUP_EDGES
    + """,
    outdeg AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
    nodes AS (SELECT doc_id AS node FROM documents),
    nnodes AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
        SELECT nd.node, CAST(1.0 AS DOUBLE) / nn.n AS rank
        FROM nodes nd CROSS JOIN nnodes nn
    ),"""
    + ",".join(
        _PR_STEP.format(i=i, prev=i - 1) for i in range(1, _PR_ITERS + 1)
    )
    + f"""
    SELECT node AS doc_id, rank AS pagerank FROM r{_PR_ITERS}
    """
)


@register("pagerank_dup_graph", oracle=_DUP_PR_ORACLE)
def pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the REAL near-duplication graph (where
    pagerank_nations exercises the operator on the 25-node toy, this runs
    it on corpus-scale data): nodes are all documents, undirected
    unit-weight edges are the verified MinHash pairs at Jaccard >= 0.7
    (the shared LSH stage -- the same pair table dedup_minhash_lsh,
    dedup_survivors, and split_leakage_audit serve). Centrality in this
    graph is a curation signal the pair list alone cannot give: a
    template/boilerplate HUB (one page near-duplicating hundreds) ranks
    far above an isolated mirror pair, so rank order is a principled
    clean-up priority; isolated documents sit at the (1-d)/n floor.

    Same determinism contract as the operator (fixed-point BIGINT floor
    before the only order-dependent SUM -- see the module docstring);
    the oracle replays the full LSH chain to build the identical edge
    list, then the identical 3-iteration recurrence.

    Scale shape: the edge list is the dedup family's output (bounded by
    true near-dup pairs, not n^2); each iteration is one node-keyed
    left join + exact integer aggregate -- linear in |docs| + |edges|
    per iteration at any corpus size."""
    from sqldataintegrationfunctiontriggerapp_spark.plans.dedup import (
        _minhash_stage,
    )

    _sigs, _cands, jacc0 = _minhash_stage(spark, sf_dir)
    pairs = jacc0.where(F.col("jaccard") >= 0.7).select("doc_a", "doc_b")
    edges = (
        pairs.select(
            F.col("doc_a").alias("src"),
            F.col("doc_b").alias("dst"),
            F.lit(1).alias("weight"),
        )
        .union(
            pairs.select(
                F.col("doc_b").alias("src"),
                F.col("doc_a").alias("dst"),
                F.lit(1).alias("weight"),
            )
        )
        .localCheckpoint()  # bounded by 2x near-dup pairs; reused per iteration
    )
    nodes = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node")
    )
    ranks = pagerank(edges, nodes, iterations=_PR_ITERS, damping=_PR_DAMPING)
    return ranks.select(
        F.col("node").alias("doc_id"), F.col("rank").alias("pagerank")
    )
