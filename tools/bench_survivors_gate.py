"""Measure annotate_survivors' two join branches (VERDICT r09 #2 done
criterion): on the real sf1 near-dup component table (small — broadcast
branch fires) and on a synthetic HIGH-dup-fraction component table (40%
of the corpus carries a component label — the web-crawl shape whose
forced broadcast was the r09 scale finding), comparing the size-gated
broadcast against the shuffled left join the gate falls back to.

Usage: python tools/bench_survivors_gate.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
from sqldataintegrationfunctiontriggerapp_spark.operators import dedup as D
from sqldataintegrationfunctiontriggerapp_spark.operators.dedup import (
    annotate_survivors,
)
from sqldataintegrationfunctiontriggerapp_spark.session import get_session


def timed2(fn):
    fn()
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/repo/.localdata/sf1"
    spark = get_session()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    n_docs = docs.count()

    # real component table: the >=0.8 ngram near-dup components
    from sqldataintegrationfunctiontriggerapp_spark.plans.dedup import (
        _ngram_pairs_stage,
    )

    edges = _ngram_pairs_stage(spark, sf_dir).select("doc_a", "doc_b")
    comps = D.connected_components(edges).localCheckpoint()
    n_comp = comps.count()
    print(f"real sf1 components: {n_comp} of {n_docs} docs "
          f"({n_comp / n_docs:.1%} dup fraction)")
    for label, cap in (("broadcast", None), ("shuffled", 0)):
        _, dt = timed2(
            lambda cap=cap: annotate_survivors(
                docs, comps, broadcast_max_rows=cap
            ).where(~F.col("kept")).count()
        )
        print(f"  real comps, {label} branch: {dt:.1f}s")

    # synthetic high-dup component table: 40% of docs labeled, pairing
    # doc 2k+1 into doc 2k's component -- the crawl-shaped fraction the
    # r09 verdict named as the broadcast OOM case
    hi = (
        docs.select("doc_id")
        .where(F.col("doc_id") % 5 < 2)
        .select(
            "doc_id",
            (F.col("doc_id") - (F.col("doc_id") % 2)).alias("component_id"),
        )
        .localCheckpoint()
    )
    n_hi = hi.count()
    print(f"synthetic components: {n_hi} of {n_docs} docs "
          f"({n_hi / n_docs:.1%} dup fraction)")
    results = {}
    for label, cap in (("broadcast (forced)", 10**9), ("shuffled", 0)):
        rows, dt = timed2(
            lambda cap=cap: annotate_survivors(
                docs, hi, broadcast_max_rows=cap
            ).where(~F.col("kept")).count()
        )
        results[label] = rows
        print(f"  high-dup comps, {label} branch: {dt:.1f}s ({rows} dropped)")
    assert len(set(results.values())) == 1, results
    print("branches agree on dropped-row count")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
