"""BPE R-scaling bench (VERDICT r09 #3): measure the production
(per-round localCheckpoint) merge chain at real-ish merge counts and show
wall-time is LINEAR in R -- the property the lazy 2^R chain cannot have.

For each R in --rounds, runs `bpe_chain_checkpointed` end-to-end on the
given fixture dir (the word-type stage is built once and session-memoized,
so per-R times measure the merge rounds themselves after the first) and
reports wall time, learned-merge count, and the final symbol-table size.

The sf1 documents fixture reduces to only ~31 alpha word TYPES (synthetic
text, tiny vocabulary), so --synthetic N swaps in a generated N-row
word-type table (32-char md5-derived words over a 16-letter alphabet,
deterministic) to measure the per-round cost at a realistic vocabulary
size instead of at job-overhead floor.

Usage: python tools/bench_bpe_rounds.py [sf_dir] [--rounds 16,64,256]
       [--synthetic 200000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.plans.text import (
    _bpe_best,
    _bpe_merge,
    _bpe_round_out,
    bpe_chain_checkpointed,
)
from sqldataintegrationfunctiontriggerapp_spark.session import get_session


def synthetic_word_types(spark, n: int):
    """Deterministic n-row word-type table: 32-char words over the
    16-letter md5 alphabet remapped to g-p (so they satisfy [a-z]+),
    freq = (id % 1000) + 1. 16 symbols -> up to 256 distinct initial
    pairs; merges then grow the symbol inventory like a real corpus."""
    return (
        spark.range(n)
        .select(
            F.translate(
                F.md5(F.col("id").cast("string")), "0123456789", "ghijklmnop"
            ).alias("w"),
            (F.col("id") % 1000 + 1).alias("freq"),
        )
        .select(
            "w", "freq",
            F.regexp_extract_all(F.col("w"), F.lit("."), 0).alias("seq"),
        )
        .localCheckpoint()
    )


def checkpointed_rounds(cur, rounds: int):
    """bpe_chain_checkpointed's loop over an explicit word-type frame."""
    outs = []
    for rnd in range(1, rounds + 1):
        best = _bpe_best(cur).localCheckpoint()
        if not best.take(1):
            break
        outs.append(_bpe_round_out(best, rnd))
        cur = _bpe_merge(cur, best).localCheckpoint()
    return outs, cur


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].startswith("--") else (
        "/root/repo/.localdata/sf1"
    )
    rounds = [16, 64, 256]
    if "--rounds" in args:
        rounds = [int(x) for x in args[args.index("--rounds") + 1].split(",")]
    synth = int(args[args.index("--synthetic") + 1]) if "--synthetic" in args \
        else 0

    spark = get_session()
    if synth:
        t0 = time.time()
        base = synthetic_word_types(spark, synth)
        base.count()
        print(f"synthetic word-type table ({synth} rows): "
              f"{time.time() - t0:.1f}s")
    else:
        # warm the shared word-type stage so every R measures rounds only
        t0 = time.time()
        bpe_chain_checkpointed(spark, sf_dir, rounds=1)
        print(f"word-type stage + R=1: {time.time() - t0:.1f}s")

    prev = None
    for r in rounds:
        t0 = time.time()
        if synth:
            outs, cur = checkpointed_rounds(base, r)
        else:
            outs, cur = bpe_chain_checkpointed(spark, sf_dir, rounds=r)
        dt = time.time() - t0
        n_types = cur.count()
        line = (f"R={r}: {dt:.1f}s total, {dt / r * 1000:.0f} ms/round, "
                f"{len(outs)} merges learned, {n_types} word types")
        if prev is not None:
            pr, pdt = prev
            line += f"  [vs R={pr}: {dt / pdt:.2f}x time for {r / pr:.0f}x rounds]"
        print(line)
        prev = (r, dt)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
