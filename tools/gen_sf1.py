"""Deterministic sf1 fixture generator (VERDICT r07 #3): scales the driver's
read-only sf0.1 parquet tables 10x so the 100 TB arguments get at least one
measured point above sf0.1. NOT driver data -- a local perf fixture only
(the correctness gate stays on the driver's sf0.01 tables).

Construction: 10 replicas of sf0.1 with per-replica key offsets, so every
join keeps its sf0.1 selectivity (orders of replica r reference customers of
replica r) and row counts scale exactly 10x (region/nation stay fixed dims,
like TPC-H). Two columns need more than an offset to keep SCALING honest:

- documents.text: straight copies would make every document 10x exact-
  duplicated, blowing the dedup families' candidate pairs up ~100x per
  bucket -- a data artifact, not an engine property. Each replica r>0
  instead suffixes every token with the replica id: within-replica
  structure (and dup rate) is identical to sf0.1, replicas share no
  vocabulary, so postings lists and candidate counts scale linearly like a
  real 10x corpus. n_chars is recomputed from the rewritten text.
- embeddings.embedding: copies would give every vector 9 exact duplicates,
  and small additive noise is nearly as bad -- 10 noisy copies of a base
  vector sit at mutual cosine ~0.9, so the TRUE >=0.4-pair set grows
  ~100x (quadratic in cluster density), a fixture artifact, not a real
  10x corpus. Each replica r>0 instead applies a seeded SIGNED
  PERMUTATION of the 64 dimensions (permute + per-dim sign flip):
  cosines within a replica are exactly preserved (the replica is an
  isometric copy of sf0.1, so per-replica dup structure is identical),
  while cross-replica similarities scatter like unrelated vectors --
  true pairs scale ~10x, the linear scale-up a real corpus shows.

Everything is seeded/arithmetic -- two runs produce byte-identical tables.
Each replica is written as its own file under <table>.parquet/ (a directory,
which Spark reads natively) with bounded row groups, so scans start with
>= 10 splits instead of one giant single-row-group file.

Usage: python tools/gen_sf1.py [dst_dir] [--replicas N] [--boilerplate]
       (defaults /root/repo/.localdata/sf1, 10 replicas; --replicas 100
       with dst .localdata/sf10 builds the r10 sf10 fixture -- same
       construction, same linear-scaling guarantees, keys offset by
       replica*10M so 100 replicas stay far below int64; --boilerplate
       wraps every document in the shared un-suffixed header/footer that
       drives the span family's hottest posting list to |corpus| and
       flips the _F_AUTO route to its capped branch)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST_DEFAULT = "/root/repo/.localdata/sf1"
REPLICAS = 10
KEY_OFF = 10_000_000  # far above any sf0.1 key

# table -> columns that get the replica key offset
OFFSET_COLS = {
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]
ROW_GROUP = 131_072


def _offset(table: pa.Table, cols: list[str], r: int) -> pa.Table:
    for c in cols:
        i = table.schema.get_field_index(c)
        shifted = pc.add(table.column(c), pa.scalar(r * KEY_OFF, table.schema.field(c).type))
        table = table.set_column(i, table.schema.field(c), shifted)
    return table


# --boilerplate: the shared header/footer every scraped-web corpus carries
# (cookie banners, license blocks, nav text). Same token sequence on EVERY
# document of EVERY replica -- never replica-suffixed -- so its 8-token
# shingles have document frequency = |corpus|, which is the regime the span
# family's _F_AUTO route exists for (VERDICT r11 #4): the hottest posting
# list blows far past 64 docs and the capped branch must take over.
BOILER_HEADER = (
    "terms of service agreement applies to this document please review the "
    "archived revision history before redistribution of any content herein"
)
BOILER_FOOTER = (
    "copyright notice all rights reserved contact the site administrator "
    "for takedown requests unsubscribe from the newsletter mailing list here"
)


def _remap_documents(table: pa.Table, r: int, boilerplate: bool = False) -> pa.Table:
    i_text = table.schema.get_field_index("text")
    i_n = table.schema.get_field_index("n_chars")
    texts = table.column("text").to_pylist()
    if r > 0:
        tag = str(r)
        texts = [" ".join(t + tag for t in s.split()) for s in texts]
    if boilerplate:
        texts = [
            f"{BOILER_HEADER} {s} {BOILER_FOOTER}" if s else
            f"{BOILER_HEADER} {BOILER_FOOTER}"
            for s in texts
        ]
    if r == 0 and not boilerplate:
        return table
    table = table.set_column(i_text, table.schema.field(i_text), pa.array(texts, pa.string()))
    n_chars = pa.array([len(s) for s in texts], table.schema.field(i_n).type)
    return table.set_column(i_n, table.schema.field(i_n), n_chars)


def _perturb_embeddings(table: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return table
    i = table.schema.get_field_index("embedding")
    field = table.schema.field(i)
    vecs = np.array(table.column("embedding").to_pylist(), dtype=np.float32)
    rng = np.random.default_rng(42_000 + r)
    perm = rng.permutation(vecs.shape[1])
    signs = rng.choice([-1.0, 1.0], size=vecs.shape[1]).astype(np.float32)
    vecs = vecs[:, perm] * signs  # isometry: within-replica cosines unchanged
    arr = pa.array(list(vecs), type=field.type)
    return table.set_column(i, field, arr)


def main() -> None:
    args = sys.argv[1:]
    replicas = REPLICAS
    if "--replicas" in args:
        i = args.index("--replicas")
        replicas = int(args[i + 1])
        del args[i:i + 2]
    # --tables lineitem,documents: generate a PARTIAL fixture holding only
    # the named tables (plus the fixed dims, which are free) -- the sf30+
    # spot-bench points need one or two fact tables, not a full 6 GB copy
    # of everything (VERDICT r10 #7). Queries touching an omitted table
    # fail at read time, loudly.
    only: set[str] | None = None
    if "--tables" in args:
        i = args.index("--tables")
        only = {t.strip() for t in args[i + 1].split(",") if t.strip()}
        del args[i:i + 2]
    boilerplate = "--boilerplate" in args
    if boilerplate:
        args.remove("--boilerplate")
    dst = args[0] if args else DST_DEFAULT
    os.makedirs(dst, exist_ok=True)
    for t in FIXED_DIMS:
        src = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(src, f"{dst}/{t}.parquet")
        print(f"{t}: {src.num_rows} rows (fixed dim)")
    for t, cols in OFFSET_COLS.items():
        if only is not None and t not in only:
            continue
        src = pq.read_table(f"{SRC}/{t}.parquet")
        out_dir = f"{dst}/{t}.parquet"
        os.makedirs(out_dir, exist_ok=True)
        for r in range(replicas):
            rep = _offset(src, cols, r)
            if t == "documents":
                rep = _remap_documents(rep, r, boilerplate=boilerplate)
            elif t == "embeddings":
                rep = _perturb_embeddings(rep, r)
            pq.write_table(rep, f"{out_dir}/part-{r:02d}.parquet", row_group_size=ROW_GROUP)
        print(f"{t}: {src.num_rows} -> {src.num_rows * replicas} rows ({replicas} files)")


if __name__ == "__main__":
    main()
