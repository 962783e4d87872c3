"""Deterministic 2M x 64 embedding corpus (VERDICT r08 #4): the fixture
that settles where amortized IVF+BLAS actually overtakes the exact dgemm
kernel -- the r08 200k comparison showed BLAS exact winning there and
called the "IVF wins at tens of millions" claim extrapolation; this is the
measured point an order of magnitude up.

Structure mirrors what a real embedding corpus gives an IVF index: vectors
are drawn around N_CENTERS latent unit centers (mixture, not uniform), so
inverted lists are coherent and n_probe pruning has real recall behavior.
Everything is seeded per part -- two runs produce byte-identical files.
float32 storage like the driver fixtures; ~550 MB for 2M rows.

Usage: python tools/gen_bigemb.py [dst_dir] [n_rows]
       (defaults: /root/repo/.localdata/emb2m, 2_097_152)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
N_CENTERS = 2048
PART_ROWS = 32_768
NOISE = 0.35


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/emb2m"
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_097_152
    os.makedirs(dst, exist_ok=True)
    rng_c = np.random.default_rng(7_000)
    centers = rng_c.standard_normal((N_CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    n_parts = -(-n_rows // PART_ROWS)
    for p in range(n_parts):
        lo = p * PART_ROWS
        hi = min(lo + PART_ROWS, n_rows)
        rng = np.random.default_rng(7_100 + p)
        cid = rng.integers(0, N_CENTERS, size=hi - lo)
        vecs = centers[cid] + NOISE * rng.standard_normal((hi - lo, DIM))
        table = pa.table(
            {
                "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "embedding": pa.array(
                    list(vecs.astype(np.float32)), pa.list_(pa.float32())
                ),
                "label": pa.array(cid.astype(np.int32)),
            }
        )
        pq.write_table(table, f"{dst}/part-{p:03d}.parquet")
    print(f"{dst}: {n_rows} rows x {DIM} dims in {n_parts} parts")


if __name__ == "__main__":
    main()
