"""ANN crossover bench (VERDICT r08 #4): at what corpus size does the
AMORTIZED IVF index (build once, probe many) overtake the exact map-side
dgemm kernel? The r08 200k x 64 comparison said "not yet at 200k"; this
reruns the same contenders on an arbitrary corpus dir (use
tools/gen_bigemb.py for the 2M x 64 point):

  * BLAS exact  -- brute_force_topk_blas: full corpus Arrow-streamed, one
    dgemm per batch against all queries (100% recall by construction)
  * IVF build   -- ivf_pivots + ivf_assign + localCheckpoint (the one-off
    amortized cost of the standing index)
  * IVF probe JVM  -- ivf_probe on the standing index (fold scoring)
  * IVF probe BLAS -- ivf_probe_topk_blas on the standing index
  * recall of the IVF result vs the exact baseline (top-k id overlap)

All timings are wall-clock with a warm pass (run twice, report the second)
because per-job fixed overheads at local[32] otherwise dominate.

Usage: python tools/bench_ann_crossover.py [corpus_dir] [--nq 100,1000]
       [--n-lists 256] [--n-probe 8] [--k 10] [--skip-jvm-probe]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.operators import similarity as S
from sqldataintegrationfunctiontriggerapp_spark.plans._util import truthful_ckpt
from sqldataintegrationfunctiontriggerapp_spark.session import get_session


def timed(fn, warm: bool = True):
    if warm:
        fn()
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main() -> int:
    args = sys.argv[1:]
    corpus_dir = args[0] if args and not args[0].startswith("--") else (
        "/root/repo/.localdata/emb2m"
    )

    def opt(name, default):
        return args[args.index(name) + 1] if name in args else default

    nqs = [int(x) for x in opt("--nq", "100,1000").split(",")]
    n_lists = int(opt("--n-lists", "256"))
    n_probe = int(opt("--n-probe", "8"))
    k = int(opt("--k", "10"))
    skip_jvm = "--skip-jvm-probe" in args
    blas_build = "--blas-build" in args
    # --probe-sweep 8,16,32,64,128: recall-vs-n_probe curve on the standing
    # index (VERDICT r11 #5), then the choose_n_probe operating points for
    # a few recall targets
    sweep = [int(x) for x in opt("--probe-sweep", "").split(",") if x]

    spark = get_session()
    corpus = spark.read.parquet(corpus_dir)
    n = corpus.count()
    print(f"corpus {corpus_dir}: {n} rows; n_lists={n_lists} n_probe={n_probe} "
          f"k={k} blas_build={blas_build}")

    t0 = time.time()
    pivots = S.ivf_pivots(corpus, n_lists)
    t_piv = time.time() - t0
    assign = S.ivf_assign_blas if blas_build else S.ivf_assign
    t0 = time.time()
    # truthful_ckpt (r13): a raw localCheckpoint of the 20M assigned index
    # is ~6 GB deserialized and OOMed the 8 g sweep the moment the exact
    # baseline scanned beside it; the spill-aware materializer lands it on
    # local parquet instead (which is also the honest 100 TB shape for a
    # standing index: on disk, scanned per probe)
    assigned = truthful_ckpt(assign(corpus, pivots))
    n_idx = assigned.count()
    t_build = time.time() - t0
    print(f"IVF build: pivots {t_piv:.1f}s; assign+checkpoint {t_build:.1f}s "
          f"({n_idx} indexed, {'BLAS' if blas_build else 'JVM'} assign)")

    for nq in nqs:
        queries = corpus.where(F.col("vec_id") < nq).localCheckpoint()
        exact_rows, t_exact = timed(
            lambda: S.brute_force_topk_blas(corpus, queries, k=k).collect()
        )
        blas_rows, t_blas = timed(
            lambda: S.ivf_probe_topk_blas(
                assigned, queries, pivots, k=k, n_probe=n_probe
            ).collect()
        )
        line = (
            f"|Q|={nq}: BLAS exact {t_exact:.1f}s; "
            f"IVF probe BLAS {t_blas:.1f}s"
        )
        if not skip_jvm:
            w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
            _, t_jvm = timed(
                lambda: S.ivf_probe(assigned, queries, pivots, n_probe)
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .collect()
            )
            line += f"; IVF probe JVM {t_jvm:.1f}s"
        exact = {}
        for r in exact_rows:
            exact.setdefault(r.query_id, set()).add(r.neighbor_id)
        got = {}
        for r in blas_rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        line += f"; recall {hits / total:.3f}"
        print(line)

        if sweep:
            curve: list[tuple[int, float]] = []
            for np_ in sweep:
                rows, t_probe = timed(
                    lambda np_=np_: S.ivf_probe_topk_blas(
                        assigned, queries, pivots, k=k, n_probe=np_
                    ).collect()
                )
                got = {}
                for r in rows:
                    got.setdefault(r.query_id, set()).add(r.neighbor_id)
                hits = sum(
                    len(exact[q] & got.get(q, set())) for q in exact
                )
                rec = hits / total
                curve.append((np_, rec))
                print(
                    f"  sweep |Q|={nq} n_probe={np_:>4}: probe "
                    f"{t_probe:.1f}s recall@{k} {rec:.3f} "
                    f"(exact baseline {t_exact:.1f}s)"
                )
            for target in (0.5, 0.7, 0.9):
                chosen = S.choose_n_probe(curve, target)
                met = max(r for n, r in curve if n == chosen)
                print(
                    f"  choose_n_probe(target={target}): n_probe={chosen}"
                    f" (measured recall {met:.3f})"
                )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
