"""Benchmark harness: runs the full queries() suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "suite_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is executed to completion with the noop sink (full plan runs,
nothing is collected to the driver), which is what a cluster job would do --
`count()` would let Catalyst prune expensive projections and flatter the
numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from sqldataintegrationfunctiontriggerapp_spark.session import get_session


def _warm_fn(s: pd.Series) -> pd.Series:
    return s


def _calibration_probe(spark) -> float:
    """Fixed CPU+shuffle micro-probe (VERDICT r14 #2): 30M JVM-side md5s
    followed by a full 64-partition row shuffle and a scalar aggregate.
    Every term is pinned -- input rows, input partitions, md5 work,
    repartition(64) target (NOT the session's derived shuffle partitions)
    -- so the measured seconds depend only on the HOST (CPU class, memory
    bandwidth, contention), never on engine code or fixture scale. Run
    before and after the suite; the recorded pair lets bench_compare.py
    separate host-class drift (judge-confirmed 2-4x swings between
    sessions) from genuine per-query code movement without a worktree
    A/B. Memory-light by construction (no per-key state; the 1g default
    heap runs it with headroom).

    Reading the pair: pre >> post within one run is NOT host drift -- it
    is heap/page warmth (measured r15: pre 12.9 s vs post 2.1 s under
    SPARK_GRAFT_DRIVER_MEM=8g, the session.py big-fresh-heap
    demand-faulting pathology; and pre 53 s while a concurrent fixture
    generator saturated the box vs post 3.1 s after it finished). For
    cross-ROUND comparison bench_compare.py uses the pair's MEAN, and the
    driver's per-round runs use identical heap settings, so the ratio
    isolates the host class."""
    t0 = time.time()
    (
        spark.range(0, 30_000_000, 1, 32)
        .select(F.md5(F.col("id").cast("string")).alias("h"))
        .repartition(64, "h")
        .select(F.sum(F.crc32(F.col("h"))).alias("s"))
        .write.mode("overwrite").format("noop").save()
    )
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Validate any query-subset filter BEFORE the expensive session/warmup
    # startup, and name the offenders (a typo used to surface as a bare
    # KeyError after ~20 s of JVM warmup).
    from sqldataintegrationfunctiontriggerapp_spark import plans as _plans
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in _plans.QUERIES]
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_QUERIES names not in the registry: {unknown}"
            )
    # The JVM child inherits fd 1 and can write banners/progress into stdout,
    # which breaks the driver's json.loads of our one-line contract. Save the
    # real stdout, point fd 1 (and sys.stdout) at stderr for the whole run,
    # and emit the JSON line on the saved fd at the end -- the only stdout line.
    real_stdout_fd = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr
    spark = get_session(app_name="bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    # Python-worker warmup: fork + pandas import for the Arrow UDF pool once,
    # not inside the first measured pandas_udf query (real clusters run
    # long-lived workers; first-fork cost is deployment, not query, time)
    warm_udf = F.pandas_udf(_warm_fn, "long")  # needs the active session
    spark.range(10_000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .select(warm_udf("id")).write.mode("overwrite").format("noop").save()
    # Python-decode-path warmup at the smallest OTHER SF (OPTIMIZATION
    # r15, path derivation fixed r16 per VERDICT r15 #8 / ADVICE): the
    # first scan->exchange->mapInPandas pipeline of a session pays
    # ~3 s/worker of one-time cost (engine-module import in every reused
    # worker plus JVM JIT of the PythonMapInArrow path) -- measured 100
    # extra CPU-seconds across 32 workers (stage REST: 132.6 cold vs 31.5
    # warm executor_run seconds), landing on whichever decode/BLAS query
    # ran first. One registered decode absorbs it; the warmup dir is now
    # DERIVED -- the smallest sibling sf* dir that is not the bench
    # sf_dir (r15 hardcoded /root/testdata/sf0.001, which crashed hosts
    # without that fixture and, when sf_dir WAS sf0.001, pre-warmed the
    # page cache of a measured query's own fixture). Without any sibling,
    # warm_python_workers covers the per-worker import + MapInPandas JVM
    # path fixture-free. Nothing is cached; clearCache() runs below.
    from sqldataintegrationfunctiontriggerapp_spark import plans as _p
    from sqldataintegrationfunctiontriggerapp_spark.operators.multimodal import (
        warm_python_workers,
    )

    def _warmup_dir(target: str) -> str | None:
        import glob
        base = os.path.dirname(os.path.abspath(target.rstrip("/")))
        cands = []
        for p in glob.glob(os.path.join(base, "sf*")):
            if not os.path.isdir(p) or os.path.samefile(p, target):
                continue
            try:
                sz = sum(
                    os.path.getsize(os.path.join(dp, f))
                    for dp, _dirs, fs in os.walk(p) for f in fs
                )
            except OSError:
                continue
            cands.append((sz, p))
        return min(cands)[1] if cands else None

    wdir = _warmup_dir(sf_dir)
    if wdir is not None:
        _p.QUERIES["multimodal_decode_gif"](
            spark, wdir
        ).write.mode("overwrite").format("noop").save()
    else:
        print("# no sibling sf dir: fixture-free python-worker warmup",
              file=sys.stderr)
        warm_python_workers(spark)
    # SQL-path warmup at the smallest SF: parquet reader, scan codegen,
    # broadcast/shuffle machinery -- so the first measured query isn't
    # charged the JVM's one-time initialization.
    import __spark_entry__ as _e
    _e.entry(spark).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    probe_pre = _calibration_probe(spark)
    print(f"# calibration probe (pre): {probe_pre:.2f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    total = 0.0
    # Per-query peak resident RDD storage (stage checkpoints + any
    # persisted intermediates), sampled by a background thread -- the
    # ladder's evidence column for the stage ledger (VERDICT r11 #1).
    import threading

    from sqldataintegrationfunctiontriggerapp_spark.plans._util import (
        stage_ledger_tick,
        storage_bytes,
    )

    # --no-ledger-sampling (VERDICT r12 #3): strip every measurement-side
    # harness term from the timed path -- no background sampler thread, no
    # per-query storage reads, no ledger tick -- so the residual suite wall
    # isolates the queries themselves. Eviction semantics are unaffected at
    # sf0.1 (the 2048 MB budget is never exceeded there: the full-sweep log
    # shows zero evictions), so the A/B difference IS the harness overhead.
    sampling = "--no-ledger-sampling" not in sys.argv[1:]
    peak_holder = {"peak": 0, "stop": False, "epoch": 0}
    # ADVICE r13: the epoch check and the peak write must be one atomic
    # step against the boundary reset -- a bare check-then-act lets a
    # reset land in between and folds a stale high sample into the next
    # query's peak. The slow storage_bytes REST read stays outside the
    # lock; only the compare-and-fold and the reset take it.
    peak_lock = threading.Lock()

    def _sample_storage() -> None:
        while not peak_holder["stop"]:
            try:
                # Epoch tag (ADVICE r12): a sample read during query N must
                # not be folded into query N+1's peak after the boundary
                # reset -- snapshot the epoch, read, and discard under the
                # lock if a reset happened while this thread was reading.
                epoch = peak_holder["epoch"]
                b = storage_bytes(spark)
                with peak_lock:
                    if epoch == peak_holder["epoch"]:
                        peak_holder["peak"] = max(peak_holder["peak"], b)
            except Exception:
                pass
            time.sleep(0.25)

    if sampling:
        sampler = threading.Thread(target=_sample_storage, daemon=True)
        sampler.start()
    storage_peaks: dict[str, float] = {}
    # Measure in registry-natural (module) order, NOT the driver's
    # correctness-sweep priority order: the sweep priority is reshuffled
    # every round toward queries with stale evidence, and whichever query
    # runs first pays the JVM's one-time warmup (codegen infra, broadcast
    # pools, AQE init) -- measured ~10x on a sub-second query. A stable
    # order keeps per-query times comparable round over round.
    from sqldataintegrationfunctiontriggerapp_spark import plans
    # Optional subset for spot-benches at other scale factors (e.g. the sf1
    # scaling table in COVERAGE.md): SPARK_GRAFT_BENCH_QUERIES="q1,q7",
    # validated against the registry above BEFORE session startup. The
    # driver's per-round run sets no filter and measures the full suite.
    selected = (
        {n: plans.QUERIES[n] for n in wanted} if only else plans.QUERIES
    )
    for name, fn in selected.items():
        if sampling:
            baseline = storage_bytes(spark)
            with peak_lock:
                peak_holder["epoch"] += 1
                peak_holder["peak"] = baseline
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        if not sampling:
            # still independent-measured: drop persisted intermediates, but
            # skip every storage read / ledger call on the timed path
            spark.catalog.clearCache()
            print(f"# {name}: {dt:.2f}s", file=sys.stderr)
            continue
        peak_mb = max(peak_holder["peak"], storage_bytes(spark)) / (1 << 20)
        storage_peaks[name] = round(peak_mb, 1)
        # operators may persist() intermediates (e.g. shingle tables); drop
        # them so queries are measured independently and the driver heap
        # doesn't fill with dead caches as the suite progresses
        spark.catalog.clearCache()
        # stage ledger: evict LRU shared-stage checkpoints past the
        # storage budget (query boundary -- nothing in-flight references
        # them), keeping long-suite residency bounded
        ledger = stage_ledger_tick(spark)
        evict_note = (
            f" evicted={ledger['evicted']}" if ledger["evicted"] else ""
        )
        if ledger.get("disk_bytes"):
            evict_note += f" disk={ledger['disk_bytes'] / (1 << 20):.0f}MB"
        print(
            f"# {name}: {dt:.2f}s peak={peak_mb:.0f}MB"
            f" resident={ledger['global_bytes'] / (1 << 20):.0f}MB"
            f"{evict_note}",
            file=sys.stderr,
        )

    peak_holder["stop"] = True
    probe_post = _calibration_probe(spark)
    print(f"# calibration probe (post): {probe_post:.2f}s", file=sys.stderr)
    payload = {
        "metric": "suite_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "storage_peak_mb": storage_peaks,
        # host-speed calibration pair (VERDICT r14 #2): fixed workload, so
        # cross-round ratios of these values measure the HOST, not the code
        "probe_sec_pre": probe_pre,
        "probe_sec_post": probe_post,
    }
    line = json.dumps(payload)
    # The driver's BENCH_r{N}.json keeps only a ~2 KB tail of stdout, which
    # truncates a 100-query timings dict mid-stream (r01/r02 both lost ~30
    # queries from round-over-round comparison -- VERDICT r02 #8). Persist
    # the complete JSON next to the repo so the full suite is always
    # readable regardless of the driver's capture window.
    # subset spot-benches and --no-ledger-sampling A/B runs must not
    # clobber the canonical full-suite record (which carries the peaks)
    if not only and sampling:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_FULL.json"), "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    os.write(real_stdout_fd, (line + "\n").encode())
    os.close(real_stdout_fd)


if __name__ == "__main__":
    main()
