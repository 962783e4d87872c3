"""Per-stage execution metrics for one registered query (VERDICT r12 #4):
run the query to completion under a job group, then pull that job group's
stages from the Spark UI REST API and print the aggregated terms that can
name WHERE a deployment's wall-clock goes -- shuffle read/write bytes,
input bytes, executor run/deserialize CPU, JVM GC, task count.

Method notes:
- The session enables the UI just for this tool (the engine default is
  ui.enabled=false); the REST API is the only stable public surface for
  per-stage metrics.
- A warm pass runs first (same reason as bench.py: JVM one-time costs are
  deployment, not query, time); only the SECOND pass's job group is
  aggregated, so memoized session stages count at their steady-state cost
  (near zero) rather than their one-off build cost. Pass --cold to skip
  the warm pass and measure the build too.
- Works identically on local[N] and on a standalone cluster via
  SPARK_GRAFT_MASTER -- which is the point: run it both ways and diff.

Usage: python tools/stage_metrics.py QUERY [sf_dir] [--cold]
Prints one JSON line: {"query", "master", "wall_sec", "num_stages",
"num_tasks", "input_mb", "shuffle_read_mb", "shuffle_write_mb",
"executor_run_sec", "executor_deser_sec", "jvm_gc_sec",
"result_size_mb"}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cold = "--cold" in sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    qname = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    from sqldataintegrationfunctiontriggerapp_spark import plans
    from sqldataintegrationfunctiontriggerapp_spark.session import get_session

    if qname not in plans.QUERIES:
        print(f"unknown query {qname}", file=sys.stderr)
        return 2
    spark = get_session(
        app_name=f"stage_metrics_{qname}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    fn = plans.QUERIES[qname]
    if not cold:
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    group = f"measured_{qname}"
    sc.setJobGroup(group, qname)
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    sc.setJobGroup(None, None)

    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def get(path):
        with urllib.request.urlopen(f"{base}/{path}") as r:
            return json.load(r)

    stage_ids = set()
    for job in get("jobs"):
        if job.get("jobGroup") == group:
            stage_ids.update(job.get("stageIds", []))
    agg = {
        "numTasks": 0, "inputBytes": 0, "shuffleReadBytes": 0,
        "shuffleWriteBytes": 0, "shuffleLocalBytesRead": 0,
        "shuffleRemoteBytesRead": 0, "memoryBytesSpilled": 0,
        "diskBytesSpilled": 0, "executorRunTime": 0,
        "executorDeserializeTime": 0, "jvmGcTime": 0, "resultSize": 0,
    }
    n_stages = 0
    for st in get("stages?status=complete"):
        if st["stageId"] not in stage_ids:
            continue
        n_stages += 1
        for k in agg:
            agg[k] += int(st.get(k, 0) or 0)
    mb = 1024 * 1024
    out = {
        "query": qname,
        "master": sc.master,
        "sf_dir": sf_dir,
        "cold": cold,
        "wall_sec": round(wall, 2),
        "num_stages": n_stages,
        "num_tasks": agg["numTasks"],
        "input_mb": round(agg["inputBytes"] / mb, 1),
        "shuffle_read_mb": round(agg["shuffleReadBytes"] / mb, 1),
        "shuffle_write_mb": round(agg["shuffleWriteBytes"] / mb, 1),
        # the local-vs-cluster differentiator: local[N] reads every
        # shuffle block from the same process; a real cluster pays the
        # network/ser path for the remote fraction
        "shuffle_local_mb": round(agg["shuffleLocalBytesRead"] / mb, 1),
        "shuffle_remote_mb": round(agg["shuffleRemoteBytesRead"] / mb, 1),
        "spill_mem_mb": round(agg["memoryBytesSpilled"] / mb, 1),
        "spill_disk_mb": round(agg["diskBytesSpilled"] / mb, 1),
        "executor_run_sec": round(agg["executorRunTime"] / 1000, 1),
        "executor_deser_sec": round(agg["executorDeserializeTime"] / 1000, 1),
        "jvm_gc_sec": round(agg["jvmGcTime"] / 1000, 1),
        "result_size_mb": round(agg["resultSize"] / mb, 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
