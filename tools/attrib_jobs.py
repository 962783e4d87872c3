"""Per-JOB wall-time attribution for one registered query (VERDICT r15 #1:
"instrument which jobs the entry actually runs in-suite").

Runs optional WARM queries first (comma list -- emulates the in-suite state
where earlier family members have already built the shared session stages),
then runs the TARGET under a job group and prints one line per Spark job it
submitted: job id, wall seconds, #tasks and the job description / callsite.
The sum of job walls vs the query wall separates executor time from
driver-side gaps (plan compile, py4j, collects).

Usage:
  python tools/attrib_jobs.py TARGET [--warm=q1,q2] [--sf=/root/testdata/sf0.1]
  python tools/attrib_jobs.py TARGET --repeat=2   # second pass = stages hot
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
    opts = dict(
        a[2:].split("=", 1) if "=" in a else (a[2:], "1")
        for a in sys.argv[1:]
        if a.startswith("--")
    )
    if not args:
        print(__doc__)
        return 2
    qname = args[0]
    sf_dir = opts.get("sf", os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    from sqldataintegrationfunctiontriggerapp_spark import plans
    from sqldataintegrationfunctiontriggerapp_spark.plans._util import (
        stage_ledger_tick,
    )
    from sqldataintegrationfunctiontriggerapp_spark.session import get_session

    spark = get_session(
        app_name=f"attrib_jobs_{qname}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    for w in [x for x in opts.get("warm", "").split(",") if x]:
        plans.QUERIES[w](spark, sf_dir).write.mode(
            "overwrite").format("noop").save()
        spark.catalog.clearCache()
        stage_ledger_tick(spark)

    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def get(path):
        with urllib.request.urlopen(f"{base}/{path}") as r:
            return json.load(r)

    for rep in range(int(opts.get("repeat", "1"))):
        group = f"attrib_{qname}_{rep}"
        sc.setJobGroup(group, qname)
        t0 = time.time()
        plans.QUERIES[qname](spark, sf_dir).write.mode(
            "overwrite").format("noop").save()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        jobs = [j for j in get("jobs") if j.get("jobGroup") == group]
        jobs.sort(key=lambda j: j["jobId"])
        tot = 0.0
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            jw = None
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                jw = (
                    datetime.strptime(comp.replace("GMT", ""), fmt[:-2])
                    - datetime.strptime(sub.replace("GMT", ""), fmt[:-2])
                ).total_seconds()
                tot += jw
            except Exception:
                pass
            desc = (j.get("description") or j.get("name") or "")[:110]
            print(
                f"  job {j['jobId']:>4} {jw if jw is not None else -1:7.2f}s"
                f" tasks={j.get('numTasks', 0):>5} {desc}",
                file=sys.stderr,
            )
        print(
            f"RESULT rep={rep} {qname}: wall={wall:.2f}s"
            f" n_jobs={len(jobs)} sum_job_wall={tot:.2f}s"
            f" driver_gap={wall - tot:.2f}s",
            flush=True,
        )
        spark.catalog.clearCache()
        stage_ledger_tick(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
