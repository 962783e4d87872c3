"""Sustained streaming-ingest throughput through the DEPLOYED foreachBatch
path (VERDICT r14 #8): the reference's only implied performance number is
the CDC ingest ceiling (~100-200 rows/s/table, BASELINE.md -- a 5 s poll
interval against a batch-size-capped change feed); this measures the
engine's rows/s through the exact pipeline a user deploys
(streaming/pipeline.py ChangePipeline.foreach_batch: allowlist resolve ->
project -> JSON envelope -> executor-side chunked HTTP POST), so COVERAGE
can state the x-over-reference factor from a measurement instead of
rhetoric.

Method: the staged 2-file events replay (the same plans/windows.py stage
the parity queries use) streams with maxFilesPerTrigger=1 /
trigger(availableNow) into the pipeline wrapper against a live loopback
HTTP receiver (ThreadingHTTPServer; the reference POSTs to a remote Azure
Function -- loopback is the honest in-sandbox stand-in, stated as such).
Wall time runs from query start to drain; rows/s = delivered rows / wall.
The receiver count cross-checks that every row arrived exactly once (no
outage is injected here -- throughput, not recovery, is under test; the
recovery path is streaming_crash_recovery_parity's job).

The per-batch POST loop runs at the batch's parquet-split parallelism
(one task per staged file half at sf1 -- the honest SERIAL per-table rate,
matching the reference's serial per-table poll loop). A cluster multiplies
this by partition count; the serial rate is the conservative comparison.

Usage: python tools/bench_streaming_ingest.py [sf_dir]
       (default .localdata/sf1; generate with
        python tools/gen_sf1.py .localdata/sf1 --tables events)
"""

from __future__ import annotations

import http.server
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqldataintegrationfunctiontriggerapp_spark.config import EngineSettings
from sqldataintegrationfunctiontriggerapp_spark.session import get_session
from sqldataintegrationfunctiontriggerapp_spark.sinks.http_sink import HttpSink
from sqldataintegrationfunctiontriggerapp_spark.sources.changefeed import (
    with_operation,
)
from sqldataintegrationfunctiontriggerapp_spark.state import StateStore
from sqldataintegrationfunctiontriggerapp_spark.streaming.pipeline import (
    ChangePipeline,
)

# BASELINE.md: ~100-200 rows/s/table implied ceiling; compare against the
# GENEROUS end so the reported factor is conservative.
_REFERENCE_ROWS_PER_SEC = 200.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    if not os.path.isdir(os.path.join(sf_dir, "events.parquet")):
        raise SystemExit(
            f"{sf_dir}/events.parquet missing -- generate with"
            " python tools/gen_sf1.py .localdata/sf1 --tables events"
        )
    spark = get_session(app_name="bench_streaming_ingest")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    from sqldataintegrationfunctiontriggerapp_spark.plans.windows import (
        _staged_events_dir,
    )

    src_dir, schema = _staged_events_dir(spark, sf_dir)

    delivered = {"rows": 0, "posts": 0}
    lock = threading.Lock()

    class _Receiver(http.server.BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            # wire shape: JSON array of {"operation", "item"} documents
            # (sinks/http_sink.py post_payloads); count without keeping the
            # bodies so the receiver never becomes the memory bound
            n = len(json.loads(body))
            with lock:
                delivered["rows"] += n
                delivered["posts"] += 1
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Receiver)
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    settings = EngineSettings(
        http_base_url=f"http://127.0.0.1:{srv.server_address[1]}",
        allowed_columns={"events": "Event_Type,Value,USER_ID"},
    )
    state_dir = tempfile.mkdtemp(prefix="ingest_bench_state_")
    ckpt_dir = tempfile.mkdtemp(prefix="ingest_bench_ckpt_")
    st = StateStore(spark, state_dir)
    sink = HttpSink(base_url=settings.http_base_url, sleeper=lambda _s: None)
    pipe = ChangePipeline(settings=settings, state=st, sink=sink)

    n_rows = spark.read.schema(schema).parquet(src_dir).count()
    t0 = time.time()
    q = (
        with_operation(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        .writeStream.foreachBatch(pipe.foreach_batch("events"))
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    srv.shutdown()

    if delivered["rows"] != n_rows:
        raise SystemExit(
            f"delivery mismatch: {delivered['rows']} rows arrived,"
            f" fixture has {n_rows}"
        )
    rate = n_rows / wall
    print(json.dumps({
        "metric": "streaming_ingest_rows_per_sec",
        "value": round(rate, 1),
        "rows": n_rows,
        "wall_sec": round(wall, 2),
        "posts": delivered["posts"],
        "sf_dir": sf_dir,
        "x_over_reference": round(rate / _REFERENCE_ROWS_PER_SEC, 1),
        "reference_rows_per_sec": _REFERENCE_ROWS_PER_SEC,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
