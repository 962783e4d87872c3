"""Attribute streaming_throttle_parity's sf1 cost (VERDICT r09 #6: 3.06 s
at sf0.1 -> 14.23 s at sf1, a 4.7x ratio -- the worst in the scaling
table). Decomposes one parity run into additive stages, each through the
REAL _staged_replay harness at the same state-partition count:

  staging     _staged_events_dir build: two coalesce(1) single-task
              parquet encodes of the time-split halves (paid once per
              session; the sweep's first streaming query carries it)
  A passthru  readStream -> select -> memory sink, append: file source +
              2 micro-batches + JVM-only sink of every event row
  B noop      applyInPandasWithState that consumes Arrow input, keeps a
              1-scalar state, emits ZERO rows: A + key shuffle + Arrow
              transfer in + per-key state-store commits
  C fused     fused_stats_throttle (the registered query's op): B + the
              per-key gap/stats walks + Arrow out + driver memory sink
              of the stats+emit rows

B - A ~ shuffle + Arrow-in + state machinery; C - B ~ Python walk +
output path. Each stage runs twice, second (warm) time reported.

Usage: python tools/profile_throttle_parity.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql.streaming.state import (  # noqa: E402
    GroupState,
    GroupStateTimeout,
)

from sqldataintegrationfunctiontriggerapp_spark.plans import windows as W  # noqa: E402
from sqldataintegrationfunctiontriggerapp_spark.session import get_session  # noqa: E402
from sqldataintegrationfunctiontriggerapp_spark.streaming import (  # noqa: E402
    stateful as S,
)


def _noop_state(stream):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for b in pdfs:
            n += len(b)
        state.update((n,))
        yield pd.DataFrame({"key": [], "emitted_ts": []})

    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="key string, emitted_ts timestamp",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def timed2(fn):
    fn()
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/repo/.localdata/sf1"
    spark = get_session()

    t0 = time.time()
    src_dir, _schema = W._staged_events_dir(spark, sf_dir)
    t_stage = time.time() - t0
    n_events = spark.read.parquet(src_dir).count()
    print(f"staging: {t_stage:.1f}s ({n_events} events, 2 time-split files)")

    _, t_a = timed2(
        lambda: W._staged_replay(
            spark, sf_dir, sink="prof_passthru", output_mode="append",
            transform=lambda s: s.select("user_id", "ts", "value"),
        ).count()
    )
    print(f"A passthrough (no state, JVM sink of all rows): {t_a:.1f}s")

    _, t_b = timed2(
        lambda: W._staged_replay(
            spark, sf_dir, sink="prof_noop", output_mode="update",
            transform=_noop_state,
        ).count()
    )
    print(f"B noop state (+shuffle +Arrow-in +state commits): {t_b:.1f}s "
          f"(delta vs A: {t_b - t_a:+.1f}s)")

    rows, t_c = timed2(
        lambda: W._staged_replay(
            spark, sf_dir, sink="prof_fused", output_mode="update",
            transform=lambda s: S.fused_stats_throttle(
                s.select("user_id", "ts", "value"),
                key_col="user_id",
                min_gap_seconds=6 * 3600,
            ),
        ).count()
    )
    print(f"C fused walk (+per-key walks +Arrow-out +sink {rows} rows): "
          f"{t_c:.1f}s (delta vs B: {t_c - t_b:+.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
