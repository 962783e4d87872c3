"""Streaming-state partitioning-invariance evidence (VERDICT r08 #7): the
stateful parity harness runs its replay at 8 state partitions with a
documented claim that keyed state / hash aggregation make results
partition-count-invariant. This converts the claim to evidence: run the two
stateful parities at 8 AND at 32 state stores (SPARK_GRAFT_STATE_PARTITIONS
override) in SEPARATE processes (the fused replay is session-memoized, so a
same-process rerun would not re-execute) and compare canonical result
hashes.

Usage: python tools/check_state_partitions.py [sf_dir]
       (default /root/repo/.localdata/sf1 -- the 10x fixture)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import hashlib, math, sys
sys.path.insert(0, __REPO__)
from sqldataintegrationfunctiontriggerapp_spark import plans
from sqldataintegrationfunctiontriggerapp_spark.session import get_session

spark = get_session()
for name in ("streaming_throttle_parity", "streaming_entity_stats_parity"):
    df = plans.QUERIES[name](spark, __SF_DIR__)
    cols = sorted(df.columns)
    rows = []
    for r in df.collect():
        vals = []
        for c in cols:
            v = r[c]
            vals.append("NaN" if isinstance(v, float) and math.isnan(v)
                        else repr(v) if isinstance(v, float) else str(v))
        rows.append("\x1f".join(vals))
    digest = hashlib.md5("\x1e".join(sorted(rows)).encode()).hexdigest()
    print(f"RESULT {name} {len(rows)} {digest}")
"""


def run(parts: str, sf_dir: str) -> dict[str, tuple[str, str]]:
    env = dict(
        os.environ,
        SPARK_GRAFT_STATE_PARTITIONS=parts,
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"),
    )
    child = CHILD.replace("__REPO__", repr(REPO)).replace(
        "__SF_DIR__", repr(sf_dir)
    )
    out = subprocess.run(
        [sys.executable, "-c", child],
        env=env, cwd=REPO, check=True, capture_output=True, text=True,
    ).stdout
    res = {}
    for line in out.splitlines():
        if line.startswith("RESULT "):
            _, name, nrows, digest = line.split()
            res[name] = (nrows, digest)
    return res


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".localdata", "sf1"
    )
    a = run("8", sf_dir)
    b = run("32", sf_dir)
    ok = True
    for name in sorted(set(a) | set(b)):
        ra, rb = a.get(name), b.get(name)
        match = ra == rb and ra is not None
        ok &= match
        print(f"{name}: 8-part {ra} vs 32-part {rb} -> "
              f"{'MATCH' if match else 'MISMATCH'}")
    print("partitioning-invariance:", "HOLDS" if ok else "VIOLATED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
