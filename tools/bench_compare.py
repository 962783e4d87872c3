"""Round-over-round bench comparison: diff two BENCH_FULL.json payloads
(paths or git revs) and print totals on the shared query set plus every
mover beyond a ratio threshold -- the check each round's closing bench
runs by hand otherwise.

r15 (VERDICT r14 #2): when BOTH payloads carry the fixed calibration-probe
pair (probe_sec_pre/probe_sec_post, written by bench.py), the NEW side's
per-query times are first divided by the host factor (mean probe ratio
NEW/OLD) and movers are flagged on the PROBE-ADJUSTED values -- so a
2-4x host-class swing (judge-confirmed between sessions) no longer drowns
genuine code movement or demands a worktree A/B. Raw totals are always
printed alongside; artifacts without probes fall back to raw comparison
with a note.

Usage: python tools/bench_compare.py OLD NEW [--ratio 1.5] [--floor 0.8]
       where OLD/NEW are file paths or git revs (e.g. HEAD~5 resolves
       HEAD~5:BENCH_FULL.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def load(ref: str) -> dict:
    if os.path.exists(ref):
        with open(ref) as f:
            return json.load(f)
    out = subprocess.run(
        ["git", "show", f"{ref}:BENCH_FULL.json"],
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out)


def main() -> int:
    # Consume flag+value pairs destructively first, then treat the remainder
    # as positionals (ADVICE r12: filtering positionals by string equality
    # with option VALUES misparses an arg that happens to equal the ratio,
    # and re-evaluating opt() with different defaults diverged from the
    # values actually used).
    args = sys.argv[1:]
    opts = {"--ratio": "1.5", "--floor": "0.8"}
    for name in opts:
        if name in args:
            i = args.index(name)
            if i + 1 >= len(args):
                print(__doc__)
                return 2
            opts[name] = args[i + 1]
            del args[i:i + 2]
    ratio = float(opts["--ratio"])
    floor = float(opts["--floor"])
    pos = args
    if len(pos) != 2:
        print(__doc__)
        return 2
    p_old, p_new = load(pos[0]), load(pos[1])
    old, new = p_old["queries"], p_new["queries"]

    def probe_of(payload: dict) -> float | None:
        vals = [payload.get("probe_sec_pre"), payload.get("probe_sec_post")]
        vals = [v for v in vals if isinstance(v, (int, float)) and v > 0]
        return sum(vals) / len(vals) if vals else None

    pr_old, pr_new = probe_of(p_old), probe_of(p_new)
    host = (pr_new / pr_old) if (pr_old and pr_new) else None
    if host is not None:
        print(f"calibration probe: {pr_old:.2f}s -> {pr_new:.2f}s "
              f"(host factor {host:.2f}x; movers are probe-adjusted)")
    else:
        print("calibration probe: absent on one side -- raw comparison "
              "(host drift NOT separated)")
        host = 1.0
    # probe-adjusted NEW times: what the new code would have measured on
    # the OLD host class
    adj = {k: v / host for k, v in new.items()}
    shared = sorted(k for k in new if k in old)
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    t_adj = sum(adj[k] for k in shared)
    print(f"shared {len(shared)} queries: {t_old:.1f}s -> {t_new:.1f}s raw "
          f"({t_new / t_old - 1:+.1%}); probe-adjusted {t_adj:.1f}s "
          f"({t_adj / t_old - 1:+.1%})")
    added = sorted(k for k in new if k not in old)
    gone = sorted(k for k in old if k not in new)
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{k}={new[k]:.2f}s" for k in added))
    if gone:
        print(f"removed ({len(gone)}): {', '.join(gone)}")
    movers = [
        (adj[k] / max(old[k], 1e-9), k)
        for k in shared
        if adj[k] > ratio * old[k] and adj[k] > floor
    ]
    improved = [
        (old[k] / max(adj[k], 1e-9), k)
        for k in shared
        if old[k] > ratio * adj[k] and old[k] > floor
    ]
    for r, k in sorted(movers, reverse=True):
        print(f"  SLOWER {r:.1f}x  {k}: {old[k]:.2f}s -> {adj[k]:.2f}s "
              f"adj ({new[k]:.2f}s raw)")
    for r, k in sorted(improved, reverse=True):
        print(f"  faster {r:.1f}x  {k}: {old[k]:.2f}s -> {adj[k]:.2f}s "
              f"adj ({new[k]:.2f}s raw)")
    if not movers:
        print(f"no probe-adjusted regressions > {ratio}x (floor {floor}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
