"""Round-over-round bench comparison: diff two BENCH_FULL.json payloads
(paths or git revs) and print totals on the shared query set plus every
mover beyond a ratio threshold -- the check each round's closing bench
runs by hand otherwise.

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
    old, new = load(pos[0])["queries"], load(pos[1])["queries"]
    shared = sorted(k for k in new if k in old)
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    print(f"shared {len(shared)} queries: {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old - 1:+.1%})")
    added = sorted(k for k in new if k not in old)
    gone = sorted(k for k in old if k not in new)
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{k}={new[k]:.2f}s" for k in added))
    if gone:
        print(f"removed ({len(gone)}): {', '.join(gone)}")
    movers = [
        (new[k] / max(old[k], 1e-9), k)
        for k in shared
        if new[k] > ratio * old[k] and new[k] > floor
    ]
    improved = [
        (old[k] / max(new[k], 1e-9), k)
        for k in shared
        if old[k] > ratio * new[k] and old[k] > floor
    ]
    for r, k in sorted(movers, reverse=True):
        print(f"  SLOWER {r:.1f}x  {k}: {old[k]:.2f}s -> {new[k]:.2f}s")
    for r, k in sorted(improved, reverse=True):
        print(f"  faster {r:.1f}x  {k}: {old[k]:.2f}s -> {new[k]:.2f}s")
    if not movers:
        print(f"no regressions > {ratio}x (floor {floor}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
