"""Round-over-round bench comparison: per-query deltas between two
BENCH_r{N}.json files, flagging regressions.

Usage: python scripts/bench_diff.py BENCH_r01.json BENCH_r02.json [ratio]

A query is flagged when new/old exceeds ``ratio`` (default 1.5) and the
absolute growth is > 0.3s (sub-second queries jitter with JVM load).
Exit code 0 always — this is a report, not a gate; the correctness gate
is scripts/check_oracle.py.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    """Accept bench.py's raw JSON output (since round 5: the FULL map line
    followed by a compact tail line — take the line with the most queries),
    BENCH_FULL.json (indented single object), or the driver's
    BENCH_r{N}.json wrapper (which nests the line under 'parsed')."""
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        # line-delimited capture: pick the parseable line with most queries
        best: dict = {}
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if len(cand.get("queries", {})) >= len(best.get("queries", {})):
                best = cand
        d = best
    if "queries" not in d and "parsed" in d:
        p = d["parsed"]
        d = p if isinstance(p, dict) else json.loads(p.replace("'", '"'))
    return d["queries"]


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = _load(sys.argv[1])
    new = _load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    flagged = []
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None:
            print(f"{name:34s} {'—':>8s} {n:8.3f}     new")
        elif n is None:
            print(f"{name:34s} {o:8.3f} {'—':>8s} removed")
        else:
            r = n / o if o else float("inf")
            mark = ""
            if r > ratio and n - o > 0.3:
                mark = "  <-- REGRESSION"
                flagged.append(name)
            print(f"{name:34s} {o:8.3f} {n:8.3f} {r:6.2f}x{mark}")
    common = [q for q in old if q in new]
    t_old, t_new = sum(old[q] for q in common), sum(new[q] for q in common)
    print(f"\ncommon-query total: {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old if t_old else 0:.2f}x); flagged: {flagged or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
