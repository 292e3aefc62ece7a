"""Pre-snapshot staleness gate (VERDICT r7 task 1): every committed round
artifact must cover the FULL query registry.  Round 7 registered 11 queries
after its final artifact sweep, so ORACLE_LOCAL.json / COVERAGE.md /
BENCH_FULL.json / PLANS.md silently lagged the registry — exactly how an
unnoticed regression would someday slip through.  This script fails loudly
when any artifact's query count differs from ``len(QUERIES)``, and is run
(and committed green) as the last step before the round snapshot.

Usage: python scripts/release_check.py        # exit 0 iff all artifacts sync
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    n = len(qs)
    problems: list[str] = []

    if set(oracles) - set(qs):
        problems.append(f"oracles without queries: {sorted(set(oracles) - set(qs))}")

    # ORACLE_LOCAL.json: one result per registered query, zero failures
    try:
        with open(os.path.join(ROOT, "ORACLE_LOCAL.json")) as f:
            local = json.load(f)
        missing = sorted(set(qs) - set(local["results"]))
        if missing:
            problems.append(f"ORACLE_LOCAL.json missing {len(missing)}: {missing[:8]}")
        if local.get("failures"):
            problems.append(f"ORACLE_LOCAL.json records {local['failures']} failures")
    except FileNotFoundError:
        problems.append("ORACLE_LOCAL.json absent")

    # COVERAGE.md: the generated table must have one row per query
    try:
        with open(os.path.join(ROOT, "COVERAGE.md")) as f:
            cov = f.read()
        rows = re.findall(r"^\| \d+ \| `([^`]+)`", cov, re.M)
        missing = sorted(set(qs) - set(rows))
        if missing:
            problems.append(f"COVERAGE.md missing {len(missing)}: {missing[:8]}")
    except FileNotFoundError:
        problems.append("COVERAGE.md absent")

    # BENCH_FULL.json: every bench.py query timed (the bench set is the
    # registry minus explicitly-excluded streaming/setup-heavy entries)
    try:
        from bench import BENCH_QUERIES

        with open(os.path.join(ROOT, "BENCH_FULL.json")) as f:
            bench = json.load(f)
        timed = set(bench["queries"])
        missing = sorted(set(BENCH_QUERIES) - timed)
        if missing:
            problems.append(f"BENCH_FULL.json missing {len(missing)}: {missing[:8]}")
        unbenched = sorted(set(qs) - set(BENCH_QUERIES))
        # unbenched queries must be a deliberate, documented exclusion
        allowed = {
            n for n in unbenched
            if n in getattr(sys.modules.get("bench"), "BENCH_EXCLUDED", ())
        }
        undocumented = [n for n in unbenched if n not in allowed]
        if undocumented:
            problems.append(
                f"queries neither benched nor in bench.BENCH_EXCLUDED "
                f"({len(undocumented)}): {undocumented[:8]}"
            )
    except FileNotFoundError:
        problems.append("BENCH_FULL.json absent")

    # PLANS.md: one audited row per query
    try:
        with open(os.path.join(ROOT, "PLANS.md")) as f:
            plans = f.read()
        rows = set(re.findall(r"^\| ([A-Za-z0-9_]+) \|", plans, re.M))
        missing = sorted(set(qs) - rows)
        if missing:
            problems.append(f"PLANS.md missing {len(missing)}: {missing[:8]}")
    except FileNotFoundError:
        problems.append("PLANS.md absent")

    if problems:
        print(f"RELEASE CHECK FAILED against registry of {n} queries:")
        for p in problems:
            print(" -", p)
        return 1
    print(f"RELEASE CHECK OK: all artifacts cover the {n}-query registry")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
