"""Interleaved fresh-driver A/B of the window-protocol commits (VERDICT r17
item 1): run bench.py --only over the store family from two checkouts,
alternating A,B,A,B..., each invocation a FRESH driver with --repeat 3
(median within one driver absorbs GC noise; interleaving absorbs slow host
drift).  Prints the per-query medians per invocation and the cross-
invocation medians per side.

Usage: python scripts/ab_store_family.py <dirA> <dirB> [rounds] [--queries q...]
"""
import json
import os
import statistics
import subprocess
import sys

QUERIES = [
    "windows_streaming_store",
    "curriculum_windows_from_store",
    "epoch_plan_from_store",
    "corpus_ingest_streaming",
]


def run_once(repo: str, queries, repeat=3):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    out = subprocess.run(
        [sys.executable, "bench.py", "--only", *queries, "--repeat", str(repeat)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800,
    )
    lines = [ln for ln in out.stdout.strip().split("\n") if ln.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise RuntimeError(f"no JSON from {repo}")
    return json.loads(lines[0])["queries"]


def main():
    args = [a for a in sys.argv[1:]]
    queries = QUERIES
    if "--queries" in args:
        i = args.index("--queries")
        queries = args[i + 1:]
        args = args[:i]
    a, b = args[0], args[1]
    rounds = int(args[2]) if len(args) > 2 else 2
    acc = {a: {q: [] for q in queries}, b: {q: [] for q in queries}}
    for r in range(rounds):
        for side in (a, b):
            res = run_once(side, queries)
            for q in queries:
                if q in res:
                    acc[side][q].append(res[q])
            print(f"round {r} {side}: " + json.dumps(res))
    print("\n=== cross-invocation medians ===")
    for q in queries:
        ma = statistics.median(acc[a][q]) if acc[a][q] else None
        mb = statistics.median(acc[b][q]) if acc[b][q] else None
        ratio = (ma / mb) if ma and mb else None
        print(f"{q}: A={ma} B={mb} A/B={ratio and round(ratio, 3)}")


if __name__ == "__main__":
    main()
