"""Ramp-scale bench mode (VERDICT r17 item 6): the 12-slowest queries on
the x10 replica set at 32 vs 8 cores, so "scales with cores" claims are
measurable — at sf0.1 every table is 1-2 scan partitions and the whole
bench is core-count-invariant (all r17 scaling ratios ≈ 1), which makes
guide-§2/§3 wins invisible.  The x10 set (scale_ramp.py's seeded replicas:
duplicate structure linear, content token spaces disjoint) is big enough
for the parallel stages to actually fan out.

Each (query-set, core-count) run is a FRESH bench.py driver (the same
methodology the round driver uses), sequential so drivers never share the
host.  Output: a markdown ratio table on stdout — paste into
OPTIMIZATION_r<n>.md.

Usage: python scripts/ramp_bench.py [--scale 10] [--repeat 1]
                                    [--queries q1 q2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the r17 driver's 12-slowest (PERF_r17 top-12), the default target set
TOP12 = [
    "packed_shard_manifest",
    "curriculum_windows_from_store",
    "windows_doc_lookup",
    "corpus_ingest_streaming",
    "windows_store_decode_roundtrip",
    "windows_streaming_store",
    "epoch_plan_from_store",
    "tokenizer_streaming_encode",
    "tokenizer_coverage_drift",
    "bpe_streaming_encode",
    "training_corpus_assembly",
    "manifest_incremental_totals",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--queries", nargs="*", default=TOP12)
    args = ap.parse_args()

    # build (or reuse) the replica set with a dedicated short-lived driver
    from cassandra_util_spark.core.session import get_spark

    import scale_ramp  # noqa: E402 — sibling script

    spark = get_spark("ramp-bench-build", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    ramp_dir = scale_ramp.build_ramp(spark, args.scale)
    spark.stop()
    print(f"ramp dir: {ramp_dir}", file=sys.stderr)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results: dict[int, dict[str, float]] = {}
    for cpus in (32, 8):
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=ramp_dir,
            SPARK_GRAFT_CPUS=str(cpus),
        )
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(repo, "bench.py"),
                "--repeat",
                str(args.repeat),
                "--only",
                *args.queries,
            ],
            env=env,
            capture_output=True,
            text=True,
            cwd=repo,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        parsed = json.loads(line)
        results[cpus] = parsed["queries"]
        print(f"cpus={cpus}: total {parsed['value']}s", file=sys.stderr)

    print(f"\n| query | 32-core s | 8-core s | 8c/32c ratio |")
    print("|---|---|---|---|")
    for q in sorted(args.queries, key=lambda q: -results[32].get(q, 0)):
        t32, t8 = results[32].get(q), results[8].get(q)
        if t32 is None or t8 is None:
            continue
        print(f"| {q} | {t32:.2f} | {t8:.2f} | {t8 / max(t32, 1e-9):.2f} |")


if __name__ == "__main__":
    main()
