"""Window-plan audit: for every registered query whose physical plan
contains a WindowExec, report whether Catalyst also planned a
WindowGroupLimit (the map-side per-group top-k pre-prune that bounds a
hot group's shuffle volume to maps·k rows).

Reading the output: a Window WITHOUT a group limit is fine when it is
(a) not a rank filter at all (lag/lead, running sums, ntile, percentile
frames), or (b) a rank ASSIGNMENT over a frame already bounded by
construction (``orderBy().limit(k)`` → TakeOrderedAndProject feeding the
window — the skew_report / bm25 / rp-rerank shape).  What this audit
exists to catch is the third case: a rank ≤ k FILTER over an unbounded
per-group window that Catalyst failed to push down — the single-task
hot-group bottleneck.  r13 final audit: zero such cases across 194
queries — 25 no-WGL windows, every one triaged as (a) or (b).  The r12
additions are all (a): corpus_budget_cut / mixture_budget_execution
carry running-sum windows (per-bucket / per-source prefix sums, no rank
filter) and dedup_token_spans' islands row_number is a rank ASSIGNMENT
feeding integer arithmetic, never filtered; the five r13 additions are
likewise (a) — the token-span trio reuses the islands rank-assignment
shape, and tokenized_packing_plan / packed_training_windows carry only
distributed_cumsum's per-bucket running sums (partitioned by __pid, N
parallel groups, no rank filter).  The grouped samplers' pushdown is
pinned in tests/test_weighted_logcost.py.  r14 final audit: 29 no-WGL
windows, all (a) or (b) — the five r14 additions are all (a):
packed_window_attribution / packed_shard_manifest /
manifest_incremental_totals / windowed_loss_masks carry only the
distributed_cumsum running sums of the windows chain they share, and
curriculum_stage_schedule's per-(stage, shard) row_number is a rank
ASSIGNMENT (the loader position), never filtered.

A planner fact worth knowing (measured on Spark 4.1): an EMPTY partition
spec (bare global window) does NOT trigger InferWindowGroupLimit, but
the non-foldable ``constant_partition_key`` treatment
(functions/windows.py, r11) DOES — the WARN-silencing change was also a
plan improvement wherever a global rank filter exists.

Usage: python scripts/window_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from cassandra_util_spark.core.session import get_spark

    spark = get_spark("window-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in e.queries().items():
        if "streaming" in name or name.startswith("stream_"):
            continue  # streaming queries execute side effects on build
        try:
            plan = (
                fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as ex:  # noqa: BLE001 — audit must survive one bad query
            rows.append((name, -1, -1, str(ex)[:60]))
            continue
        n_win = plan.count("Window [")
        n_wgl = plan.count("WindowGroupLimit")
        if n_win or n_wgl:
            rows.append((name, n_win, n_wgl, ""))
    print(f"{'query':40} {'windows':>8} {'grouplimit':>10}")
    for name, w, g, err in rows:
        print(f"{name:40} {w:>8} {g:>10}  {err}")
    no_wgl = [n for n, w, g, err in rows if w > 0 and g == 0 and not err]
    print(f"\nwindows without group limit ({len(no_wgl)}) — triage each as "
          f"(a) non-rank window or (b) bounded-by-construction frame:")
    for n in no_wgl:
        print(f"  {n}")
    spark.stop()


if __name__ == "__main__":
    main()
