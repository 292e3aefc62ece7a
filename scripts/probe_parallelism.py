"""Probe: sample active-task concurrency while a query executes — answers
"why is the x100 ramp core-count-invariant?" (§9).  A sampler thread polls
the status tracker every 100 ms and records the distribution of
concurrently-active tasks; if the p95 sits near 1-2 on a 32-core master,
the wall time is sequential protocol actions / single-task stages, not
parallel compute.

Usage: SPARK_GRAFT_SF_DIR=/tmp/scale_ramp/x100 python scripts/probe_parallelism.py <query>
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_util_spark.core.session import get_spark
from cassandra_util_spark.entry_queries import QUERIES

name = sys.argv[1]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe-parallelism")
spark.sparkContext.setLogLevel("ERROR")
tracker = spark.sparkContext.statusTracker()

samples: list[int] = []
stop = threading.Event()


def sampler():
    while not stop.is_set():
        active = 0
        for sid in tracker.getActiveStageIds():
            info = tracker.getStageInfo(sid)
            if info:
                active += info.numActiveTasks
        samples.append(active)
        time.sleep(0.1)


t = threading.Thread(target=sampler, daemon=True)
t.start()
t0 = time.monotonic()
df = QUERIES[name](spark, sf_dir)
t_build = time.monotonic()
df.write.format("noop").mode("overwrite").save()
t_exec = time.monotonic()
stop.set()
t.join()

samples.sort()
n = len(samples)


def pct(p):
    return samples[min(n - 1, int(p * n))] if n else 0


busy = [s for s in samples if s > 0]
print(
    f"{name}: build+fixture={t_build - t0:.1f}s exec={t_exec - t_build:.1f}s "
    f"samples={n} idle%={100 * (n - len(busy)) / max(n, 1):.0f} "
    f"p50={pct(0.50)} p90={pct(0.90)} p99={pct(0.99)} max={samples[-1] if n else 0}"
)
