"""Multi-PROCESS writer drill for the locked stores (VERDICT r6 task 6).

The manifest-lock tests elsewhere interleave writers inside one process
(threads / injected callbacks).  This drill is the real thing: two
independent OS processes — separate Python interpreters, separate JVMs,
separate SparkSessions — append counter-delta runs to ONE store directory
while the pytest process (a third OS process) runs fold compactions
concurrently.  The lock under test is the O_CREAT|O_EXCL manifest lockfile
(``RunStore.locked``, sources/runs.py:106-140) and the live-set re-read in
``append_run`` / ``CounterStore.compact`` — the mechanisms that keep a
compaction's manifest swap from dropping a run another PROCESS published
mid-fold.

Assertions: no lost run (every key's total equals writers x runs x delta —
addition is the witness, a dropped delta run shows up as a missing unit)
and no double count (each writer retries one IDEMPOTENT named append; the
retry must fold in exactly once).

Reference anchor: concurrent counter sub-batches merged server-side without
read-modify-write, CQLBatch.scala:190-218 and 284-336.
"""

import os
import subprocess
import sys
import textwrap

from pyspark.sql import functions as F  # noqa: F401  (spark fixture import side)
import pytest

WRITER_SCRIPT = textwrap.dedent(
    """
    import sys, time
    sys.path.insert(0, "/root/repo")
    store_root, writer_id = sys.argv[1], sys.argv[2]
    from cassandra_util_spark.core.session import get_spark
    from cassandra_util_spark.operators.counters import CounterStore

    spark = get_spark(
        f"mp-writer-{writer_id}", master="local[2]", shuffle_partitions=2
    )
    cs = CounterStore(store_root, keys=["k"], counters=["hits"])
    delta = spark.createDataFrame([(k, 1.0) for k in range(10)], "k bigint, hits double")
    for i in range(5):
        cs.append_increments(delta)          # uuid-named: collision-free
        time.sleep(0.05)                     # let the compactor interleave
    # idempotent retry: the SAME named run published twice lands once
    cs.append_increments(delta, name=f"retry-{writer_id}")
    cs.append_increments(delta, name=f"retry-{writer_id}")
    spark.stop()
    print("WRITER-DONE", writer_id)
    """
)


@pytest.mark.slow
def test_two_process_writers_survive_concurrent_compaction(spark, tmp_path):
    from cassandra_util_spark.operators.counters import CounterStore

    store_root = str(tmp_path / "mp-counters")
    cs = CounterStore(store_root, keys=["k"], counters=["hits"])
    script = tmp_path / "writer.py"
    script.write_text(WRITER_SCRIPT)

    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), store_root, wid],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
        )
        for wid in ("a", "b")
    ]

    # third process (this one) folds whatever is live while writers append;
    # every cycle exercises the locked swap against foreign-process appends
    import time

    compactions = 0
    while any(p.poll() is None for p in procs):
        if len(cs.store.live_runs()) >= 2:
            cs.compact(spark)
            compactions += 1
        else:
            time.sleep(0.1)
    outs = [p.communicate()[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert all("WRITER-DONE" in o for o in outs), outs
    assert compactions > 0, "drill never overlapped a compaction with the writers"
    # final fold after the dust settles, then the invariant: 2 writers x
    # (5 uuid runs + 1 idempotent named run) x delta 1.0 = 12.0 per key —
    # a lost run reads < 12, a double-applied retry reads > 12
    cs.compact(spark)
    totals = {r["k"]: r["hits"] for r in cs.totals(spark).collect()}
    assert totals == {k: 12.0 for k in range(10)}, totals
    # and the retry names folded without duplication: manifest never holds
    # two runs of the same name
    live = cs.store.live_runs()
    assert len(live) == len(set(live))
