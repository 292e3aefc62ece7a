"""x1/x10/x30 ramp of the persisted IVFADC probe path (VERDICT r8 task 7).

The claim to pin: probe cost follows PROBED-CELL bytes only.  The ramp
holds the per-cell population constant — corpus scales s×, coarse_k scales
s× (16 → 160 → 480), so each cell holds the same ~n/16 vectors — and holds
the query count and nprobe fixed.  A probe that only reads its nprobe cell
directories then does the same work at every scale: wall time and
bytes-read should both stay FLAT while the index underneath grows 30×.

Bytes come from the Spark UI REST API (inputBytes summed over stages newer
than a per-run stage-id watermark — the scale_ramp.py eviction-safe
pattern).  The rerank pass reads the corpus table through the bounded
``isin`` shortlist literal (similarity._exact_rerank), so its bytes follow
the shortlist's row groups, not the table — the r9 fix this ramp verifies;
the r8 shape (full-corpus scan + broadcast join) measured ~linear
rerank bytes and motivated it.

Usage: python scripts/ramp_ivfpq_probe.py [--scales 1,10,30] [--repeat 3]
Prints one table row per scale; SCALING.md is updated by hand from it.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAMP_ROOT = "/tmp/scale_ramp"


def _stages(spark) -> list:
    import json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        return json.load(r)


def max_stage_id(spark) -> int:
    return max((s["stageId"] for s in _stages(spark)), default=-1)


def io_after(spark, watermark: int) -> tuple[int, int]:
    inp = sh = 0
    for s in _stages(spark):
        if s["stageId"] > watermark:
            inp += s.get("inputBytes", 0)
            sh += s.get("shuffleWriteBytes", 0)
    return inp, sh


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--rerank", type=int, default=32)
    ap.add_argument("--filtered", action="store_true",
                    help="probe with a 50%%-selectivity candidate set "
                         "(vec_id %% 2 = 0): pins that the filter semi-join "
                         "adds only a narrow metadata-column scan, not "
                         "vector/code bytes")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from cassandra_util_spark.core.session import get_spark
    from cassandra_util_spark.sources.ivf_index import (
        probe_ivfpq_index,
        write_ivfpq_index,
    )
    from scale_ramp import build_ramp  # reuses the cached /tmp replicas

    spark = get_spark(
        "ramp-ivfpq",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for s in scales:
        sf_dir = build_ramp(spark, s)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        idx = os.path.join(RAMP_ROOT, f"ivfpq_x{s}")
        marker = os.path.join(idx, "_DONE")
        coarse_k = 16 * s
        if not os.path.exists(marker):
            t0 = time.monotonic()
            write_ivfpq_index(emb, idx, coarse_k=coarse_k, refine_iters=0)
            open(marker, "w").close()
            print(f"index x{s} (coarse_k={coarse_k}) built in "
                  f"{time.monotonic() - t0:.1f}s", file=sys.stderr)
        # fixed probe load: 3 base-replica queries at every scale
        q = emb.filter(F.col("vec_id") < 3)
        q.cache().count()
        cand = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id") if args.filtered else None
        times, inputs, shuffles = [], [], []
        for _ in range(args.repeat):
            wm = max_stage_id(spark)
            t0 = time.monotonic()
            probe_ivfpq_index(
                spark, idx, q, corpus=emb, k=10,
                nprobe=args.nprobe, rerank=args.rerank, candidates=cand,
            ).write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
            inp, sh = io_after(spark, wm)
            inputs.append(inp)
            shuffles.append(sh)
        codes_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(os.path.join(idx, "codes"))
            for f in fs
        )
        rows.append({
            "scale": s,
            "coarse_k": coarse_k,
            "corpus_rows": emb.count(),
            "codes_mb": round(codes_bytes / 1e6, 1),
            "probe_sec": round(statistics.median(times), 2),
            "input_mb": round(statistics.median(inputs) / 1e6, 2),
            "shuffle_mb": round(statistics.median(shuffles) / 1e6, 2),
        })
        print(rows[-1], file=sys.stderr)
    print("| scale | coarse_k | corpus rows | codes MB | probe sec | input MB | shuffle MB |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| x{r['scale']} | {r['coarse_k']} | {r['corpus_rows']} | "
              f"{r['codes_mb']} | {r['probe_sec']} | {r['input_mb']} | {r['shuffle_mb']} |")
    spark.stop()


if __name__ == "__main__":
    main()
