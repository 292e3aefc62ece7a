"""Measure ANN-routed semantic_decontamination vs the exact broadcast scan
(VERDICT r13 task 3): IVF over the train side, probe nprobe cells per eval
vector, exact-rerank candidates; compare the contaminated set + wall at
x10/x30 using the scale_ramp replicas and stage-watermark shuffle bytes."""
import os, sys, time, statistics
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from pyspark.sql import functions as F, Window

from cassandra_util_spark.core.session import get_spark
from cassandra_util_spark.operators.similarity import (
    semantic_decontamination, cosine, ivf_seeds, kmeans_refine, ivf_assign)

spark = get_spark("decon-ivf-ramp", extra_conf={
    "spark.ui.enabled": "true",
    "spark.ui.retainedStages": "100000",
    "spark.ui.retainedJobs": "100000",
})
spark.sparkContext.setLogLevel("ERROR")
from scale_ramp import build_ramp, max_stage_id, shuffle_bytes_after

THRESH = 0.40

def ivf_decon(train, ev, num_centroids=64, nprobe=8, refine_iters=2,
              round_digits=4):
    id_col, vec_col = "vec_id", "embedding"
    seeds = ivf_seeds(train, id_col, vec_col, num_centroids)
    centroids = kmeans_refine(train, seeds, id_col, vec_col,
                              refine_iters).localCheckpoint()
    assigned = ivf_assign(train, centroids, id_col, vec_col)
    cent = centroids.select(F.col(id_col).alias("cell"),
                            F.col(vec_col).alias("cent_vec"))
    q = ev.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("eval_id"), F.col(vec_col).alias("__qv"))
    qc = q.crossJoin(F.broadcast(cent)).withColumn(
        "cs", cosine(F.col("__qv"), F.col("cent_vec")))
    wq = Window.partitionBy("eval_id").orderBy(F.col("cs").desc(), F.col("cell").asc())
    probes = (qc.withColumn("__r", F.row_number().over(wq))
                .filter(F.col("__r") <= nprobe)
                .select("eval_id", "__qv", "cell"))
    scored = assigned.join(F.broadcast(probes), "cell").withColumn(
        "best_cosine", F.round(cosine(F.col("__qv"), F.col(vec_col)), round_digits))
    w = Window.partitionBy("eval_id").orderBy(
        F.col("best_cosine").desc(), F.col(id_col).asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("eval_id", F.col(id_col).alias("best_train_id"),
                    "best_cosine",
                    (F.col("best_cosine") >= THRESH).alias("contaminated")))

def run(df_fn, label):
    times, shufs, out = [], [], None
    for _ in range(2):
        wm = max_stage_id(spark)
        t0 = time.monotonic()
        out = {r["eval_id"]: (r["best_train_id"], r["best_cosine"], r["contaminated"])
               for r in df_fn().collect()}
        times.append(time.monotonic() - t0)
        shufs.append(shuffle_bytes_after(spark, wm))
    return statistics.median(times), statistics.median(shufs) / 1e6, out

for scale in (10, 30):
    d = build_ramp(spark, scale)
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    ev = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 1_000_000_000))
    tr = emb.join(ev.select("vec_id"), "vec_id", "left_anti")
    tr = tr.localCheckpoint()  # pin the anti-join out of both timed paths
    n_tr, n_ev = tr.count(), ev.count()
    t_ex, s_ex, exact = run(lambda: semantic_decontamination(
        tr, ev, "vec_id", "embedding", threshold=THRESH), "exact")
    for K, npb in ((64, 8), (256, 16)):
        t_iv, s_iv, ivf = run(lambda: ivf_decon(tr, ev, K, npb), f"ivf{K}/{npb}")
        ex_flag = {e for e, v in exact.items() if v[2]}
        iv_flag = {e for e, v in ivf.items() if v[2]}
        same_best = sum(1 for e in exact if ivf.get(e, (None,))[0] == exact[e][0])
        miss = ex_flag - iv_flag
        extra = iv_flag - ex_flag
        print(f"x{scale} train={n_tr} eval={n_ev} | exact {t_ex:.2f}s {s_ex:.1f}MB | "
              f"ivf K={K} nprobe={npb}: {t_iv:.2f}s {s_iv:.1f}MB "
              f"speedup={t_ex/t_iv:.2f}x | flagged exact={len(ex_flag)} "
              f"ivf={len(iv_flag)} missed={len(miss)} extra={len(extra)} "
              f"best-id match={same_best}/{len(exact)}")
