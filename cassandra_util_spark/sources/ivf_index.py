"""Persisted IVF index: the corpus partitioned on disk by centroid cell.

``ivf_topk`` computes the cell layout per query job; at 100 TB the layout
should be computed ONCE and written down, so that every later probe touches
only its ``nprobe`` cells' FILES — parquet partition pruning turns the
logical "probe 8 of 64 cells" into physically reading 8 of 64 directories
(~12% of bytes), with zero scan of the rest.  This is the Spark-native form
of an ANN index: no serving process, no sidecar format — a partitioned
table whose layout IS the index, queryable by any Spark job.

Layout contract: ``write_ivf_index`` stores (id, embedding, cell) with
``partitionBy("cell")`` plus the centroid table under ``centroids/`` (a
K-row parquet — K is a fixed parameter, never corpus-sized).  Probing loads
ONLY the centroids (K rows) driver-side to choose cells, then issues a
``cell IN (...)`` scan whose PartitionFilters prune at file-listing time —
verified by test_probe_plan_prunes_partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 64,
    refine_iters: int = 2,
) -> None:
    """Build and persist the IVF layout: Lloyd-refined centroids + the
    corpus re-clustered into one directory per cell.

    One full-corpus pass for the assignment (map-only Arrow BLAS argmax,
    see ivf_assign) + one partitioned write clustered by cell.  Rewriting
    the index after drift = rerunning this; readers keep working against
    the old directory until the swap (pair with SnapshotStore for
    atomicity if needed).
    """
    from cassandra_util_spark.operators.similarity import (
        ivf_assign,
        ivf_seeds,
        kmeans_refine,
    )

    seeds = ivf_seeds(corpus, id_col, vec_col, num_centroids)
    centroids = kmeans_refine(corpus, seeds, id_col, vec_col, refine_iters).localCheckpoint()
    centroids.write.parquet(os.path.join(path, "centroids"))
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    (
        assigned.repartition("cell")
        .write.partitionBy("cell")
        .parquet(os.path.join(path, "cells"))
    )


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 8,
) -> DataFrame:
    """Top-k per query against a persisted index, touching only ``nprobe``
    cells' files per query.

    The centroid table (K rows) broadcasts to rank cells per query; the
    union of all queries' probed cells becomes ONE ``cell IN (...)``
    predicate, so parquet partition pruning skips every other directory at
    file-listing time (PartitionFilters in the scan node — the same
    mechanism as date-partition pruning on a warehouse table).  Scoring
    then proceeds exactly as ivf_topk's probe join.
    """
    from pyspark.sql import Window

    from cassandra_util_spark.operators.similarity import cosine

    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    cent = centroids.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    qcells = q.crossJoin(F.broadcast(cent)).withColumn(
        "cscore", cosine(F.col("q_vec"), F.col("cent_vec"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    probes = (
        qcells.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    # the probed-cell set is at most |queries| * nprobe values (bounded by
    # the K centroids) — a driver-side literal list is the partition-pruning
    # lever: an IN over a literal set reaches PartitionFilters, a join does not
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    indexed = spark.read.parquet(os.path.join(path, "cells")).filter(
        F.col("cell").isin(cells)
    )
    scored = (
        indexed.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col(vec_col)))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )
