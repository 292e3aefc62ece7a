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


def _read_probed_cells(
    spark: SparkSession, root: str, cells: list, cell_col: str = "cell"
) -> DataFrame:
    """Read ONLY the probed cells' directories of a cell-partitioned layout.

    ``spark.read.parquet(root)`` discovers the WHOLE partition tree before
    PartitionFilters prune — above 32 directories that discovery becomes a
    distributed listing job over every cell (the r9 x30 probe ramp measured
    it: a 480-task listing stage dominating a probe that then read 0.2 MB).
    Passing the probed directories as explicit paths (with ``basePath`` so
    the cell column survives) keeps the probe's metadata work proportional
    to nprobe · |queries|, not coarse_k — file-listing-time pruning in the
    literal sense.  Cells with no directory (possible when a cell received
    no vectors) are skipped via bounded driver-side existence checks
    through the Hadoop FileSystem API, which follows the table's actual
    scheme (file://, hdfs://, s3a://...)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root_path = jvm.org.apache.hadoop.fs.Path(root)
    fs = root_path.getFileSystem(hconf)
    dirs = []
    for c in cells:
        p = jvm.org.apache.hadoop.fs.Path(os.path.join(root, f"{cell_col}={c}"))
        if fs.exists(p):
            dirs.append(os.path.join(root, f"{cell_col}={c}"))
    if not dirs:
        # Degenerate no-probed-cell case: derive the empty-but-typed frame
        # from ONE existing cell directory instead of spark.read.parquet(root),
        # which would re-run the whole-tree partition discovery this helper
        # exists to avoid (ADVICE r9).  listStatus(root) is a single
        # driver-side RPC over the first level, not a distributed listing job.
        for s in fs.listStatus(root_path):
            name = s.getPath().getName()
            if s.isDirectory() and name.startswith(f"{cell_col}="):
                one = os.path.join(root, name)
                return spark.read.option("basePath", root).parquet(one).limit(0)
        raise ValueError(
            f"ivf index at {root!r} has no {cell_col}= cell directories"
        )
    return spark.read.option("basePath", root).parquet(*dirs)


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
    # lazy pin (r17): the centroid write materializes it; ivf_assign's
    # bounded collect re-reads the cache
    centroids = kmeans_refine(corpus, seeds, id_col, vec_col, refine_iters).localCheckpoint(eager=False)
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
    candidates: DataFrame = None,
) -> DataFrame:
    """Top-k per query against a persisted index, touching only ``nprobe``
    cells' files per query.  ``candidates`` (one-column allowed-id frame)
    makes this a FILTERED search — the predicate semi-joins the indexed
    rows before scoring, the ivfpq_topk semantics.

    The centroid table (K rows) broadcasts to rank cells per query; the
    union of all queries' probed cells becomes ONE ``cell IN (...)``
    predicate, so parquet partition pruning skips every other directory at
    file-listing time (PartitionFilters in the scan node — the same
    mechanism as date-partition pruning on a warehouse table).  Scoring
    then proceeds exactly as ivf_topk's probe join.
    """
    from pyspark.sql import Window

    from cassandra_util_spark.operators.similarity import cosine, cosine_staged, norm

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
        .withColumn("__qn", norm(F.col("q_vec")))
    )
    # the probed-cell set is at most |queries| * nprobe values (bounded by
    # the K centroids) — reading those directories DIRECTLY keeps even the
    # file listing proportional to the probe, not to coarse_k
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    indexed = _read_probed_cells(spark, os.path.join(path, "cells"), cells)
    if candidates is not None:
        indexed = indexed.join(
            candidates.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
    scored = (
        indexed.withColumn("__cn", norm(F.col(vec_col)))
        .join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        # norms staged per row (r17): bit-identical, 3 folds per pair -> 1
        .withColumn(
            "score",
            cosine_staged(
                F.col("q_vec"), F.col(vec_col), F.col("__qn"), F.col("__cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_k: int = 16,
    dim: int = 64,
    m: int = 8,
    num_codes: int = 16,
    refine_iters: int = 0,
) -> None:
    """Persist the IVFADC layout: ``centroids/`` (coarse_k rows),
    ``codebooks/`` (m·num_codes residual codebook rows), and ``codes/``
    partitioned by cell holding ONLY (id, codes array<bigint>) — 8·m bytes
    per vector, no embeddings.  This is the 100 TB memory contract made
    physical: the index directory is ~64/512 of the corpus bytes at the
    default config, probes prune to nprobe cell directories at file-listing
    time, and the original vectors are only ever touched by the caller's
    exact re-rank against the corpus table itself."""
    from cassandra_util_spark.operators.similarity import (
        ivf_assign,
        ivf_seeds,
        kmeans_refine,
        pq_codebooks,
        pq_encode,
    )

    cents = ivf_seeds(corpus, id_col, vec_col, coarse_k)
    if refine_iters:
        cents = kmeans_refine(corpus, cents, id_col, vec_col, refine_iters).localCheckpoint(eager=False)
    cents.write.parquet(os.path.join(path, "centroids"))
    assigned = ivf_assign(corpus, cents, id_col, vec_col)
    cent = cents.select(
        F.col(id_col).alias("cell"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cent_vec"),
    )
    res = assigned.join(F.broadcast(cent), "cell").select(
        F.col(id_col),
        F.col("cell"),
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.col("cent_vec"),
            lambda a, b: a - b,
        ).alias("__res"),
    )
    # Materialize once (ADVICE r8): the residual lineage (seed sort + Arrow
    # cell assignment over the full corpus) feeds THREE consumers below —
    # the codebook fit, the codebook collect inside pq_encode, and the codes
    # write.  Without this checkpoint each consumer replays the full scan;
    # same pattern as ivfpq_topk's materialization point.
    res = res.localCheckpoint(eager=False)  # the codebook write materializes it (r17)
    cb = pq_codebooks(res, id_col, "__res", dim, m, num_codes)
    cb.write.parquet(os.path.join(path, "codebooks"))
    codes = pq_encode(res, cb, id_col, "__res", dim, m, num_codes, keep=("cell",))
    codes.repartition("cell").write.partitionBy("cell").parquet(
        os.path.join(path, "codes")
    )


def probe_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    corpus: DataFrame = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    dim: int = 64,
    m: int = 8,
    num_codes: int = 16,
    rerank: int = None,
    candidates: DataFrame = None,
) -> DataFrame:
    """IVFADC probe against the persisted layout: centroids (coarse_k rows)
    rank cells per query; the probed cells' directories are read DIRECTLY
    (listing work follows the probe, not coarse_k); the pruned 8·m-byte
    code rows are ADC-scored against the per-cell query residuals
    (codebooks loaded as a plan literal).  ``rerank`` re-scores the
    shortlist exactly from the caller-supplied ``corpus`` table — the
    index itself holds no vectors.  ``candidates`` (one-column allowed-id
    frame) makes this a FILTERED search: the predicate semi-joins the
    codes before scoring, the ivfpq_topk semantics."""
    from pyspark.sql import Window

    from cassandra_util_spark.operators.similarity import (
        _adc9_expr,
        _collect_codebooks,
        cosine,
    )

    if rerank is not None and corpus is None:
        raise ValueError("rerank requires the corpus table (the index holds no vectors)")
    sub = dim // m
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    cent = cents.select(
        F.col(id_col).alias("cell"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cent_vec"),
    )
    cb = spark.read.parquet(os.path.join(path, "codebooks"))
    by_sub, code_ids = _collect_codebooks(cb, m, num_codes)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("q_vec"),
    )
    qcells = q.crossJoin(F.broadcast(cent)).withColumn(
        "cscore", cosine(F.col("q_vec"), F.col("cent_vec"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    probes = (
        qcells.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select(
            "query_id",
            "cell",
            F.zip_with("q_vec", "cent_vec", lambda a, b: a - b).alias("q_res"),
        )
    )
    # bounded driver-side cell set (≤ |queries| · nprobe values), read as
    # DIRECT directory paths: listing work follows the probe, not coarse_k
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    codes = _read_probed_cells(spark, os.path.join(path, "codes"), cells)
    if candidates is not None:
        codes = codes.join(
            candidates.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
    scored = (
        codes.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "adc9", _adc9_expr(F.col("q_res"), F.col("codes"), by_sub, code_ids, sub, m)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc9").asc(), F.col(id_col).asc()
    )
    short = scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= (rerank if rerank is not None else k)
    )
    if rerank is None:
        return short.select(
            "query_id", F.col(id_col).alias("neighbor_id"), "adc9", "rank"
        )
    from cassandra_util_spark.operators.similarity import _exact_rerank

    short_ids = short.select("query_id", F.col(id_col).alias("neighbor_id"))
    return _exact_rerank(corpus, queries, short_ids, id_col, vec_col, k)
