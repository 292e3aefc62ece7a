"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k — the exact baseline; a broadcast nested-loop
  of queries × corpus with the dot product as a zip_with/aggregate
  expression.  Right answer, O(Q·N) — fine when Q is small (queries are
  broadcast; the corpus streams map-side, no shuffle of the corpus).
- IVF (inverted-file) — the 100 TB path: corpus assigned once to the nearest
  of K centroids (one broadcast pass + shuffle by cell); a query probes only
  the ``nprobe`` nearest cells, scanning N·nprobe/K vectors instead of N.
- embedding cosine near-dup via deterministic sign-LSH hyperplanes.

Exact-scoring paths are pure expressions over array columns (oracle-
matched); the IVF centroid assignment uses an Arrow-batched pandas UDF —
batched BLAS matmuls are the right tool once a fixed small matrix (the
centroids) multiplies every row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _round_half_away(a, dp: int):
    """numpy rounding with HALF-AWAY-FROM-ZERO ties — the mode Spark's
    ROUND (BigDecimal HALF_UP) and DuckDB's round() share.  np.round ties
    half-to-EVEN, so a score landing exactly on a .00005 boundary would
    round differently in the BLAS paths than in the SQL oracles and flip a
    threshold/argmax frontier across engines; every numpy-side 4dp round
    in this module goes through this helper for that reason."""
    import numpy as np

    f = 10.0 ** dp
    return np.copysign(np.floor(np.abs(a) * f + 0.5), a) / f


def dot(a: Column, b: Column) -> Column:
    # cast BEFORE multiplying: float32*float32 would round in float32 first,
    # diverging from any double-precision oracle by ~1e-7 per term
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # zero vectors have no direction: define cos = 0 rather than ANSI 0/0
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_staged(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """:func:`cosine` with the two norms supplied as PRE-STAGED columns —
    bit-identical values (same expression DAG per scalar: denom =
    norm(a)·norm(b) in the same operand order, same dot fold), but the
    O(dim) norm folds evaluate once per ROW instead of once per PAIR.
    The per-pair expression cosine runs three interpreted array folds
    (dot + both norms — CodegenFallback HOFs, no CSE); in every
    broadcast-join scoring shape (train × eval, corpus × queries,
    bucket-pair verify) the norms depend on one side only, so two of the
    three folds were pure per-pair waste (r17; the expression-path cousin
    of the semantic_dedup BLAS lesson)."""
    denom = norm_a * norm_b
    return F.when(denom != 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    queries is broadcast (small side); score+rank = one window shuffle keyed
    by query id.  Output: (query_id, neighbor_id, rank) with a total order
    (score desc, neighbor id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("__qn", norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("__cn", norm(F.col("c_vec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # norms staged per ROW before the pair join (r17): bit-identical
        # to cosine(q_vec, c_vec), 3 interpreted folds per pair -> 1
        .withColumn(
            "score",
            cosine_staged(
                F.col("q_vec"), F.col("c_vec"), F.col("__qn"), F.col("__cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def semantic_decontamination(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_digits: int = 4,
) -> DataFrame:
    """(eval_id, best_train_id, best_cosine, contaminated) — the SEMANTIC
    half of train/eval decontamination: for every evaluation vector, its
    single best cosine match in the training corpus and a flag when that
    match clears ``threshold``.  The n-gram operators
    (``dedup.decontaminate`` / ``contamination_report``) catch verbatim
    and near-verbatim leakage; this catches paraphrased or re-rendered
    duplicates that share no surface n-grams — the standard second check
    before trusting an eval score.

    Scale shape: the EVAL side broadcasts (benchmark suites are small by
    construction — the asymmetry is the point), the training corpus
    streams map-side, and the rank-1 filter over the (eval_id)-keyed
    window is a map-side WindowGroupLimit prune, so shuffled rows are
    ∝ |eval| · maps, never ∝ |train|.  Cosines are rounded to
    ``round_digits`` BEFORE ranking and thresholding so the report —
    including its tie-breaks — is engine-reproducible (the
    semantic_dedup discipline); ties on the rounded score break to the
    smallest train id.  Rows with a NULL vector are excluded on BOTH
    sides (a missing embedding has no direction, and engines disagree on
    how NULL scores rank — Spark's cosine() would fold them to 0.0 while
    a SQL CASE leaves them NULL, ranking NULLS LAST; ADVICE r13):
    every eval row WITH a vector appears exactly once; an empty training
    corpus yields an empty report."""
    q = eval_set.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("eval_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", norm(F.col("__qv")))
    t = train.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("best_train_id"), F.col(vec_col).alias("__tv")
    ).withColumn("__tn", norm(F.col("__tv")))
    # norms staged per ROW (r17): bit-identical to cosine(__qv, __tv) —
    # same denom operand order — with 3 interpreted folds per pair -> 1
    scored = t.crossJoin(F.broadcast(q)).withColumn(
        "best_cosine",
        F.round(
            cosine_staged(
                F.col("__qv"), F.col("__tv"), F.col("__qn"), F.col("__tn")
            ),
            round_digits,
        ),
    )
    w = Window.partitionBy("eval_id").orderBy(
        F.col("best_cosine").desc(), F.col("best_train_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "eval_id",
            "best_train_id",
            "best_cosine",
            (F.col("best_cosine") >= threshold).alias("contaminated"),
        )
    )


def quantize_embedding(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization:
    struct(q: array<int>, scale: double).

    ``q[i] = round(v[i] * 127 / max|v|)`` with ``scale = max|v| / 127`` so
    ``v[i] ≈ q[i] * scale`` within scale/2 per component.  At 100 TB this
    is the ANN memory lever: a 64-dim float32 vector (256 B) becomes 64
    bytes + one scale — 4× more corpus per executor-heap byte, and int8
    dot products vectorize wider.  Zero vectors quantize to zeros with
    scale 0.  All arithmetic is exact-input double division + round —
    engine-reproducible (the same discipline as the portable hashes).

    The max-abs subtree is LET-BOUND through single-element transforms
    (the word_shingles pattern, dedup.py): referencing it directly from
    the per-element lambda re-evaluates the O(dim) array_max per element
    — measured 7× slower at dim 64.  One struct output for the same
    reason: returning (q, scale) as two columns would duplicate the whole
    subtree per consumer.
    """
    v = F.transform(vec, lambda x: x.cast("double"))

    def of_vec(varr: Column) -> Column:
        def of_max(m: Column) -> Column:
            q = F.transform(
                varr,
                lambda x: F.when(m == 0, F.lit(0))
                .otherwise(F.round(x * 127 / m, 0))
                .cast("int"),
            )
            return F.struct(q.alias("q"), F.round(m / 127, 9).alias("scale"))

        return F.transform(F.array(F.array_max(F.transform(varr, F.abs))), of_max)[0]

    return F.transform(F.array(v), of_vec)[0]


def dequantize_embedding(q: Column, scale: Column) -> Column:
    """array<double> reconstruction ``q[i] * scale`` — feed to cosine_topk
    for quantized search; recall loss is bounded by the per-component
    error scale/2 (recall-tested in test_pipeline_ops)."""
    return F.transform(q, lambda x: x.cast("double") * scale)


# ---------------------------------------------------------------------------
# IVF: coarse-quantized ANN
# ---------------------------------------------------------------------------

def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine).

    The centroid matrix is collected — O(K) where K is the *fixed*
    ``num_centroids`` parameter, never a function of corpus size — and closed
    over by an Arrow-batched pandas UDF: each batch becomes one
    (batch x dim) @ (dim x cells) BLAS matmul + argmax — measured ~5x faster
    than the crossJoin + per-row expression cosine, and it is a map-only
    pass: no shuffle at all.  Ties break toward the smallest cell id.

    Assignment scores are rounded to 4dp BEFORE the argmax (the same
    precision discipline as the pair threshold): the BLAS pairwise summation
    and an oracle's sequential dot/norm summation can differ in the last
    ulp, and an unrounded argmax would let that flip near-tied cell
    assignments nondeterministically across engines.  At 4dp near-ties
    become exact ties, broken toward the smallest cell id on both sides.
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    cents = sorted(
        (r[id_col], r[vec_col]) for r in centroids.select(id_col, vec_col).collect()
    )
    if not cents:  # empty corpus/centroids: nothing to assign
        return corpus.withColumn("cell", F.lit(None).cast("bigint"))
    cell_ids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([v for _, v in cents], dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)

    def _nearest_cell(vecs):
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        V = np.array(vecs.tolist(), dtype=np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        scores = _round_half_away(V @ C.T, 4)  # (batch, cells), 4dp frontier
        # argmax picks the FIRST max; cells sorted ascending => smallest cell
        return pd.Series(cell_ids[np.argmax(scores, axis=1)])

    nearest_cell = pandas_udf(_nearest_cell, LongType())
    return corpus.withColumn("cell", nearest_cell(F.col(vec_col)))


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
) -> DataFrame:
    """Lloyd iterations over DataFrames: assign → element-wise mean per cell.

    Per iteration: one broadcast (centroids are tiny), one shuffle keyed by
    (cell, dimension-index) for the mean — both scale linearly.  The mean is
    computed by posexploding the vector, so no Python touches the data.
    """
    cents = centroids
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        cents = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                F.col("cell").alias(id_col),
                F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias(vec_col),
            )
        )
    return cents


def ivf_seeds(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 64,
) -> DataFrame:
    """``num_centroids`` deterministic seed vectors, independent of N.

    Sampling = the K smallest ids under a multiplicative hash order
    (``portable_token``): uniform-ish over the corpus, fully deterministic,
    and executed as a distributed TakeOrdered (top-K per partition, K-row
    merge on the driver) — no full sort, and the driver never holds more
    than K vectors no matter how large the corpus grows.
    """
    from cassandra_util_spark.functions import portable_token

    return (
        corpus.select(id_col, vec_col)
        .orderBy(portable_token(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(num_centroids)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_centroids: int = 64,
    nprobe: int = 8,
    refine_iters: int = 2,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest cells per query.

    ``num_centroids`` (K) is a FIXED parameter — pick ~sqrt(N) capped by
    memory (4096 is reasonable at warehouse scale); it never scales with the
    corpus, so the O(K) driver-side centroid collect in :func:`ivf_assign`
    stays bounded at any N.  Seeds come from :func:`ivf_seeds` (deterministic
    hash-ordered sample), then ``refine_iters`` Lloyd iterations align them
    with the data's cluster structure.  Measured on the 64-dim test
    embeddings: recall@10 ≈ 0.35 with raw seeds/nprobe=4, ≈ 0.6 with two
    refinements and nprobe=8 (~25% of the corpus scanned per query) — the
    standard IVF recall/scan trade; raise nprobe or add exact re-ranking of a
    wider candidate set when the workload needs more.
    """
    seeds = ivf_seeds(corpus, id_col, vec_col, num_centroids)
    # materialize the refined centroids (a K-row table): both the
    # corpus assignment and the query probes consume them, and without a
    # materialization point each re-runs the whole Lloyd chain
    # lazy pin (r17): ivf_assign's bounded centroid collect materializes
    # it — one job instead of a pin job plus a cache read
    centroids = kmeans_refine(corpus, seeds, id_col, vec_col, refine_iters).localCheckpoint(eager=False)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)

    cent = centroids.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    qcells = q.crossJoin(F.broadcast(cent)).withColumn(
        "cscore", cosine(F.col("q_vec"), F.col("cent_vec"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cscore").desc(), F.col("cell").asc())
    probes = (
        qcells.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "q_vec", "cell")
        .withColumn("__qn", norm(F.col("q_vec")))
    )

    scored = (
        assigned.withColumn("__cn", norm(F.col(vec_col)))
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
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank")
    )


# ---------------------------------------------------------------------------
# Cosine near-duplicate pairs
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (compile-time literals)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((planes, dim)).tolist()


def signlsh_bucket(vec: Column, dim: int, planes: int = 16, seed: int = 42) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (sign of the projection).

    Each hyperplane ships as ONE array literal (``F.lit(list)``), not
    dim separate ``F.lit`` calls — the py4j construction-chatter fix of
    random_projection applied here (planes×dim lit round-trips cost
    whole seconds of driver time per query construction)."""
    bits = []
    for i, plane in enumerate(_hyperplanes(dim, planes, seed)):
        p = F.lit([float(v) for v in plane])
        bits.append(
            F.when(dot(vec, p) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    planes: int = 8,
    exact: bool = False,
    multi_probe: bool = False,
) -> DataFrame:
    """Pairs (a < b) with cosine >= threshold.

    exact=False (scale path): candidates = same sign-LSH bucket, then exact
    cosine verify — linear-ish, misses cross-bucket pairs near the boundary.
    ``multi_probe=True`` is the recall lever for those boundary pairs: one
    side additionally probes every single-bit-flip neighbor bucket (a
    high-cosine pair disagrees on few hyperplane signs, most often exactly
    one), recovering all Hamming-distance-1 bucket pairs for a
    ``planes``-fold candidate fan-out — no extra shuffle stages, just a
    wider explode on the probe side.  Each qualifying pair is generated
    exactly once (the probe set {bucket} ∪ {bucket⊕2^i} has distinct
    members and only the probing side explodes), so no dedup pass is
    needed.  exact=True (oracle path): all-pairs verify — O(N²), small N
    only.  Output: (id_a, id_b, cos_sim rounded to 4dp).
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("__n", norm(F.col("vec")))
    if exact:
        a, b = base.alias("a"), base.alias("b")
        cand = a.join(b, F.col("a.id") < F.col("b.id"))
    else:
        bucketed = base.withColumn("bucket", signlsh_bucket(F.col("vec"), dim, planes))
        b = bucketed.alias("b")
        if multi_probe:
            probes = F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(planes)],
            )
            a = (
                bucketed.withColumn("probe", F.explode(probes))
                .drop("bucket")
                .alias("a")
            )
            cand = a.join(
                b, (F.col("a.probe") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
            )
        else:
            a = bucketed.alias("a")
            cand = a.join(
                b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
            )
    scored = cand.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        # norms staged per row (r17): bit-identical, 3 folds per pair -> 1
        F.round(
            cosine_staged(
                F.col("a.vec"), F.col("b.vec"), F.col("a.__n"), F.col("b.__n")
            ),
            4,
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style: cluster-scoped cosine pruning)
# ---------------------------------------------------------------------------

def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 64,
    threshold: float = 0.8,
    refine_iters: int = 2,
    block_rows: int = 4096,
) -> DataFrame:
    """Semantic deduplication over an embedding column, SemDeDup-style
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): k-means-cluster the corpus, compute
    cosine pairs ONLY within each cluster, close them into duplicate groups,
    keep one canonical survivor per group.

    Output: (id, cluster, keep) for every corpus row — the same contract as
    :func:`~cassandra_util_spark.operators.cluster.resolve_duplicates`.

    Scale design (100 TB): restricting pairs to cluster scope is what makes
    semantic dedup tractable — the quadratic term is Σ|cell|², bounded by
    choosing ``num_centroids`` ≈ N/target_cell_size.  The centroid table
    stays O(K) on the driver (ivf_assign), assignment is a map-only BLAS
    pass run ONCE (materialized — a naive self-join would execute the
    assignment subtree twice), and near-boundary cross-cell duplicates are
    the accepted approximation of the method (raise num_centroids
    granularity or run the sign-LSH pair path for recall-critical corpora).

    The within-cell pair scoring is ONE BLAS matmul per cell via
    applyInPandas (normalize the cell's (n × dim) block once, S = V·Vᵀ,
    take the upper triangle above threshold) rather than a self-join with a
    per-pair expression cosine: the join evaluates three array traversals
    per pair — dot plus both norms — in codegen, measured ~15× slower than
    the vectorized block product at 32k vectors, and its cell-keyed shuffle
    caps parallelism at K.  The score matrix is computed in ROW BLOCKS of
    ``block_rows``: S = V[block]·Vᵀ, so peak transient memory per task is
    block_rows × |cell| doubles (32 MB per 4096-row block at |cell|=1k …
    bounded even when a skewed corpus or a mis-sized ``num_centroids``
    produces an oversized cell — the full n² matrix never materializes).
    The block decomposition is exact, not an approximation: every (i<j)
    pair appears in exactly one block's row range, pinned by
    test_semantic_dedup_block_split_identical.  Cosines are rounded to 4dp
    before thresholding so the keep/drop frontier is reproducible across
    engines (embedding_neardup_pairs convention).
    """
    import numpy as np
    import pandas as pd

    from cassandra_util_spark.operators.cluster import resolve_duplicates

    seeds = ivf_seeds(corpus, id_col, vec_col, num_centroids)
    cents = (
        kmeans_refine(corpus, seeds, id_col, vec_col, refine_iters).localCheckpoint(eager=False)
        if refine_iters
        else seeds
    )
    assigned = ivf_assign(corpus, cents, id_col, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), "cell"
    )

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values("id")  # positional triangle == id-ordered pairs
        ids = pdf["id"].to_numpy()
        V = np.array(pdf["vec"].tolist(), dtype=np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        out_a, out_b = [], []
        for s in range(0, n, block_rows):
            S = _round_half_away(V[s:s + block_rows] @ V.T, 4)  # (block, n)
            ia, ib = np.nonzero(S >= threshold)
            ia = ia + s
            upper = ia < ib  # strict upper triangle, in global coordinates
            out_a.append(ids[ia[upper]])
            out_b.append(ids[ib[upper]])
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    pairs = assigned.groupBy("cell").applyInPandas(
        cell_pairs, "id_a bigint, id_b bigint"
    )
    return resolve_duplicates(corpus, pairs, id_col)


def hard_negatives(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    k: int = 5,
    mode: str = "cell",
    num_centroids: int = 16,
    refine_iters: int = 0,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the ``k``
    most cosine-similar examples carrying a DIFFERENT label — the negatives
    that actually move a contrastive loss (random negatives are trivially
    distant; the hard ones adjacent to the decision boundary carry the
    gradient signal).

    Output: (anchor_id, negative_id, cos_sim, rank) with cosines rounded to
    4dp before ranking (the embedding_neardup frontier discipline) and ties
    broken on negative_id — a total, engine-reproducible order.

    ``mode='cell'`` (default, the 100 TB path): candidates are restricted
    to IVF-cell co-residents (:func:`ivf_seeds` → optional
    :func:`kmeans_refine` → :func:`ivf_assign`), exactly the semantic_dedup
    scoping — the quadratic term is Σ|cell|², bounded by ``num_centroids``,
    and the candidate join is one shuffle keyed by cell.  Cross-cell
    negatives are the accepted approximation (hard negatives are by
    definition NEAR the anchor, which is what cell co-residence captures;
    raise ``num_centroids`` granularity or ``refine_iters`` for tighter
    cells).  ``mode='exact'`` scores all label-mismatched pairs — the
    oracle/audit path, O(N²), small-N only (the ngram exact-mode
    convention).
    """
    if mode not in ("cell", "exact"):
        raise ValueError(f"unknown mode {mode!r}: cell | exact")
    if mode == "cell":
        import numpy as np
        import pandas as pd

        seeds = ivf_seeds(df, id_col, vec_col, num_centroids)
        cents = (
            kmeans_refine(df, seeds, id_col, vec_col, refine_iters).localCheckpoint(eager=False)
            if refine_iters
            else seeds
        )
        assigned = ivf_assign(df, cents, id_col, vec_col).select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("lbl"),
            F.col(vec_col).alias("vec"),
            "cell",
        )

        # ONE BLAS matmul per cell instead of a per-pair expression cosine —
        # the semantic_dedup lesson (join form measured ~15x slower; this
        # rewrite took the contract query 6.2s -> 0.74s at sf0.1).  Every
        # anchor lives in exactly one cell, so its whole candidate set is
        # local and the per-anchor top-k is emitted inside the cell task.
        # Row-blocked like cell_pairs: peak memory block x |cell|, never
        # |cell|^2.
        empty = pd.DataFrame(
            {
                "anchor_id": pd.Series([], dtype="int64"),
                "negative_id": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
                "rank": pd.Series([], dtype="int64"),
            }
        )

        def cell_topk(pdf: pd.DataFrame, block_rows: int = 4096) -> pd.DataFrame:
            n = len(pdf)
            if n < 2:
                return empty
            pdf = pdf.sort_values("id")
            ids = pdf["id"].to_numpy()
            lbl = pdf["lbl"].to_numpy()
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            out = []
            for s in range(0, n, block_rows):
                S = _round_half_away(V[s:s + block_rows] @ V.T, 4)
                mask = lbl[s:s + block_rows, None] == lbl[None, :]
                S[mask] = -np.inf  # same-label (incl. self) never a negative
                # stable argsort on -S over ascending-id columns: cos ties
                # resolve toward the smallest negative_id — the same total
                # order the rank-window form defines
                order = np.argsort(-S, axis=1, kind="stable")[:, :k]
                for bi in range(S.shape[0]):
                    cols = order[bi][np.isfinite(S[bi, order[bi]])]
                    for r, c in enumerate(cols, start=1):
                        out.append((ids[s + bi], ids[c], S[bi, c], r))
            if not out:
                return empty
            return pd.DataFrame(
                out, columns=["anchor_id", "negative_id", "cos_sim", "rank"]
            )

        return assigned.groupBy("cell").applyInPandas(
            lambda pdf: cell_topk(pdf),
            "anchor_id bigint, negative_id bigint, cos_sim double, rank bigint",
        )
    base = df.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lbl"), F.col(vec_col).alias("vec")
    ).withColumn("__n", norm(F.col("vec")))
    a, b = base.alias("a"), base.alias("b")
    cand = a.join(b, F.col("a.lbl") != F.col("b.lbl"))
    scored = cand.select(
        F.col("a.id").alias("anchor_id"),
        F.col("b.id").alias("negative_id"),
        # norms staged per row (r17): bit-identical, 3 folds per pair -> 1
        F.round(
            cosine_staged(
                F.col("a.vec"), F.col("b.vec"), F.col("a.__n"), F.col("b.__n")
            ),
            4,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "negative_id", "cos_sim", "rank")
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale_bits: int = 30,
) -> DataFrame:
    """Per-label mean-embedding centroids: (label, centroid array<double>,
    n_members) — the class prototypes of prototypicality-based pruning.

    Engine-exact under any partitioning: naively averaging float vectors
    sums doubles in partition order (non-deterministic and oracle-hostile),
    so each component is first quantized to a 2^-``scale_bits`` grid —
    ``round(val * 2^bits)`` as bigint, one correctly-rounded double product
    plus a half-away round, identical in any engine — then summed as exact
    integers; the mean is two final correctly-rounded double divisions.
    At 2^-30 resolution the quantization error (~1e-9 per component) is
    three orders below the 4dp cosine rounding every consumer applies.

    Plan shape at scale: posexplode is a map-only fan-out of dim rows per
    vector; the sum is one groupBy(label, pos) shuffle with map-side
    partial integer sums; reassembly is a groupBy(label) collect of
    exactly ``dim`` rows per label.  The output is one row per LABEL —
    bounded by the labeling scheme, not the corpus — which is what lets
    every consumer broadcast it.
    """
    q = 1 << scale_bits
    expl = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    sums = expl.groupBy("label", "pos").agg(
        F.sum(F.round(F.col("val").cast("double") * F.lit(float(q))).cast("bigint")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    cent = sums.select(
        "label",
        "pos",
        ((F.col("s").cast("double") / F.col("n")) / F.lit(float(q))).alias("c"),
        "n",
    )
    return cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid"),
        F.max("n").alias("n_members"),
    )


def prototypicality_prune(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    drop_fraction: float = 0.2,
    mode: str = "rank",
) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws: beating power law scaling via data pruning"): rank every
    example by cosine to its class centroid and DROP the most prototypical
    ``drop_fraction`` per label — when data is abundant, the easy examples
    nearest the prototype carry the least marginal information, and pruning
    them beats random subsetting.

    ``mode='rank'`` (default, the contract-precision path): (id, label,
    proto_cos, rank, keep) for every input row — ``rank`` 1 = most
    prototypical within the label; ``keep`` is False for the first
    ``floor(drop_fraction * n_label)`` ranks.  Ties break on id, making
    the cut frontier total-ordered and reproducible.  The rank window
    shuffles once keyed by label; a heavily skewed label (one label = half
    the corpus) serializes its ranking into one task.

    ``mode='approx'`` (the skewed-label 100 TB path, the
    commonness_buckets discipline): one per-label approx_percentile
    aggregate yields the score cutoff at (1 - drop_fraction); keep becomes
    a MAP-SIDE comparison against the broadcast cutoff table — no rank
    window, no per-label serialization.  Output drops ``rank`` (it would
    need the window this mode exists to avoid): (id, label, proto_cos,
    keep).  Boundary examples within approx-quantile error of the cutoff
    may flip keep, which fraction-targeted pruning tolerates by
    construction.

    Scale shape (both modes): the centroid table (:func:`label_centroids`)
    is one row per label and broadcasts; scoring is a map-only expression
    cosine.
    """
    cents = (
        label_centroids(df, label_col, vec_col)
        .withColumnRenamed("label", "__lbl")
        .withColumn("__cn", norm(F.col("centroid")))
    )
    scored = (
        df.withColumn("__vn", norm(F.col(vec_col)))
        .join(F.broadcast(cents), F.col(label_col) == F.col("__lbl"))
        .select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("label"),
            # norms staged as columns (r17): bit-identical, and the
            # when-guard's duplicated denominator no longer re-folds both
            # arrays — 5 interpreted folds per row down to 2
            F.round(
                cosine_staged(
                    F.col(vec_col), F.col("centroid"),
                    F.col("__vn"), F.col("__cn"),
                ),
                4,
            ).alias("proto_cos"),
            "n_members",
        )
    )
    if mode == "rank":
        w = Window.partitionBy("label").orderBy(
            F.col("proto_cos").desc(), F.col("id").asc()
        )
        n_drop = F.floor(F.lit(drop_fraction) * F.col("n_members"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .select(
                F.col("id").alias(id_col),
                "label",
                "proto_cos",
                "rank",
                (F.col("rank") > n_drop).alias("keep"),
            )
        )
    if mode != "approx":
        raise ValueError(f"unknown mode {mode!r}: rank | approx")
    # the scored subtree feeds two consumers (cutoffs + the gate); without
    # the materialization the centroid join and cosine run twice
    scored = scored.localCheckpoint(eager=False)
    cuts = scored.groupBy("label").agg(
        F.percentile_approx("proto_cos", 1.0 - drop_fraction, 10_000).alias("__cut")
    )
    return (
        scored.join(F.broadcast(cuts), "label")
        .select(
            F.col("id").alias(id_col),
            "label",
            "proto_cos",
            (F.col("proto_cos") <= F.col("__cut")).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss dimension reduction)
# ---------------------------------------------------------------------------

def rademacher_signs(dim: int, k: int, seed: int = 7) -> list[list[int]]:
    """Deterministic ±1 (Rademacher) projection matrix, k rows × dim cols,
    derived from md5 parity so ANY engine can regenerate it exactly — the
    same portability discipline as portable_hash32 (numpy's generator, used
    by the sign-LSH hyperplanes, has no SQL equivalent).  Achlioptas (2001)
    shows ±1 entries satisfy the JL lemma with the same distortion bound as
    Gaussian entries."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"rp:{seed}:{i}:{j}".encode()).hexdigest()[:8], 16) % 2
            == 0
            else -1
            for i in range(dim)
        ]
        for j in range(k)
    ]


def random_projection(
    vec: Column, dim: int, k: int = 16, seed: int = 7
) -> Column:
    """Project a float vector to k dimensions: y[j] = Σ_i s[j][i]·v[i] / √k
    with Rademacher signs — the JL distance-preserving reduction that cuts
    ANN scoring cost dim/k-fold at bounded distortion (the lever for 100 TB
    embedding sweeps: coarse-score in k dims, exact-rerank survivors).

    Engine-exact: each component is scaled to 1e9-integers per element, the
    ±1 fold is an exact BIGINT sum (no float summation-order dependence),
    and one final double division + √k rescale rounds to 6dp.  The integer
    array is LET-BOUND (the quantize_embedding pattern) so the O(dim)
    scaling subtree evaluates once, not once per output dimension.

    The k×dim sign matrix ships as ONE nested-array literal and the k
    output components as one transform-over-sequence: the first cut built
    k separate 64-literal arrays via k·dim ``F.lit`` calls, and the py4j
    round-trips alone cost ~5 s of DRIVER time per query construction at
    any data size (measured r17 — the Python-side twin of the pq_encode
    literal-fold pathology; same fix family as DECODE_LITERAL_MAP_MAX).

    Output: array<double> of length k, rounded to 6dp.
    """
    import math

    signs = rademacher_signs(dim, k, seed)
    scale = F.lit(1e9) * F.lit(math.sqrt(k))
    signs_lit = F.lit([[int(s) for s in row] for row in signs])

    def project(r: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.round(
                F.aggregate(
                    F.zip_with(
                        r,
                        F.element_at(signs_lit, j + F.lit(1)),
                        lambda a, b: a * b,
                    ),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                )
                / scale,
                6,
            ),
        )

    r_expr = F.transform(
        vec, lambda x: F.round(x.cast("double") * 1e9).cast("bigint")
    )
    return F.transform(F.array(r_expr), project)[0]


def rademacher_signs_sql_values(dim: int, k: int, seed: int = 7) -> str:
    """The same sign matrix as SQL VALUES rows ``(j, i, s)`` — generated
    from the SAME loop as :func:`rademacher_signs` (the zorder_value
    generated-SQL precedent), so oracle and engine share one definition."""
    rows = ", ".join(
        f"({j}, {i}, {s})"
        for j, row in enumerate(rademacher_signs(dim, k, seed))
        for i, s in enumerate(row)
    )
    return rows


def mean_pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean of vectors per group — the chunk→document pooling
    step every long-document embedding pipeline needs (embed chunks, pool
    to one document vector).

    Engine-exact: components scale to 1e9-integers per element, the
    per-(group, position) sum is an exact BIGINT aggregate with map-side
    partial combine, and the mean is one rounded double division — so the
    pooled vector is identical under any partitioning (a float avg() would
    not be).  Reassembly sorts by position inside a struct array (the
    kmeans_refine pattern): no Python, no UDF.

    Output: (group, n_vectors, pooled array<double> 6dp).
    Scale: one shuffle keyed by (group, pos) then one by group — both keys
    grow with the data, no reduce-to-one.
    """
    exploded = df.select(
        F.col(group_col).alias("g"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * 1e9).cast("bigint"),
            )
        ).alias("pos", "x9"),
    )
    per_dim = exploded.groupBy("g", "pos").agg(
        F.sum("x9").alias("s9"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy("g")
        .agg(
            F.max("n").alias("n_vectors"),  # all dims share the group count
            F.array_sort(F.collect_list(F.struct("pos", "s9", "n"))).alias("pm"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_vectors",
            F.transform(
                F.col("pm"),
                lambda s: F.round(s["s9"].cast("double") / 1e9 / s["n"], 6),
            ).alias("pooled"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the ANN memory-compression path
# ---------------------------------------------------------------------------


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as a left-to-right double fold — the summation
    order is the list order in both Spark and DuckDB's list_aggregate, so
    a 4dp round on top is engine-exact."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    num_codes: int = 16,
) -> DataFrame:
    """Per-subspace PQ codebooks (Jégou et al., TPAMI 2011): the vector
    space splits into ``m`` contiguous subspaces of ``dim/m`` components;
    each subspace gets ``num_codes`` centroids taken from the SAME
    deterministic seed documents :func:`ivf_seeds` uses (K smallest ids
    under the multiplicative-hash order), sliced per subspace.

    Output: (sub, code, cvec) — exactly ``m * num_codes`` rows, bounded by
    config, so the codebook broadcasts/collects at any corpus size.  Codes
    are the seed documents' ids (the ivf_seeds cell-id convention), giving
    the oracle a replayable identity.  ``refine`` is deliberately absent
    here: seed codebooks replay exactly in SQL; Lloyd-refined codebooks are
    recall-tested in pytest (the ann_ivf_topk split).
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    seeds = ivf_seeds(corpus, id_col, vec_col, num_codes)
    return seeds.select(
        F.col(id_col).alias("code"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.struct(
                    j.alias("sub"),
                    F.transform(
                        F.slice(F.col(vec_col), j * sub + 1, sub),
                        lambda x: x.cast("double"),
                    ).alias("cvec"),
                ),
            )
        ).alias("s"),
    ).select("s.sub", "code", "s.cvec")


def _collect_codebooks(codebooks: DataFrame, m: int, num_codes: int):
    """codebooks -> ([[cvec per code] per sub], [code ids]) with loud
    failure on shape mismatch (the sketches.py collect discipline: the
    collect is bounded by config — m*num_codes rows — never by data)."""
    rows = codebooks.orderBy("sub", "code").collect()
    if len(rows) != m * num_codes:
        raise ValueError(
            f"codebook shape mismatch: {len(rows)} rows != {m}*{num_codes}"
        )
    code_ids = sorted({r["code"] for r in rows})
    if len(code_ids) != num_codes:
        raise ValueError(f"expected {num_codes} distinct codes, got {len(code_ids)}")
    by_sub = [[None] * num_codes for _ in range(m)]
    pos = {c: i for i, c in enumerate(code_ids)}
    for r in rows:
        by_sub[r["sub"]][pos[r["code"]]] = list(r["cvec"])
    return by_sub, code_ids


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    num_codes: int = 16,
    keep: tuple = (),
) -> DataFrame:
    """(id, *keep, codes array<bigint> length m): each subvector's nearest codebook
    entry under squared L2 rounded to 4dp, ties to the smallest code id —
    the same argmin discipline as ivf_assign, replayable in SQL.

    Map-only at any scale: the codebook is collected once (bounded
    m·num_codes rows) and closed over by an Arrow-batched pandas UDF —
    each batch is m (batch × sub) − (num_codes × sub) broadcasted squared
    distances + an argmin.  The first cut built the argmin as an
    array_min over m×num_codes literal fold expressions; Catalyst
    analysis + codegen of that plan (MB-scale task binaries) cost ~15 s
    per query at ANY data size, the same pathology the nested BPE folds
    hit — the Arrow pass is the ivf_assign solution applied to encoding.
    Distances round to 4dp HALF-AWAY before the argmin (the
    engine-exactness frontier: numpy's pairwise summation kicks in above
    8-element rows, so the per-subspace sums match a sequential-fold
    oracle bit-for-bit at 4dp) and ties break toward the smallest code id
    (codebook columns ordered by code id; argmin returns the first
    minimum).  Output rows are 8·m bytes in place of the original vector —
    the 100 TB index memory lever (64-dim float64 = 512 B -> 64 B at m=8).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    by_sub, code_ids = _collect_codebooks(codebooks, m, num_codes)
    sub = dim // m
    CB = np.array(by_sub, dtype=np.float64)  # (m, num_codes, sub)
    codes_np = np.array(code_ids, dtype=np.int64)  # ascending

    def _encode(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.array(vecs.tolist(), dtype=np.float64)
        out = np.empty((len(V), m), dtype=np.int64)
        for j in range(m):
            X = V[:, j * sub : (j + 1) * sub]
            d = ((X[:, None, :] - CB[j][None, :, :]) ** 2).sum(-1)
            out[:, j] = codes_np[np.argmin(_round_half_away(d, 4), axis=1)]
        return pd.Series(list(out))

    encode = pandas_udf(_encode, ArrayType(LongType()))
    return corpus.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        encode(F.col(vec_col)).alias("codes"),
    )


def _adc9_expr(q_vec: Column, codes: Column, by_sub, code_ids, sub: int, m: int) -> Column:
    """Integer ADC score: per subspace j, d9 = round(round(l2sq(q_sub,
    cvec), 4) · 1e4) as bigint for the STORED code, summed over the m
    subspaces (exact under any order).  ``q_vec`` is whatever the caller
    scores against — the raw query for plain ADC, the per-probed-cell query
    residual for IVFADC.

    Executed as an Arrow-batched pandas UDF closing over the codebook
    array (bounded m·num_codes·sub doubles): per batch, m broadcasted
    squared-distance tables + an integer gather on the stored codes.  The
    first cut built this as m×num_codes literal fold expressions —
    correct, but Catalyst analysis/codegen of the MB-scale plan cost
    ~15 s per query at any data size (the pq_encode docstring tells the
    same story).  Rounding is the certified two-step: 4dp HALF-AWAY on
    the double distance, then half-away to integer after the 1e4 scale —
    bit-matched against DuckDB's round()/list_reduce replay by every
    query that certifies this path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    CB = np.array(by_sub, dtype=np.float64)  # (m, num_codes, sub)
    codes_np = np.array(code_ids, dtype=np.int64)  # ascending

    def _score(qv, stored):
        if len(qv) == 0:
            return pd.Series([], dtype="int64")
        Q = np.array(qv.tolist(), dtype=np.float64)
        S = np.array(stored.tolist(), dtype=np.int64)  # (B, m)
        total = np.zeros(len(Q), dtype=np.int64)
        rows = np.arange(len(Q))
        for j in range(m):
            X = Q[:, j * sub : (j + 1) * sub]
            d = ((X[:, None, :] - CB[j][None, :, :]) ** 2).sum(-1)  # (B, K)
            d9 = _round_half_away(_round_half_away(d, 4) * 1e4, 0).astype(np.int64)
            pos = np.searchsorted(codes_np, S[:, j])
            # Membership check (ADVICE r8): probing a store with codebooks
            # from a DIFFERENT model would otherwise return silently-wrong
            # ADC distances (searchsorted maps an unknown id to its
            # insertion point) or an opaque IndexError past the max id.
            # Fail loud, naming the foreign ids — the same discipline as
            # _collect_codebooks' shape assert.
            pos = np.minimum(pos, len(codes_np) - 1)
            bad = codes_np[pos] != S[:, j]
            if bad.any():
                unknown = sorted(set(S[bad, j].tolist()))[:8]
                raise ValueError(
                    f"stored PQ code ids absent from the supplied codebook "
                    f"(model/store mismatch) in subspace {j}: {unknown}"
                )
            total += d9[rows, pos]
        return pd.Series(total)

    score = pandas_udf(_score, LongType())
    return score(q_vec, codes)


def pq_topk(
    codes_df: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    m: int = 8,
    num_codes: int = 16,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k per query over PQ codes: the query
    stays exact, every corpus vector is approximated by its codebook
    entries, and the per-pair distance is a table lookup sum.

    Per-(query, sub, code) distances integer-scale to round(d4·1e4) —
    bigint — so the m-term per-pair sum is EXACT under any evaluation
    order and the ranking (adc9 asc, neighbor asc) hash-matches an
    independent engine.  Scale shape: queries broadcast; the corpus side
    streams its 8·m-byte codes through a map-only scoring expression (the
    codebook is a plan literal — no join, no shuffle before the per-query
    top-k window), which is the point of PQ: the scan never touches the
    original vectors.
    """
    by_sub, code_ids = _collect_codebooks(codebooks, m, num_codes)
    sub = dim // m
    pos = {c: i for i, c in enumerate(code_ids)}

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("q_vec"),
    )
    c = codes_df.select(F.col(id_col).alias("neighbor_id"), "codes")
    paired = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = paired.withColumn(
        "adc9", _adc9_expr(F.col("q_vec"), F.col("codes"), by_sub, code_ids, sub, m)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc9").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc9", "rank")
    )


def _d4_rank_topk(pairs: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, d4, rank) — the ONE copy of the L2-metric
    family's exact ranking semantics, shared by the ground-truth scan
    (:func:`l2_topk`) and the shortlist re-rank (:func:`_exact_rerank`):
    d4 = round(l2sq(qv, cv), 4) ascending, ties to the smaller neighbor
    id, top-k per query.  The recall audits compare these two paths, so
    their rounding and tie-break must be provably identical (review r16)."""
    exact = pairs.withColumn("d4", F.round(_l2sq(F.col("qv"), F.col("cv")), 4))
    w = Window.partitionBy("query_id").orderBy(
        F.col("d4").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "d4", "rank")
    )


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """(query_id, neighbor_id, d4, rank) — the EXACT squared-L2 top-k
    scan, the ground truth the L2-metric approximate family (PQ/IVFADC)
    is audited against (:func:`cosine_topk` is the cosine twin).  Same
    ranking semantics as the family's exact re-rank stage: d4 =
    round(l2sq, 4) — the 4dp round stabilizes float ties across engines
    — ascending, ties to the smaller neighbor id, self excluded.

    Scale shape: O(N·|queries|) with the query side broadcast — at
    production scale this runs on a SAMPLED query set (|queries| fixed),
    the recall-audit shape, never as the serving path (that is what the
    index is for)."""
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    cd = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    )
    return _d4_rank_topk(
        cd.join(F.broadcast(qd), F.col("neighbor_id") != F.col("query_id")), k
    )


def _exact_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    short_ids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact L2 re-rank of a bounded (query_id, neighbor_id) shortlist
    against the full-width vectors in ``corpus``: d4 = round(l2sq, 4),
    ties to the smaller neighbor id, top-k per query.

    The r8 shape scanned the WHOLE corpus and broadcast-joined the
    shortlist — correct, but the scan's bytes grew with corpus size, not
    with the shortlist, which broke the probe-cost contract at scale (the
    x30 ramp measured it: rerank bytes ~linear in corpus).  The shortlist
    is bounded by construction (≤ |queries| · rerank rows), so its ids are
    collected once (after a localCheckpoint — one materialization serves
    both the collect and the broadcast) into an ``isin`` literal: the IN
    predicate reaches the parquet scan (PushedFilters), so only row groups
    whose id range intersects the shortlist decompress the vector column —
    probe bytes follow the shortlist, not the table."""
    # lazy pin (r17): the distinct-collect below materializes it; the
    # broadcast re-reads the cache
    short_ids = short_ids.localCheckpoint(eager=False)
    nbr = sorted(r["neighbor_id"] for r in short_ids.select("neighbor_id").distinct().collect())
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    cd = corpus.filter(F.col(id_col).isin(nbr)).select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    )
    return _d4_rank_topk(
        cd.join(F.broadcast(short_ids), "neighbor_id")
        .join(F.broadcast(qd), "query_id"),
        k,
    )


def pq_topk_rerank(
    codes_df: DataFrame,
    codebooks: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rerank: int = 64,
    dim: int = 64,
    m: int = 8,
    num_codes: int = 16,
) -> DataFrame:
    """ADC shortlist + exact re-rank (the IVFADC+R pattern, Jégou et al.
    2011 §V): the compressed scan proposes ``rerank`` candidates per query,
    then ONLY those rows' original vectors are read and exactly scored
    (squared L2 at 4dp, ties to the smaller id).

    This is how PQ recall is bought back without ever scanning full
    vectors: the wide pass touches 8·m-byte codes, the exact pass touches
    ``rerank × |queries|`` rows.  Measured recall@10 at sf0.001 (500
    vectors, seed codebooks, no Lloyd refine): pure ADC K=16 is 0.28;
    rerank=64 lifts it to 0.62, rerank=128 with K=32 to 0.94, rerank=250
    with K=16 to 0.98 — the budget knob is the rerank width, the codebook
    size is secondary.  The candidate join keys on the id — a
    broadcast-size build side at any corpus scale because the shortlist
    is bounded by config.
    """
    short = pq_topk(
        codes_df, codebooks, queries, id_col, vec_col,
        k=rerank, dim=dim, m=m, num_codes=num_codes,
    ).select("query_id", "neighbor_id")
    return _exact_rerank(corpus, queries, short, id_col, vec_col, k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    coarse_k: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    m: int = 8,
    num_codes: int = 16,
    rerank: int | None = None,
    refine_iters: int = 0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """IVFADC (Jégou et al., TPAMI 2011 §IV): the composed 100 TB ANN
    architecture — coarse IVF cell pruning, then an asymmetric-distance scan
    over PQ codes of the RESIDUALS (x − centroid) within only the probed
    cells, optionally followed by exact re-rank of the shortlist.

    ``candidates`` (optional): a one-column (``id_col``) DataFrame of
    allowed neighbor ids — FILTERED vector search (top-k among documents
    matching a metadata predicate, the lang/date/source-scoped retrieval
    shape).  The filter semi-joins the 8·m-byte codes BEFORE ADC scoring,
    so selectivity cuts scan work instead of recall: a post-shortlist
    filter would silently return fewer than k when the predicate is
    selective, the classic filtered-ANN failure.  The model (centroids +
    codebooks) still trains on the FULL corpus, so filtered and unfiltered
    searches share one index.

    Why residuals: after subtracting the cell centroid, the vectors a
    codebook must cover live in a ball around the origin instead of spread
    across the whole space, so the same ``num_codes`` buys materially lower
    quantization error — that is what makes IVF×PQ more than the sum of its
    parts.  The query is re-expressed per probed cell as q − centroid and
    scored against the residual codes with the same integer lookup-table sum
    as :func:`pq_topk` (round(d4·1e4) bigint — exact under any order).

    Scale shape, stage by stage:
    - centroids are K rows (config-bounded collect, the ivf_assign
      discipline); assignment is a map-only Arrow pass;
    - residual computation is a broadcast join on cell + zip_with — map-only;
    - codebooks are m·num_codes rows, a plan literal in the encode/scan;
    - the scan touches ONLY probed cells (N·nprobe/K rows) and reads 8·m-byte
      codes, never vectors — write the codes table partitioned by cell and
      partition pruning makes the probe join file-skipping, the inverted-list
      read pattern of a native ANN index;
    - re-rank reads rerank×|queries| original vectors through a
      broadcast-size id join.

    ``refine_iters=0`` keeps seed centroids/codebooks so an independent SQL
    engine replays every step (the ann_ivf_topk / ann_pq_* certification
    split); Lloyd-refined recall is pytest territory (tests/test_ivfpq.py).
    Output: (query_id, neighbor_id, adc9, rank) for the pure scan, or
    (query_id, neighbor_id, d4, rank) when ``rerank`` is set.
    """
    cents = ivf_seeds(corpus, id_col, vec_col, coarse_k)
    if refine_iters:
        cents = kmeans_refine(
            corpus, cents, id_col, vec_col, refine_iters
        ).localCheckpoint(eager=False)
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
    # the codebook collect below is an action over res's lineage (seed sort,
    # Arrow assign pass, residual join); without a materialization point the
    # encode/scan would replay that whole chain a second time
    res = res.localCheckpoint(eager=False)  # the codebook collect materializes it (r17)
    cb = pq_codebooks(res, id_col, "__res", dim, m, num_codes)
    by_sub, code_ids = _collect_codebooks(cb, m, num_codes)
    sub = dim // m
    codes = pq_encode(res, cb, id_col, "__res", dim, m, num_codes, keep=("cell",))
    if candidates is not None:
        # semi-join the codes against the allowed-id set before any scoring:
        # AQE broadcasts a small candidate table; a corpus-scale one shuffles
        # on the 8-byte id — either way unqualified rows never reach the ADC
        codes = codes.join(
            candidates.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )

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
    short = (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= (rerank if rerank is not None else k))
    )
    if rerank is None:
        return short.select(
            "query_id", F.col(id_col).alias("neighbor_id"), "adc9", "rank"
        )

    short_ids = short.select("query_id", F.col(id_col).alias("neighbor_id"))
    return _exact_rerank(corpus, queries, short_ids, id_col, vec_col, k)
