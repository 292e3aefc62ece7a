"""Connected-components cluster resolution for near-duplicate groups.

Pair generators (``ngram_jaccard_pairs``, ``minhash_lsh_pairs``,
``simhash_pairs``, ``embedding_neardup``) emit EDGES — (id_a, id_b)
similarity links.  Deduplicating a corpus needs the transitive closure of
those links: if a~b and b~c, then {a,b,c} is ONE duplicate cluster and one
canonical document survives, even though (a,c) was never emitted as a pair.

Scale design (100 TB):
- the iteration is min-label propagation over the (undirected) edge list:
  each round, every node adopts the smallest label among itself and its
  neighbors.  Rounds needed = the largest component's diameter.  Near-dup
  clusters are overwhelmingly small and dense (near-cliques from LSH
  buckets), so 3-5 rounds converge; the ``max_iter`` guard raises rather
  than silently emitting a half-merged clustering.
- each round is ONE shuffle keyed by node id (join labels→edges, then
  min-aggregate), with map-side partial mins.  Labels are (id, bigint) —
  the shuffle never carries document content.
- lineage is cut every round with ``localCheckpoint``: without it, round k
  replays all k-1 prior joins (quadratic work) and the plan tree grows
  unboundedly.  At warehouse scale this becomes a persisted label table
  per round (same pattern as the MinHash signature table, dedup.py).
- for adversarial long-chain graphs (diameter ≫ 5), the documented upgrade
  is the alternating large-star/small-star contraction (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14), which converges
  in O(log^2 n) rounds with the same per-round shuffle shape.  Label
  propagation is the right default for dedup because real duplicate
  clusters are shallow; the convergence guard makes the failure mode loud.

The canonical-survivor rule matches the pairwise operators' convention:
lowest id in the cluster survives (dedup.py `exact_dedup`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; component =
    the smallest id reachable through the pair graph.

    ``pairs`` is an undirected edge list (each link listed once in either
    direction).  Raises ``RuntimeError`` if ``max_iter`` rounds do not
    converge — a half-converged clustering silently under-merges, which for
    dedup means keeping documents that should have been dropped.
    """
    # undirected: materialize both directions once; (src, dst) bigint pairs
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=False)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=False)
    )

    def _label_sum(lbl: DataFrame) -> int:
        # exact convergence signal: each id's label is monotonically
        # non-increasing (min over a set containing itself), so the label
        # total strictly decreases iff ANY label changed this round — a
        # map-side aggregate replaces the join-and-compare per round.
        # decimal(38,0) so the ANSI-mode sum cannot overflow.
        row = lbl.agg(
            F.coalesce(F.sum(F.col("comp").cast("decimal(38,0)")), F.lit(0)).alias("s")
        ).collect()[0]
        return int(row["s"])

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        # neighbor minimum: every edge proposes its src's label to its dst
        proposals = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), F.col("comp"))
        )
        labels = (
            labels.unionByName(proposals)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "component diameter exceeds the guard — raise max_iter or switch "
        "to large-star/small-star contraction for this graph"
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """(id, component) via alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the adversarial-diameter upgrade to
    :func:`connected_components`.

    Label propagation needs rounds = component diameter; a pathological
    10,000-link chain means 10,000 shuffles.  Star contraction converges in
    O(log² n) rounds regardless of diameter by rewiring the graph itself:

    - **large-star**: every node's larger neighbors are reconnected to the
      minimum of its neighborhood (halves long tails);
    - **small-star**: every node and its smaller neighbors collapse onto the
      smallest of them (flattens local stars).

    Each half-round is one groupBy shuffle + one co-partitioned join, keyed
    by node id; edges are (bigint, bigint) — no content in the shuffle.
    Termination (round 7): a DIRECT star-forest test — the edge set is
    converged iff every child node has exactly one distinct root and no
    node appears as both root and child (one keyed aggregate + isEmpty per
    check; exact, no hashing).  The test runs BEFORE the loop and after
    EACH half-round, so convergence is detected the moment it happens: the
    previous signature-compare needed one extra full round (two contraction
    halves) just to observe that nothing changed, and a pre-converged input
    (pair generators that already emit (min → member) stars) paid a full
    round to learn it was done.  Identity of both halves on a star forest
    makes the early exit bit-identical to running the loop to the old fixed
    point (large-star around a root re-emits (child, root); around a child
    the only neighbor is smaller, emitting nothing; small-star's hi_edge is
    the star itself and its lo_edges collapse to filtered self-loops) —
    pinned by the unchanged star-vs-recursive-CTE hash oracle.  At the
    fixed point every edge is (child → component-min) directly.

    Default for dedup stays label propagation (near-dup clusters are shallow
    near-cliques; fewer rounds, one shuffle per round); choose this variant
    via ``resolve_duplicates(method="star")`` when the pair graph may chain.
    """
    fwd = pairs.select(F.col(id_a).alias("u").cast("bigint"),
                       F.col(id_b).alias("v").cast("bigint"))
    all_nodes = (
        fwd.select(F.col("u").alias("id"))
        .unionByName(fwd.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # canonical undirected edge set, no self-loops
    edges = (
        fwd.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _is_star_forest(e: DataFrame) -> bool:
        # exact convergence test, duplicate-tolerant: mark every edge
        # endpoint once ((u, null) for roots, (v, u) for children), then one
        # keyed aggregate finds any violation — a child with two distinct
        # roots, or a node that is both root and child (n_child strictly
        # between 0 and its appearance count).  No violations ⟺ the edges
        # are disjoint (root < children) stars, on which both contraction
        # halves are the identity.
        marks = e.select(
            F.col("u").alias("id"), F.lit(None).cast("bigint").alias("root")
        ).unionByName(e.select(F.col("v").alias("id"), F.col("u").alias("root")))
        violations = (
            marks.groupBy("id")
            .agg(
                F.count_distinct("root").alias("nr"),
                F.count(F.lit(1)).alias("n_all"),
                F.count("root").alias("n_child"),
            )
            .filter(
                (F.col("nr") > 1)
                | ((F.col("n_child") > 0) & (F.col("n_child") < F.col("n_all")))
            )
        )
        return violations.isEmpty()

    def _labels(e: DataFrame) -> DataFrame:
        # star edges are (root=u, child=v); distinct() because the
        # large-star half does not canonicalize duplicates
        labels = e.select(F.col("v").alias("id"), F.col("u").alias("comp")).distinct()
        return (
            all_nodes.join(labels, "id", "left")
            .select("id", F.coalesce("comp", "id").alias("comp"))
        )

    if _is_star_forest(edges):
        return _labels(edges)
    for _ in range(max_iter):
        # -- large-star: around each node x, connect neighbors y > x to
        #    m(x) = min(neighborhood(x) ∪ {x})
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # no distinct() here: the small-star half tolerates duplicate edges
        # (lo_mins is a min-aggregate; lo_edges duplicates die in the final
        # distinct), so canonicalizing this intermediate would only add a
        # shuffle per round — the per-round edge set after small-star is
        # identical either way (pinned by the star-vs-recursive-CTE oracle).
        # The checkpoint stays: two consumers below, and it cuts the
        # iterative lineage.
        edges = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .localCheckpoint(eager=False)
        )
        if _is_star_forest(edges):
            return _labels(edges)  # mid-round exit: skip the small-star half
        # -- small-star: direct edges high→low; collapse each node x and its
        #    smaller neighbors onto m(x) = min of them
        lo_mins = edges.groupBy("v").agg(F.min("u").alias("m"))
        hi_edge = lo_mins.select(F.col("m").alias("u"), F.col("v"))
        lo_edges = (
            edges.join(lo_mins, "v")
            .select(F.col("m").alias("u"), F.col("u").alias("v"))
        )
        edges = (
            hi_edge.unionByName(lo_edges)
            .filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        if _is_star_forest(edges):
            return _labels(edges)
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds "
        "(expected O(log^2 n)); the edge stream may be changing under the "
        "computation — materialize pairs first"
    )


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    method: str = "label_propagation",
) -> DataFrame:
    """Full-corpus cluster assignment + survivor flag.

    Returns ``df``'s ids annotated with (cluster, keep): nodes in a pair
    cluster get the component's minimum id; singletons (never paired) are
    their own cluster.  ``keep`` marks the canonical survivor — exactly one
    per cluster, the lowest id (the same rule as exact_dedup).

    The components table is tiny relative to the corpus (only paired docs
    appear in it), so the corpus join broadcasts in the common case; at
    extreme pair volume Catalyst/AQE falls back to a key shuffle on id.

    ``method``: 'label_propagation' (default — fewest shuffles on the
    shallow near-clique graphs dedup produces) or 'star' (large-star/
    small-star contraction, O(log² n) rounds on any diameter).
    """
    if method == "star":
        comp = connected_components_star(pairs, id_a, id_b)
    elif method == "label_propagation":
        comp = connected_components(pairs, id_a, id_b)
    else:
        raise ValueError(f"unknown method {method!r}: label_propagation | star")
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("comp"), F.col("id")).alias("cluster"),
        )
    )
    return out.withColumn("keep", F.col(id_col) == F.col("cluster"))


def cluster_size_histogram(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    method: str = "label_propagation",
) -> DataFrame:
    """Duplicate-cluster size distribution: (size, n_clusters, n_docs) per
    component size, singletons included as size-1 clusters.

    The audit view that decides dedup policy: a corpus whose mass sits in a
    few giant clusters (boilerplate storms, mirror sites) needs survivor
    sampling or span excision, while a long tail of pairs is safe to
    collapse outright.  Composes :func:`resolve_duplicates` (already
    hash-certified against a recursive-CTE oracle) with two partial
    aggregations — the histogram is at most |distinct sizes| rows, so both
    shuffles carry keys only and the result is driver-safe at any corpus
    size.
    """
    clusters = resolve_duplicates(df, pairs, id_col, id_a, id_b, method)
    sizes = clusters.groupBy("cluster").agg(F.count(F.lit(1)).alias("size"))
    return (
        sizes.groupBy("size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("size").cast("bigint").alias("n_docs"),
        )
        .select("size", "n_clusters", "n_docs")
    )


def soft_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    seed: str = "soft1",
    method: str = "label_propagation",
) -> DataFrame:
    """Probabilistic deduplication: keep each document with probability
    1/|cluster| instead of keeping exactly the canonical survivor.

    Hard dedup (:func:`resolve_duplicates`) biases the surviving corpus
    toward whichever copy sorts first; soft dedup keeps duplicate MASS
    uniform — every cluster contributes one expected document, but which
    copy survives varies per cluster, and near-duplicate variation
    (formatting, boilerplate deltas) is preserved in expectation.  This is
    the dedup counterpart of temperature sampling: same expected token
    budget, less selection bias.

    The keep decision is a deterministic hash gate (the sampling-module
    discipline): ``gate(seed, id) < 2^32 div |cluster|`` — reproducible
    across runs/engines, no RNG state.  Singletons pass always
    (2^32 div 1 exceeds every gate value).

    Scale: component table join as in resolve_duplicates, plus ONE extra
    shuffle for the cluster-size count; the gate itself is map-only.

    Output: (id, cluster, cluster_size, keep).
    """
    from cassandra_util_spark.operators.sampling import sample_gate

    assigned = resolve_duplicates(df, pairs, id_col, id_a, id_b, method).drop("keep")
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        assigned.join(sizes, "cluster")
        .select(
            id_col,
            "cluster",
            "cluster_size",
            (
                sample_gate(F.col(id_col), seed)
                < F.expr("4294967296 div cluster_size")
            ).alias("keep"),
        )
    )
