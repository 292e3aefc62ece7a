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

    for _ in range(max_iter):
        # neighbor minimum: every edge proposes its src's label to its dst
        proposals = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), F.col("comp"))
        )
        new_labels = (
            labels.unionByName(proposals)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "component diameter exceeds the guard — raise max_iter or switch "
        "to large-star/small-star contraction for this graph"
    )


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Full-corpus cluster assignment + survivor flag.

    Returns ``df``'s ids annotated with (cluster, keep): nodes in a pair
    cluster get the component's minimum id; singletons (never paired) are
    their own cluster.  ``keep`` marks the canonical survivor — exactly one
    per cluster, the lowest id (the same rule as exact_dedup).

    The components table is tiny relative to the corpus (only paired docs
    appear in it), so the corpus join broadcasts in the common case; at
    extreme pair volume Catalyst/AQE falls back to a key shuffle on id.
    """
    comp = connected_components(pairs, id_a, id_b)
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("comp"), F.col("id")).alias("cluster"),
        )
    )
    return out.withColumn("keep", F.col(id_col) == F.col("cluster"))
