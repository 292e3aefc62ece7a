from cassandra_util_spark.operators.convictors import (
    Convictor,
    ConfigurableDeleter,
    RuleBasedDeletionConvictor,
    RuleBasedLateTTLConvictor,
    create_convictor,
    register_convictor,
)
from cassandra_util_spark.operators.retention import RetentionJob, RetentionStats
from cassandra_util_spark.operators.cluster import (
    connected_components,
    connected_components_star,
    resolve_duplicates,
)
from cassandra_util_spark.operators.dedup import (
    decontaminate,
    dedup_against,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from cassandra_util_spark.operators.packing import (
    chunk_documents,
    pack_greedy,
    pack_sequences,
)
from cassandra_util_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    quantize_embedding,
    semantic_dedup,
)
from cassandra_util_spark.operators.sampling import (
    hash_sample,
    mixed_sample,
    stratified_repeat,
    stratified_sample,
    stratified_topk_sample,
)
from cassandra_util_spark.operators.text import (
    commonness_score,
    redact_pii,
    text_profile,
    tfidf_top_terms,
)

__all__ = [
    "Convictor",
    "ConfigurableDeleter",
    "RuleBasedDeletionConvictor",
    "RuleBasedLateTTLConvictor",
    "create_convictor",
    "register_convictor",
    "RetentionJob",
    "RetentionStats",
    "connected_components",
    "connected_components_star",
    "resolve_duplicates",
    "decontaminate",
    "dedup_against",
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "cosine_topk",
    "embedding_neardup_pairs",
    "ivf_topk",
    "quantize_embedding",
    "semantic_dedup",
    "chunk_documents",
    "pack_greedy",
    "pack_sequences",
    "commonness_score",
    "redact_pii",
    "text_profile",
    "tfidf_top_terms",
    "hash_sample",
    "mixed_sample",
    "stratified_repeat",
    "stratified_sample",
    "stratified_topk_sample",
]
