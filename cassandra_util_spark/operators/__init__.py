from cassandra_util_spark.operators.convictors import (
    Convictor,
    ConfigurableDeleter,
    RuleBasedDeletionConvictor,
    RuleBasedLateTTLConvictor,
    create_convictor,
    register_convictor,
)
from cassandra_util_spark.operators.retention import RetentionJob, RetentionStats

__all__ = [
    "Convictor",
    "ConfigurableDeleter",
    "RuleBasedDeletionConvictor",
    "RuleBasedLateTTLConvictor",
    "create_convictor",
    "register_convictor",
    "RetentionJob",
    "RetentionStats",
]
