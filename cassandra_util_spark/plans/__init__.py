from cassandra_util_spark.plans.rules import (
    CompiledRuleset,
    Range,
    Rule,
    compile_ruleset,
    load_rules_df,
    rule_match_expr,
    ruleset_convict_expr,
    ttl_assignment_expr,
)
from cassandra_util_spark.plans.statement import In, Inline, Fields, Statement, cql

__all__ = [
    "CompiledRuleset",
    "Range",
    "Rule",
    "compile_ruleset",
    "load_rules_df",
    "rule_match_expr",
    "ruleset_convict_expr",
    "ttl_assignment_expr",
    "In",
    "Inline",
    "Fields",
    "Statement",
    "cql",
]
