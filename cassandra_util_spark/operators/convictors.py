"""Convictor plugin surface: the engine's UDF-like extension point.

The reference loads a convictor class by name from table options, hard-fails
invalid options at ALTER time (``DeletingCompactionStrategyOptions.java:125-143,
228-259``), and lets runtime irregularities degrade the run to dry-run
("spooked").  Here a convictor contributes a **Column expression** — it stays
inside Catalyst/codegen, so conviction is evaluated during the scan with
predicate pushdown, never in Python per row.

``ConfigurationError`` = the ALTER-time hard failure; ``spooked`` = the
runtime degrade-to-dry-run signal.
"""

from __future__ import annotations

import json
import time
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_util_spark.core.table import KeyedTable
from cassandra_util_spark.plans.rules import (
    LoadedRules,
    Range,
    Rule,
    compile_ruleset,
    load_rules_df,
    parse_bound,
    ruleset_convict_expr,
    ttl_assignment_expr,
    ttl_convict_expr,
)


class ConfigurationError(ValueError):
    """Invalid convictor options — raised eagerly, like validateOptions."""


class Convictor:
    """Base convictor: subclasses override :meth:`convict_expr`.

    ``spooked`` convictors still *evaluate* (counts are reported) but the
    retention job refuses to delete — never partial deletion on bad config.
    """

    name: str = "convictor"

    def __init__(self, table: KeyedTable, **options: Any) -> None:
        self.table = table
        self.options = options
        self.warnings: list[str] = []
        self.spooked = False

    @classmethod
    def validate_options(cls, **options: Any) -> dict[str, Any]:
        """Hard-fail on structurally invalid options; returns leftover options
        (pass-through protocol: unknown keys flow to the underlying job)."""
        return dict(options)

    def convict_expr(self) -> Column:
        """Must be NULL-SAFE: evaluate to true/false, never null, for every
        row (three-valued logic would otherwise silently drop rows on
        ``~convict``).  Rule-compiled predicates guarantee this at the leaves
        (every range match conjoins ``isNotNull``); wrap anything else in
        ``F.coalesce(expr, F.lit(False))``.  Kept free of a blanket coalesce
        here because it would block parquet predicate pushdown — at 100 TB
        the keep-filter reaching ``PushedFilters`` is the difference between
        scanning row groups and skipping them."""
        raise NotImplementedError

    def keep_expr(self) -> Column:
        return ~self.convict_expr()


# ---------------------------------------------------------------------------
# Registry (dcs_convictor analog)
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, type[Convictor]] = {}


def register_convictor(cls: type[Convictor]) -> type[Convictor]:
    _REGISTRY[cls.name] = cls
    return cls


def create_convictor(name: str, table: KeyedTable, **options: Any) -> Convictor:
    if name not in _REGISTRY:
        raise ConfigurationError(
            f"unknown convictor {name!r}; registered: {sorted(_REGISTRY)}"
        )
    cls = _REGISTRY[name]
    cls.validate_options(**options)
    return cls(table, **options)


# ---------------------------------------------------------------------------
# Rule-based convictors (the reference's two production convictors)
# ---------------------------------------------------------------------------

def _resolve_rules(
    table: KeyedTable, rules: Any, rules_select: Any, with_ttl: bool
) -> Any:
    """Rules come either as data (DataFrame / LoadedRules / [Rule]) or as a
    QUERY (``rules_select`` — Statement or SQL string), the reference's
    ``rules_select_statement`` option where the rule set is data-driven
    configuration fetched at convictor-construction time
    (``RuleBasedDeletionConvictor.java:97-198``)."""
    from cassandra_util_spark.plans.rules import load_rules

    if rules is None and rules_select is None:
        raise ConfigurationError("requires 'rules' or 'rules_select'")
    if rules_select is not None:
        if rules is not None:
            raise ConfigurationError("pass either 'rules' or 'rules_select', not both")
        return load_rules(table.df.sparkSession, rules_select, with_ttl=with_ttl)
    return load_rules_df(rules, with_ttl=with_ttl) if isinstance(rules, DataFrame) else rules


@register_convictor
class RuleBasedDeletionConvictor(Convictor):
    """Match ⇒ convict, over a rules table (cassandra-util
    ``RuleBasedDeletionConvictor.java``; semantics at :mod:`plans.rules`)."""

    name = "rule_based_deletion"

    def __init__(
        self,
        table: KeyedTable,
        rules: DataFrame | LoadedRules | list[Rule] | None = None,
        rules_select: Any = None,
        **options: Any,
    ) -> None:
        super().__init__(table, **options)
        loaded = _resolve_rules(table, rules, rules_select, with_ttl=False)
        compiled = compile_ruleset(loaded, table, mode="delete")
        self.rules = compiled.rules
        self.warnings = compiled.warnings
        self.spooked = compiled.spooked

    @classmethod
    def validate_options(cls, **options: Any) -> dict[str, Any]:
        options = dict(options)
        if options.pop("rules", None) is None and options.pop("rules_select", None) is None:
            raise ConfigurationError(
                "rule_based_deletion requires 'rules' or 'rules_select'"
            )
        options.pop("rules_select", None)
        return options

    def convict_expr(self) -> Column:
        return ruleset_convict_expr(self.rules, self.table)


@register_convictor
class RuleBasedLateTTLConvictor(Convictor):
    """Age-out rows whose min-matching-rule TTL is exceeded
    (``RuleBasedLateTTLConvictor.java:560-684``).  ``now_ms`` is pinned at
    construction (fixedTtlBaseTime) so a run is deterministic."""

    name = "rule_based_late_ttl"

    def __init__(
        self,
        table: KeyedTable,
        rules: DataFrame | LoadedRules | list[Rule] | None = None,
        default_ttl: Optional[int] = None,
        now_ms: Optional[int] = None,
        rules_select: Any = None,
        **options: Any,
    ) -> None:
        super().__init__(table, **options)
        loaded = _resolve_rules(table, rules, rules_select, with_ttl=True)
        compiled = compile_ruleset(loaded, table, mode="ttl")
        self.rules = compiled.rules
        self.warnings = compiled.warnings
        self.spooked = compiled.spooked
        self.default_ttl = default_ttl
        self.now_ms = int(now_ms if now_ms is not None else time.time() * 1000)
        if table.meta.writetime_col is None:
            raise ConfigurationError("rule_based_late_ttl requires a writetime column")

    @classmethod
    def validate_options(cls, **options: Any) -> dict[str, Any]:
        options = dict(options)
        if options.pop("rules", None) is None and options.get("rules_select") is None:
            raise ConfigurationError(
                "rule_based_late_ttl requires 'rules' or 'rules_select'"
            )
        dt = options.pop("default_ttl", None)
        if dt is not None:
            try:
                int(dt)
            except (TypeError, ValueError):
                raise ConfigurationError(f"invalid default_ttl {dt!r}") from None
        options.pop("now_ms", None)
        options.pop("rules_select", None)
        return options

    def effective_ttl_expr(self) -> Column:
        return ttl_assignment_expr(self.rules, self.table, self.default_ttl)

    def convict_expr(self) -> Column:
        return ttl_convict_expr(
            self.rules, self.table, self.now_ms, self.default_ttl
        )


# ---------------------------------------------------------------------------
# ConfigurableDeleter (JSON-option rules; example-class parity)
# ---------------------------------------------------------------------------

@register_convictor
class ConfigurableDeleter(Convictor):
    """Deletion ranges from a JSON option, e.g.
    ``{"a": [8, [null, 5], ["11", null]], "b": "7"}``
    (``ConfigurableDeleter.java:136-197,261-311``).

    Single value = degenerate [v, v] range; empty list = no ranges (column
    ignored); only partition/clustering key columns participate.

    Divergences from the reference, documented on purpose:
    - the reference tests only the FIRST key column present in the rules
      (HashMap iteration order — an artifact); we apply the documented AND
      semantics: keep iff NO covered key column matches (= convict on any
      match).  Observable outcomes on its own test matrix are identical.
    - the reference compares raw serialized bytes unsigned
      (``compareUnsigned``); the default ``compare="typed"`` compares in the
      column's type domain, which agrees for non-negative ints and ASCII
      text (all the reference fixtures).  ``compare="bytes"`` reproduces the
      byte-wise unsigned order exactly (negative keys sort after positive),
      closing the parity gap for negative-int keys.
    """

    name = "configurable_deleter"

    def __init__(
        self, table: KeyedTable, delete_keys: str, compare: str = "typed", **options: Any
    ) -> None:
        super().__init__(table, **options)
        if compare not in ("typed", "bytes"):
            raise ConfigurationError(f"compare must be 'typed' or 'bytes', got {compare!r}")
        self.compare = compare
        parsed = self.validate_delete_keys(delete_keys)
        columns: dict[str, tuple[Range, ...]] = {}
        for col, spec in parsed.items():
            if table.meta.key_kind(col) is None:
                # non-key columns never participate in conviction
                self.warnings.append(f"ignoring non-key column {col!r} in delete_keys")
                continue
            ranges: list[Range] = []
            if isinstance(spec, list):
                for v in spec:
                    if isinstance(v, list):
                        lo, hi = v
                        ranges.append(Range(_s(lo), _s(hi)))
                    else:
                        ranges.append(Range(_s(v), _s(v)))
            else:
                ranges.append(Range(_s(spec), _s(spec)))
            if ranges:
                columns[col] = tuple(ranges)
        self.columns = columns

    @classmethod
    def validate_options(cls, **options: Any) -> dict[str, Any]:
        options = dict(options)
        value = options.pop("delete_keys", None)
        if value is None:
            raise ConfigurationError("delete_keys is a required configuration property")
        cls.validate_delete_keys(value)
        cmp_mode = options.pop("compare", "typed")
        if cmp_mode not in ("typed", "bytes"):
            raise ConfigurationError(f"compare must be 'typed' or 'bytes', got {cmp_mode!r}")
        return options

    @staticmethod
    def validate_delete_keys(value: str) -> dict[str, Any]:
        try:
            rules = json.loads(value)
        except (TypeError, ValueError) as e:
            raise ConfigurationError(f"invalid JSON for delete_keys: {e}") from e
        if not isinstance(rules, dict):
            raise ConfigurationError("delete_keys must be a JSON object")
        for k, v in rules.items():
            if isinstance(v, dict):
                raise ConfigurationError(f"{k} contains an invalid value: maps unsupported")
            if isinstance(v, list):
                for item in v:
                    if isinstance(item, dict):
                        raise ConfigurationError(f"{k} contains an invalid value: maps unsupported")
                    if isinstance(item, list):
                        if len(item) != 2:
                            raise ConfigurationError(
                                f"{k}: sub-arrays define a range and must be exactly 2 elements"
                            )
                        for b in item:
                            if isinstance(b, (dict, list)):
                                raise ConfigurationError(
                                    f"{k}: ranges may contain only simple values"
                                )
        return rules

    def convict_expr(self) -> Column:
        from functools import reduce

        from cassandra_util_spark.plans.rules import range_match_expr

        col_preds = []
        for col, ranges in self.columns.items():
            dtype = self.table.dtype_of(col)
            col_preds.append(
                reduce(
                    lambda a, b: a | b,
                    (range_match_expr(col, r, dtype, self.compare) for r in ranges),
                )
            )
        if not col_preds:
            return F.lit(False)
        return reduce(lambda a, b: a | b, col_preds)


def _s(v: Any) -> Optional[str]:
    return None if v is None else str(v)


# ---------------------------------------------------------------------------
# Example/test-fixture convictors (example package parity)
# ---------------------------------------------------------------------------

@register_convictor
class KeepAllItemsDeleter(Convictor):
    name = "keep_all"

    def convict_expr(self) -> Column:
        return F.lit(False)


@register_convictor
class AllPartitionKeyDeleter(Convictor):
    name = "delete_all_partitions"

    def convict_expr(self) -> Column:
        return F.lit(True)


@register_convictor
class AllAtomDeleter(Convictor):
    """Convicts every atom (``example/AllAtomDeleter.java:43-53``).  The
    reference distinguishes partition-level conviction from atom/cell-level
    conviction; in the row model a row IS the atom group, so this is
    behaviorally identical to ``delete_all_partitions`` — registered under
    its own name so the example-convictor matrix maps 1:1 and the identity
    is explicit rather than implied."""

    name = "delete_all_atoms"

    def convict_expr(self) -> Column:
        return F.lit(True)


@register_convictor
class AllClusterKeyDeleter(Convictor):
    """Convicts every clustering group — rows in tables *with* clustering keys
    vanish; tables without clustering keys are untouched."""

    name = "delete_all_clusters"

    def convict_expr(self) -> Column:
        return F.lit(bool(self.table.meta.clustering_keys))


@register_convictor
class OddPartitionKeyDeleter(Convictor):
    """Keeps rows whose first partition key is even
    (``OddPartitionKeyDeleter.java:55-75``)."""

    name = "odd_pk"

    def convict_expr(self) -> Column:
        pk = self.table.meta.partition_keys[0]
        return F.coalesce(F.pmod(F.col(pk).cast("bigint"), F.lit(2)) == 1, F.lit(False))


@register_convictor
class OddClusterKeyDeleter(Convictor):
    """Keeps rows whose last clustering key is even
    (``OddClusterKeyDeleter.java:52-75``)."""

    name = "odd_ck"

    def convict_expr(self) -> Column:
        if not self.table.meta.clustering_keys:
            return F.lit(False)
        ck = self.table.meta.clustering_keys[-1]
        return F.coalesce(F.pmod(F.col(ck).cast("bigint"), F.lit(2)) == 1, F.lit(False))


@register_convictor
class OddTokenDeleter(Convictor):
    """Keeps partitions whose token is even (``OddTokenDeleter.java:46-61``).
    The Spark "token" is a 64-bit hash of the partition key columns."""

    name = "odd_token"

    def convict_expr(self) -> Column:
        token = F.xxhash64(*[F.col(c) for c in self.table.meta.partition_keys])
        return F.coalesce(F.pmod(token, F.lit(2)) == 1, F.lit(False))
