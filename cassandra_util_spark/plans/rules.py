"""Retention-rule model and compiler: rules → a single Catalyst ``Column``.

Semantics (from cassandra-util, implemented fresh for Spark):

- A **rule** names columns, each with a list of inclusive ``[lo, hi]`` ranges;
  a ``None`` bound is unbounded (``RuleBasedDeletionConvictor.java:381-408``).
- Bounds arrive as **text** but compare with the *column type's* comparator —
  ``"1726"`` on a bigint is numeric, on a text column lexicographic
  (``RuleBasedDeletionConvictor.java:270-280``; proven by the "sweep for
  oversized values" spec).  We parse each bound with the column's Spark type
  at compile time and inline it as a typed literal — never compare as strings.
- A rule **matches** a row iff EVERY column it names matches ≥1 of its ranges
  (AND over columns, OR over ranges); rules combine as OR — any rule matching
  convicts the row (``RuleBasedLateTTLConvictor.java:129-166``).
- An **empty rule** would convict everything; the reference chooses to convict
  nothing and warn (``RuleBasedDeletionConvictor.java:424-428``) — so do we.
- **Degradation ladder**: irregular configuration (unknown column, non-key
  column, unparseable bound, pk+ck mixed ruleset in delete mode, inconsistent
  TTL within a rule) never partially deletes — it "spooks" the run into
  dry-run (``RuleBasedDeletionConvictor.java:238-251,319-323``).

Note on the reference's cluster-path inversion: its ``shouldKeepCluster``
convicts when every rule column is *outside* its ranges
(``RuleBasedDeletionConvictor.java:481-510``) — the opposite of the partition
path and of the documented semantics.  That path is unreachable in shipped
config (pk+ck mixes degrade to dry run) and untested; we implement the
documented match⇒convict semantics uniformly for both key levels.

Scale: rules are tiny (a config table); compiling them to literal-inlined
predicates makes retention a **map-only scan** — no join, no shuffle, full
predicate pushdown into the parquet scan.  That is the design that holds at
100 TB: conviction cost is one pass over the data, embarrassingly parallel.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from decimal import Decimal, InvalidOperation
from functools import reduce
from typing import Any, Callable, Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_util_spark.core.table import KeyedTable


@dataclass(frozen=True)
class Range:
    """Inclusive [lo, hi]; None = unbounded on that side; both None = match all."""

    lo: Optional[str]
    hi: Optional[str]


@dataclass(frozen=True)
class Rule:
    name: str
    columns: Mapping[str, tuple[Range, ...]]
    ttl: Optional[int] = None  # seconds; 0 = delete now; <0 = keep forever

    @property
    def is_empty(self) -> bool:
        return len(self.columns) == 0


@dataclass
class LoadedRules:
    rules: list[Rule]
    warnings: list[str] = field(default_factory=list)
    spooked: bool = False


@dataclass
class CompiledRuleset:
    rules: list[Rule]
    spooked: bool
    warnings: list[str]
    contains_partition_keys: bool
    contains_clustering_keys: bool


# ---------------------------------------------------------------------------
# Rule loading (the "rules_select_statement" analog)
# ---------------------------------------------------------------------------

def load_rules_df(rules_df: DataFrame, with_ttl: bool = False) -> LoadedRules:
    """Materialize a rules table into Rule objects.

    Expected columns: ``rulename``, ``column``, ``range`` struct<lo,hi> (text,
    nullable) and, when ``with_ttl``, ``ttl`` (bigint).  Rule tables are
    configuration — a few rows — so a driver-side collect is correct here;
    the compiled predicate is what ships to executors.

    A rulename whose rows disagree on ``ttl`` spooks the ruleset
    (``RuleBasedLateTTLConvictor.java:326-334``).
    """
    rows = rules_df.collect()
    by_name: dict[str, dict[str, list[Range]]] = {}
    ttls: dict[str, int] = {}
    warnings: list[str] = []
    spooked = False
    for r in rows:
        name = r["rulename"]
        rng = r["range"]
        lo = rng["lo"] if rng is not None else None
        hi = rng["hi"] if rng is not None else None
        by_name.setdefault(name, {}).setdefault(r["column"], []).append(Range(lo, hi))
        if with_ttl:
            ttl = int(r["ttl"])
            if name in ttls and ttls[name] != ttl:
                warnings.append(
                    f"rule {name!r} has inconsistent TTLs ({ttls[name]} vs {ttl}); degrading to dry run"
                )
                spooked = True
            ttls[name] = ttl
    rules = [
        Rule(name, {c: tuple(rs) for c, rs in cols.items()}, ttls.get(name))
        for name, cols in by_name.items()
    ]
    return LoadedRules(rules, warnings, spooked)


def load_rules(spark, rules_select, with_ttl: bool = False) -> LoadedRules:
    """Load rules from a *query* — the reference's ``rules_select_statement``
    path, where the convictor's rule set is data-driven configuration fetched
    by an operator-supplied SELECT (``RuleBasedDeletionConvictor.java:97-198``,
    executed there at LOCAL_QUORUM; here Spark SQL's parameterized-query API
    plays that role, with Catalyst's plan cache as the prepared-statement
    cache).

    ``rules_select`` may be a :class:`~cassandra_util_spark.plans.statement.Statement`
    (safe parameter binding — the way to scope a shared rules table by
    tenant) or a plain SQL string.  The result must expose the standard rule
    columns (``rulename``, ``column``, ``range``; plus ``ttl`` when
    ``with_ttl``).
    """
    from cassandra_util_spark.plans.statement import Statement

    if isinstance(rules_select, Statement):
        df = rules_select.execute(spark)
    else:
        df = spark.sql(rules_select)
    return load_rules_df(df, with_ttl=with_ttl)


# ---------------------------------------------------------------------------
# Text bound → typed literal (schema-directed late typing)
# ---------------------------------------------------------------------------

_INT_BOUNDS = {
    "tinyint": (-(2**7), 2**7 - 1),
    "smallint": (-(2**15), 2**15 - 1),
    "int": (-(2**31), 2**31 - 1),
    "bigint": (-(2**63), 2**63 - 1),
}


def parse_bound(text: str, dtype: str) -> Any:
    """Parse a text bound with the column type's semantics; raises ValueError
    on anything the type can't represent (→ spook, never silent null)."""
    base = dtype.split("(")[0]
    if base == "string":
        return text
    if base in _INT_BOUNDS:
        v = int(text)
        lo, hi = _INT_BOUNDS[base]
        if not lo <= v <= hi:
            raise ValueError(f"{text!r} out of range for {dtype}")
        return v
    if base in ("float", "double"):
        return float(text)
    if base == "decimal":
        try:
            return Decimal(text)
        except InvalidOperation as e:
            raise ValueError(str(e)) from e
    if base == "boolean":
        t = text.strip().lower()
        if t in ("true", "false"):
            return t == "true"
        raise ValueError(f"{text!r} is not a boolean")
    if base == "date":
        return _dt.date.fromisoformat(text)
    if base == "timestamp":
        if text.lstrip("-").isdigit():  # epoch milliseconds, like CQL timestamps
            return _dt.datetime.fromtimestamp(int(text) / 1000.0, tz=_dt.timezone.utc)
        return _dt.datetime.fromisoformat(text.replace("Z", "+00:00"))
    if base == "binary":
        return bytes.fromhex(text)
    raise ValueError(f"unsupported column type for rule bounds: {dtype}")


def _typed_lit(value: Any, dtype: str) -> Column:
    lit = F.lit(value)
    base = dtype.split("(")[0]
    # lit() infers python int as bigint etc.; cast pins the exact column type
    # so comparisons stay in the column's domain (and fold at plan time).
    if base not in ("string",):
        lit = lit.cast(dtype)
    return lit


# ---------------------------------------------------------------------------
# Compilation to Column expressions
# ---------------------------------------------------------------------------

_SIGN64 = -(1 << 63)


def _unsigned64_lit(v: int) -> int:
    """The signed-bigint whose value under ``x XOR sign-bit`` ordering equals
    v's rank in unsigned-byte order (big-endian two's complement)."""
    x = (v & 0xFFFFFFFFFFFFFFFF) ^ (1 << 63)
    return x - (1 << 64) if x >= (1 << 63) else x


def range_match_expr(column: str, rng: Range, dtype: str, compare: str = "typed") -> Column:
    """value ∈ [lo, hi] inclusive; None bound = unbounded.

    ``compare="bytes"`` reproduces the reference's unsigned byte-wise order
    over the serialized key (``ConfigurableDeleter.java:272-275``): integer
    types compare as ``x XOR sign-bit`` (exactly unsigned big-endian
    two's-complement order, still a folded codegen integer compare — negative
    keys sort AFTER positive ones); strings already compare byte-wise in
    Spark (UTF8String order = UTF-8 byte order), and other types keep their
    typed order (the reference fixtures only exercise ints and text).
    """
    base = dtype.split("(")[0]
    if compare == "bytes" and base in _INT_BOUNDS:
        colx = F.col(column).cast("bigint").bitwiseXOR(F.lit(_SIGN64))

        def bound_lit(text: str) -> Column:
            return F.lit(_unsigned64_lit(parse_bound(text, dtype)))

    else:
        colx = F.col(column)

        def bound_lit(text: str) -> Column:
            return _typed_lit(parse_bound(text, dtype), dtype)

    preds: list[Column] = []
    if rng.lo is not None:
        preds.append(colx >= bound_lit(rng.lo))
    if rng.hi is not None:
        preds.append(colx <= bound_lit(rng.hi))
    if not preds:
        # (null, null) = full scan: matches every non-null value
        return F.col(column).isNotNull()
    return reduce(lambda a, b: a & b, preds) & F.col(column).isNotNull()


def rule_match_expr(rule: Rule, table: KeyedTable) -> Column:
    """AND over the rule's columns; OR over each column's ranges."""
    if rule.is_empty:
        return F.lit(False)  # empty rule convicts nothing (reference policy)
    col_preds = []
    for column, ranges in rule.columns.items():
        dtype = table.dtype_of(column)
        col_preds.append(reduce(lambda a, b: a | b, (range_match_expr(column, r, dtype) for r in ranges)))
    return reduce(lambda a, b: a & b, col_preds)


def ruleset_convict_expr(rules: list[Rule], table: KeyedTable) -> Column:
    """OR over rules: any rule matching ⇒ convict.  ``keep = ~convict``."""
    exprs = [rule_match_expr(r, table) for r in rules if not r.is_empty]
    if not exprs:
        return F.lit(False)
    return reduce(lambda a, b: a | b, exprs)


def ttl_assignment_expr(
    rules: list[Rule], table: KeyedTable, default_ttl: Optional[int] = None
) -> Column:
    """Effective TTL per row: the **minimum** TTL among matching rules, falling
    back to ``default_ttl`` when no rule matches
    (``RuleBasedLateTTLConvictor.java:575-589,610-642``).

    Folded as ``least(when(match_i, ttl_i)...)`` — ``least`` skips nulls, so
    non-matching rules drop out; stays entirely in codegen.
    """
    branches = [
        F.when(rule_match_expr(r, table), F.lit(int(r.ttl)).cast("bigint"))
        for r in rules
        if not r.is_empty and r.ttl is not None
    ]
    if not branches:
        eff = F.lit(None).cast("bigint")
    elif len(branches) == 1:
        eff = branches[0]
    else:
        eff = F.least(*branches)
    if default_ttl is not None:
        eff = F.coalesce(eff, F.lit(int(default_ttl)).cast("bigint"))
    return eff


def ttl_convict_expr(
    rules: list[Rule],
    table: KeyedTable,
    now_ms: int,
    default_ttl: Optional[int] = None,
    writetime_col: Optional[str] = None,
) -> Column:
    """Convict iff the record's age exceeds its effective TTL.

    - writetime is **microseconds**; age = (now_ms - writetime/1000)/1000 sec
      (``RuleBasedLateTTLConvictor.java:644-648``); future-dated writes have
      negative age and always survive.
    - effective TTL null (no rule matched, no default) ⇒ keep.
    - effective TTL < 0 ⇒ keep forever — a narrowly-scoped negative-TTL rule
      overrides broader deletion rules because min() picks it.
    - ``now_ms`` is pinned once per run (``fixedTtlBaseTime``) for determinism.
    """
    wt = writetime_col or table.meta.writetime_col
    if wt is None:
        raise ValueError("TTL retention needs a writetime column")
    eff = ttl_assignment_expr(rules, table, default_ttl)
    wt_ms = F.floor(F.col(wt) / F.lit(1000))
    age_sec = F.floor((F.lit(int(now_ms)) - wt_ms) / F.lit(1000))
    # coalesce: a null writetime yields null age — keep such rows, never convict
    return F.coalesce(eff.isNotNull() & (eff >= 0) & (age_sec > eff), F.lit(False))


# ---------------------------------------------------------------------------
# Validation (the spook/degradation ladder)
# ---------------------------------------------------------------------------

def compile_ruleset(
    loaded: LoadedRules | list[Rule],
    table: KeyedTable,
    mode: str = "delete",
) -> CompiledRuleset:
    """Validate rules against the table's key metadata.

    mode='delete' mirrors RuleBasedDeletionConvictor (pk+ck mix spooks);
    mode='ttl' mirrors RuleBasedLateTTLConvictor (mix allowed — the cluster
    pass refines the partition pass).
    """
    if isinstance(loaded, LoadedRules):
        rules, warnings, spooked = list(loaded.rules), list(loaded.warnings), loaded.spooked
    else:
        rules, warnings, spooked = list(loaded), [], False

    contains_pk = False
    contains_ck = False
    table_cols = {name: dtype for name, dtype in table.df.dtypes}
    valid_rules: list[Rule] = []

    for rule in rules:
        if rule.is_empty:
            warnings.append(
                f"rule {rule.name!r} is empty and would convict everything; convicting nothing instead"
            )
            valid_rules.append(rule)  # harmless: compiles to convict-nothing
            continue
        rule_ok = True
        for column, ranges in rule.columns.items():
            if column not in table_cols:
                warnings.append(f"degrading to dry run: column {column!r} not found")
                spooked = True
                rule_ok = False
                continue
            kind = table.meta.key_kind(column)
            if kind is None:
                warnings.append(
                    f"degrading to dry run: column {column!r} is not a partition or clustering key"
                )
                spooked = True
                rule_ok = False
                continue
            contains_pk |= kind == "pk"
            contains_ck |= kind == "ck"
            dtype = table_cols[column]
            for rng in ranges:
                for bound in (rng.lo, rng.hi):
                    if bound is None:
                        continue
                    try:
                        parse_bound(bound, dtype)
                    except (ValueError, TypeError) as e:
                        warnings.append(
                            f"degrading to dry run: column {column!r} has unparseable bound {bound!r}: {e}"
                        )
                        spooked = True
                        rule_ok = False
        if rule_ok:
            valid_rules.append(rule)

    if mode == "delete" and contains_pk and contains_ck:
        warnings.append(
            "degrading to dry run: ruleset mixes partition and clustering keys"
        )
        spooked = True
    if rules and not contains_pk and not spooked:
        warnings.append("ruleset contains no partition keys; deletion will still evaluate per row")

    # invalid rules are excluded from compilation — the spooked flag already
    # forces dry run, and dry-run counts then reflect the parseable subset
    return CompiledRuleset(valid_rules, spooked, warnings, contains_pk, contains_ck)


def rule_impact_report(table: KeyedTable, rules: list[Rule]) -> DataFrame:
    """Per-rule dry-run impact: how many rows each rule would convict, in
    ONE scan — the "which rule is about to delete half the table" report an
    operator reads before arming a retention config (the reference surfaces
    only aggregate kept/dropped counts in its status line,
    FilteringSSTableScanner.java:333-373; per-rule attribution is the
    missing operational breakdown).

    Counts are independent per rule (a row matching two rules counts in
    both) plus an ``__any__`` row giving the de-overlapped union — the
    number the actual deletion would remove.  ``share`` is each count over
    the table total, rounded to 6dp.

    Scale: every rule predicate folds into one conditional-sum aggregate —
    a single map-only pass + 1-row combine regardless of rule count; the
    R-row unpivot happens on the 1-row aggregate, never on data.

    Rule names are configuration-supplied DATA, so they never touch the
    plan's column namespace: per-rule sums alias positionally (``__r<i>__``)
    and the unpivot is an explode of ``struct(lit(name), counter)`` pairs —
    no SQL-string interpolation, so a name containing backticks, quotes, or
    the report's own ``__total__``/``__any__`` labels cannot break or
    collide with the expression (it just appears verbatim in ``rulename``;
    the union row is always the one labeled ``__any__`` last).
    """
    aggs = [F.count(F.lit(1)).alias("__total__")]
    names = []
    for i, rule in enumerate(rules):
        names.append(rule.name)
        aggs.append(
            F.sum(F.when(rule_match_expr(rule, table), 1).otherwise(0)).alias(
                f"__r{i}__"
            )
        )
    aggs.append(
        F.sum(
            F.when(ruleset_convict_expr(rules, table), 1).otherwise(0)
        ).alias("__r_any__")
    )
    wide = table.df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("rulename"),
                F.col(f"__r{i}__").alias("n_convicted"),
            )
            for i, n in enumerate(names)
        ],
        F.struct(
            F.lit("__any__").alias("rulename"),
            F.col("__r_any__").alias("n_convicted"),
        ),
    )
    long = wide.select("__total__", F.explode(pairs).alias("e"))
    return long.select(
        F.col("e.rulename").alias("rulename"),
        F.col("e.n_convicted").cast("bigint").alias("n_convicted"),
        F.round(
            F.col("e.n_convicted").cast("double") / F.col("__total__"), 6
        ).alias("share"),
    )
