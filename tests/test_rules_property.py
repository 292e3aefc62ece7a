"""Property-based check of the rule compiler: the compiled Catalyst predicate
must agree with a direct Python evaluation of the documented semantics
(AND over a rule's columns, OR over ranges, OR over rules, inclusive typed
bounds, null bound = unbounded, null value never matches) on arbitrary
rulesets and rows.  The reference has no property tests; this guards the
compiler against regressions the golden counts wouldn't catch."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_util_spark.core.table import KeyedTable, TableMeta
from cassandra_util_spark.plans.rules import Range, Rule, ruleset_convict_expr

COLS = ("a", "b")

bound = st.one_of(st.none(), st.integers(-20, 20).map(str))
rng = st.builds(Range, bound, bound)
rule_columns = st.dictionaries(st.sampled_from(COLS), st.lists(rng, min_size=1, max_size=3).map(tuple), max_size=2)
rules_strategy = st.lists(
    st.builds(lambda i, cols: Rule(f"r{i}", cols), st.integers(0, 99), rule_columns),
    max_size=4,
)
rows_strategy = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(-25, 25)), st.one_of(st.none(), st.integers(-25, 25))),
    min_size=1,
    max_size=30,
)


def python_convicts(rules: list[Rule], row: dict) -> bool:
    def in_range(v, r: Range) -> bool:
        if v is None:
            return False
        lo_ok = r.lo is None or int(r.lo) <= v
        hi_ok = r.hi is None or v <= int(r.hi)
        return lo_ok and hi_ok

    for rule in rules:
        if rule.is_empty:
            continue  # empty rule convicts nothing
        if all(any(in_range(row[c], r) for r in ranges) for c, ranges in rule.columns.items()):
            return True
    return False


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rules=rules_strategy, rows=rows_strategy)
def test_compiled_predicate_matches_python_semantics(spark, rules, rows):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "rid int, a int, b int"
    )
    table = KeyedTable(df, TableMeta(("a",), ("b",)))
    convict = ruleset_convict_expr(rules, table)
    got = {r["rid"] for r in df.filter(convict).collect()}
    expected = {
        i for i, (a, b) in enumerate(rows) if python_convicts(rules, {"a": a, "b": b})
    }
    assert got == expected


ttl_rules_strategy = st.lists(
    st.builds(
        lambda i, cols, ttl: Rule(f"t{i}", cols, ttl),
        st.integers(0, 99),
        rule_columns,
        st.integers(-2, 400),
    ),
    max_size=3,
)


def python_ttl_convicts(rules, default_ttl, now_ms, row, wt):
    def in_range(v, r: Range) -> bool:
        if v is None:
            return False
        lo_ok = r.lo is None or int(r.lo) <= v
        hi_ok = r.hi is None or v <= int(r.hi)
        return lo_ok and hi_ok

    matching = [
        rule.ttl
        for rule in rules
        if not rule.is_empty
        and all(any(in_range(row[c], r) for r in ranges) for c, ranges in rule.columns.items())
    ]
    eff = min(matching) if matching else default_ttl
    if eff is None or eff < 0:
        return False
    if wt is None:
        return False
    import math
    age_sec = math.floor((now_ms - math.floor(wt / 1000)) / 1000)
    return age_sec > eff


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rules=ttl_rules_strategy,
    rows=st.lists(
        st.tuples(
            st.integers(-25, 25),
            st.integers(-25, 25),
            st.one_of(st.none(), st.integers(0, 1000)),  # age seconds (None = null wt)
        ),
        min_size=1,
        max_size=25,
    ),
    default_ttl=st.one_of(st.none(), st.integers(-1, 400)),
)
def test_ttl_convict_matches_python_semantics(spark, rules, rows, default_ttl):
    from cassandra_util_spark.plans.rules import ttl_convict_expr

    NOW = 1_700_000_000_000
    data = [
        (i, a, b, None if age is None else (NOW - age * 1000) * 1000)
        for i, (a, b, age) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "rid int, a int, b int, writetime bigint")
    table = KeyedTable(df, TableMeta(("a",), ("b",), "writetime"))
    convict = ttl_convict_expr(rules, table, NOW, default_ttl)
    got = {r["rid"] for r in df.filter(convict).collect()}
    expected = {
        i
        for i, (a, b, age) in enumerate(rows)
        if python_ttl_convicts(
            rules, default_ttl, NOW, {"a": a, "b": b},
            None if age is None else (NOW - age * 1000) * 1000,
        )
    }
    assert got == expected
